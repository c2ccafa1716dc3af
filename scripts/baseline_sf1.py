"""Generate BASELINE_sf1.md: the full-registry 10x-data (sf1) bench
table (VERDICT r5 item 8's highest-ambition ask, executed round 6).

Usage: python scripts/baseline_sf1.py SF1_JSON [SF1_JSON ...]

Merges one or more sf1 bench passes (per-query MINIMUM — same policy as
refresh_baseline.py), compares each query against the committed sf0.1
per-query baseline in BASELINE.md, and writes the scaling table with a
ratio column. Data volume is 10x, so for a CPU-bound operator on the same 32 cores a
ratio of ~10x IS linear scaling; sublinear ratios mean the sf0.1 time
was dominated by fixed per-query overhead (~0.15-0.3 s of planning/job
setup). Queries >12x get flagged for a plan-audit note (appended below
the table after investigation) — that margin separates a superlinear
asymptote from best-of-N-vs-best-of-few measurement noise.
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def committed_sf01() -> dict[str, float]:
    """Parse the per-query table (only) out of BASELINE.md — the later
    scaling-probe tables reuse the `| name | sec |` shape at other scale
    factors and must not leak in."""
    out: dict[str, float] = {}
    in_section = False
    with open(os.path.join(REPO, "BASELINE.md")) as f:
        for line in f:
            if line.startswith("### Per-query baseline"):
                in_section = True
                continue
            if in_section and line.startswith("#"):
                break
            if in_section:
                m = re.match(r"\| ([a-z0-9_]+) \| ([0-9.]+) \|", line)
                if m:
                    out[m.group(1)] = float(m.group(2))
    return out


def main() -> None:
    passes = [json.load(open(p)) for p in sys.argv[1:]]
    if not passes:
        sys.exit("usage: baseline_sf1.py SF1_JSON [SF1_JSON ...]")
    merged: dict[str, float] = {}
    for p in passes:
        for k, v in p["queries"].items():
            merged[k] = min(merged.get(k, float("inf")), v)
    base = committed_sf01()
    hosts = [p.get("host", {}) for p in passes]
    total = round(sum(merged.values()), 1)

    base_total = round(sum(v for k, v in base.items() if k in merged))
    lines = [
        "# BASELINE_sf1 — full-registry bench at 10x data (sf1)",
        "",
        "The ENTIRE registry measured at sf1 (VERDICT r5 item 8, first run",
        "round 6, refreshed each round from current code): a persistent",
        "10x-sf0.1 dataset built by",
        "`SPARK_GRAFT_PROBE_MODE=build_sf1 python scripts/scaling_probe.py`;",
        "facts/entities get disjoint key offsets + 10-year time shifts,",
        "documents per-copy word salting, embeddings norm-preserving cyclic",
        "rotations — near-dup/ANN structure grows linearly by construction.",
        "Minimum per query across the passes below; ratio compares against",
        "the committed sf0.1 minima in BASELINE.md (themselves best-of-N, so",
        "single-pass sf1 numbers carry one-sided noise of ~+30%).",
        "",
        f"Passes: {len(passes)}; host telemetry per pass: "
        + "; ".join(
            f"trials={h.get('trials_per_query')}, load_before={h.get('loadavg_before')}, "
            f"spread={h.get('max_trial_spread')}"
            for h in hosts
        ),
        "",
        f"**Total: {total} s for {len(merged)} queries at 10x data** (committed",
        f"sf0.1 baseline total ~{base_total} s) — aggregate scaling on 10x rows.",
        "",
        "| query | sf1 s | sf0.1 s | ratio | verdict |",
        "|---|---|---|---|---|",
    ]
    flagged: list[str] = []
    for k in sorted(merged):
        s1 = merged[k]
        s01 = base.get(k)
        if s01:
            r = s1 / s01
            verdict = "linear-or-better" if r <= 12 else "AUDIT"
            if s01 <= 0.02:
                # ratio still shown and still auditable — just annotated,
                # because a <=20 ms denominator is fixed-overhead noise
                verdict += " (noise-dominated sf0.1 baseline)"
            if r > 12:
                flagged.append(k)
            lines.append(f"| `{k}` | {s1:.2f} | {s01:.2f} | {r:.2f}x | {verdict} |")
        else:
            lines.append(f"| `{k}` | {s1:.2f} | — | — | new this round |")
    lines += ["", f"Flagged for audit (>12x): {', '.join(f'`{k}`' for k in flagged) or 'none'}", ""]
    with open(os.path.join(REPO, "BASELINE_sf1.md"), "w") as f:
        f.write("\n".join(lines))
    print(json.dumps({"total": total, "n": len(merged), "flagged": flagged}))


if __name__ == "__main__":
    main()
