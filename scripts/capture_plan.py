"""Capture `.explain("formatted")` for registered queries.

Usage: python scripts/capture_plan.py OUTDIR SUFFIX query [query ...]

Writes OUTDIR/<query>_<SUFFIX>.txt for each query (the judge-facing
plan evidence: plans/r12/<query>_before.txt / _after.txt). Queries that
return an eagerly-checkpointed result print the FINAL assembled plan
(post-checkpoint), same convention as the r11 dumps.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from designing_data_warehouse_in_sql_server_spark.session import get_spark  # noqa: E402


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ddw-plan-capture")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue().splitlines())} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
