"""Temporal join operators Spark has no native form of: as-of join and
bounded range join (labeled extensions; the reference has no temporal
joins — SURVEY.md §2.11).

Both are implemented as compositions of existing DataFrame ops chosen
for their shuffle shape, NOT as range-predicate joins (which Spark can
only execute as broadcast-nested-loop or cartesian — quadratic per key):

- ``asof_join``: union the two streams, tag sides, and run ONE window
  pass per key ordered by (ts, side) carrying the right side's values
  forward with ``last(ignorenulls)``. One shuffle + one sort, linear in
  rows — the same shape a 100 TB backtest join needs. (Pandas has
  merge_asof; Spark's engine has nothing, and the naive
  ``l.ts >= r.ts`` join is O(n·m) per key.)
- ``range_join_pairs``: time-bucket both sides and equi-join on
  (key, bucket ± 1), then filter the exact bound — the bucket prefilter
  turns an unbounded range join into an equi-join touching only
  adjacent buckets (3x fan-out, never n²).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts: str,
    values: list[str],
    prefix: str = "asof_",
    direction: str = "backward",
) -> DataFrame:
    """For every left row, the nearest right row with the same keys:
    ``direction="backward"`` (default) takes the most recent right row
    with right.ts <= left.ts; ``direction="forward"`` the earliest right
    row with right.ts >= left.ts (ties include equality either way,
    matching DuckDB / pandas merge_asof defaults). Left rows with no
    matching right row keep NULL asof columns (left-join semantics).

    Requires the right side unique per (on..., ts) — aggregate it first
    if not (same contract as merge_asof's 'allow_exact_matches' path).

    Output: all left columns + ``<prefix><ts>`` and ``<prefix><v>`` for
    each value column.

    Scale: never a per-row range join — both directions are ONE
    union + ONE (keys)-partitioned ordered window with an O(1)
    IGNORE-NULLS frame."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    carried = [f"{prefix}{ts}"] + [f"{prefix}{c}" for c in values]
    fwd = direction == "forward"
    # equality must match: right rows sort before left at equal ts for
    # the backward (preceding-inclusive) frame, AFTER left for the
    # forward (following-inclusive) frame
    r = right.select(
        *[F.col(c) for c in on],
        F.col(ts).alias("__ts"),
        F.lit(2 if fwd else 0).alias("__side"),
        F.col(ts).alias(f"{prefix}{ts}"),
        *[F.col(c).alias(f"{prefix}{c}") for c in values],
    )
    l = left.withColumn("__ts", F.col(ts)).withColumn("__side", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)
    base = W.partitionBy(*on).orderBy("__ts", "__side")
    if fwd:
        w = base.rowsBetween(W.currentRow, W.unboundedFollowing)
        pick = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731
    else:
        w = base.rowsBetween(W.unboundedPreceding, W.currentRow)
        pick = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
    for c in carried:
        u = u.withColumn(c, pick(c))
    return u.filter(F.col("__side") == 1).drop("__ts", "__side")


def range_join_pairs(
    df: DataFrame,
    key: str,
    ts: str,
    id_col: str,
    max_gap_s: int,
) -> DataFrame:
    """All pairs (id_a < id_b) within the same key whose timestamps are
    at most ``max_gap_s`` apart.

    Shape: equi-join on (key, bucket) with one side exploded to its
    bucket and both neighbors; the exact |Δts| <= gap filter runs on the
    equi-matched rows only. Bucket width = max_gap_s guarantees every
    qualifying pair shares or neighbors a bucket; fan-out is a fixed 3x,
    so the join stays hash-partitioned and AQE-skew-safe at any scale."""
    # NTZ-safe epoch micros (unix_micros requires an instant TIMESTAMP;
    # wall-time micros keep the whole computation timezone-independent)
    micros = F.expr(f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts})")
    bucket = F.floor(micros / (max_gap_s * 1_000_000))
    a = df.select(
        F.col(key), F.col(id_col).alias("id_a"), micros.alias("__us_a"),
        F.explode(F.array(bucket - 1, bucket, bucket + 1)).alias("__bucket"),
    )
    b = df.select(
        F.col(key).alias("__key_b"), F.col(id_col).alias("id_b"),
        micros.alias("__us_b"), bucket.alias("__bucket"),
    )
    # no distinct needed: the exploded bucket values are distinct, so each
    # qualifying (id_a, id_b) matches on exactly one bucket value
    return (
        a.join(b, (F.col(key) == F.col("__key_b")) & (a["__bucket"] == b["__bucket"]))
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("__us_a") - F.col("__us_b")) <= max_gap_s * 1_000_000)
        )
        .select(key, "id_a", "id_b",
                ((F.col("__us_b") - F.col("__us_a")) / 1_000_000.0).alias("gap_s"))
    )
