"""SCD Type 2 dimension maintenance (M5).

The reference gets this declaratively from SQL Server system-versioned
temporal tables (README.md:88-91 of the reference): every UPDATE writes
the old row version to a history table with valid_from/valid_to. Spark
has no in-place versioning, so this is the explicit two-phase form:
expire changed current rows, insert new versions, pass through the rest
(SURVEY.md §2.6 M5).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SCD2_OPEN_END = "9999-12-31 00:00:00"


def _changed(tracked: Sequence[str]) -> Column:
    cond = F.lit(False)
    for c in tracked:
        # null-safe inequality
        cond = cond | ~F.col(f"d.{c}").eqNullSafe(F.col(f"u.{c}"))
    return cond


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: Sequence[str],
    tracked: Sequence[str],
    effective_ts: str,
    open_end: str = SCD2_OPEN_END,
) -> DataFrame:
    """Return the new dimension table state.

    ``dim`` must carry valid_from/valid_to/is_current; ``updates`` carries
    key + tracked attribute columns (one row per key). Rows whose tracked
    attributes changed are expired (valid_to = effective_ts,
    is_current = false) and re-inserted as the new current version; new
    keys are inserted as current; history rows pass through untouched.

    Duplicate update keys would silently fan out the join into multiple
    expired + multiple current versions of the same key, so they are
    rejected: a window count over the key rides inside the join job
    (same guard as TableStore.merge) and raises when the result is
    materialized.

    Scale: one broadcast-or-shuffle join dim⋈updates on the key plus a
    union — no windowing over the data, no driver collect (the guard's
    window hash-partitions on the key, the same exchange the join needs).
    """
    eff = F.lit(effective_ts).cast("timestamp_ntz")
    open_end = F.lit(open_end).cast("timestamp_ntz")
    key = list(key)
    tracked = list(tracked)

    history = dim.filter(~F.col("is_current"))
    current = dim.filter(F.col("is_current")).alias("d")
    u = updates.withColumn(
        "__u_cnt", F.count(F.lit(1)).over(Window.partitionBy(*key))
    ).alias("u")
    dup_guard = F.assert_true(
        F.col("u.__u_cnt").isNull() | (F.col("u.__u_cnt") == 1),
        F.lit(f"scd2 updates have duplicate keys on {key}"),
    )

    def _guarded(col: Column) -> Column:
        # the guard either raises (duplicate update keys) or yields NULL,
        # so the otherwise-branch is always the one taken
        return F.when(dup_guard.isNotNull(), F.lit(None)).otherwise(col)

    cond = None
    for k in key:
        c = F.col(f"d.{k}") == F.col(f"u.{k}")
        cond = c if cond is None else (cond & c)

    joined = current.join(u, cond, "full_outer")
    d_present = F.col(f"d.{key[0]}").isNotNull()
    u_present = F.col(f"u.{key[0]}").isNotNull()
    changed = d_present & u_present & _changed(tracked)

    dim_cols = dim.columns
    # EVERY output column carries the guard (not just the first): a
    # downstream projection keeping any subset of columns still evaluates
    # at least one guarded expression, so column pruning cannot silently
    # disable the duplicate-key check. The per-row cost is a count
    # comparison per column — negligible next to the join itself.
    passthrough_cols = [_guarded(F.col(f"d.{c}")).alias(c) for c in dim_cols]

    # 1. unchanged current rows (no matching update, or update equal)
    unchanged = joined.filter(d_present & ~changed).select(*passthrough_cols)

    # 2. expired versions of changed rows
    expired = (
        joined.filter(changed)
        .select(*passthrough_cols)
        .withColumn("valid_to", eff)
        .withColumn("is_current", F.lit(False))
    )

    # 3. new versions: changed rows take update attrs, new keys insert fresh
    def new_version(rows: DataFrame, from_update_only: bool) -> DataFrame:
        cols = []
        for i, c in enumerate(dim_cols):
            if c == "valid_from":
                col = eff
            elif c == "valid_to":
                col = open_end
            elif c == "is_current":
                col = F.lit(True)
            elif c in tracked or c in key:
                col = F.col(f"u.{c}")
            elif from_update_only:
                col = F.lit(None).cast(dim.schema[c].dataType)
            else:
                col = F.col(f"d.{c}")  # untracked attrs carry over
            cols.append(_guarded(col).alias(c))
        return rows.select(*cols)

    new_changed = new_version(joined.filter(changed), from_update_only=False)
    new_keys = new_version(joined.filter(u_present & ~d_present), from_update_only=True)

    return (
        history.unionByName(unchanged)
        .unionByName(expired)
        .unionByName(new_changed)
        .unionByName(new_keys)
    )
