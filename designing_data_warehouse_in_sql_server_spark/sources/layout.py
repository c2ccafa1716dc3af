"""Multi-dimensional file layout: Z-order clustered parquet writes.

The write path behind `zorder_layout_key` (plans/quality.py): compute the
Morton key over the clustering dimensions, range-partition the rows by it
(contiguous key ranges per output file), and sort within each partition —
exactly what Delta's OPTIMIZE ZORDER / Iceberg's sort orders do. Files
then carry tight min/max ranges on BOTH dimensions, so any engine that
does footer-statistics pruning (Spark's parquet reader, Delta data
skipping) reads only the files whose range intersects the predicate.

Scale: one range exchange (the intentional shuffle of a layout job —
repartitionByRange samples the key distribution, so file sizes stay
balanced even under skew) + an in-partition sort that spills gracefully.
Nothing touches the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_key(col_a: Column, col_b: Column) -> Column:
    """Interleave the low 16 bits of two nonnegative integer dimensions
    into one BIGINT sort key (per-bit CASE form — constant-folded by
    Catalyst into one codegen'd projection; see plans/quality.py for the
    portability rationale)."""

    def spread(c: Column) -> Column:
        x = c.cast("long") % 65536
        out = F.lit(0).cast("long")
        for i in range(16):
            # long literals: the term sum reaches 2^31+ and would overflow
            # 32-bit ints under ANSI arithmetic
            out = out + F.when(
                x % (1 << (i + 1)) >= (1 << i), F.lit(4**i).cast("long")
            ).otherwise(F.lit(0).cast("long"))
        return out

    return (spread(col_a) * 2 + spread(col_b)).cast("long")


def zordered_frame(df: DataFrame, dim_a: str, dim_b: str) -> DataFrame:
    """``df`` plus a ``__zkey`` Morton-key column over (dim_a, dim_b).

    Each dimension is linearly rescaled to the full 16-bit range before
    interleaving: raw interleaving lets the wider-domain dimension's high
    bits dominate the key (measured: a 150-value custkey dimension got
    ZERO pruning against a 3500-value date dimension), while after
    normalization both dimensions contribute alternating significant
    bits — the same reason Delta/Iceberg z-order on range-partition ids,
    not raw values. Cost: one 1-row min/max aggregate broadcast back.
    Bounds are GLOBAL — on a hive-partitioned rewrite every partition
    shares one key space, which keeps the layout a single job."""
    bounds = df.agg(
        F.min(dim_a).alias("__amin"),
        F.max(dim_a).alias("__amax"),
        F.min(dim_b).alias("__bmin"),
        F.max(dim_b).alias("__bmax"),
    )

    def rescale(c: Column, lo: Column, hi: Column) -> Column:
        span = F.greatest(hi - lo, F.lit(1)).cast("double")
        return ((c - lo) * 65535.0 / span).cast("long")

    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(
            "__zkey",
            morton_key(
                rescale(F.col(dim_a), F.col("__amin"), F.col("__amax")),
                rescale(F.col(dim_b), F.col("__bmin"), F.col("__bmax")),
            ),
        )
        .drop("__amin", "__amax", "__bmin", "__bmax")
    )


def write_zordered(
    df: DataFrame,
    path: str,
    dim_a: str,
    dim_b: str,
    n_files: int,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered on the Morton
    key of (dim_a, dim_b) (see :func:`zordered_frame`). The key column
    itself is not persisted — it only steers the layout."""
    (
        zordered_frame(df, dim_a, dim_b)
        .repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
