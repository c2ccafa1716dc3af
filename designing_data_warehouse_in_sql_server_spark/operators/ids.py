"""Distributed sequential surrogate-key assignment (F7 parity).

The reference gets surrogate keys from an IDENTITY column
(reference README.md:96); a naive Spark translation is
``row_number() OVER (ORDER BY ...)`` — a window with an empty
partition spec, which Catalyst plans as Exchange SinglePartition:
the whole increment serializes through one task. At 100 TB that
single task IS the job.

``assign_sequential_ids`` is the two-phase (zipWithIndex-style) form:

  phase 1: repartition by the sort key, per-PARTITION row_number
           (parallel windows, one shuffle)
  phase 2: count rows per partition (a metadata-sized aggregate),
           prefix-sum the counts on the driver (#partitions values,
           not rows), broadcast-join the offsets back

Ids are dense 1..N starting at ``start + 1``. Repartitioning by
range on the sort key makes the assignment deterministic for a given
(data, partition count): ids are globally ordered by ``order_by``,
matching what the single-partition window would have produced.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def assign_sequential_ids(
    df: DataFrame,
    id_col: str,
    order_by: Sequence[str | Column],
    start: int = 0,
) -> DataFrame:
    """Add ``id_col`` = start+1, start+2, ... dense and globally ordered
    by ``order_by``, without ever collapsing to one partition.

    Scale: one range-exchange of the data plus one partition-count
    aggregate whose result (#partitions rows) is collected and
    broadcast back. No task sees more than its own partition.
    """
    order_cols = list(order_by)
    ranged = df.repartitionByRange(*order_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    local = F.row_number().over(
        Window.partitionBy("__pid").orderBy(*order_cols)
    )
    # materialized once by the counts job below, reused by the final join
    # (on a cluster, swap for a reliable checkpoint / cached staging table)
    ranged = ranged.withColumn("__local_rn", local).localCheckpoint(eager=False)

    counts = sorted(
        ranged.groupBy("__pid").count().collect(), key=lambda r: r["__pid"]
    )
    offsets, acc = {}, int(start)
    for r in counts:
        offsets[r["__pid"]] = acc
        acc += r["count"]
    offsets_df = ranged.sparkSession.createDataFrame(
        [(pid, off) for pid, off in offsets.items()] or [(0, int(start))],
        "__pid int, __offset long",
    )
    return (
        ranged.join(F.broadcast(offsets_df), "__pid", "left")
        .withColumn(id_col, (F.col("__local_rn") + F.coalesce("__offset", F.lit(int(start)))).cast("long"))
        .drop("__pid", "__local_rn", "__offset")
    )


def prefix_sum(
    df: DataFrame,
    value_col: str,
    order_by: Sequence[str | Column],
    cum_col: str,
    total_col: str | None = None,
) -> DataFrame:
    """Two-phase global running sum of ``value_col`` in ``order_by`` order
    — the distributed replacement for ``SUM() OVER (ORDER BY ...)``'s
    Exchange SinglePartition (which serializes the whole relation through
    one task at scale).

    phase 1: range-partition by the sort key, per-partition running sum;
    phase 2: per-partition totals (#partitions rows) prefix-summed on the
    driver and broadcast back as offsets.

    Optionally emits the grand total as ``total_col`` (a literal — it is
    known exactly from the same partition totals)."""
    order_cols = list(order_by)
    ranged = df.repartitionByRange(*order_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranged = ranged.withColumn("__local_cum", F.sum(value_col).over(w)).localCheckpoint(
        eager=False
    )
    totals = sorted(
        ranged.groupBy("__pid").agg(F.sum(value_col).alias("__t")).collect(),
        key=lambda r: r["__pid"],
    )
    offsets, acc = {}, 0
    for r in totals:
        offsets[r["__pid"]] = acc
        acc += r["__t"] or 0
    offsets_df = ranged.sparkSession.createDataFrame(
        [(pid, off) for pid, off in offsets.items()] or [(0, 0)],
        "__pid int, __offset long",
    )
    out = (
        ranged.join(F.broadcast(offsets_df), "__pid", "left")
        .withColumn(
            cum_col,
            (F.col("__local_cum") + F.coalesce("__offset", F.lit(0))).cast("long"),
        )
        .drop("__pid", "__local_cum", "__offset")
    )
    if total_col is not None:
        out = out.withColumn(total_col, F.lit(int(acc)).cast("long"))
    return out


def exact_ntile(
    df: DataFrame,
    k: int,
    order_by: Sequence[str | Column],
    out_col: str,
    n: int | None = None,
) -> DataFrame:
    """Two-phase NTILE(k): global dense rank via ``assign_sequential_ids``
    (never a single-partition window), then SQL NTILE's exact bucket law —
    the first n % k buckets get one extra row. Bit-identical to
    ``NTILE(k) OVER (ORDER BY ...)`` for deterministic (tie-broken)
    orderings."""
    if n is None:
        n = df.count()
    ranked = assign_sequential_ids(df, "__rank", order_by)
    q, rem = divmod(n, k)
    big = q + 1
    cut = rem * big  # ranks 1..cut live in the first `rem` (bigger) buckets
    bucket = (
        F.when(F.col("__rank") <= cut, ((F.col("__rank") - 1) / big).cast("long") + 1)
        .otherwise(
            F.lit(rem) + ((F.col("__rank") - cut - 1) / F.greatest(F.lit(q), F.lit(1))).cast("long") + 1
        )
        .cast("int")
    )
    return ranked.withColumn(out_col, bucket).drop("__rank")
