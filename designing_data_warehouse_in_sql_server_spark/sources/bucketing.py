"""Bucketed table layout: pre-shuffled storage for repeated co-located
joins (SURVEY §4 "shuffle/partitioning" — the storage-level answer).

A fact table bucketed on its join key is hash-partitioned ON DISK; a join
between two tables co-bucketed on the same key with the same bucket count
needs NO exchange on either side — at 100 TB that deletes the single
largest cost of a recurring fact-fact join. The trade: bucketing fixes
the bucket count at write time (pick ~= target cluster cores) and only
pays off when the key is reused across many queries (dimension keys,
entity ids). One-off joins should rely on AQE instead.

`sortBy` within buckets additionally enables merge-join without a
per-task sort (Spark reads bucket files pre-sorted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str,
    n_buckets: int = 8,
) -> None:
    """Write `df` as an external bucketed table (metadata in the session
    catalog, files at `path`), bucketed and sorted by `key`."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table through the catalog (the bucket spec only
    applies via the catalog — a plain parquet path read loses it)."""
    return spark.table(table)
