"""File-format sources beyond parquet: JSONL and CSV read/write with
explicit schemas (never inference — an inference pass is a second full
scan of the data at 100 TB).

The reference's only file interchange is its CSV seed load
(Designing-Data-Warehouse-In-SQL-Server bulk-inserts weather CSVs); the
engine generalizes that to schema-checked JSONL + CSV round-trips as
distributed Spark reads/writes — each executor writes/reads its own
split, nothing funnels through the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_jsonl(df: DataFrame, path: str) -> None:
    """Distributed JSONL write (one file per partition)."""
    df.write.mode("overwrite").json(path)


def read_jsonl(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Schema-first JSONL read. PERMISSIVE mode: malformed lines become
    all-null rows instead of failing the 1000-executor job at hour three;
    callers audit with a null-count check."""
    return spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)


def write_orc(df: DataFrame, path: str) -> None:
    """Distributed ORC write (columnar interchange with the Hive/Trino
    world; one file per partition, zlib by default)."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Schema-first ORC read (schema asserted, not inferred — ORC files
    carry one, but pinning it catches producer drift at plan time)."""
    return spark.read.schema(schema).orc(path)


def write_csv(df: DataFrame, path: str) -> None:
    """Distributed CSV write with header; '"' escaping so embedded
    delimiters/quotes survive the round-trip."""
    df.write.mode("overwrite").option("header", True).option("escape", '"').csv(path)


def read_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", True)
        .option("escape", '"')
        .option("mode", "PERMISSIVE")
        .csv(path)
    )
