"""Date enrichment functions and the conformed date dimension.

The reference PLANS both but ships neither: "a date dimension table
(pre-built for 2000 to current year)" (reference README.md:49) and
derived columns "season from date, day of week" (reference
README.md:232-234). They are required by the star-schema design, so the
engine ships them as first-class (labeled additions — SURVEY §2.7).

Scale: the dimension generates from ``spark.range`` (distributed,
partition-parallel), NOT a driver-built list or a single-row
``sequence()`` explode — at one row per day it hardly matters, but the
same generator pattern serves minute- or second-grain time dimensions
where a single-partition explode would serialize.
"""

from __future__ import annotations

from datetime import date

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def iso_day_of_week(d: Column) -> Column:
    """ISO day-of-week: 1 = Monday .. 7 = Sunday (Spark's ``dayofweek``
    is 1 = Sunday; the shift makes it engine-portable)."""
    return (F.dayofweek(d) + 5) % 7 + 1


def season(month: Column) -> Column:
    """Meteorological season from a month number (northern hemisphere,
    matching the reference's weather domain)."""
    return (
        F.when(month.isin(12, 1, 2), "winter")
        .when(month.isin(3, 4, 5), "spring")
        .when(month.isin(6, 7, 8), "summer")
        .otherwise("autumn")
    )


def date_dimension(spark: SparkSession, start: str, end: str) -> DataFrame:
    """Conformed date dimension covering [start, end] inclusive, one row
    per day: surrogate key (yyyymmdd int), calendar attributes, ISO
    day-of-week/week, quarter, season, weekend flag.

    The date itself is emitted as TIMESTAMP_NTZ (midnight) so downstream
    results are independent of the session timezone."""
    n_days = (date.fromisoformat(end) - date.fromisoformat(start)).days + 1
    d = F.date_add(F.lit(start).cast("date"), F.col("id").cast("int"))
    return spark.range(n_days).select(
        (F.year(d) * 10000 + F.month(d) * 100 + F.dayofmonth(d)).cast("int").alias("date_key"),
        d.cast("timestamp_ntz").alias("date_ts"),
        F.year(d).cast("int").alias("year"),
        F.quarter(d).cast("int").alias("quarter"),
        F.month(d).cast("int").alias("month"),
        F.dayofmonth(d).cast("int").alias("day"),
        iso_day_of_week(d).cast("int").alias("iso_dow"),
        F.weekofyear(d).cast("int").alias("iso_week"),
        season(F.month(d)).alias("season"),
        (iso_day_of_week(d) >= 6).alias("is_weekend"),
    )
