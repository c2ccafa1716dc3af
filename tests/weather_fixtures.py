"""Weather-domain fixtures per FIXTURES.md §A: staging rows with planted
duplicates, NULLs, a >3σ outlier, a single-row city, an unseen city, and
already-processed rows; seeded dim/fact exercising both MERGE branches."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

from pyspark.sql import SparkSession

from designing_data_warehouse_in_sql_server_spark.schemas import (
    DIM_CITY,
    FACT_WEATHER,
    STG_WEATHER_RAW,
)

D = Decimal
TS0 = dt.datetime(2024, 1, 31, 0, 0)
TS1 = dt.datetime(2024, 2, 1, 0, 0)
OPEN_END = dt.datetime(9999, 12, 31)
VALID_FROM = dt.datetime(2020, 1, 1)


def _d(s: str) -> dt.date:
    return dt.date.fromisoformat(s)


# Sydney gets 11 normal values + one 100.00: max attainable z for n points
# is (n-1)/sqrt(n); n=12 gives 3.18 > 3, so the outlier IS capped.
SYDNEY_NORMALS = [20, 21, 19, 20, 22, 18, 20, 21, 19, 20, 22]


def staging_rows():
    rows = [
        # duplicate pair (London 2024-01-10): dedupe keeps latest load_timestamp
        ("London", _d("2024-01-10"), D("10.00"), D("5.00"), D("1.00"), False, TS0),
        ("London", _d("2024-01-10"), D("12.00"), D("6.00"), D("2.00"), False, TS1),
        # NULL temp_max (imputed from London month-1 mean incl. processed row)
        ("London", _d("2024-01-11"), None, D("4.00"), D("0.00"), False, TS1),
        # matched-update row: fact already has (London, 2024-01-05)
        ("London", _d("2024-01-05"), D("9.00"), D("3.00"), D("0.50"), False, TS1),
        # already-processed row: feeds statistics, not reloaded
        ("London", _d("2024-01-05"), D("8.00"), D("2.00"), D("0.00"), True, TS0),
        # single-row city: stddev NULL -> outlier cap keeps the value
        ("Lahore", _d("2024-01-10"), D("30.00"), D("15.00"), D("0.00"), False, TS1),
        # unseen city -> dim insert-only merge
        ("Karachi", _d("2024-01-10"), D("28.00"), D("14.00"), D("0.00"), False, TS1),
    ]
    for i, v in enumerate(SYDNEY_NORMALS):
        rows.append(
            ("Sydney", _d("2024-01-01") + dt.timedelta(days=i), D(v), D(v - 8), D("0.00"), False, TS1)
        )
    # the planted outlier
    rows.append(("Sydney", _d("2024-01-20"), D("100.00"), D("12.00"), D("0.00"), False, TS1))
    return rows


def dim_rows():
    cities = [
        (1, "London", "UK", D("51.507400"), D("-0.127800"), "Europe/London"),
        (2, "New York", "USA", D("40.712800"), D("-74.006000"), "America/New_York"),
        (3, "Sydney", "Australia", D("-33.868800"), D("151.209300"), "Australia/Sydney"),
        (4, "Lahore", "Pakistan", D("31.520400"), D("74.358700"), "Asia/Karachi"),
        (5, "Dubai", "UAE", D("25.276987"), D("55.296249"), "Asia/Dubai"),
    ]
    return [c + (VALID_FROM, OPEN_END, True) for c in cities]


def fact_rows():
    return [
        # pre-existing row -> exercises the MERGE matched-update branch
        (1, 1, _d("2024-01-05"), D("8.00"), D("2.00"), D("0.00"), TS0),
    ]


def seed_store(spark: SparkSession, store) -> None:
    store.overwrite("stg_weather_raw", spark.createDataFrame(staging_rows(), STG_WEATHER_RAW))
    store.overwrite("dim_city", spark.createDataFrame(dim_rows(), DIM_CITY))
    store.overwrite("fact_weather", spark.createDataFrame(fact_rows(), FACT_WEATHER))
