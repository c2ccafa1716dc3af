"""Explicit StructTypes for the weather-domain warehouse (reference DDL at
README.md:77-115 of /root/reference; Spark type mapping per SURVEY.md §1.2).

DECIMAL(5,2)/(9,6) are kept as DecimalType for schema parity; measures are
computed in double and cast at write time.
"""

from __future__ import annotations

from pyspark.sql import types as T

STG_WEATHER_RAW = T.StructType(
    [
        T.StructField("city_name", T.StringType(), False),
        T.StructField("date", T.DateType(), False),
        T.StructField("temp_max", T.DecimalType(5, 2), True),
        T.StructField("temp_min", T.DecimalType(5, 2), True),
        T.StructField("precipitation", T.DecimalType(5, 2), True),
        T.StructField("is_processed", T.BooleanType(), False),
        T.StructField("load_timestamp", T.TimestampNTZType(), False),
    ]
)

DIM_CITY = T.StructType(
    [
        T.StructField("city_id", T.LongType(), False),
        T.StructField("city_name", T.StringType(), False),
        T.StructField("country", T.StringType(), True),
        T.StructField("latitude", T.DecimalType(9, 6), True),
        T.StructField("longitude", T.DecimalType(9, 6), True),
        T.StructField("timezone", T.StringType(), True),
        T.StructField("valid_from", T.TimestampNTZType(), False),
        T.StructField("valid_to", T.TimestampNTZType(), False),
        T.StructField("is_current", T.BooleanType(), False),
    ]
)

FACT_WEATHER = T.StructType(
    [
        T.StructField("weather_id", T.LongType(), False),
        T.StructField("city_id", T.LongType(), False),
        T.StructField("date", T.DateType(), False),
        T.StructField("temp_max", T.DecimalType(5, 2), True),
        T.StructField("temp_min", T.DecimalType(5, 2), True),
        T.StructField("precipitation", T.DecimalType(5, 2), True),
        T.StructField("load_timestamp", T.TimestampNTZType(), False),
    ]
)

# Open-Meteo daily archive payload: a struct of parallel arrays
# (extract_weather.py:45-65 of the reference).
OPEN_METEO_DAILY = T.StructType(
    [
        T.StructField(
            "daily",
            T.StructType(
                [
                    T.StructField("time", T.ArrayType(T.StringType()), True),
                    T.StructField("temperature_2m_max", T.ArrayType(T.DoubleType()), True),
                    T.StructField("temperature_2m_min", T.ArrayType(T.DoubleType()), True),
                    T.StructField("precipitation_sum", T.ArrayType(T.DoubleType()), True),
                ]
            ),
            True,
        )
    ]
)

# The five reference cities (extract_weather.py:7-13 / README.md:131-135).
REFERENCE_CITIES = [
    ("London", "UK", 51.5074, -0.1278, "Europe/London"),
    ("New York", "USA", 40.7128, -74.0060, "America/New_York"),
    ("Sydney", "Australia", -33.8688, 151.2093, "Australia/Sydney"),
    ("Lahore", "Pakistan", 31.5204, 74.3587, "Asia/Karachi"),
    ("Dubai", "UAE", 25.276987, 55.296249, "Asia/Dubai"),
]
