"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship star-join query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the engine's registry
(one entry per implemented operator from SURVEY.md §2, plus the
scale-extension operators).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from designing_data_warehouse_in_sql_server_spark.plans import QUERIES, ORACLES
from designing_data_warehouse_in_sql_server_spark.plans.parity import flagship_revenue

# Importing these modules populates the registry.
import designing_data_warehouse_in_sql_server_spark.plans.parity  # noqa: F401
import designing_data_warehouse_in_sql_server_spark.plans.analytics  # noqa: F401
import designing_data_warehouse_in_sql_server_spark.plans.extensions  # noqa: F401
import designing_data_warehouse_in_sql_server_spark.plans.training  # noqa: F401


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
