"""Query registry: name -> (Spark callable, optional DuckDB oracle SQL).

Every operator claimed done in SURVEY.md §2 registers here; the driver
contract (`__spark_entry__.py`) exposes this registry via ``queries()`` /
``oracle_sql()``. Column names are aliased identically on both sides —
the driver's compare sorts columns by name before hashing values.

Floating-point aggregates are rounded (same ROUND on both sides) so that
summation-order differences between Spark and DuckDB don't flip the
value hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a (spark, sf_dir) -> DataFrame callable to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
