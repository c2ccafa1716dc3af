"""Skew mitigation operators.

At 100 TB a handful of hot keys (a viral user, a default enum value, a
null-ish sentinel) can pin an entire shuffle stage on one reducer. Two
built-in mitigations already apply engine-wide: AQE skew-join splitting
(session.py enables it) and map-side partial aggregation. This module
adds the third classic tool — explicit salting — for the case partial
aggregation does NOT cover: aggregations whose per-key partial state is
large (collect_list/distinct-heavy) or grouped computations where one
key dominates the reduce side.

Salting is semantics-preserving: phase 1 groups on (key, salt) spreading
each hot key over `n_salt` reducers; phase 2 merges the n_salt partials
per key. The final result is byte-identical to the unsalted aggregate,
which is exactly what the DuckDB oracle checks.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_group_agg(
    df: DataFrame,
    keys: list[str],
    salt_from: str,
    n_salt: int,
    sums: dict[str, Column],
    merges: dict[str, Callable[[Column], Column]],
) -> DataFrame:
    """Generic two-phase salted aggregation.

    ``sums`` maps output column -> phase-1 aggregate over input rows;
    ``merges`` maps the same output column -> phase-2 aggregate over the
    phase-1 partials (e.g. sum -> sum, count -> sum, min -> min).

    The salt is ``pmod(hash(salt_from), n_salt)`` — deterministic given
    the data (re-runs and retried tasks produce identical partials,
    unlike rand()-based salts), and uniform when `salt_from` is a
    high-cardinality column such as a row id.

    Scale: phase 1 shuffles on (keys..., salt) = hot key split n_salt
    ways; phase 2 shuffles only |keys| x n_salt partial rows — negligible.
    Size n_salt to the reducer count a hot key should span."""
    salt = F.pmod(F.hash(F.col(salt_from)), F.lit(n_salt)).alias("__salt")
    phase1 = df.groupBy(*[F.col(c) for c in keys], salt).agg(
        *[agg.alias(f"__p_{name}") for name, agg in sums.items()]
    )
    renamed = {name: F.col(f"__p_{name}") for name in sums}
    phase2 = phase1.groupBy(*[F.col(c) for c in keys]).agg(
        *[merges[name](renamed[name]).alias(name) for name in merges]
    )
    return phase2


def salted_sum_count(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    salt_from: str,
    n_salt: int = 8,
) -> DataFrame:
    """Skew-resistant SUM + COUNT over a low-cardinality group key.

    The value is quantized to integer cents before summing so the
    two-phase summation is exactly associative (bigint adds commute;
    double adds do not) — the salted result is bit-identical to the
    plain aggregate on any engine."""
    cents = F.round(F.col(value_col) * 100).cast("bigint")
    return salted_group_agg(
        df,
        keys,
        salt_from,
        n_salt,
        sums={
            "sum_cents": F.sum(cents),
            "n_rows": F.count(F.lit(1)),
        },
        merges={
            "sum_cents": F.sum,
            "n_rows": F.sum,
        },
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_from: str,
    n_salt: int = 8,
) -> DataFrame:
    """Skew-resistant inner equi-join for when BOTH sides are too big to
    broadcast and one join key is hot (the case AQE's skew splitting
    handles only after a slow first attempt — explicit salting plans it
    up front).

    The big/probe side (``left``) gets a deterministic salt from one of
    its own high-cardinality columns; the build side (``right``) is
    replicated n_salt times via a tiny exploded literal array. Each hot
    key's rows thus spread over n_salt reducers at the cost of
    right-side duplication — choose the smaller table as ``right``.

    Result = plain ``left.join(right, key)`` row-for-row (the oracle
    checks exactly that).

    Scale: shuffle volume is |left| + n_salt * |right|; pick n_salt ~=
    (hot-key row count / target rows per task). The salt column is
    dropped, so downstream operators see the unsalted schema."""
    salt = F.pmod(F.hash(F.col(salt_from)), F.lit(n_salt))
    l_salted = left.withColumn("__salt", salt)
    r_salted = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return l_salted.join(r_salted, [key, "__salt"]).drop("__salt")
