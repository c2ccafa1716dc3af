"""Explicit Bloom-filter build/probe as pure Catalyst expressions.

Spark injects its own runtime bloom filters inside a single query
(pinned by tests/test_plan_shape.py), but a training-data pipeline also
needs an EXPLICIT filter it controls: built once from a bounded
reference set (benchmark shingles, a blocklist, known-contaminated ids)
and pushed into many later scans — the classic bloom-prefilter +
exact-verify pattern, where the filter only PRUNES and an exact join
confirms, so false positives never reach the output and the result is
bit-identical to the exact computation.

Scale contract:
  - build: the reference side streams through ``xxhash64`` position
    expressions and folds into the bitset with a ``bit_or`` hash
    aggregate GROUPED BY 64-bit word index — the driver collect is
    bounded by the FILTER SIZE (n_bits/64 rows), never by the data.
  - probe: the bitset rides the plan as a literal array (broadcast with
    the task binaries); membership is element_at + shiftright + bitwise
    AND — whole-stage-codegen'd, no UDF, no shuffle of the probe side.

The reference warehouse has no bloom surface (its MERGE dedup is exact,
reference transform_load.sql:43-70); this is a labeled 100 TB extension.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class BloomBits(NamedTuple):
    """A built bitset WITH its build parameters. ``might_contain`` takes
    this struct (not a bare word list) so the probe can never run with a
    mismatched ``n_hashes`` — probing with fewer/different hash functions
    than the build silently yields false negatives, breaking the
    never-false-for-present contract."""

    words: list[int]
    n_hashes: int


def _position(col: Column, seed: int, n_bits: int) -> Column:
    # xxhash64 over (value, seed-literal): k independent hash functions
    return F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(n_bits))


def build_bloom_bits(
    df: DataFrame, col: str, n_bits: int, n_hashes: int = 4
) -> BloomBits:
    """Fold ``df[col]``'s hash positions into a bitset of ``n_bits``
    (must be a multiple of 64). Returns a :class:`BloomBits` carrying
    the n_bits/64 little-endian words AND the ``n_hashes`` they were
    built with. One hash aggregate; driver traffic = the bitset itself."""
    assert n_bits % 64 == 0
    positions = df.select(
        F.explode(
            F.array(*[_position(F.col(col), i, n_bits) for i in range(n_hashes)])
        ).alias("__p")
    )
    rows = (
        positions.groupBy((F.col("__p") / 64).cast("int").alias("__w"))
        .agg(F.expr("bit_or(shiftleft(1L, cast(__p % 64 as int)))").alias("__bits"))
        .collect()
    )
    words = [0] * (n_bits // 64)
    for r in rows:
        words[r["__w"]] = r["__bits"]
    return BloomBits(words=words, n_hashes=n_hashes)


def might_contain(col: Column, bloom: BloomBits) -> Column:
    """Membership predicate against a :func:`build_bloom_bits` bitset.
    May return true for absent values (false-positive rate set by the
    caller's bits-per-element budget); never false for present ones —
    always pair with an exact verify when exactness matters. The hash
    count comes from the struct, so probe and build cannot diverge."""
    words, n_hashes = bloom.words, bloom.n_hashes
    n_bits = len(words) * 64
    bitset = F.lit(words)
    cond = None
    for i in range(n_hashes):
        p = _position(col, i, n_bits)
        word = F.element_at(bitset, (p / 64).cast("int") + 1)
        shift = F.pmod(p, F.lit(64)).cast("int")
        # the SQL ShiftRight expression accepts a column shift amount
        # (the Python wrapper's int-only signature is a wrapper limit)
        probe = (
            F.call_function("shiftright", word, shift).bitwiseAND(F.lit(1)) == 1
        )
        cond = probe if cond is None else (cond & probe)
    return cond
