"""Document deduplication operators for training-data pipelines
(task-brief first-class extensions; no reference counterpart — the
reference's only dedup is the row-level window W1/M2).

All operators are pure Catalyst expression pipelines (higher-order array
functions, no Python UDFs), so they scale: signatures are computed in a
single scan without exploding shingles, and the only shuffles are the
hash-partitioned groupBys/joins on doc or bucket keys.

Design notes:
- Hashes are md5 hex strings: identical in Spark and DuckDB, and
  lexicographic MIN over fixed-length lowercase hex equals numeric MIN —
  so MinHash signatures are cross-engine deterministic without any
  integer conversion.
- MinHash-LSH: k-word shingles → H=bands*rows md5 "permutations" (md5 of
  seed||shingle) → per-band bucket = md5 of the band's row minima →
  candidate pairs = docs sharing any band bucket. One scan for
  signatures, one explode(bands), one shuffle join on (band, bucket).
- SimHash: 16-bit fingerprint from the high bit of each md5 nibble,
  majority-voted across shingles; near-dups = fingerprints within
  Hamming distance d.
- n-gram Jaccard: exact verification on candidate pairs via
  array_intersect/array_union sizes (integer division → deterministic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def words_col(text: Column) -> Column:
    return F.split(F.trim(F.lower(text)), r"\s+")


def shingles_col(text: Column, k: int = 3) -> Column:
    """Distinct k-word shingles; empty array when the doc has < k words."""
    w = words_col(text)
    n = F.size(w) - F.lit(k - 1)
    return F.when(
        n >= 1,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n),
                lambda i: F.array_join(F.slice(w, i, k), " "),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup by content hash: keep the minimum id per md5(text).

    Scale: one hash-partitioned groupBy on a 32-char key; no text
    comparison after the hash."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    bands: int = 4,
    rows_per_band: int = 2,
) -> DataFrame:
    """Per-doc LSH band buckets: (id, band, bucket).

    The j-th "permutation" is min over shingles of md5('<j>|'||shingle);
    a band bucket is md5 of its rows_per_band minima joined. Documents
    sharing >= 1 band bucket are near-dup candidates.
    """
    docs = df.select(F.col(id_col), shingles_col(F.col(text_col), k).alias("__sh")).filter(
        F.size("__sh") > 0  # docs with < k words have no signature
    )
    sh = F.col("__sh")

    def seeded_hash(seed: int):
        # NB: a two-arg lambda would be treated by F.transform as
        # (element, index) — the seed must be captured in a closure.
        prefix = f"{seed}|"
        return lambda s: F.md5(F.concat(F.lit(prefix), s))

    band_cols = []
    for b in range(bands):
        mins = [
            F.array_min(F.transform(sh, seeded_hash(b * rows_per_band + r)))
            for r in range(rows_per_band)
        ]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws("|", *mins)).alias("bucket"))
        )
    return docs.select(F.col(id_col), F.explode(F.array(*band_cols)).alias("bb")).select(
        id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def lsh_candidate_pairs(signatures: DataFrame, id_col: str) -> DataFrame:
    """Self-join band buckets -> distinct (id_a < id_b) candidate pairs.

    Scale: shuffle join keyed on (band, bucket); bucket sizes are the
    LSH-bounded collision groups, so the join never materializes the
    full n^2 pair space. Skewed mega-buckets (boilerplate text) are
    handled by AQE skew-join splitting."""
    a = signatures.alias("a")
    b = signatures.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def ngram_jaccard(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
) -> DataFrame:
    """Exact shingle-Jaccard for candidate pairs (verification stage).

    Jaccard = |A ∩ B| / |A ∪ B| over distinct k-shingles; integer sizes
    divide to a deterministic double on both engines."""
    sh = docs.select(
        F.col(id_col).alias("__id"), shingles_col(F.col(text_col), k).alias("__sh")
    )
    a = sh.alias("sa")
    b = sh.alias("sb")
    return (
        pairs.join(a, pairs.id_a == F.col("sa.__id"))
        .join(b, pairs.id_b == F.col("sb.__id"))
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("sa.__sh", "sb.__sh")).alias("n_common"),
            F.size(F.array_union("sa.__sh", "sb.__sh")).alias("n_total"),
        )
        .withColumn(
            "jaccard",
            F.round(F.col("n_common").cast("double") / F.col("n_total"), 6),
        )
    )


def simhash_fingerprint(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, bits: int = 16
) -> DataFrame:
    """bits-bit SimHash: bit i is the majority vote over shingles of the
    high bit of md5 nibble i (hex char >= '8' — lexicographic compare is
    exact for lowercase hex). Returns (id, simhash string, n_shingles).

    Scale: explode(shingles) then ONE groupBy(id) with `bits` conditional
    sums — a single shuffle; the fingerprint is a plain string column
    ready for banding or Hamming joins."""
    assert bits <= 32  # md5 has 32 hex chars
    sh = df.select(
        F.col(id_col), F.explode(shingles_col(F.col(text_col), k)).alias("__sh")
    ).withColumn("__h", F.md5("__sh"))
    votes = [
        F.sum(
            F.when(F.substring("__h", i + 1, 1) >= "8", 1).otherwise(-1)
        ).alias(f"__v{i}")
        for i in range(bits)
    ]
    agg = sh.groupBy(id_col).agg(*votes, F.count("*").alias("n_shingles"))
    bit_chars = [
        F.when(F.col(f"__v{i}") > 0, F.lit("1")).otherwise(F.lit("0")) for i in range(bits)
    ]
    return agg.select(
        id_col, F.concat(*bit_chars).alias("simhash"), "n_shingles"
    )


def simhash_near_pairs(fingerprints: DataFrame, id_col: str, max_hamming: int) -> DataFrame:
    """Pairs whose SimHash Hamming distance <= max_hamming.

    The all-pairs form is for verification at test scale; the scale path
    bands the fingerprint (split into max_hamming+1 segments — pigeonhole:
    any pair within the distance shares >= 1 exact segment) and joins on
    segments, identical shape to lsh_candidate_pairs."""
    n_bits = 16
    a = fingerprints.alias("a")
    b = fingerprints.alias("b")
    hamming = sum(
        (
            F.substring(F.col("a.simhash"), i + 1, 1)
            != F.substring(F.col("b.simhash"), i + 1, 1)
        ).cast("int")
        for i in range(n_bits)
    )
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
