"""Training-data pipeline operators, part 2: dataset splitting, stratified
sampling, and sequence packing over the ``documents`` table.

These are labeled extensions (no reference counterpart — SURVEY §2.11);
they complete the large-scale training-data surface alongside the dedup /
similarity / text-analysis suites in ``extensions.py``.

Determinism / scale notes:
- Splits and samples use a **Knuth multiplicative hash in plain BIGINT
  arithmetic** (``(doc_id * 2654435761) mod 2^32``) rather than an
  engine hash function, so the Spark plan and the DuckDB oracle compute
  the *identical* bucket for every row on any engine. Assignment is a
  pure per-row projection: no shuffle, fully parallel, and stable under
  repartitioning — exactly what a 100 TB split job needs (engine hash
  functions like xxhash64 are also per-row; the arithmetic form is chosen
  only for cross-engine checkability).
- Sequence packing uses the streaming cumulative-sum form (pack boundary
  = running-token-count crossing a budget multiple) — one window per
  partition key, deterministic order by doc_id. Greedy first-fit packing
  is inherently sequential; the cumsum form is the scalable analog that
  keeps the same budget guarantee per pack (±1 document straddle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .registry import register

# Knuth multiplicative hash constants (public-domain folklore, TAOCP v3).
# The id is reduced mod 2^31 BEFORE the multiply: (2^31-1) * 2654435761
# < 2^63, so the product never overflows signed BIGINT — without the
# reduction, doc_id >= ~3.47e9 would overflow (ANSI error on Spark 4,
# sign-dependent garbage buckets elsewhere), exactly the id range a
# 100 TB corpus reaches.
_KNUTH = 2654435761
_PREMOD = 2147483648  # 2^31
_MOD = 4294967296  # 2^32

# bucket in [0, 100) — same expression in Spark and ANSI SQL.
_BUCKET_SQL = f"CAST((doc_id % {_PREMOD}) * {_KNUTH} % {_MOD} % 100 AS INT)"


def _bucket(col: F.Column) -> F.Column:
    return ((col % _PREMOD) * _KNUTH % _MOD % 100).cast("int")


# ---------------------------------------------------------------------------
# Deterministic train/validation/test split (80/10/10)
# ---------------------------------------------------------------------------
SPLIT_ORACLE = f"""
SELECT doc_id,
       {_BUCKET_SQL} AS bucket,
       CASE WHEN {_BUCKET_SQL} < 80 THEN 'train'
            WHEN {_BUCKET_SQL} < 90 THEN 'validation'
            ELSE 'test' END AS split
FROM documents
"""


@register("train_val_test_split", SPLIT_ORACLE)
def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = _bucket(F.col("doc_id"))
    return docs.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < 80, "train")
        .when(bucket < 90, "validation")
        .otherwise("test")
        .alias("split"),
    )


# ---------------------------------------------------------------------------
# Stratified sampling: fixed fraction per stratum (language), deterministic.
# Narrow per-row predicate — no shuffle, no sampling bias drift across
# partitions, reproducible across runs and engines.
# ---------------------------------------------------------------------------
STRATIFIED_ORACLE = f"""
SELECT doc_id, lang, n_chars
FROM documents
WHERE {_BUCKET_SQL} < 20
"""


@register("stratified_sample", STRATIFIED_ORACLE)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~20% per language stratum. The hash is independent of ``lang``, so
    each stratum is sampled at the same rate; per-stratum rate changes are
    a per-row ``when`` on the stratum column (still shuffle-free)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(_bucket(F.col("doc_id")) < 20).select("doc_id", "lang", "n_chars")


# ---------------------------------------------------------------------------
# Sequence packing: assign documents to fixed-token-budget packs for LLM
# pretraining batches. Cumulative-sum form: one window shuffle on the
# partition key (lang), running sum ordered by doc_id, pack boundary at
# budget multiples.
# ---------------------------------------------------------------------------
PACK_BUDGET = 512

PACK_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang,
         CAST(length(trim(text)) - length(replace(trim(text), ' ', '')) + 1 AS INT)
           AS n_tokens
  FROM documents
), packed AS (
  SELECT doc_id, lang, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM toks
)
SELECT doc_id, lang, n_tokens,
       CAST(cum_tokens AS BIGINT) AS cum_tokens,
       CAST((cum_tokens - n_tokens) // {PACK_BUDGET} AS INT) AS pack_id
FROM packed
"""


@register("pack_sequences", PACK_ORACLE)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counts (consecutive single spaces in the testdata,
    so ``spaces + 1``), then pack_id = how many full budgets precede the
    document's first token."""
    docs = load_table(spark, sf_dir, "documents")
    text = F.trim(F.col("text"))
    n_tokens = (
        F.length(text) - F.length(F.replace(text, F.lit(" "), F.lit(""))) + 1
    ).cast("int")
    w = W.partitionBy("lang").orderBy("doc_id").rowsBetween(W.unboundedPreceding, 0)
    toks = docs.select("doc_id", "lang", n_tokens.alias("n_tokens"))
    return toks.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.sum("n_tokens").over(w).alias("cum_tokens"),
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / PACK_BUDGET)
        .cast("int")
        .alias("pack_id"),
    )


# ---------------------------------------------------------------------------
# Document chunking: fixed-size character windows with overlap (the
# standard context-window prep for embedding/RAG pipelines). Generation
# is a per-row sequence + explode — zero shuffles, scales linearly; the
# chunk count per doc is ceil((n_chars - overlap) / stride).
# ---------------------------------------------------------------------------
CHUNK_CHARS = 200
CHUNK_OVERLAP = 50
_STRIDE = CHUNK_CHARS - CHUNK_OVERLAP

CHUNK_ORACLE = f"""
SELECT doc_id,
       CAST(idx AS INT) AS chunk_idx,
       CAST(idx * {_STRIDE} AS INT) AS start_offset,
       substr(text, idx * {_STRIDE} + 1, {CHUNK_CHARS}) AS chunk_text,
       CAST(length(substr(text, idx * {_STRIDE} + 1, {CHUNK_CHARS})) AS INT) AS chunk_len
FROM documents,
     UNNEST(generate_series(0, CAST(CEIL(CAST(GREATEST(length(text) - {CHUNK_OVERLAP}, 1) AS DOUBLE) / {_STRIDE}) AS BIGINT) - 1)) AS t(idx)
"""


@register("chunk_documents", CHUNK_ORACLE)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_chunks = F.ceil(
        F.greatest(F.length("text") - CHUNK_OVERLAP, F.lit(1)).cast("double") / _STRIDE
    ).cast("bigint")
    idx = F.explode(F.sequence(F.lit(0).cast("bigint"), n_chunks - 1)).alias("idx")
    exploded = docs.select("doc_id", "text", idx)
    start = (F.col("idx") * _STRIDE).cast("int")
    chunk = F.substring(F.col("text"), start + 1, CHUNK_CHARS)
    return exploded.select(
        "doc_id",
        F.col("idx").cast("int").alias("chunk_idx"),
        start.alias("start_offset"),
        chunk.alias("chunk_text"),
        F.length(chunk).cast("int").alias("chunk_len"),
    )


# ---------------------------------------------------------------------------
# Dataset mixing + epoch shuffling: source-weighted up/down-sampling
# (replication for rate > 1, deterministic subsampling for the fractional
# part) followed by shard / sort-key assignment for the training order.
#
# Rates here: src0-4 -> 2.5x (quality upsample), src5-9 -> 1.0x,
# src10-19 -> 0.3x (bulk downsample). copies = floor(rate) + one extra
# copy when an independent Knuth bucket falls below frac(rate)*100.
#
# Scale shape: a pure per-row projection + explode — zero shuffle, no
# RNG (reproducible across engines, runs, and retries). The writer
# realizes the training order with repartition(shard) +
# sortWithinPartitions(sort_key); copies of the same document land in
# different shards because copy_id feeds the hash.
# ---------------------------------------------------------------------------
N_SHARDS = 16
_MIX_SALT = 7919  # decorrelates the sampling bucket from the split bucket
_COPY_STEP = 1000003  # spreads copies of one doc across the hash space

MIX_ORACLE = f"""
WITH rated AS (
  SELECT doc_id, source,
         CASE WHEN src_num < 5 THEN 2 WHEN src_num < 10 THEN 1 ELSE 0 END AS base,
         CASE WHEN src_num < 5 THEN 50 WHEN src_num < 10 THEN 0 ELSE 30 END AS frac_pct
  FROM (SELECT doc_id, source, CAST(substr(source, 4) AS INT) AS src_num FROM documents)
),
copied AS (
  SELECT doc_id, source,
         base + CASE WHEN (doc_id + {_MIX_SALT}) % {_PREMOD} * {_KNUTH} % {_MOD} % 100 < frac_pct
                     THEN 1 ELSE 0 END AS n_copies
  FROM rated
)
SELECT doc_id, source, CAST(copy_id AS INT) AS copy_id,
       CAST(h % {N_SHARDS} AS INT) AS shard, h AS sort_key
FROM (
  SELECT doc_id, source, copy_id,
         (doc_id + copy_id * {_COPY_STEP}) % {_PREMOD} * {_KNUTH} % {_MOD} AS h
  FROM copied, UNNEST(generate_series(1, n_copies)) AS t(copy_id)
)
"""


@register("dataset_mix_shards", MIX_ORACLE)
def dataset_mix_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    src_num = F.substring("source", 4, 10).cast("int")
    base = F.when(src_num < 5, 2).when(src_num < 10, 1).otherwise(0)
    frac_pct = F.when(src_num < 5, 50).when(src_num < 10, 0).otherwise(30)
    mix_bucket = (F.col("doc_id") + _MIX_SALT) % _PREMOD * _KNUTH % _MOD % 100
    n_copies = base + F.when(mix_bucket < frac_pct, 1).otherwise(0)
    copied = docs.select(
        "doc_id", "source", n_copies.alias("n_copies")
    ).filter(F.col("n_copies") > 0)
    copy_id = F.explode(F.sequence(F.lit(1), F.col("n_copies"))).alias("copy_id")
    h = (F.col("doc_id") + F.col("copy_id") * _COPY_STEP) % _PREMOD * _KNUTH % _MOD
    return (
        copied.select("doc_id", "source", copy_id)
        .select(
            "doc_id",
            "source",
            F.col("copy_id").cast("int").alias("copy_id"),
            (h % N_SHARDS).cast("int").alias("shard"),
            h.alias("sort_key"),
        )
    )


# ---------------------------------------------------------------------------
# Length-weighted sampling (importance sampling for dataset mixing):
# accept each document with probability proportional to its length
# (capped), via the same overflow-guarded Knuth hash as the splits —
# a deterministic per-row Bernoulli draw, zero shuffle, reproducible
# across engines and re-runs. The production variant swaps the length
# weight for a model-based quality score column.
# ---------------------------------------------------------------------------
WEIGHTED_ORACLE = f"""
SELECT doc_id, lang, n_chars
FROM documents
WHERE (doc_id % {_PREMOD}) * {_KNUTH} % {_MOD} % 10000 < LEAST(n_chars, 9000)
"""


@register("weighted_sample", WEIGHTED_ORACLE)
def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    draw = (F.col("doc_id") % _PREMOD) * _KNUTH % _MOD % 10000
    return docs.filter(draw < F.least(F.col("n_chars"), F.lit(9000))).select(
        "doc_id", "lang", "n_chars"
    )


# ---------------------------------------------------------------------------
# Stratified k-fold assignment (round 6): deterministic 5-fold
# cross-validation folds, stratified by language — round-robin over the
# within-stratum rank, so every fold gets ±1 of each language (a plain
# hash split only stratifies in expectation; rare strata end up
# unbalanced). Companion to train_val_test_split's hash buckets.
#
# Scale: one shuffle on the stratum key for the per-stratum window; the
# rank is only used mod k, so no global ordering and no driver state.
# ---------------------------------------------------------------------------
KFOLD_ORACLE = """
SELECT doc_id, lang,
       CAST((ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) - 1) % 5
            AS INT) AS fold
FROM documents
"""


@register("stratified_kfold", KFOLD_ORACLE)
def stratified_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy("doc_id")
    return docs.select(
        "doc_id",
        "lang",
        ((F.row_number().over(w) - 1) % 5).cast("int").alias("fold"),
    )
