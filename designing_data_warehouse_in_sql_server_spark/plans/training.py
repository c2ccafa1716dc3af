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
