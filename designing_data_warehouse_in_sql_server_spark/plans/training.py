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


# ---------------------------------------------------------------------------
# AUC-ROC (round 6 wave 3): exact area under the ROC curve for a binary
# task (label 0 = positive class) scored by a deterministic model proxy
# (the first embedding component), via the rank-statistic identity
# AUC = [#(pos > neg) + #(pos = neg)/2] / (n_pos * n_neg). Computed at
# the SCORE-VALUE grain: one hash aggregate to (score -> n_pos, n_neg),
# then the running negative count comes from the size-adaptive
# two-phase prefix-sum operator — never an Exchange SinglePartition
# over the score relation at scale. Ties handled exactly (the /2 term);
# the numerator is carried x2 so everything is integer until the final
# rounded division.
#
# Scale: grouping to score grain bounds the ordered relation by
# distinct scores; prefix_sum range-partitions it; the final AUC is a
# 1-row aggregate. No windows over raw rows, no joins.
# ---------------------------------------------------------------------------
AUC_ORACLE = """
WITH scored AS (
  SELECT CAST(embedding[1] AS DOUBLE) AS score,
         CASE WHEN label = 0 THEN 1 ELSE 0 END AS pos
  FROM embeddings
), grain AS (
  SELECT score,
         CAST(SUM(pos) AS BIGINT) AS n_pos,
         CAST(COUNT(*) - SUM(pos) AS BIGINT) AS n_neg
  FROM scored GROUP BY score
), cum AS (
  SELECT n_pos, n_neg,
         SUM(n_neg) OVER (ORDER BY score
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - n_neg AS neg_below
  FROM grain
), agg AS (
  SELECT CAST(SUM(n_pos * (2 * neg_below + n_neg)) AS BIGINT) AS auc_num_x2,
         CAST(SUM(n_pos) AS BIGINT) AS n_pos,
         CAST(SUM(n_neg) AS BIGINT) AS n_neg
  FROM cum
)
SELECT auc_num_x2, n_pos, n_neg,
       ROUND(CAST(auc_num_x2 AS DOUBLE)
             / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)), 6) AS auc
FROM agg
"""


@register("auc_roc", AUC_ORACLE)
def auc_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ids import prefix_sum

    emb = load_table(spark, sf_dir, "embeddings")
    scored = emb.select(
        F.element_at("embedding", 1).cast("double").alias("score"),
        F.when(F.col("label") == 0, 1).otherwise(0).alias("pos"),
    )
    grain = scored.groupBy("score").agg(
        F.sum("pos").alias("n_pos"),
        (F.count("*") - F.sum("pos")).alias("n_neg"),
    )
    cum = prefix_sum(grain, "n_neg", ["score"], cum_col="cum_neg")
    agg = cum.select(
        "n_pos",
        "n_neg",
        (F.col("cum_neg") - F.col("n_neg")).alias("neg_below"),
    ).agg(
        F.sum(F.col("n_pos") * (2 * F.col("neg_below") + F.col("n_neg"))).alias(
            "auc_num_x2"
        ),
        F.sum("n_pos").alias("n_pos"),
        F.sum("n_neg").alias("n_neg"),
    )
    return agg.select(
        "auc_num_x2",
        "n_pos",
        "n_neg",
        F.round(
            F.col("auc_num_x2").cast("double")
            / (2.0 * F.col("n_pos").cast("double") * F.col("n_neg").cast("double")),
            6,
        ).alias("auc"),
    )


# ---------------------------------------------------------------------------
# Calibration / reliability bins (round 6 wave 3): predicted
# probabilities (sigmoid of the score proxy) bucketed into 10
# equal-width bins, each emitting its EXACT positive count vs total and
# the order-insensitive min/max confidence — the reliability-diagram
# input for "is the model over-confident". No float sums anywhere
# (double SUMs are partition-order-dependent; min/max/counts are not).
#
# Scale: one scan, one 10-row hash aggregate. The sigmoid/bin edge is
# a pure per-row expression.
# ---------------------------------------------------------------------------
CALIBRATION_ORACLE = """
WITH scored AS (
  SELECT 1.0 / (1.0 + EXP(-CAST(embedding[1] AS DOUBLE))) AS p,
         CASE WHEN label = 0 THEN 1 ELSE 0 END AS pos
  FROM embeddings
)
SELECT CAST(LEAST(FLOOR(p * 10), 9) AS INT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(pos) AS BIGINT) AS n_pos,
       ROUND(MIN(p), 6) AS p_min, ROUND(MAX(p), 6) AS p_max
FROM scored GROUP BY 1
"""


@register("calibration_bins", CALIBRATION_ORACLE)
def calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.element_at("embedding", 1).cast("double")))
    scored = emb.select(
        p.alias("p"), F.when(F.col("label") == 0, 1).otherwise(0).alias("pos")
    )
    return scored.groupBy(
        F.least(F.floor(F.col("p") * 10), F.lit(9)).cast("int").alias("bin")
    ).agg(
        F.count("*").alias("n"),
        F.sum("pos").alias("n_pos"),
        F.round(F.min("p"), 6).alias("p_min"),
        F.round(F.max("p"), 6).alias("p_max"),
    )


# ---------------------------------------------------------------------------
# Confusion matrix + derived metrics (round 6 wave 3): threshold the
# score proxy at 0 (sigmoid 0.5), emit TP/FP/TN/FN as exact integers
# and precision/recall/F1 as single rounded double expressions over
# them. The classification-eval companion to auc_roc.
#
# Scale: one scan, four conditional aggregates, 1-row output — the
# reduce side is a single row with map-side partials.
# ---------------------------------------------------------------------------
CONFUSION_ORACLE = """
WITH scored AS (
  SELECT CAST(embedding[1] AS DOUBLE) >= 0.0 AS pred,
         label = 0 AS actual
  FROM embeddings
), agg AS (
  SELECT
    CAST(COUNT(*) FILTER (pred AND actual) AS BIGINT) AS tp,
    CAST(COUNT(*) FILTER (pred AND NOT actual) AS BIGINT) AS fp,
    CAST(COUNT(*) FILTER (NOT pred AND NOT actual) AS BIGINT) AS tn,
    CAST(COUNT(*) FILTER (NOT pred AND actual) AS BIGINT) AS fn
  FROM scored
)
SELECT tp, fp, tn, fn,
       ROUND(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE), 6) AS precision,
       ROUND(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE), 6) AS recall,
       ROUND(2.0 * CAST(tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE), 6) AS f1
FROM agg
"""


@register("confusion_matrix_metrics", CONFUSION_ORACLE)
def confusion_matrix_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    scored = emb.select(
        (F.element_at("embedding", 1).cast("double") >= 0.0).alias("pred"),
        (F.col("label") == 0).alias("actual"),
    )

    def cnt(cond):
        return F.sum(F.when(cond, 1).otherwise(0))

    agg = scored.agg(
        cnt(F.col("pred") & F.col("actual")).alias("tp"),
        cnt(F.col("pred") & ~F.col("actual")).alias("fp"),
        cnt(~F.col("pred") & ~F.col("actual")).alias("tn"),
        cnt(~F.col("pred") & F.col("actual")).alias("fn"),
    )
    return agg.select(
        "tp",
        "fp",
        "tn",
        "fn",
        F.round(F.col("tp").cast("double") / (F.col("tp") + F.col("fp")).cast("double"), 6).alias("precision"),
        F.round(F.col("tp").cast("double") / (F.col("tp") + F.col("fn")).cast("double"), 6).alias("recall"),
        F.round(
            2.0 * F.col("tp").cast("double")
            / (2 * F.col("tp") + F.col("fp") + F.col("fn")).cast("double"),
            6,
        ).alias("f1"),
    )


# ---------------------------------------------------------------------------
# Population stability index bins (round 6 wave 3): the drift monitor —
# the event-value distribution of the first half of the period vs the
# second, binned equal-width, each bin emitting exact counts and its
# PSI contribution (p_a - p_b) * ln(p_a / p_b) as ONE rounded double
# expression over exact integers (the total-PSI sum is left to the
# reader because cross-bin double summation order is engine-dependent;
# per-bin terms are deterministic). Laplace-style +1 smoothing keeps
# empty bins finite, as production PSI monitors do.
#
# Scale: one scan, one ~10-row hash aggregate (both periods' counts as
# conditional sums — not two scans), totals via windows over the
# bin-bounded aggregate.
# ---------------------------------------------------------------------------
PSI_ORACLE = """
WITH binned AS (
  SELECT CAST(LEAST(FLOOR(value / 50.0), 9) AS INT) AS bin,
         CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS in_a
  FROM events
), cells AS (
  SELECT bin,
         CAST(SUM(in_a) AS BIGINT) AS n_a,
         CAST(COUNT(*) - SUM(in_a) AS BIGINT) AS n_b
  FROM binned GROUP BY 1
), tot AS (
  SELECT bin, n_a, n_b,
         SUM(n_a + 1) OVER () AS tot_a, SUM(n_b + 1) OVER () AS tot_b
  FROM cells
)
SELECT bin, n_a, n_b,
       ROUND((CAST(n_a + 1 AS DOUBLE) / CAST(tot_a AS DOUBLE)
               - CAST(n_b + 1 AS DOUBLE) / CAST(tot_b AS DOUBLE))
             * LN((CAST(n_a + 1 AS DOUBLE) / CAST(tot_a AS DOUBLE))
                  / (CAST(n_b + 1 AS DOUBLE) / CAST(tot_b AS DOUBLE))), 6)
         AS psi_term
FROM tot
"""


@register("psi_drift_bins", PSI_ORACLE)
def psi_drift_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    binned = events.select(
        F.least(F.floor(F.col("value") / 50.0), F.lit(9)).cast("int").alias("bin"),
        F.when(F.col("ts") < F.lit("2024-01-16").cast("timestamp_ntz"), 1)
        .otherwise(0)
        .alias("in_a"),
    )
    cells = binned.groupBy("bin").agg(
        F.sum("in_a").alias("n_a"),
        (F.count("*") - F.sum("in_a")).alias("n_b"),
    )
    tot = cells.select(
        "bin",
        "n_a",
        "n_b",
        F.sum(F.col("n_a") + 1).over(W.partitionBy()).alias("tot_a"),
        F.sum(F.col("n_b") + 1).over(W.partitionBy()).alias("tot_b"),
    )
    pa = (F.col("n_a") + 1).cast("double") / F.col("tot_a").cast("double")
    pb = (F.col("n_b") + 1).cast("double") / F.col("tot_b").cast("double")
    return tot.select(
        "bin", "n_a", "n_b", F.round((pa - pb) * F.log(pa / pb), 6).alias("psi_term")
    )


# ---------------------------------------------------------------------------
# Leakage-aware temporal split with embargo (round 7): per-user 80/20
# time-ordered train/test split where events inside a 1-hour embargo
# window after each user's train boundary are EXCLUDED from test — the
# standard guard against target leakage through short-horizon
# autocorrelation (purged/embargoed splits, Lopez de Prado-style).
#
# Exactness: the boundary rank is ceil(0.8*n) computed as the INTEGER
# (4n+4) DIV 5 — never float (0.8*n in doubles misrounds at n % 5 == 0:
# 0.8*55 = 44.000000000000007, ceil 45). Timestamp comparisons are
# microsecond-exact in both engines.
#
# Scale: one shuffle on user_id; the rank window, the per-user count,
# and the boundary-timestamp pick all share that partitioning (one sort,
# chained Window operators, no second exchange); the split label is a
# projection and the final rollup is a 3-group hash aggregate with
# map-side partials. Parallelism = number of users.
# ---------------------------------------------------------------------------
TEMPORAL_SPLIT_ORACLE = """
WITH ranked AS (
  SELECT user_id, event_id, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM events
), brk AS (
  SELECT *, (4 * n + 4) // 5 AS boundary_rn FROM ranked
), bounded AS (
  SELECT *,
         MAX(CASE WHEN rn = boundary_rn THEN ts END)
           OVER (PARTITION BY user_id) AS boundary_ts
  FROM brk
)
SELECT CASE WHEN rn <= boundary_rn THEN 'train'
            WHEN ts <= boundary_ts + INTERVAL 1 HOUR THEN 'embargo'
            ELSE 'test' END AS split,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM bounded
GROUP BY 1
"""


@register("temporal_split_embargo", TEMPORAL_SPLIT_ORACLE)
def temporal_split_embargo(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    wu = W.partitionBy("user_id")
    ranked = events.select(
        "user_id",
        "ts",
        F.row_number().over(wu.orderBy("ts", "event_id")).alias("rn"),
        F.count("*").over(wu).alias("n"),
    ).withColumn("boundary_rn", F.expr("(4 * n + 4) DIV 5"))
    bounded = ranked.withColumn(
        "boundary_ts",
        F.max(F.when(F.col("rn") == F.col("boundary_rn"), F.col("ts"))).over(wu),
    )
    split = F.when(F.col("rn") <= F.col("boundary_rn"), F.lit("train")).otherwise(
        F.when(
            F.col("ts") <= F.col("boundary_ts") + F.expr("INTERVAL 1 HOUR"),
            F.lit("embargo"),
        ).otherwise(F.lit("test"))
    )
    return bounded.groupBy(split.alias("split")).agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


# ---------------------------------------------------------------------------
# Walk-forward (rolling-origin) backtest folds (round 7): F expanding
# train windows, each tested on the following fixed horizon — the
# time-series cross-validation analog of k-fold. Fold f trains on
# everything up to 2024-01-01 + 5f days and tests on the next 5 days.
#
# Scale: the fold spec is a F-row broadcast; each fact row fans out to
# at most the folds whose test window hasn't closed before it (bounded
# by F, a small constant), and the fan-out is consumed immediately by a
# map-side-partial hash aggregate — no F-times shuffle, no window, no
# sort. This is the standard "materialize the fold dimension" backtest
# shape; at 100 TB the broadcast join keeps the fact scan single-pass.
# ---------------------------------------------------------------------------
WALK_FORWARD_FOLDS = 4
WALK_FORWARD_STEP_DAYS = 5

WALK_FORWARD_ORACLE = f"""
WITH folds AS (
  SELECT CAST(f AS BIGINT) AS fold,
         TIMESTAMP '2024-01-01 00:00:00'
           + INTERVAL ({WALK_FORWARD_STEP_DAYS}) DAY * f AS train_end
  FROM range(1, {WALK_FORWARD_FOLDS + 1}) t(f)
)
SELECT fold, train_end,
       CAST(SUM(CASE WHEN ts <= train_end THEN 1 ELSE 0 END) AS BIGINT)
         AS n_train,
       CAST(SUM(CASE WHEN ts > train_end
                      AND ts <= train_end + INTERVAL ({WALK_FORWARD_STEP_DAYS}) DAY
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_test,
       CAST(COUNT(DISTINCT CASE WHEN ts > train_end
                      AND ts <= train_end + INTERVAL ({WALK_FORWARD_STEP_DAYS}) DAY
                     THEN user_id END) AS BIGINT) AS n_test_users
FROM events CROSS JOIN folds
GROUP BY fold, train_end
"""


@register("walk_forward_splits", WALK_FORWARD_ORACLE)
def walk_forward_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select("ts", "user_id")
    folds = spark.range(1, WALK_FORWARD_FOLDS + 1).select(
        F.col("id").alias("fold"),
        F.timestamp_add(
            "DAY",
            (F.col("id") * WALK_FORWARD_STEP_DAYS).cast("int"),
            F.lit("2024-01-01 00:00:00").cast("timestamp_ntz"),
        ).alias("train_end"),
    )
    test_end = F.timestamp_add(
        "DAY", F.lit(WALK_FORWARD_STEP_DAYS), F.col("train_end")
    )
    in_test = (F.col("ts") > F.col("train_end")) & (F.col("ts") <= test_end)
    return (
        events.crossJoin(F.broadcast(folds))
        .groupBy("fold", "train_end")
        .agg(
            F.sum(F.when(F.col("ts") <= F.col("train_end"), 1).otherwise(0)).alias(
                "n_train"
            ),
            F.sum(F.when(in_test, 1).otherwise(0)).alias("n_test"),
            F.countDistinct(F.when(in_test, F.col("user_id"))).alias("n_test_users"),
        )
    )


# ---------------------------------------------------------------------------
# Group k-fold (round 7, wave 7): every GROUP (user) lands wholly in
# one fold — sklearn GroupKFold semantics, the cross-validation guard
# against within-user leakage (row-level folds like stratified_kfold
# put one user's events in train AND validation). Assignment is
# greedy-balanced: groups ranked by size descending, dealt round-robin
# — fold row-counts balance to the largest-group granularity, better
# than hash assignment on skewed group sizes.
#
# Scale: the fold decision runs on the GROUPS relation (one row per
# user — vocabulary-scale), ranked by the size-adaptive sequential-id
# operator (single small-relation window below the row threshold,
# two-phase range-partitioned form above it: no single-partition sort
# of a large group list); the fact then joins the user->fold map on
# user_id. The footer row count of events is the free upper bound fed
# to the dispatch.
# ---------------------------------------------------------------------------
GROUP_KFOLD_K = 5

GROUP_KFOLD_ORACLE = f"""
WITH g AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY user_id
), ranked AS (
  SELECT user_id, cnt,
         ROW_NUMBER() OVER (ORDER BY cnt DESC, user_id) AS rk
  FROM g
), folds AS (
  SELECT user_id, cnt, CAST((rk - 1) % {GROUP_KFOLD_K} AS BIGINT) AS fold
  FROM ranked
)
SELECT fold, CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(cnt) AS BIGINT) AS n_rows
FROM folds GROUP BY fold
"""


@register("group_kfold", GROUP_KFOLD_ORACLE)
def group_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ids import assign_sequential_ids
    from ..sources.parquet import table_row_count

    events = load_table(spark, sf_dir, "events")
    g = events.groupBy("user_id").agg(F.count("*").alias("cnt"))
    # events' footer row count is a free upper bound on |groups|
    ranked = assign_sequential_ids(
        g,
        "rk",
        [F.col("cnt").desc(), F.col("user_id")],
        n_hint=table_row_count(sf_dir, "events"),
    )
    folds = ranked.select(
        "user_id", "cnt", ((F.col("rk") - 1) % GROUP_KFOLD_K).alias("fold")
    )
    return folds.groupBy("fold").agg(
        F.count("*").alias("n_groups"), F.sum("cnt").alias("n_rows")
    )


# ---------------------------------------------------------------------------
# Temperature-scaled dataset mixing weights (round 8): per-source
# sampling weights proportional to n_docs^ALPHA — the standard
# temperature/UniMax-style corpus re-balancing used in multilingual and
# multi-domain LLM training (alpha < 1 up-weights small sources
# relative to proportional sampling; alpha = 1 recovers it, alpha = 0
# is uniform). Emits each source's weight and its expected epoch count
# at a fixed document budget, the quantity that flags over-epoching of
# small domains BEFORE a training run.
#
# Scale: one fact-sized hash aggregate to the per-source counts
# (map-side partials), one 1-row normalizer broadcast back — the
# weight computation never rescans the corpus. POWER on the exact
# integer counts is a single-shot double on identical inputs in both
# engines, ROUND 6.
# ---------------------------------------------------------------------------
MIX_ALPHA = 0.7
MIX_DOC_BUDGET = 100_000

TEMPERATURE_MIX_ORACLE = f"""
WITH per_src AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS n_chars_total
  FROM documents GROUP BY source
), z AS (
  SELECT SUM(POWER(n_docs, {MIX_ALPHA})) AS z FROM per_src
)
SELECT source, n_docs, n_chars_total,
       ROUND(POWER(n_docs, {MIX_ALPHA}) / z, 6) AS weight,
       ROUND(POWER(n_docs, {MIX_ALPHA}) / z * {MIX_DOC_BUDGET} / n_docs, 4)
         AS epochs_at_budget
FROM per_src, z
"""


@register("temperature_mix_weights", TEMPERATURE_MIX_ORACLE)
def temperature_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum("n_chars").alias("n_chars_total")
    )
    z = per_src.agg(F.sum(F.pow("n_docs", F.lit(MIX_ALPHA))).alias("z"))
    w = F.pow("n_docs", F.lit(MIX_ALPHA)) / F.col("z")
    return per_src.crossJoin(F.broadcast(z)).select(
        "source",
        "n_docs",
        "n_chars_total",
        F.round(w, 6).alias("weight"),
        F.round(w * MIX_DOC_BUDGET / F.col("n_docs"), 4).alias("epochs_at_budget"),
    )


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov distance (round 8): D = max_x |F1(x) -
# F2(x)| between the event-value distributions of two event types — the
# classic distribution-drift test next to psi_drift_bins (PSI needs a
# binning choice; KS is binning-free and exact). The unscaled statistic
# d_num = max |cum1*N2 - cum2*N1| is carried as an EXACT BIGINT (the
# ECDF difference over the common denominator N1*N2), so the max, the
# arg-max value, and the hash comparison are integer-exact; only the
# final normalized D is a single-shot double division, ROUND 6.
#
# Scale: the fact collapses to per-distinct-VALUE counts first (one
# hash aggregate; values are 2-decimal cents, so the aggregate is
# bounded by the price domain, not the row count); the running ECDFs
# are windows over that domain-bounded relation — the global windows /
# 1-row max are SinglePartition over a provably bounded input (ratchet
# class 2). Ties between the samples at one value are handled by
# evaluating both ECDFs AFTER the shared step, the standard convention.
# ---------------------------------------------------------------------------
KS_TYPE_A = "click"
KS_TYPE_B = "purchase"

KS_ORACLE = f"""
WITH c AS (
  SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents,
         CAST(SUM(CASE WHEN event_type = '{KS_TYPE_A}' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN event_type = '{KS_TYPE_B}' THEN 1 ELSE 0 END) AS BIGINT) AS n2
  FROM events
  WHERE event_type IN ('{KS_TYPE_A}', '{KS_TYPE_B}')
  GROUP BY 1
), e AS (
  SELECT cents,
         SUM(n1) OVER (ORDER BY cents) AS cum1,
         SUM(n2) OVER (ORDER BY cents) AS cum2,
         SUM(n1) OVER () AS tot1,
         SUM(n2) OVER () AS tot2
  FROM c
), d AS (
  SELECT cents, ABS(cum1 * tot2 - cum2 * tot1) AS gap, tot1, tot2,
         MAX(ABS(cum1 * tot2 - cum2 * tot1)) OVER () AS dmax
  FROM e
)
SELECT CAST(MIN(cents) AS BIGINT) AS at_cents,
       CAST(MAX(dmax) AS BIGINT) AS d_num,
       CAST(MAX(tot1) AS BIGINT) AS n_a,
       CAST(MAX(tot2) AS BIGINT) AS n_b,
       ROUND(CAST(MAX(dmax) AS DOUBLE) / (MAX(tot1) * MAX(tot2)), 6) AS ks_d
FROM d WHERE gap = dmax
"""


@register("ks_test_two_sample", KS_ORACLE)
def ks_test_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    c = (
        events.filter(F.col("event_type").isin(KS_TYPE_A, KS_TYPE_B))
        .groupBy(
            F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("cents")
        )
        .agg(
            F.sum(F.when(F.col("event_type") == KS_TYPE_A, 1).otherwise(0))
            .cast("long")
            .alias("n1"),
            F.sum(F.when(F.col("event_type") == KS_TYPE_B, 1).otherwise(0))
            .cast("long")
            .alias("n2"),
        )
    )
    # windows over the domain-bounded counts relation share ONE sort
    run = W.orderBy("cents").rowsBetween(W.unboundedPreceding, W.currentRow)
    full = W.orderBy("cents").rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    e = c.select(
        "cents",
        F.sum("n1").over(run).alias("cum1"),
        F.sum("n2").over(run).alias("cum2"),
        F.sum("n1").over(full).alias("tot1"),
        F.sum("n2").over(full).alias("tot2"),
    )
    gap = F.abs(F.col("cum1") * F.col("tot2") - F.col("cum2") * F.col("tot1"))
    d = e.select(
        "cents",
        gap.alias("gap"),
        "tot1",
        "tot2",
        F.max(gap).over(W.partitionBy()).alias("dmax"),
    )
    return d.filter(F.col("gap") == F.col("dmax")).agg(
        F.min("cents").alias("at_cents"),
        F.max("dmax").alias("d_num"),
        F.max("tot1").alias("n_a"),
        F.max("tot2").alias("n_b"),
        F.round(
            F.max("dmax").cast("double") / (F.max("tot1") * F.max("tot2")), 6
        ).alias("ks_d"),
    )


# ---------------------------------------------------------------------------
# Mann-Whitney U rank-sum test (round 8): the nonparametric location
# test between the same two event-type samples as ks_test_two_sample —
# KS asks "do the distributions differ anywhere", Mann-Whitney asks
# "does one stochastically dominate". Everything up to the final z is
# EXACT integer arithmetic: pooled DOUBLED mid-ranks (2·#below + ties
# + 1, the spearman_rank_corr device) make the rank sum 2·R1 an exact
# BIGINT, 4·U1 = 2·R1 - 2·n1·(n1+1)/2·2 stays integral, and the
# tie-correction term Σ(t³-t) is an exact integer sum — the only
# doubles are the final mean/variance normalization, ROUND 6. The two
# cubic-headroom sums (Σ n1·r2 ≈ 2N² and Σ t³) are accumulated as
# DECIMAL(38,0) on BOTH engines (ADVICE r8: t³ wraps a Spark BIGINT
# once a single distinct value carries >2M ties; decimal keeps 38
# digits of identical headroom where DuckDB would silently widen to
# HUGEINT and diverge), and u1_doubled is emitted as a STRING of the
# exact integer (same device as wasserstein_1d's w1_num: DuckDB's
# pandas bridge renders DECIMAL(38,0) as lossy float64).
#
# Scale: identical shape to the KS twin — one hash aggregate to
# per-distinct-cents counts (domain-bounded), windows over that bounded
# relation (whitelisted SinglePartition class 2), a 1-row reduction.
# ---------------------------------------------------------------------------
MWU_ORACLE = f"""
WITH c AS (
  SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents,
         CAST(SUM(CASE WHEN event_type = '{KS_TYPE_A}' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN event_type = '{KS_TYPE_B}' THEN 1 ELSE 0 END) AS BIGINT) AS n2
  FROM events
  WHERE event_type IN ('{KS_TYPE_A}', '{KS_TYPE_B}')
  GROUP BY 1
), r AS (
  SELECT n1, n2, n1 + n2 AS t,
         2 * (SUM(n1 + n2) OVER (ORDER BY cents) - (n1 + n2)) + (n1 + n2) + 1 AS r2
  FROM c
), agg AS (
  SELECT CAST(SUM(n1) AS BIGINT) AS na,
         CAST(SUM(n2) AS BIGINT) AS nb,
         CAST(SUM(CAST(n1 * r2 AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS r2sum_a,
         CAST(SUM(CAST(t * t * t - t AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS tie_term
  FROM r
)
SELECT na AS n_a, nb AS n_b,
       CAST(CAST((r2sum_a - na * (na + 1)) AS DECIMAL(38,0)) AS VARCHAR) AS u1_doubled,
       ROUND((CAST(r2sum_a - na * (na + 1) AS DOUBLE) / 2 - CAST(na AS DOUBLE) * nb / 2)
             / SQRT(CAST(na AS DOUBLE) * nb / 12.0
                    * ((na + nb + 1)
                       - CAST(tie_term AS DOUBLE) / ((na + nb) * (na + nb - 1.0)))), 6)
         AS z_score
FROM agg
"""


@register("mannwhitney_u_test", MWU_ORACLE)
def mannwhitney_u_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    c = (
        events.filter(F.col("event_type").isin(KS_TYPE_A, KS_TYPE_B))
        .groupBy(F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("cents"))
        .agg(
            F.sum(F.when(F.col("event_type") == KS_TYPE_A, 1).otherwise(0))
            .cast("long")
            .alias("n1"),
            F.sum(F.when(F.col("event_type") == KS_TYPE_B, 1).otherwise(0))
            .cast("long")
            .alias("n2"),
        )
    )
    t = F.col("n1") + F.col("n2")
    run = W.orderBy("cents").rowsBetween(W.unboundedPreceding, W.currentRow)
    # pooled doubled mid-rank of each distinct value, exact BIGINT
    r = c.select(
        "n1",
        "n2",
        t.alias("t"),
        (2 * (F.sum(t).over(run) - t) + t + 1).alias("r2"),
    )
    # decimal(38,0) before the product/cube so no per-row BIGINT wrap
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    agg = r.agg(
        F.sum("n1").alias("na"),
        F.sum("n2").alias("nb"),
        F.sum(dec(F.col("n1")) * dec(F.col("r2"))).alias("r2sum_a"),
        F.sum(
            dec(F.col("t")) * dec(F.col("t")) * dec(F.col("t")) - dec(F.col("t"))
        ).alias("tie_term"),
    )
    u1d = (F.col("r2sum_a") - F.col("na") * (F.col("na") + 1)).cast("decimal(38,0)")
    mean = F.col("na").cast("double") * F.col("nb") / 2
    var = (
        F.col("na").cast("double")
        * F.col("nb")
        / 12.0
        * (
            (F.col("na") + F.col("nb") + 1)
            - F.col("tie_term").cast("double")
            / ((F.col("na") + F.col("nb")) * (F.col("na") + F.col("nb") - 1.0))
        )
    )
    return agg.select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        u1d.cast("string").alias("u1_doubled"),
        F.round((u1d.cast("double") / 2 - mean) / F.sqrt(var), 6).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# 1-D Wasserstein (earth-mover's) distance (round 8): the third drift
# lens over the same two samples — KS is the worst-case ECDF gap,
# Wasserstein is the INTEGRAL of the gap (how much probability mass
# must move how far, in value units), the measure that distinguishes a
# small shift everywhere from a large shift somewhere. Closed form in
# 1-D: W1 = ∫|F1 - F2| dx = Σ over consecutive distinct values of
# |cum1·N2 - cum2·N1| · Δv / (N1·N2) — the numerator Σ|gap|·Δv is an
# EXACT integer accumulated as DECIMAL(38,0) on BOTH engines (ADVICE
# r8: it is bounded by N1·N2·cents-range, which approaches 2^63 at
# ~100× event scale where a BIGINT sum would wrap silently in Spark's
# non-ANSI mode while DuckDB's HUGEINT sum would error on the BIGINT
# cast — decimal gives 38 digits of identical headroom on both
# engines); the exact numerator is EMITTED AS A STRING because neither
# engine can hand a 2^63-exceeding integer to the comparison harness
# losslessly in a native type (DuckDB's pandas bridge renders
# DECIMAL(38,0) as float64); the single division at the end is the
# only double, ROUND 6 (units: cents).
#
# Scale: identical to the KS twin — per-distinct-cents counts, windows
# over the domain-bounded relation, 1-row reduction.
# ---------------------------------------------------------------------------
WASSERSTEIN_ORACLE = f"""
WITH c AS (
  SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents,
         CAST(SUM(CASE WHEN event_type = '{KS_TYPE_A}' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN event_type = '{KS_TYPE_B}' THEN 1 ELSE 0 END) AS BIGINT) AS n2
  FROM events
  WHERE event_type IN ('{KS_TYPE_A}', '{KS_TYPE_B}')
  GROUP BY 1
), e AS (
  SELECT cents,
         SUM(n1) OVER (ORDER BY cents) AS cum1,
         SUM(n2) OVER (ORDER BY cents) AS cum2,
         SUM(n1) OVER () AS tot1,
         SUM(n2) OVER () AS tot2,
         LEAD(cents) OVER (ORDER BY cents) AS next_cents
  FROM c
)
SELECT CAST(CAST(SUM(CAST(ABS(cum1 * tot2 - cum2 * tot1) * (next_cents - cents)
                          AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS VARCHAR) AS w1_num,
       CAST(MAX(tot1) AS BIGINT) AS n_a,
       CAST(MAX(tot2) AS BIGINT) AS n_b,
       ROUND(CAST(SUM(ABS(cum1 * tot2 - cum2 * tot1) * (next_cents - cents)) AS DOUBLE)
             / (MAX(tot1) * MAX(tot2)), 6) AS w1_cents
FROM e WHERE next_cents IS NOT NULL
"""


@register("wasserstein_1d", WASSERSTEIN_ORACLE)
def wasserstein_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    c = (
        events.filter(F.col("event_type").isin(KS_TYPE_A, KS_TYPE_B))
        .groupBy(F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("cents"))
        .agg(
            F.sum(F.when(F.col("event_type") == KS_TYPE_A, 1).otherwise(0))
            .cast("long")
            .alias("n1"),
            F.sum(F.when(F.col("event_type") == KS_TYPE_B, 1).otherwise(0))
            .cast("long")
            .alias("n2"),
        )
    )
    run = W.orderBy("cents").rowsBetween(W.unboundedPreceding, W.currentRow)
    full = W.orderBy("cents").rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    e = c.select(
        "cents",
        F.sum("n1").over(run).alias("cum1"),
        F.sum("n2").over(run).alias("cum2"),
        F.sum("n1").over(full).alias("tot1"),
        F.sum("n2").over(full).alias("tot2"),
        F.lead("cents").over(W.orderBy("cents")).alias("next_cents"),
    )
    # decimal(38,0) end-to-end: cast BEFORE the products so no
    # intermediate ever lives in a wrappable BIGINT (dec*dec and
    # SUM(dec) both stay decimal(38,0) in Spark — exact to 38 digits).
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    num = F.sum(
        F.abs(
            dec(F.col("cum1")) * dec(F.col("tot2"))
            - dec(F.col("cum2")) * dec(F.col("tot1"))
        )
        * dec(F.col("next_cents") - F.col("cents"))
    )
    return e.filter(F.col("next_cents").isNotNull()).agg(
        num.cast("string").alias("w1_num"),
        F.max("tot1").alias("n_a"),
        F.max("tot2").alias("n_b"),
        F.round(
            num.cast("double") / (F.max("tot1") * F.max("tot2")), 6
        ).alias("w1_cents"),
    )


# ---------------------------------------------------------------------------
# Poisson-bootstrap confidence interval (round 8): a 95% CI for the
# mean order value WITHOUT resampling passes — each of B replicates
# weights every row by an independent Poisson(1)-distributed count
# (Chamandy et al., "Estimating Uncertainty for Massive Data Streams",
# the standard bootstrap at data-parallel scale: multinomial resampling
# needs the global N per replicate; Poisson weights are per-row
# independent, so the whole bootstrap is ONE scan with a B-way
# explode). The Poisson(1) draw is the inverse-CDF lookup on a
# deterministic per-(row, replicate) hash bucket — integer thresholds
# from the exact cumulative probabilities, capped at 5 (P > 5 at
# lambda=1 is 0.06%), identical on both engines.
#
# Exactness: per-replicate sums are exact BIGINTs (cents x small
# weights); each replicate mean is one double division; the percentile
# bounds interpolate over the B-row means relation with the same
# formula in both engines, ROUND 4.
#
# Scale: explode x B multiplies the scan linearly (the documented cost
# of the method — still one pass over the data); the aggregate is a
# B-row hash aggregate with map-side partials; the CI reduction is a
# B-row single partition (whitelisted, bounded by the constant B).
# ---------------------------------------------------------------------------
BOOT_B = 100  # bootstrap replicates
_BOOT_SALT = 40503
# inverse CDF of Poisson(1) over a [0, 1e6) bucket: cumulative
# probabilities e^-1 * (1, 2, 2.5, 2.666.., 2.7083..) scaled to 1e6
_POIS_THRESH = (367879, 735759, 919699, 981012, 996340)


def _pois_case(u: str) -> str:
    branches = " ".join(
        f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(_POIS_THRESH)
    )
    return f"CASE {branches} ELSE 5 END"


BOOTSTRAP_ORACLE = f"""
WITH expl AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
         CAST(b AS BIGINT) AS b,
         ((o_orderkey % {_PREMOD}) * {_KNUTH} + b * {_BOOT_SALT}) % {_MOD} % 1000000 AS u
  FROM orders, UNNEST(generate_series(1, {BOOT_B})) AS t(b)
), weighted AS (
  SELECT b, CAST(SUM(({_pois_case('u')}) * cents) AS BIGINT) AS wsum,
         CAST(SUM({_pois_case('u')}) AS BIGINT) AS wn
  FROM expl GROUP BY b
), means AS (
  SELECT CAST(wsum AS DOUBLE) / wn AS m FROM weighted
)
SELECT CAST({BOOT_B} AS BIGINT) AS n_replicates,
       ROUND(AVG(m), 4) AS boot_mean_cents,
       ROUND(quantile_cont(m, 0.025), 4) AS ci_lo_cents,
       ROUND(quantile_cont(m, 0.975), 4) AS ci_hi_cents
FROM means
"""


@register("poisson_bootstrap_ci", BOOTSTRAP_ORACLE)
def poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    expl = orders.select(
        "o_orderkey",
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"),
        F.explode(
            F.sequence(F.lit(1).cast("bigint"), F.lit(BOOT_B).cast("bigint"))
        ).alias("b"),
    ).withColumn(
        "u",
        ((F.col("o_orderkey") % _PREMOD) * _KNUTH + F.col("b") * _BOOT_SALT)
        % _MOD
        % 1000000,
    )
    w = F.expr(_pois_case("u"))
    weighted = expl.groupBy("b").agg(
        F.sum(w * F.col("cents")).alias("wsum"), F.sum(w).alias("wn")
    )
    means = weighted.select(
        (F.col("wsum").cast("double") / F.col("wn")).alias("m")
    )
    return means.agg(
        F.lit(BOOT_B).cast("long").alias("n_replicates"),
        F.round(F.avg("m"), 4).alias("boot_mean_cents"),
        F.round(F.expr("percentile(m, 0.025)"), 4).alias("ci_lo_cents"),
        F.round(F.expr("percentile(m, 0.975)"), 4).alias("ci_hi_cents"),
    )


# ---------------------------------------------------------------------------
# Model lift table (round 8): decile-gain analysis — rank by a score
# (order value as the stand-in propensity), split into exact deciles,
# and report per-decile response rate, lift vs the base rate, and
# cumulative capture — the standard campaign-targeting / model-quality
# report next to auc_roc and calibration_bins. All rates are EXACT
# integer basis points (cross-multiplied, floor division); nothing
# floats.
#
# Scale: deciles come from the size-adaptive exact NTILE
# (operators/ids.exact_ntile — plain window at most
# WINDOW_FORM_MAX_ROWS rows by footer hint, two-phase sequential-id
# form above, never an unbounded single-partition sort); the report is
# a 10-row aggregate, and the cumulative capture is a window over that
# 10-row relation.
# ---------------------------------------------------------------------------
LIFT_ORACLE = """
WITH scored AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS hit,
         NTILE(10) OVER (ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT) DESC,
                         o_orderkey) AS decile
  FROM orders
), per AS (
  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(hit) AS BIGINT) AS responders
  FROM scored GROUP BY decile
), tot AS (
  SELECT decile, n_orders, responders,
         SUM(n_orders) OVER () AS n_total,
         SUM(responders) OVER () AS r_total,
         SUM(responders) OVER (ORDER BY decile) AS cum_r
  FROM per
)
SELECT CAST(decile AS INT) AS decile, n_orders, responders,
       CAST(responders * 10000 // n_orders AS BIGINT) AS response_bp,
       CAST(responders * n_total * 10000 // (n_orders * r_total) AS BIGINT) AS lift_bp,
       CAST(cum_r * 10000 // r_total AS BIGINT) AS cum_capture_bp
FROM tot
"""


@register("model_lift_deciles", LIFT_ORACLE)
def model_lift_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ids import exact_ntile
    from ..sources.parquet import table_row_count

    orders = load_table(spark, sf_dir, "orders")
    scored = orders.select(
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("hit"),
        "o_orderkey",
    )
    deciled = exact_ntile(
        scored,
        10,
        [F.col("cents").desc(), F.col("o_orderkey")],
        "decile",
        n_hint=table_row_count(sf_dir, "orders"),
    )
    per = deciled.groupBy("decile").agg(
        F.count("*").alias("n_orders"), F.sum("hit").alias("responders")
    )
    tot = per.select(
        "decile",
        "n_orders",
        "responders",
        F.sum("n_orders").over(W.partitionBy()).alias("n_total"),
        F.sum("responders").over(W.partitionBy()).alias("r_total"),
        F.sum("responders")
        .over(W.orderBy("decile").rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("cum_r"),
    )
    return tot.select(
        F.col("decile").cast("int").alias("decile"),
        "n_orders",
        "responders",
        F.expr("CAST(responders * 10000 div n_orders AS BIGINT)").alias("response_bp"),
        F.expr(
            "CAST(responders * n_total * 10000 div (n_orders * r_total) AS BIGINT)"
        ).alias("lift_bp"),
        F.expr("CAST(cum_r * 10000 div r_total AS BIGINT)").alias("cum_capture_bp"),
    )


# ---------------------------------------------------------------------------
# DSIR importance weights (round 9): Data Selection with Importance
# Resampling (Xie et al. 2023) — score every raw document by how much
# its hashed n-gram feature distribution looks like a TARGET domain
# versus the raw corpus, w(doc) = Sigma_f c_doc(f) * [ln p_T(f) -
# ln p_R(f)] with Laplace-smoothed bucket unigram+bigram features.
# The standard recipe for carving a domain-matched subset out of a web
# crawl before training (the paper selects Pile-subset lookalikes; here
# the target is the corpus's lang='en' slice and the raw side is the
# whole corpus). Downstream, weights feed Gumbel-top-k / weighted
# reservoir sampling (weighted_sample, reservoir_sample_per_group).
#
# Cross-engine exactness: features are hashed with the same
# exact-integer polynomial discipline as winnowing — bucket(tok) =
# (Sigma_j<8 ascii(char_j) % 256 * 131^j) % 8192 in plain BIGINT
# arithmetic (max term 255*131^7 ~ 1.9e17, sum of 8 < 2^63), bigram
# bucket = (h1 * 131 + h2) % 8192 — so both engines compute IDENTICAL
# buckets; the only doubles are the two LNs on exact integer counts,
# ROUND 6 like js_divergence_sources.
#
# Scale: tokenize-and-hash is a per-row projection; the bigram needs
# one doc-partitioned LEAD window (bounded by doc length). Bucket
# statistics are a hash aggregate onto AT MOST 8192 rows — broadcast
# back to the per-doc feature counts (the join the paper's streaming
# implementation does with an in-memory array). Totals are a 1-row
# broadcast. Everything else is per-doc hash aggregation with map-side
# partials. Linear, two bounded broadcasts, no pair work.
# ---------------------------------------------------------------------------
DSIR_BUCKETS = 8192
DSIR_TARGET_LANG = "en"
DSIR_TOPN = 100

_DSIR_HASH_TERMS = " + ".join(
    f"(CASE WHEN length(tok) > {j} THEN ascii(substr(tok, {j + 1}, 1)) % 256"
    f" ELSE 0 END) * CAST({131 ** j} AS BIGINT)"
    for j in range(8)
)

DSIR_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, CAST(p AS BIGINT) AS p, w[p] AS tok
  FROM (
    SELECT doc_id, lang, regexp_split_to_array(trim(lower(text)), '\\s+') AS w
    FROM documents
  ), UNNEST(generate_series(1, len(w))) AS t(p)
), hashed AS (
  SELECT doc_id, lang, p, ({_DSIR_HASH_TERMS}) % {DSIR_BUCKETS} AS h
  FROM toks
), adjacent AS (
  SELECT doc_id, lang, h,
         LEAD(h) OVER (PARTITION BY doc_id ORDER BY p) AS nh
  FROM hashed
), features AS (
  SELECT doc_id, lang, h AS bucket FROM adjacent
  UNION ALL
  SELECT doc_id, lang, (h * 131 + nh) % {DSIR_BUCKETS} AS bucket
  FROM adjacent WHERE nh IS NOT NULL
), bucket_stats AS (
  SELECT bucket,
         CAST(COUNT(*) AS BIGINT) AS c_r,
         CAST(SUM(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN 1 ELSE 0 END)
              AS BIGINT) AS c_t
  FROM features GROUP BY bucket
), totals AS (
  SELECT CAST(SUM(c_r) AS BIGINT) AS n_r, CAST(SUM(c_t) AS BIGINT) AS n_t
  FROM bucket_stats
), per_doc AS (
  SELECT doc_id, lang, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM features GROUP BY doc_id, lang, bucket
)
SELECT d.doc_id, d.lang,
       CAST(SUM(d.cnt) AS BIGINT) AS n_features,
       ROUND(SUM(d.cnt * (LN(CAST(b.c_t + 1 AS DOUBLE) / (t.n_t + {DSIR_BUCKETS}))
                        - LN(CAST(b.c_r + 1 AS DOUBLE) / (t.n_r + {DSIR_BUCKETS})))),
             6) AS dsir_logratio
FROM per_doc d
JOIN bucket_stats b USING (bucket)
CROSS JOIN totals t
GROUP BY d.doc_id, d.lang
ORDER BY dsir_logratio DESC, d.doc_id
LIMIT {DSIR_TOPN}
"""


@register("dsir_importance_weights", DSIR_ORACLE)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup_text import words_col

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    toks = docs.select(
        "doc_id",
        "lang",
        F.posexplode(words_col(F.col("text"))).alias("p", "tok"),
    )
    hashed = toks.select(
        "doc_id",
        "lang",
        "p",
        (F.expr(_DSIR_HASH_TERMS) % DSIR_BUCKETS).alias("h"),
    )
    adjacent = hashed.select(
        "doc_id",
        "lang",
        "h",
        F.lead("h").over(W.partitionBy("doc_id").orderBy("p")).alias("nh"),
    )
    features = adjacent.select(
        "doc_id", "lang", F.col("h").alias("bucket")
    ).unionAll(
        adjacent.filter(F.col("nh").isNotNull()).select(
            "doc_id",
            "lang",
            ((F.col("h") * 131 + F.col("nh")) % DSIR_BUCKETS).alias("bucket"),
        )
    )
    bucket_stats = features.groupBy("bucket").agg(
        F.count("*").cast("long").alias("c_r"),
        F.sum(
            F.when(F.col("lang") == DSIR_TARGET_LANG, 1).otherwise(0)
        )
        .cast("long")
        .alias("c_t"),
    )
    totals = bucket_stats.agg(
        F.sum("c_r").alias("n_r"), F.sum("c_t").alias("n_t")
    )
    per_doc = features.groupBy("doc_id", "lang", "bucket").agg(
        F.count("*").cast("long").alias("cnt")
    )
    term = F.col("cnt") * (
        F.log(
            (F.col("c_t") + 1).cast("double")
            / (F.col("n_t") + DSIR_BUCKETS)
        )
        - F.log(
            (F.col("c_r") + 1).cast("double")
            / (F.col("n_r") + DSIR_BUCKETS)
        )
    )
    return (
        per_doc.join(F.broadcast(bucket_stats), "bucket")
        .crossJoin(F.broadcast(totals))
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("cnt").cast("long").alias("n_features"),
            F.round(F.sum(term), 6).alias("dsir_logratio"),
        )
        .select("doc_id", "lang", "n_features", "dsir_logratio")
        .orderBy(F.col("dsir_logratio").desc(), "doc_id")
        .limit(DSIR_TOPN)
    )
