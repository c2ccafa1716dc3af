"""Text analysis operators for training-data pipelines (task-brief
first-class extensions): language ID, quality scoring, token counting,
document fingerprinting. All pure Catalyst expressions (regexp_count /
split / md5), SQL-expressible on both engines for oracle checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup_text import shingles_col, spread, words_col

# Stopword alternations per language — deliberately regex-dialect-neutral
# (word boundaries + literal ASCII words work identically in Java regex
# and RE2).
LANG_STOPWORDS = {
    "en": r"\b(the|and|of|to|in)\b",
    "es": r"\b(el|la|de|que|los)\b",
    "de": r"\b(der|die|und|das|ist)\b",
    "fr": r"\b(le|la|les|et|des)\b",
}


def lang_votes(text: Column) -> dict[str, Column]:
    return {
        lang: F.regexp_count(F.lower(text), F.lit(pat))
        for lang, pat in LANG_STOPWORDS.items()
    }


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """n-gram/stopword-vote language ID: argmax of per-language stopword
    hits, 'und' (undetermined) when no votes. Deterministic tie order =
    dict order (en, es, de, fr)."""
    votes = lang_votes(F.col(text_col))
    out = df.select(F.col(id_col), *[v.alias(f"votes_{k}") for k, v in votes.items()])
    vote_cols = {lang: F.col(f"votes_{lang}") for lang in votes}
    best = F.greatest(*vote_cols.values())
    pred = F.lit("und")
    for lang in reversed(list(vote_cols)):  # earlier langs win ties
        pred = F.when((vote_cols[lang] > 0) & (vote_cols[lang] == best), F.lit(lang)).otherwise(pred)
    return out.withColumn("lang_pred", pred)


def quality_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Length / punctuation / stopword-ratio quality features. Ratios are
    integer/integer doubles (deterministic cross-engine)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = F.size(words_col(t))
    n_punct = F.regexp_count(t, F.lit(r"[.,;:!?]"))
    n_stop = F.regexp_count(F.lower(t), F.lit(LANG_STOPWORDS["en"]))
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        n_punct.alias("n_punct"),
        n_stop.alias("n_stopwords"),
        F.round(n_punct.cast("double") / n_chars, 6).alias("punct_ratio"),
        F.round(n_stop.cast("double") / n_tokens, 6).alias("stopword_ratio"),
        F.round(n_chars.cast("double") / n_tokens, 6).alias("chars_per_token"),
    )


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace token count + a BPE-ish subword proxy: runs of letters,
    runs of digits, or single other non-space chars."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.size(words_col(t)).alias("ws_tokens"),
        F.regexp_count(F.lower(t), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]")).alias("bpe_tokens"),
    )


def fingerprints(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """Document fingerprints: full-content md5 of the normalized text plus
    a winnowing-style rolling fingerprint (min shingle hash — the anchor
    a rolling-hash winnower would select).

    Scale: shingling + per-shingle md5 is the heavy row-local step, so
    the input is spread to full parallelism first (small scans produce
    few splits; at cluster scale the repartition is one cheap shuffle of
    raw text that unlocks N-way compute)."""
    df = spread(df, id_col)
    t = F.col(text_col)
    normalized = F.regexp_replace(F.trim(F.lower(t)), r"\s+", " ")
    return df.select(
        F.col(id_col),
        F.md5(normalized).alias("content_md5"),
        F.array_min(F.transform(shingles_col(t, k), F.md5)).alias("min_shingle_hash"),
    )
