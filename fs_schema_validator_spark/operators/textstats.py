"""Text-analysis operators for training-data pipelines.

All operators are pure Spark SQL expressions (whole-stage codegen, no
Python): token counting, quality features, n-gram/stopword language ID, and
document fingerprinting. Each has an ANSI-SQL oracle equivalent (DuckDB)
used by the driver's correctness gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny deterministic stopword inventory per language. Real pipelines plug in
# larger lists; the operator shape (vectorized membership counting over a
# split column) is what scales.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "zu"),
    "fr": ("le", "la", "les", "et", "de"),
    "es": ("el", "la", "los", "y", "de"),
}


def words(text: Column) -> Column:
    """Whitespace tokenization; empty string -> empty array (SQL-portable)."""
    return F.filter(F.split(text, r"\s+"), lambda w: w != "")


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_words, n_chars_seen) — whitespace token counting."""
    w = words(F.col(text_col))
    return df.select(
        "doc_id",
        F.size(w).cast("bigint").alias("n_words"),
        F.length(F.col(text_col)).cast("bigint").alias("n_chars_seen"),
    )


def _stopword_count(w: Column, lang: str) -> Column:
    vocab = STOPWORDS[lang]
    return F.size(F.filter(w, lambda t: t.isin(*vocab)))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality scoring: length, word stats, punct/stopword
    ratios. Everything rounded so engine-vs-oracle hashing is stable."""
    w = words(F.col(text_col))
    n_words = F.size(w)
    n_chars = F.length(F.col(text_col))
    total_word_chars = F.aggregate(
        w, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
    )
    avg_word_len = F.when(
        n_words > 0,
        F.round(total_word_chars / n_words.cast("double"), 4),
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(
        n_words > 0,
        F.round(_stopword_count(w, "en") / n_words.cast("double"), 4),
    ).otherwise(F.lit(0.0))
    return df.select(
        "doc_id",
        n_chars.cast("bigint").alias("n_chars_seen"),
        n_words.cast("bigint").alias("n_words"),
        avg_word_len.alias("avg_word_len"),
        stop_ratio.alias("stopword_ratio"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-vote language ID: the language whose stopword inventory
    matches most tokens wins; ties and zero votes -> 'und'."""
    w = words(F.col(text_col))
    votes = [
        _stopword_count(w, lang).alias(f"v_{lang}") for lang in STOPWORDS
    ]
    scored = df.select("doc_id", F.col("lang").alias("labeled_lang"), *votes)
    langs = list(STOPWORDS)
    best = F.greatest(*[F.col(f"v_{lang}") for lang in langs])
    pred = F.lit("und")
    # reverse order so earlier languages win ties deterministically
    for lang in reversed(langs):
        pred = F.when(
            (F.col(f"v_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return scored.select(
        "doc_id",
        "labeled_lang",
        pred.alias("predicted_lang"),
        (pred == F.col("labeled_lang")).alias("agree"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", prefix_words: int | None = None) -> DataFrame:
    """Deterministic document fingerprint: md5 of the normalized text (or of
    its first `prefix_words` tokens) — the exact-dedup / near-prefix-dedup
    key."""
    if prefix_words is None:
        basis = F.lower(F.trim(F.col(text_col)))
    else:
        basis = F.array_join(
            F.slice(words(F.lower(F.col(text_col))), 1, prefix_words), " "
        )
    return df.select("doc_id", F.md5(basis).alias("fingerprint"))
