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


def quality_features(
    df: DataFrame,
    text_col: str = "text",
    passthrough: list[str] | None = None,
) -> DataFrame:
    """Per-document quality scoring: length, word stats, punct/stopword
    ratios. Everything rounded so engine-vs-oracle hashing is stable.

    `passthrough` keeps the named input columns in the projection so a
    downstream stage (e.g. lang_id in the curation pipeline) can consume
    this output directly instead of joining back on doc_id — each branch
    of such a join would re-execute this projection's whole upstream
    lineage (union + dedup window), tripling the scans."""
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
        *(passthrough or []),
        n_chars.cast("bigint").alias("n_chars_seen"),
        n_words.cast("bigint").alias("n_words"),
        avg_word_len.alias("avg_word_len"),
        stop_ratio.alias("stopword_ratio"),
    )


def lang_id(
    df: DataFrame,
    text_col: str = "text",
    passthrough: list[str] | None = None,
) -> DataFrame:
    """Stopword-vote language ID: the language whose stopword inventory
    matches most tokens wins; ties and zero votes -> 'und'.
    `passthrough` as in quality_features."""
    w = words(F.col(text_col))
    votes = [
        _stopword_count(w, lang).alias(f"v_{lang}") for lang in STOPWORDS
    ]
    scored = df.select(
        "doc_id",
        *(passthrough or []),
        F.col("lang").alias("labeled_lang"),
        *votes,
    )
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
        *(passthrough or []),
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


# GPT-2-style pretokenizer pattern (simplified: no unicode categories —
# ASCII classes keep it portable across regex engines). Matches
# contractions, space-prefixed letter runs, digit runs, punctuation runs,
# and whitespace — the standard BPE pre-split shape.
BPE_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"


def subword_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_subwords, n_alpha, n_numeric) — BPE-ish regex token
    counting (the pre-tokenization count a byte-pair encoder would see),
    alongside the whitespace count in ``token_count``. Pure regexp
    expressions — runs in codegen, no UDF."""
    toks = F.regexp_extract_all(F.col(text_col), F.lit(BPE_PATTERN), 0)
    return df.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_subwords"),
        F.size(F.filter(toks, lambda t: t.rlike(r"^ ?[A-Za-z]+$")))
        .cast("bigint")
        .alias("n_alpha"),
        F.size(F.filter(toks, lambda t: t.rlike(r"^ ?[0-9]+$")))
        .cast("bigint")
        .alias("n_numeric"),
    )


# PII patterns kept engine-portable: Java regex (Spark) and RE2 (DuckDB)
# agree on these constructs (character classes, bounded repetition, greedy
# quantifiers with no backtracking ambiguity).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9()\- ]{7,}[0-9]"


def repetition_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_lines, dup_line_frac, top_2gram_frac) — Gopher-style
    repetition quality signals (Rae et al. 2021 §A1.1): the fraction of
    duplicate lines and the share of the most frequent word 2-gram.
    Boilerplate/templated documents light up both.

    Line dedup is in-expression (split + array_distinct, codegen). The
    2-gram mode needs a per-(doc, gram) count — explode → two partial-agg
    groupBys keyed by doc_id, the scalable shape (map-side combine; no
    per-doc O(n²) HOF scan). Docs with <2 words get top_2gram_frac=0 via
    explode_outer's null row."""
    lines = F.filter(
        F.split(F.col(text_col), "\n"), lambda ln: ln != F.lit("")
    )
    n_lines = F.size(lines)
    dup_frac = F.when(
        n_lines > 0,
        F.round(
            F.lit(1.0)
            - F.size(F.array_distinct(lines)) / n_lines.cast("double"),
            4,
        ),
    ).otherwise(F.lit(0.0))
    # Bind the word array as a lambda variable (1-element-array trick):
    # referencing `words(...)` directly inside the per-gram lambda lets
    # CollapseProject inline the whole split+filter expression into EVERY
    # element access — O(n²) splits per document (measured 7.2s → 1.5s at
    # sf0.1). A null result (docs with <2 words) flows through flatten →
    # explode_outer emits the null row the aggregation expects.
    grams = F.flatten(
        F.transform(
            F.array(words(F.col(text_col))),
            lambda w: F.when(
                F.size(w) >= 2,
                F.transform(
                    F.sequence(F.lit(0), F.size(w) - 2),
                    lambda i: F.concat_ws(" ", F.get(w, i), F.get(w, i + 1)),
                ),
            ),
        )
    )
    # Stage the line features in their OWN projection before the explode:
    # ExtractGenerator keeps non-generator expressions in the Project
    # ABOVE Generate, so inlining them in the explode select would re-run
    # the line split + array_distinct once per gram instance (~n_words x
    # per doc; same trap as the gram-array binding above).
    staged = df.select(
        "doc_id",
        n_lines.cast("bigint").alias("n_lines"),
        dup_frac.alias("dup_line_frac"),
        F.col(text_col),
    )
    base = staged.select(
        "doc_id",
        "n_lines",
        "dup_line_frac",
        F.explode_outer(grams).alias("_gram"),
    )
    counts = base.groupBy(
        "doc_id", "n_lines", "dup_line_frac", "_gram"
    ).agg(F.count(F.lit(1)).alias("_c"))
    per_doc = counts.groupBy("doc_id", "n_lines", "dup_line_frac").agg(
        F.sum(F.when(F.col("_gram").isNotNull(), F.col("_c"))).alias("_tot"),
        F.max(F.when(F.col("_gram").isNotNull(), F.col("_c"))).alias("_top"),
    )
    return per_doc.select(
        "doc_id",
        "n_lines",
        "dup_line_frac",
        F.coalesce(
            F.round(F.col("_top") / F.col("_tot").cast("double"), 4),
            F.lit(0.0),
        ).alias("top_2gram_frac"),
    )


def unigram_entropy(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_words, entropy) — Shannon entropy (nats) of the
    document's unigram distribution: ln(N) − Σ c·ln(c) / N. Low-entropy
    docs are repetitive/templated; a standard pretraining quality gate.

    Shape: explode → (doc, word) partial-agg count → one per-doc agg.
    The entropy identity keeps every aggregated term a function of the
    integer count c, so both engines sum identical term values (only fp
    addition order differs, absorbed by round-4)."""
    e = df.select("doc_id", F.explode_outer(words(F.col(text_col))).alias("_w"))
    counts = e.groupBy("doc_id", "_w").agg(F.count(F.lit(1)).alias("_c"))
    per_doc = counts.groupBy("doc_id").agg(
        F.sum(F.when(F.col("_w").isNotNull(), F.col("_c"))).alias("_n"),
        F.sum(
            F.when(
                F.col("_w").isNotNull(),
                F.col("_c") * F.log(F.col("_c").cast("double")),
            )
        ).alias("_s"),
    )
    return per_doc.select(
        "doc_id",
        F.coalesce(F.col("_n"), F.lit(0)).cast("bigint").alias("n_words"),
        F.coalesce(
            F.round(
                F.log(F.col("_n").cast("double")) - F.col("_s") / F.col("_n"),
                4,
            ),
            F.lit(0.0),
        ).alias("entropy"),
    )


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_emails, n_phones, scrubbed_len) — PII detection counts
    and the length after replacing matches with <EMAIL>/<PHONE> tags.
    Pure codegen regex (one pass per pattern), the shape for redaction
    sweeps over a 100 TB corpus; the oracle replays with RE2 global
    replace.

    Counts are detections on the RAW text; the scrub is sequential
    (emails first, then phones on the already-tagged string), so a digit
    run adjacent to an email can be counted as a phone yet consumed by
    the email replacement — counts are detection totals, not a tag
    inventory of the scrubbed output (the oracle replays the same
    order)."""
    c = F.col(text_col)
    scrubbed = F.regexp_replace(
        F.regexp_replace(c, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return df.select(
        "doc_id",
        F.regexp_count(c, F.lit(EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count(c, F.lit(PHONE_RE)).cast("bigint").alias("n_phones"),
        F.length(scrubbed).cast("bigint").alias("scrubbed_len"),
    )


def vocab_top_terms(
    df: DataFrame,
    text_col: str = "text",
    k: int = 20,
    group_col: str | None = None,
) -> DataFrame:
    """Top-k most frequent tokens (globally or per group) — the vocabulary
    /stopword-discovery pass. explode -> count is the canonical heavy
    -shuffle shape, kept cheap by map-side partial aggregation (the
    shuffle carries (token, partial_count), not token instances); the
    final top-k is a TakeOrderedAndProject (global) or one rank window
    (grouped). Ties break on the token string for determinism."""
    w = words(F.lower(F.col(text_col)))
    toks = df.select(
        *([group_col] if group_col else []), F.explode(w).alias("token")
    )
    keys = ([group_col] if group_col else []) + ["token"]
    counts = toks.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    if group_col is None:
        return counts.orderBy(F.desc("n"), F.asc("token")).limit(k)
    from pyspark.sql import Window

    rk = F.row_number().over(
        Window.partitionBy(group_col).orderBy(F.desc("n"), F.asc("token"))
    )
    return (
        counts.withColumn("_rk", rk)
        .filter(F.col("_rk") <= k)
        .select(group_col, "token", "n", F.col("_rk").cast("bigint").alias("rank"))
    )


def cross_table_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    corpus_id: str = "doc_id",
    bench_id: str = "doc_id",
) -> DataFrame:
    """Decontamination screen: corpus documents whose normalized content
    exactly matches a benchmark/eval document. Both sides reduce to an
    md5 fingerprint BEFORE the join, so the shuffle carries 16-byte keys
    (and the benchmark side — small by nature — broadcasts); returns
    (bench_id, corpus_id, fingerprint) pairs to drop or audit. Near-dup
    decontamination composes the same way from minhash candidates."""
    fp = F.md5(F.lower(F.trim(F.col(text_col))))
    c = corpus.select(F.col(corpus_id).alias("corpus_id"), fp.alias("fingerprint"))
    b = benchmark.select(F.col(bench_id).alias("bench_id"), fp.alias("fingerprint"))
    return F.broadcast(b).join(c, "fingerprint").select(
        "bench_id", "corpus_id", "fingerprint"
    )


_RH_MOD = 2147483647  # 2^31 - 1: h*31 + c stays far below bigint overflow
_RH_SEED = 7


def _poly_hash(codes: Column) -> Column:
    return F.aggregate(
        codes,
        F.lit(_RH_SEED).cast("bigint"),
        lambda h, c: (h * 31 + c) % _RH_MOD,
    )


def rolling_hashes(
    df: DataFrame, text_col: str = "text", k: int = 8, strategy: str = "arrow"
) -> DataFrame:
    """(doc_id, rhash, min_kgram_hash) — Rabin-Karp rolling-hash
    fingerprints: the whole-document polynomial hash (base 31 mod 2^31-1
    over character codes) and the minimum k-char-gram hash (a winnowing-
    style content fingerprint that survives prefix/suffix edits).

    strategy="arrow" (default): one mapInArrow NumPy kernel computing the
    closed-form polynomial hashes in O(n) per document
    (functions.arrays.rolling_hash_kernel). The expression form below
    (strategy="sql") re-folds every k-gram with an interpreted HOF
    `aggregate` over per-character `slice`s — O(n·k) interpreted ops per
    row, the hottest loop of the near-dup screen at corpus scale — and is
    retained for differential testing. Both strategies are hash-identical
    (and match the DuckDB oracle) on BMP text; astral-plane codepoints
    differ in the sql form (Java splits them into surrogate halves).

    In the sql form the char-code array is bound once as a lambda variable
    (1-element-array trick) so CollapseProject cannot inline it into each
    consumer. Docs shorter than k fall back to the whole-document hash."""
    if strategy == "arrow":
        from ..functions.arrays import rolling_hashes_arrow

        return rolling_hashes_arrow(
            df, text_col, "doc_id", k, base=31, mod=_RH_MOD, seed=_RH_SEED
        )
    chars = F.filter(F.split(F.col(text_col), ""), lambda c: c != "")
    codes = F.transform(chars, lambda c: F.ascii(c).cast("bigint"))

    def both(cs: Column) -> Column:
        n = F.size(cs)
        whole = _poly_hash(cs)
        kgrams = F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: _poly_hash(F.slice(cs, i, k)),
        )
        mink = F.when(n < k, whole).otherwise(F.array_min(kgrams))
        return F.struct(whole.alias("rhash"), mink.alias("min_kgram_hash"))

    packed = F.element_at(F.transform(F.array(codes), both), 1)
    return df.select(
        "doc_id",
        packed["rhash"].alias("rhash"),
        packed["min_kgram_hash"].alias("min_kgram_hash"),
    )
