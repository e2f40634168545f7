"""Data-selection operators for pretraining pipelines.

``dsir_importance`` scores every corpus document by how much it resembles a
target distribution (DSIR — Data Selection with Importance Resampling,
Xie et al. 2023, arXiv:2302.03169): unigrams are hashed into a fixed
number of buckets, a smoothed bucket distribution is estimated on the
target set and on the raw corpus, and each document's score is the sum of
per-token log-likelihood ratios log p_target(b) − log p_corpus(b).
High-scoring documents look like the target domain; selection is a filter
or weighted sample on the score.

``classifier_score`` completes the selection triad (CCNet perplexity /
DSIR importance / quality classifier): fastText-style linear-model
inference over hashed word unigrams + bigrams with a broadcast weight
table — the "trained classifier" stage of GPT-3-style quality filtering.

Everything is pure Spark SQL expressions over one explode (whole-stage
codegen, no UDF). The corpus is tokenized and hashed ONCE into a cached
per-(doc, bucket) count table; the global bucket counts, the broadcast
weight join, and the per-document score all derive from that table, so no
branch re-executes the explode + md5 lineage. The bucket hash is the
engine-portable md5-prefix (sampling.split_bucket), so the driver's DuckDB
oracle replays the exact scores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import split_bucket
from .textstats import words


def _doc_bucket_counts(
    df: DataFrame, text_col: str, id_col: str, n_buckets: int, salt: str
) -> DataFrame:
    """(id, bucket, k) token counts per document and hash bucket; docs
    with null/empty text keep one (id, NULL, 1) sentinel row
    (explode_outer + null-propagating hash) so per-doc aggregation never
    loses them. The explode's shuffle is immediately collapsed by the
    map-side partial aggregation — at most n_buckets+1 rows per document
    survive per partition."""
    w = F.explode_outer(words(F.lower(F.col(text_col)))).alias("_w")
    toks = df.select(F.col(id_col), w)
    # split_bucket propagates NULL words to a NULL bucket (md5(concat(
    # salt, NULL)) is NULL), which is exactly the sentinel we need
    return (
        toks.select(
            id_col, split_bucket(F.col("_w"), n_buckets, salt=salt).alias("bucket")
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("k"))
    )


def dsir_importance(
    corpus: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    alpha: float = 1.0,
    salt: str = "dsir",
    digits: int = 4,
) -> DataFrame:
    """(id, n_words, dsir_score) — one row per distinct corpus id.
    Corpus ids are expected unique and non-null (the documents-table
    contract the dedup and profiling operators share); duplicate ids
    would merge into one summed row, null ids into one null-keyed row.

    score(d) = Σ_tokens [ ln((T_b + α)/(T + α·B)) − ln((C_b + α)/(C + α·B)) ]

    with T_b/C_b the target/corpus counts of the token's hash bucket,
    T/C the total token counts, B = n_buckets, α the add-α smoothing that
    keeps buckets unseen in the target finite. Null/empty documents score
    0.0 with n_words = 0. The weight table is at most B rows, built from
    a union-aggregate merge of the two count tables (a full-outer join
    cannot broadcast and would plan a sort-merge join) and broadcast to
    the per-document counts. The cached per-(doc, bucket) table is
    tracked — release with functions.cache.release_all() after the
    action, like the dedup operators."""
    from ..functions.cache import track

    pdc = track(
        _doc_bucket_counts(corpus, text_col, id_col, n_buckets, salt).cache()
    )
    cb = (
        pdc.filter(F.col("bucket").isNotNull())
        .groupBy("bucket")
        .agg(F.sum("k").alias("c"))
    )
    tb = (
        _doc_bucket_counts(target, text_col, id_col, n_buckets, salt)
        .filter(F.col("bucket").isNotNull())
        .groupBy("bucket")
        .agg(F.sum("k").alias("t"))
    )
    tagged = cb.select(
        "bucket", F.col("c"), F.lit(0).cast("bigint").alias("t")
    ).unionByName(
        tb.select("bucket", F.lit(0).cast("bigint").alias("c"), F.col("t"))
    )
    merged = tagged.groupBy("bucket").agg(
        F.sum("c").alias("c"), F.sum("t").alias("t")
    )
    # Totals via a single-row cross join: `merged` is at most B rows, so
    # the two-pass shape (agg + join) is driver-free and trivially cheap.
    totals = merged.agg(
        F.sum("c").alias("c_tot"), F.sum("t").alias("t_tot")
    )
    b = float(n_buckets)
    weights = merged.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("t") + alpha) / (F.col("t_tot") + alpha * b))
            - F.log((F.col("c") + alpha) / (F.col("c_tot") + alpha * b))
        ).alias("w"),
    )
    scored = pdc.join(F.broadcast(weights), "bucket", "left")
    per_doc = scored.groupBy(id_col).agg(
        F.sum(F.when(F.col("bucket").isNotNull(), F.col("k"))).alias("_n"),
        F.sum(
            F.when(F.col("bucket").isNotNull(), F.col("k") * F.col("w"))
        ).alias("_s"),
    )
    return per_doc.select(
        id_col,
        F.coalesce(F.col("_n"), F.lit(0)).cast("bigint").alias("n_words"),
        F.coalesce(F.round(F.col("_s"), digits), F.lit(0.0)).alias(
            "dsir_score"
        ),
    )


def classifier_score(
    corpus: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 512,
    bias: float = 0.0,
    word_ngrams: int = 2,
    salt: str = "clf",
    digits: int = 4,
) -> DataFrame:
    """(id, n_features, clf_score) — fastText-style linear quality
    classifier INFERENCE (Joulin et al. 2016, arXiv:1607.01759; the
    quality-filter stage of CCNet/GPT-3-style pipelines): each document
    is a hashed bag of word unigrams (+ word bigrams when
    ``word_ngrams=2``, fastText's wordNgrams), the logit is the mean
    feature weight plus a bias, and the score is its sigmoid.

        logit(d) = bias + (1/n) Σ_features k_f · w[bucket(f)]
        clf_score = round(1 / (1 + exp(-logit)), digits)

    ``weights`` is the trained model: a (bucket bigint, w double) table
    of at most ``n_buckets`` rows (trained offline — logistic regression
    over the same hashed features — or synthesized for fixtures). It is
    broadcast; features whose bucket is absent weigh 0. Documents with
    no features (null/empty text) score sigmoid(bias) with
    n_features = 0. Bigram feature strings are the two words joined by a
    single space — unigrams never contain whitespace, so the feature
    namespaces cannot alias.

    Scale shape (the dsir_importance sibling): pure codegen — tokenize +
    hash once, one explode into per-(doc, bucket) counts collapsed by
    map-side partial aggregation (≤ n_buckets+1 surviving rows per doc),
    one broadcast join against the ≤n_buckets-row model, one per-doc
    rollup. No UDF, no Python in the hot path; the bucket hash is the
    engine-portable md5 prefix so a SQL oracle replays scores exactly up
    to fp addition order."""
    if word_ngrams not in (1, 2):
        raise ValueError(f"word_ngrams must be 1 or 2, got {word_ngrams}")
    empty_s = F.array().cast("array<string>")
    # bind the token array ONCE via the 1-element-array trick —
    # referencing the tokenize expression inside per-element lambdas
    # would inline it per feature (CollapseProject)
    feats = F.flatten(
        F.transform(
            F.array(words(F.lower(F.col(text_col)))),
            lambda t: F.concat(
                t,
                (
                    F.when(
                        F.size(t) >= 2,
                        F.transform(
                            # guarded: sequence(2, 1) DESCENDS in Spark
                            F.sequence(F.lit(2), F.size(t)),
                            lambda i: F.concat(
                                F.element_at(t, i - 1),
                                F.lit(" "),
                                F.element_at(t, i),
                            ),
                        ),
                    ).otherwise(empty_s)
                    if word_ngrams == 2
                    else empty_s
                ),
            ),
        )
    )
    # explode_outer sentinel: a featureless doc keeps one (id, NULL)
    # row, so the rollup needs no join back (the _doc_bucket_counts
    # pattern); split_bucket propagates NULL to a NULL bucket
    counts = (
        corpus.select(F.col(id_col), F.explode_outer(feats).alias("_f"))
        .select(
            id_col,
            split_bucket(F.col("_f"), n_buckets, salt=salt).alias("bucket"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    scored = counts.join(F.broadcast(weights), "bucket", "left")
    real = F.col("bucket").isNotNull()
    per = scored.groupBy(id_col).agg(
        F.sum(F.when(real, F.col("k")).otherwise(F.lit(0))).alias("_n"),
        F.sum(
            F.when(real, F.col("k") * F.coalesce(F.col("w"), F.lit(0.0)))
        ).alias("_s"),
    )
    n = F.coalesce(F.col("_n"), F.lit(0)).cast("bigint")
    logit = F.lit(float(bias)) + F.when(
        n > 0, F.col("_s") / F.col("_n")
    ).otherwise(F.lit(0.0))
    return per.select(
        id_col,
        n.alias("n_features"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), digits).alias(
            "clf_score"
        ),
    )


def bigram_cross_entropy(
    corpus: DataFrame,
    lm_corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    alpha: float = 1.0,
    salt: str = "blm",
    digits: int = 4,
) -> DataFrame:
    """(id, n_bigrams, cross_entropy) — each document's mean negative
    log-probability under an add-alpha-smoothed hashed-BIGRAM model
    counted on `lm_corpus` (the CCNet-style perplexity quality filter:
    documents unlike the clean reference corpus score high and get
    bucketed out; DSIR's unigram LLR is the importance-weighting
    sibling, this is the sequential-context one).

    P(b | a) = (C(a,b) + alpha) / (C(a) + alpha * B) over B-bucket word
    hashes (the engine-portable md5 prefix, so the DuckDB oracle replays
    scores exactly up to fp addition order — every log argument is a
    function of integer counts). xent = -1/n * sum ln P over a doc's n
    bigrams; docs with < 2 words report (0, 0.0).

    Scale shape: pure codegen SQL — one explode per side into
    per-(doc, a, b) partial-agg counts (explode_outer sentinels keep
    zero-bigram docs without a join back to the source); the model is
    at most B^2 + B rows, cached + broadcast onto the corpus counts;
    one per-doc rollup. No Python, no UDF."""

    def pair_counts(df: DataFrame) -> DataFrame:
        hb = F.transform(
            words(F.lower(F.col(text_col))),
            lambda t: split_bucket(t, n_buckets, salt=salt),
        )
        # bind the bucket array ONCE via the 1-element-array trick:
        # referencing `hb` inside the per-index lambda would inline the
        # whole tokenize+hash expression per element (CollapseProject)
        pairs = F.flatten(
            F.transform(
                F.array(hb),
                lambda h: F.when(
                    F.size(h) >= 2,
                    F.transform(
                        F.sequence(F.lit(2), F.size(h)),
                        lambda i: F.struct(
                            F.element_at(h, i - 1).alias("a"),
                            F.element_at(h, i).alias("b"),
                        ),
                    ),
                ).otherwise(
                    F.array().cast("array<struct<a:bigint,b:bigint>>")
                ),
            )
        )
        # explode_outer sentinel: a doc with < 2 words keeps one
        # (id, NULL, NULL) row, so the per-doc rollup never needs a
        # join back to the source (the _doc_bucket_counts pattern)
        return (
            df.select(F.col(id_col), F.explode_outer(pairs).alias("p"))
            .select(id_col, "p.a", "p.b")
            .groupBy(id_col, "a", "b")
            .agg(F.count(F.lit(1)).alias("k"))
        )

    from ..functions.cache import track

    # the tiny (<= B^2-row) pair-count model feeds BOTH broadcast
    # tables; uncached, ca's derivation would re-run the whole LM-side
    # explode + hash lineage a second time — tracked like dsir's pdc,
    # release with functions.cache.release_all() after the action
    cab = track(
        pair_counts(lm_corpus)
        .filter(F.col("a").isNotNull())
        .groupBy("a", "b")
        .agg(F.sum("k").alias("cab"))
        .cache()
    )
    ca = cab.groupBy("a").agg(F.sum("cab").alias("ca"))
    pdc = pair_counts(corpus)
    logp = F.log(
        (F.coalesce(F.col("cab"), F.lit(0)) + F.lit(float(alpha)))
        / (
            F.coalesce(F.col("ca"), F.lit(0))
            + F.lit(float(alpha) * n_buckets)
        )
    )
    # two separate left joins: an unseen (a, b) pair still needs C(a)
    # when the CONTEXT bucket was seen, so the context totals cannot
    # ride the pair-count join; sentinel (NULL, NULL) rows match
    # neither and contribute 0 to both sums
    scored = (
        pdc.join(F.broadcast(cab), ["a", "b"], "left")
        .join(F.broadcast(ca), "a", "left")
        .withColumn("_lp", logp)
    )
    real = F.col("a").isNotNull()
    per = scored.groupBy(id_col).agg(
        F.sum(F.when(real, F.col("k")).otherwise(F.lit(0))).alias("_n"),
        F.sum(F.when(real, F.col("k") * F.col("_lp"))).alias("_s"),
    )
    n = F.coalesce(F.col("_n"), F.lit(0)).cast("bigint")
    return per.select(
        id_col,
        n.alias("n_bigrams"),
        F.when(
            n > 0, F.round(-F.col("_s") / F.col("_n"), digits)
        )
        .otherwise(F.lit(0.0))
        .alias("cross_entropy"),
    )
