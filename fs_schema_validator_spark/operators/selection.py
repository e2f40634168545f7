"""Data-selection operators for pretraining pipelines.

``dsir_importance`` scores every corpus document by how much it resembles a
target distribution (DSIR — Data Selection with Importance Resampling,
Xie et al. 2023, arXiv:2302.03169): unigrams are hashed into a fixed
number of buckets, a smoothed bucket distribution is estimated on the
target set and on the raw corpus, and each document's score is the sum of
per-token log-likelihood ratios log p_target(b) − log p_corpus(b).
High-scoring documents look like the target domain; selection is a filter
or weighted sample on the score.

Everything is pure Spark SQL expressions over one explode (whole-stage
codegen, no UDF): two bucket-count aggregations (map-side partials — the
shuffle carries at most `n_buckets` rows per partition), a broadcast join
of the tiny weight table, and one per-document sum. The bucket hash is the
engine-portable md5-prefix (sampling.split_bucket), so the driver's DuckDB
oracle replays the exact scores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import split_bucket
from .textstats import words


def _bucketed_tokens(
    df: DataFrame, text_col: str, id_col: str, n_buckets: int, salt: str
) -> DataFrame:
    """(id, bucket) one row per token; docs with null/empty text emit one
    NULL-bucket row (explode_outer) so per-doc aggregation keeps them."""
    w = F.explode_outer(words(F.lower(F.col(text_col)))).alias("_w")
    toks = df.select(F.col(id_col), w)
    return toks.select(
        id_col,
        F.when(
            F.col("_w").isNotNull(),
            split_bucket(F.col("_w"), n_buckets, salt=salt),
        ).alias("bucket"),
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
    """(id, n_words, dsir_score) for every corpus row.

    score(d) = Σ_tokens [ ln((T_b + α)/(T + α·B)) − ln((C_b + α)/(C + α·B)) ]

    with T_b/C_b the target/corpus counts of the token's hash bucket,
    T/C the total token counts, B = n_buckets, α the add-α smoothing that
    keeps buckets unseen in the target finite. Null/empty documents score
    0.0 with n_words = 0. The weight table is exactly B rows (buckets
    absent from BOTH sides cannot occur in the join), built from one
    full-outer merge of the two count aggregations and broadcast to the
    corpus token stream."""
    ct = _bucketed_tokens(corpus, text_col, id_col, n_buckets, salt)
    tt = _bucketed_tokens(target, text_col, id_col, n_buckets, salt)
    # The two count tables merge by UNION + one aggregation rather than a
    # full-outer join: full outer cannot broadcast in Spark, so even a
    # 256-row merge would plan a sort-merge join; the union shape is one
    # partial-agg shuffle over at most 2·B tagged rows per partition.
    tagged = ct.filter(F.col("bucket").isNotNull()).select(
        "bucket", F.lit(1).alias("c"), F.lit(0).alias("t")
    ).unionByName(
        tt.filter(F.col("bucket").isNotNull()).select(
            "bucket", F.lit(0).alias("c"), F.lit(1).alias("t")
        )
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
    scored = ct.join(F.broadcast(weights), "bucket", "left")
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.col("bucket")).alias("n_words"),
        F.sum(F.when(F.col("bucket").isNotNull(), F.col("w"))).alias("_s"),
    )
    return per_doc.select(
        id_col,
        F.col("n_words").cast("bigint").alias("n_words"),
        F.coalesce(F.round(F.col("_s"), digits), F.lit(0.0)).alias(
            "dsir_score"
        ),
    )
