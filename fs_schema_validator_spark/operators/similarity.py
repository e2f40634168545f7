"""Similarity search over embedding columns.

* ``cosine_scores`` — brute-force cosine against one query vector as a pure
  JVM expression (zip_with/aggregate): the exact baseline. One scan, no
  shuffle, trivially data-parallel — at 10^12 rows this is scan-bound.
* ``topk_cosine`` — exact top-k via per-partition top-k then global merge
  (orderBy+limit lets Catalyst run TakeOrderedAndProject — no full sort).
* ``lsh_bucketed_topk`` — the scale path: random-hyperplane LSH buckets
  (sign bits of fixed pseudo-random projections), search only the query's
  bucket (and optionally neighboring probes). Signature computation is a
  JVM expression; bucketing is a groupBy-free filter on equality.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_scores(
    df: DataFrame,
    query: list[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    digits: int = 5,
) -> DataFrame:
    """(id, cos) cosine similarity of every row against `query` (rounded for
    engine-portable comparison)."""
    q = F.array(*[F.lit(float(x)) for x in query])
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    cos = _dot(v, q) / (_norm(v) * _norm(q))
    return df.select(F.col(id_col), F.round(cos, digits).alias("cos"))


def topk_cosine(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine; deterministic tie-break on id."""
    scored = cosine_scores(df, query, vec_col, id_col)
    return scored.orderBy(F.desc("cos"), F.asc(id_col)).limit(k)


# ---------------------------------------------------------------------------
# LSH (random hyperplane) — the 100 TB path


def _projection_matrix(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG, no numpy dependency in
    the plan; tiny driver-side constant folded into the expression)."""
    state = seed & 0x7FFFFFFF
    planes = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) % (1 << 31)
            row.append((state / float(1 << 31)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def hyperplane_signature(
    vec: Column, planes: list[list[float]]
) -> Column:
    """Bit-pack sign(v·p_i) into a bigint bucket id — one expression."""
    sig = F.lit(0).cast("bigint")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(x) for x in plane])
        bit = F.when(_dot(vec, p) >= 0, F.lit(1 << i).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        sig = sig + bit
    return sig


def near_dup_pairs(
    df: DataFrame,
    dim: int,
    threshold: float = 0.9,
    n_planes: int = 16,
    bands: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    digits: int = 5,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs at scale: multi-band
    random-hyperplane LSH proposes candidates, exact cosine (double math)
    verifies them.

    Signature = n_planes sign bits; a pair is a candidate if ANY of the
    `bands` bit-bands matches (near-identical vectors agree on almost every
    plane, so per-band miss probability is (θ/π)-small and banding drives
    recall to ~1). Candidates come from one groupBy per band key —
    shuffle keys are (band, chunk) ints, no self-join — and the exact
    score join touches only candidate participants."""
    bits_per_band = n_planes // bands
    planes = _projection_matrix(dim, n_planes, seed)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    sig = hyperplane_signature(v, planes)
    banded = df.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(sig, i * bits_per_band)
                        .bitwiseAND(F.lit((1 << bits_per_band) - 1))
                        .alias("chunk"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.chunk")
    groups = (
        banded.groupBy("band", "chunk")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    pair_expr = F.flatten(
        F.transform(
            F.col("ids"),
            lambda a, i: F.filter(
                F.transform(
                    F.col("ids"),
                    lambda b, j: F.when(
                        j > i, F.struct(a.alias("id_a"), b.alias("id_b"))
                    ),
                ),
                lambda s: s.isNotNull(),
            ),
        )
    )
    cand = (
        groups.select(F.explode(pair_expr).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )
    left = df.select(
        F.col(id_col).alias("id_a"), v.alias("va")
    )
    right = df.select(
        F.col(id_col).alias("id_b"), v.alias("vb")
    )
    scored = cand.join(left, "id_a").join(right, "id_b")
    cos = _dot(F.col("va"), F.col("vb")) / (
        _norm(F.col("va")) * _norm(F.col("vb"))
    )
    return (
        scored.select("id_a", "id_b", F.round(cos, digits).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


def lsh_bucketed_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    n_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only rows in the query's LSH bucket.

    With B = 2^n_planes buckets the candidate set is ~N/B of the corpus;
    partition pruning applies if the table is written bucketed by the
    signature (the intended layout at scale)."""
    dim = len(query)
    planes = _projection_matrix(dim, n_planes, seed)
    qsig = 0
    for i, plane in enumerate(planes):
        if sum(a * b for a, b in zip(query, plane)) >= 0:
            qsig |= 1 << i
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    bucketed = df.withColumn("_sig", hyperplane_signature(v, planes))
    candidates = bucketed.filter(F.col("_sig") == qsig)
    return topk_cosine(candidates, query, k, vec_col, id_col)
