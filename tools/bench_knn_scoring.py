"""Operator-level A/B of ivf_knn_join candidate-scoring strategies.

Three physical strategies for the same logical batch kNN join:
  * cell  — cogrouped per-cell BLAS block matmul (cell_cosine_pairs_arrow);
            vectors cross the wire once per (home cell | probe), pairs
            ship 24 B.
  * pairs — cell equi-join + per-pair Arrow kernel (pairwise_cosine_arrow);
            every candidate row carries both vectors through the shuffle
            and the Python IPC.
  * hof   — cell equi-join + interpreted zip_with/aggregate cosine (the
            round-4 shape, reconstructed here for the A/B).

All three are verified to produce identical rounded rows before timing
(min of `passes` steady-state passes after one warmup). Two levels:
'batch' (queries = corpus/100 over a larger corpus) and 'graph'
(queries == corpus — the kNN-graph build). Candidate volume is
N_queries × probes × N/cells, so each level sizes its centroid count
to keep the interpreted HOF reference finishable; the CELL/PAIRS
ratios are what transfer to scale (their plans are volume-linear).

Usage: python tools/bench_knn_scoring.py  (levels are built in)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from fs_schema_validator_spark.session import get_spark  # noqa: E402
from fs_schema_validator_spark.operators import similarity  # noqa: E402

DIM = 64
K = 10
PROBES = 4
# (mode, corpus size, query stride, n_centroids): candidate pairs =
# (n/stride) * PROBES * n/cells — ~6M (batch) and ~12M (graph)
LEVELS = [
    ("batch", 200_000, 100, 256),
    ("graph", 20_000, 1, 128),
]


def build_corpus(
    spark, n: int, n_clusters: int = 16, noise: float = 1.0,
    manifold: bool = False,
):
    """n DIM-dim float32 vectors, two deterministic geometries. Default:
    a planted cluster direction (id % n_clusters) plus a per-row
    pseudo-random component of `noise` amplitude — the scoring A/B only
    needs volume. `manifold=True`: a smooth 1-D curve through the
    sphere (phase advances with id) plus tiny jitter, so true nearest
    neighbors are the adjacent ids (cos 0.998 at distance 1, noise
    floor by distance 50) — the LOCAL structure real embedding spaces
    have, which the kNN-graph recall probe needs (discrete micro-
    clusters tie-degenerate the PQ codes: every member quantizes
    identically and recall measures tie-breaking, not the index).
    Never zero-norm (id+1 keeps row 0 off the all-zero vector)."""
    if manifold:
        comp = lambda i: (
            F.sin((F.col("id") + 1) * 0.002 * (i * 0.37 + 1)) * 1.5
            + F.sin((F.col("id") + 1) * i * 0.618) * 0.05
        ).cast("float")
    else:
        # hash-based components: sin(id * c * i) noise ALIASES (ids ~10
        # apart share phase mod 2π and come out near-duplicate — it
        # poisoned the semantic-dedup probe with 75% phantom dups);
        # sin(xxhash64(...)) is effectively uniform and collision-free
        comp = lambda i: (
            F.sin(
                F.xxhash64(F.lit("c"), F.col("id") % n_clusters, i)
                .cast("double")
            )
            * 1.5
            + F.sin(F.xxhash64(F.lit("n"), F.col("id"), i).cast("double"))
            * noise
        ).cast("float")
    df = (
        spark.range(n)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(DIM)), comp
            ).alias("embedding"),
        )
        .repartition(32)
        .persist()
    )
    df.count()
    return df


def hof_knn_join(corpus, queries, k, centroids):
    """Round-4 shape: cell equi-join, interpreted HOF cosine per pair."""
    from fs_schema_validator_spark.functions.arrays import (
        ivf_assign_arrow,
        ivf_probe_cells_arrow,
    )
    from fs_schema_validator_spark.operators.similarity import (
        _dot,
        _norm,
        _per_query_topk,
    )

    corpus_cells = ivf_assign_arrow(corpus, centroids).filter(
        F.col("cell").isNotNull() & F.col("vec_id").isNotNull()
    )
    q_cells = ivf_probe_cells_arrow(
        queries.filter(F.col("vec_id").isNotNull()), centroids, PROBES
    ).withColumnRenamed("vec_id", "qid")
    cand = q_cells.join(corpus_cells, "cell").select("qid", "vec_id")
    qv = queries.select(
        F.col("vec_id").alias("qid"),
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "_qv"
        ),
    )
    cv = corpus.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "_cv"
        ),
    )
    scored = (
        cand.join(qv, "qid")
        .join(cv, "vec_id")
        .select(
            "qid",
            "vec_id",
            F.round(
                _dot(F.col("_qv"), F.col("_cv"))
                / (_norm(F.col("_qv")) * _norm(F.col("_cv"))),
                5,
            ).alias("cos"),
        )
    )
    return _per_query_topk(scored, "qid", "vec_id", k)


def time_min(fn, passes: int = 3) -> float:
    fn()
    best = float("inf")
    for _ in range(passes):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main() -> int:
    spark = get_spark(app_name="bench_knn_scoring")
    for mode, n, stride, cells in LEVELS:
        corpus = build_corpus(spark, n)
        queries = (
            corpus
            if stride == 1
            else corpus.filter(F.col("vec_id") % stride == 0)
        )
        seeds = similarity._collect_seed_matrix(
            corpus, cells, "embedding", "vec_id"
        )

        def plan(strategy):
            if strategy == "hof":
                return hof_knn_join(corpus, queries, K, seeds)
            return similarity.ivf_knn_join(
                corpus,
                queries,
                k=K,
                probes=PROBES,
                centroids=seeds,
                scoring=strategy,
            )

        def run(strategy):
            # aggregate a column that DEPENDS on the scored rows so
            # Catalyst can't prune the join (the BASELINE.md timing
            # caveat); sum(cos) is for the plan, not for equality —
            # fp aggregation order varies run to run
            return plan(strategy).agg(
                F.count("*"), F.sum("cos"), F.sum("qid")
            ).collect()

        base = plan("cell")
        for s in ("pairs", "hof"):
            other = plan(s)
            assert base.exceptAll(other).count() == 0, s
            assert other.exceptAll(base).count() == 0, s
        rec = {"n_vectors": n, "mode": mode, "n_cells": cells}
        for s in ("cell", "pairs", "hof"):
            rec[f"{s}_sec"] = round(time_min(lambda: run(s)), 2)
        rec["speedup_vs_pairs"] = round(
            rec["pairs_sec"] / rec["cell_sec"], 2
        )
        rec["speedup_vs_hof"] = round(rec["hof_sec"] / rec["cell_sec"], 2)
        print(json.dumps(rec), flush=True)
        corpus.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
