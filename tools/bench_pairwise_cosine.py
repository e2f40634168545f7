"""A/B probe: HOF-lambda cosine vs the pairwise_cosine_arrow kernel on a
corpus-wide candidate stream.

Round-4 verdict flagged `ivf_knn_join`'s candidate scoring as the one
remaining non-codegen HOF path on a corpus-wide stream (Spark HOF lambdas
— zip_with/aggregate — are interpreted per element). This probe times both
scorings over the SAME materialized (qid, id, qv, cv) pair table at two
sizes, fresh pair data each size, min of `passes` steady-state passes
after one warmup.

MEASURED RESULT (the probe's reason to exist in the repo): the verdict's
hypothesized fix LOSES — at dim 64 the per-pair kernel runs 0.5-0.6x the
HOF path, because each pair row ships 2x256 B of vectors through the
shuffle and Arrow IPC while the kernel's compute is only 1.6 us/row. The
payload, not the interpreter, is the hot term on Spark 4.1; the fix that
actually won is the cogrouped per-cell BLAS scorer
(cell_cosine_pairs_arrow, see tools/bench_knn_scoring.py: 8-10x over
HOF). This probe stays as the evidence for that design decision.

Usage: python tools/bench_pairwise_cosine.py [n_pairs ...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from fs_schema_validator_spark.session import get_spark  # noqa: E402
from fs_schema_validator_spark.functions.arrays import (  # noqa: E402
    pairwise_cosine_arrow,
)
from fs_schema_validator_spark.operators.similarity import (  # noqa: E402
    _dot,
    _norm,
)

DIM = 64


def build_pairs(spark, n_pairs: int):
    """Deterministic (qid, id, qv, cv) pair table, DIM-dim doubles —
    the exact shape the kNN joins' candidate stream has after the cell
    equi-join (vectors already joined on)."""
    df = (
        spark.range(n_pairs)
        .select(
            (F.col("id") % 997).alias("qid"),
            F.col("id").alias("vid"),
            F.transform(
                F.sequence(F.lit(1), F.lit(DIM)),
                lambda i: (F.sin(F.col("id") * i) + F.lit(1.5)).cast(
                    "double"
                ),
            ).alias("qv"),
            F.transform(
                F.sequence(F.lit(1), F.lit(DIM)),
                lambda i: (F.cos(F.col("id") * i) + F.lit(1.5)).cast(
                    "double"
                ),
            ).alias("cv"),
        )
        .repartition(32)
    )
    df = df.persist()
    df.count()
    return df


def time_min(fn, passes: int = 3) -> float:
    fn()  # warmup (JIT / Arrow init)
    best = float("inf")
    for _ in range(passes):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main() -> int:
    sizes = [int(a) for a in sys.argv[1:]] or [100_000, 1_000_000]
    spark = get_spark(app_name="bench_pairwise_cosine")
    out = {"dim": DIM, "passes": 3, "levels": []}
    for n in sizes:
        pairs = build_pairs(spark, n)

        def run_hof():
            return (
                pairs.select(
                    "qid",
                    "vid",
                    F.round(
                        _dot(F.col("qv"), F.col("cv"))
                        / (_norm(F.col("qv")) * _norm(F.col("cv"))),
                        5,
                    ).alias("cos"),
                )
                .agg(F.sum("cos"), F.count("cos"))
                .collect()
            )

        def run_kernel():
            return (
                pairwise_cosine_arrow(pairs, DIM, "qv", "cv", "qid", "vid")
                .select("qid", "vid", F.round(F.col("cos"), 5).alias("cos"))
                .agg(F.sum("cos"), F.count("cos"))
                .collect()
            )

        hof_vals = run_hof()
        ker_vals = run_kernel()
        assert [tuple(r) for r in hof_vals] == [tuple(r) for r in ker_vals], (
            hof_vals,
            ker_vals,
        )
        hof = time_min(run_hof)
        ker = time_min(run_kernel)
        pairs.unpersist()
        out["levels"].append(
            {
                "n_pairs": n,
                "hof_sec": round(hof, 3),
                "kernel_sec": round(ker, 3),
                "speedup": round(hof / ker, 2),
            }
        )
        print(json.dumps(out["levels"][-1]), flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
