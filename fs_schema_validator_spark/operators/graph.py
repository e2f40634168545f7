"""Connected components over a pair list — the clustering step that turns
near-duplicate PAIRS (LSH/SimHash/embedding output) into dedup CLUSTERS
with one keeper per cluster.

Iterative min-label propagation: every node starts labeled with itself;
each round a node adopts the minimum label in its closed neighborhood;
fixpoint = every node carries its component's minimum id. Convergence takes
O(component diameter) rounds — and this engine's pair generators are
diameter-friendly by construction: `bucket_pairs`' capped output is a
clique plus a star around the bucket minimum (diameter <= 2 per bucket, so
a handful of rounds even for chained clusters).

Spark shape per round: ONE shuffle (groupBy of the neighbor-label join) on
(node, label) int pairs — never the documents. Lineage is truncated with
localCheckpoint every round so the plan doesn't grow with the iteration
count (the standard pattern for iterative DataFrame algorithms), and the
per-round convergence check rides the same job via an Observation rather
than a second count action. For billion-edge graphs swap the fixpoint loop
for the large-star/small-star variant (O(log n) rounds); the driver-side
loop itself is the correct shape — iteration count is bounded and tiny,
each round is fully distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, cluster) for every node appearing in `edges`; `cluster` is
    the minimum node id of its connected component. Deterministic.

    Raises RuntimeError if the fixpoint is not reached in `max_iter`
    rounds (a diameter-`max_iter` component — raise the bound or use the
    star-contraction variant)."""
    a, b = F.col(src).alias("a"), F.col(dst).alias("b")
    und = (
        edges.select(a, b)
        .unionByName(
            edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
        )
        # materialize the edge list ONCE: it is consumed by every round's
        # neighbor join, and its lineage is typically the whole candidate
        # pipeline (LSH banding over the corpus) — without this each round
        # re-executes that pipeline. (localCheckpoint blocks are not
        # replicated: an executor loss mid-fixpoint fails the job instead
        # of recomputing — acceptable for a loop this short; use
        # reliable checkpointing for hour-long graph jobs.)
        .localCheckpoint(eager=True)
    )
    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("cluster"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        from pyspark.sql import Observation

        # min label over the closed neighborhood: own label + each
        # neighbor's current label, one groupBy
        neighbor = (
            und.join(labels, und["b"] == labels["node"])
            .select(F.col("a").alias("node"), "cluster")
        )
        proposed = (
            labels.unionByName(neighbor)
            .groupBy("node")
            .agg(F.min("cluster").alias("cluster"))
        )
        obs = Observation()
        joined = (
            proposed.alias("n")
            .join(labels.alias("o"), "node")
            .observe(
                obs,
                F.sum(
                    (F.col("n.cluster") != F.col("o.cluster")).cast("long")
                ).alias("changed"),
            )
            .select("node", F.col("n.cluster").alias("cluster"))
        )
        labels = joined.localCheckpoint(eager=True)
        if int(obs.get["changed"] or 0) == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def dedup_cluster_summary(
    edges: DataFrame, src: str = "doc_a", dst: str = "doc_b"
) -> DataFrame:
    """(cluster, n_docs, keeper, dropped) per component: the actionable
    dedup verdict — keep the minimum id, drop the rest."""
    cc = connected_components(edges, src, dst)
    return (
        cc.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("node").alias("keeper"),
            F.sort_array(
                F.collect_list(F.when(F.col("node") != F.col("cluster"), F.col("node")))
            ).alias("dropped"),
        )
    )
