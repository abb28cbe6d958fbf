"""Distributed connected components — the clustering step of a dedup
pipeline: near-dup PAIRS (from LSH/SimHash/embedding candidates) become
CLUSTERS, and each cluster keeps one canonical document.

Reference parity: the reference repo (flink-essentials) has no graph
or dedup layer; this backs the LLM-training-data extension surface
(SURVEY.md §2.11), built from the public literature cited below.

Algorithm: iterative min-label propagation. Every node starts labeled
with itself; each round every node takes the minimum label among itself
and its neighbors; convergence when a round changes nothing. Rounds
needed = graph diameter — near-dup clusters are dense and shallow
(diameter a handful), so this settles in a few rounds. For adversarial
long-chain graphs at 100 TB the round count is the known weakness; the
documented upgrade path is the alternating large-star/small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC 2014) which converges in O(log n) rounds with the same
per-round join shape — the driver loop below swaps in unchanged.

Each round is one shuffle (edge-label join + min-aggregate). Lineage is
cut every round with localCheckpoint so the plan does not grow with
iterations (at cluster scale, use a reliable checkpoint dir instead).
The convergence test piggybacks on the propagation aggregate (a
max(changed) over the same round's result) — one job per round, no
second pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """(src, dst) edge list -> (node, cluster_id), cluster_id = min
    node id in the component. Nodes are whatever appears in the edge
    list (isolated documents never enter the pair stream)."""
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        e.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr_min = (
            e.join(
                labels.select(
                    F.col("node").alias("b"), F.col("label").alias("nbr_label")
                ),
                "b",
            )
            .groupBy("a")
            .agg(F.min("nbr_label").alias("nbr_min"))
        )
        stepped = (
            labels.join(nbr_min, labels["node"] == nbr_min["a"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_min"), F.col("label"))
                ).alias("label"),
                (F.coalesce(F.col("nbr_min"), F.col("label")) < F.col("label")).alias(
                    "changed"
                ),
            )
            .localCheckpoint()  # materializes this round once; reused below
        )
        labels = stepped.select("node", "label")
        if stepped.agg(F.max("changed")).first()[0] is not True:
            break
    return labels.select("node", F.col("label").alias("cluster_id"))
