"""Connected components over snapshot links: iterative min-label
propagation (the classic GraphX-style algorithm as a DataFrame loop).

Not in the reference's operator set (its graphs are single DODAGs), but
the natural companion to root/depth analytics when a snapshot contains
multiple meshes — and the standard "is this one network or five"
question for topology monitoring.

Algorithm: every node starts labeled with its own ID; each round a
node's label becomes the min of its own and its neighbors' labels;
fixpoint after O(component diameter) rounds. Each round is one shuffle
keyed by node; ``localCheckpoint`` truncates lineage like the BFS loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, max_iter: int = 50
) -> DataFrame:
    """DataFrame(src, dst) -> DataFrame(node_id, component) where
    component = min node ID in the (undirected) component."""
    und = (
        edges.select("src", "dst")
        .unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .persist()
    )
    labels = (
        und.select(F.col("src").alias("node_id"))
        .distinct()
        .withColumn("component", F.col("node_id"))
        .localCheckpoint(eager=True)
    )
    try:
        for _ in range(max_iter):
            neighbor_min = (
                und.join(
                    labels.withColumnRenamed("node_id", "dst").withColumnRenamed(
                        "component", "_nc"
                    ),
                    "dst",
                )
                .groupBy(F.col("src").alias("node_id"))
                .agg(F.min("_nc").alias("_nmin"))
            )
            updated = (
                labels.join(neighbor_min, "node_id", "left")
                .select(
                    "node_id",
                    F.least(
                        F.col("component"), F.coalesce("_nmin", F.col("component"))
                    ).alias("component"),
                )
                .localCheckpoint(eager=False)
            )
            changed = (
                updated.alias("u")
                .join(labels.alias("l"), "node_id")
                .where(F.col("u.component") != F.col("l.component"))
                .limit(1)
                .count()
            )
            labels = updated
            if changed == 0:
                break
    finally:
        und.unpersist()
    return labels
