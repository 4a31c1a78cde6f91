"""Reachability: iterative BFS as a driver-side loop of joins.

Parity target: the reference's unbounded Gremlin ``repeat(...out("finds")
...simplePath()).emit()`` traversal plus its client-side visited set
(``net-spider/src/NetSpider/Spider.hs:209-226,283-289``).

Spark has no recursive CTE, so reachability is a Python ``while`` loop,
one job per BFS level (SURVEY §4). Scale design:

* the edge list is projected to two columns and pre-partitioned by
  ``src`` ONCE (`repartition` + cache) — each level then shuffles only
  the (small) frontier, not the edges;
* the frontier is broadcast when below a threshold, so a level is a
  broadcast-hash join with zero edge movement;
* an anti-join against the visited set implements ``simplePath``/dedup;
* ``localCheckpoint`` truncates the growing lineage every level
  (without it, plan size grows linearly with depth and the driver
  dominates runtime);
* unlike the reference, which loops start nodes sequentially
  (Spider.hs:179-185), ALL start nodes ride in one frontier — a
  whole-graph BFS is the same cost as a single-source one.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Below this many frontier rows, broadcast it explicitly.
_BROADCAST_FRONTIER_MAX = 1_000_000


def reachable_nodes(
    edges: DataFrame,
    starts: DataFrame,
    max_hops: Optional[int] = None,
) -> DataFrame:
    """All nodes reachable from ``starts`` over directed ``edges``.

    ``edges``: DataFrame(src string, dst string); ``starts``:
    DataFrame(node_id string). Returns DataFrame(node_id string),
    including the start nodes themselves.

    The reference leaves a max-step bound as an unimplemented TODO
    (Spider.hs:254); ``max_hops`` implements it.
    """
    edges = (
        edges.select(F.col("src"), F.col("dst"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .repartition("src")
        .persist()
    )
    visited = starts.select("node_id").distinct().localCheckpoint(eager=True)
    frontier = visited
    hops = 0
    try:
        while True:
            if max_hops is not None and hops >= max_hops:
                break
            n_frontier = frontier.count()
            if n_frontier == 0:
                break
            f = (
                F.broadcast(frontier)
                if n_frontier <= _BROADCAST_FRONTIER_MAX
                else frontier
            )
            nxt = (
                edges.join(f, edges.src == f.node_id, "inner")
                .select(F.col("dst").alias("node_id"))
                .distinct()
                .join(visited, "node_id", "left_anti")
                .localCheckpoint(eager=True)
            )
            if nxt.isEmpty():
                break
            visited = visited.unionByName(nxt).localCheckpoint(eager=True)
            frontier = nxt
            hops += 1
    finally:
        edges.unpersist()
    return visited
