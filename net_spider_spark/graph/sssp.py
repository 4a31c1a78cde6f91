"""Weighted single-source(-set) shortest paths over snapshot link
graphs: synchronous Bellman-Ford rounds.

The reference's traversal (`net-spider/src/NetSpider/Spider.hs:175-254`)
is an unweighted BFS reachability walk (see ``traverse.py``); shortest
*weighted* distance is the natural extension once links carry numeric
attributes — and the shape that matters at scale: each round is one
hash-partitioned join (frontier x static edge list) plus one
map-side-combinable ``min`` per destination, exactly the PageRank loop
with ``min`` instead of ``sum``.

Determinism: weights are BIGINT and distances are integer sums, so
every engine agrees bit-for-bit (no float reduction-order drift). After
``max_hops`` rounds the result is the minimum distance over paths of at
most ``max_hops`` edges — a well-defined contract that a DuckDB
recursive CTE mirrors exactly (bounded recursion also keeps cyclic
graphs terminating on both engines).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from net_spider_spark.sizing import count_and_fits
from net_spider_spark.reliability import (
    materialize as _materialize,
    materialize_lazy as _materialize_lazy,
)

# Same rationale as pagerank._LOCAL_PR_MAX_EDGES: below this many
# distinct edges the per-round Spark jobs are pure scheduling overhead
# and a driver-local loop (identical integer arithmetic) wins.
_LOCAL_SSSP_MAX_EDGES = 2_000_000


def _local_sssp(spark, rows, sources, max_hops, id_type):
    adj: dict = {}
    for s, t, w in rows:
        adj.setdefault(s, []).append((t, w))
    dist = {s: 0 for s in sources}
    for _ in range(max_hops):
        updates = {}
        for n, d in dist.items():
            for t, w in adj.get(n, ()):
                nd = d + w
                if nd < dist.get(t, nd + 1) and nd < updates.get(t, nd + 1):
                    updates[t] = nd
        if not updates:
            break
        dist.update(updates)
    out = sorted(dist.items())
    return spark.createDataFrame(out, f"node_id {id_type}, dist bigint")


def shortest_paths(
    edges: DataFrame,
    sources: Sequence[str],
    max_hops: int = 6,
    checkpoint_every: int = 3,
    local_threshold: int = _LOCAL_SSSP_MAX_EDGES,
) -> DataFrame:
    """DataFrame(src, dst, weight BIGINT) + source node IDs ->
    DataFrame(node_id, dist): minimum total weight over directed paths
    of at most ``max_hops`` edges from any source. Unreached nodes are
    absent (the traversal's visited-set contract, Spider.hs:175-185).
    """
    e = (
        edges.select("src", "dst", F.col("weight").cast("long").alias("weight"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.min("weight").alias("weight"))
        .persist()
    )
    spark = e.sparkSession
    id_type = e.schema["src"].dataType.simpleString()
    n_edges, _local = count_and_fits(e, local_threshold, tag="sssp")
    if _local:
        try:
            rows = [(r["src"], r["dst"], r["weight"]) for r in e.collect()]
            return _local_sssp(spark, rows, list(sources), max_hops, id_type)
        finally:
            e.unpersist()

    try:
        dist = spark.createDataFrame(
            [(s, 0) for s in sources], f"node_id {id_type}, dist bigint"
        )
        for i in range(max_hops):
            relaxed = (
                dist.join(e, dist.node_id == e.src)
                .select(
                    F.col("dst").alias("node_id"),
                    (F.col("dist") + F.col("weight")).alias("dist"),
                )
            )
            dist = (
                dist.unionByName(relaxed)
                .groupBy("node_id")
                .agg(F.min("dist").alias("dist"))
            )
            if (i + 1) % checkpoint_every == 0 and i + 1 < max_hops:
                dist = dist.transform(_materialize_lazy)
        # Materialize before unpersisting ``e`` — the lazy plan holds
        # max_hops references to the edge table and would recompute it
        # from source that many times at the caller's action.
        dist = dist.transform(_materialize)
    finally:
        e.unpersist()
    return dist
