"""k-core extraction: iteratively peel nodes of degree < k until the
surviving subgraph is stable (every survivor has >= k surviving
neighbors) — the standard dense-subgraph / spam-farm / community-seed
primitive.

Deterministic replay contract: the peel is a synchronous fixpoint —
round i keeps exactly the nodes whose degree within round i-1's
subgraph is >= k. A fixed upper bound ``max_rounds`` makes the
operator replayable by a SQL engine as ``max_rounds`` unrolled rounds:
if the loop converges earlier, the extra rounds are no-ops on both
sides; if not, both sides have executed the identical round count —
either way the outputs agree bit-for-bit.

Scale shape: each round is two semi-joins (restrict the symmetric edge
set to survivors) + one count per node — all hash-partitioned on node
id; survivors shrink monotonically so rounds get cheaper. Lineage is
truncated with ``localCheckpoint`` per round. O(rounds) Spark jobs for
the early-exit check, like the BFS loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from net_spider_spark.sizing import count_and_fits
from net_spider_spark.reliability import materialize as _materialize


# Driver-local fast path bound (see traverse/components/pagerank: the
# snapshot graph is usually tiny next to its observation history).
_LOCAL_KCORE_MAX_EDGES = 2_000_000


def _local_kcore(spark, pairs, k, id_type):
    adj: dict = {}
    for s, t in pairs:
        adj.setdefault(s, set()).add(t)
        adj.setdefault(t, set()).add(s)
    alive = set(adj)
    while True:
        drop = {v for v in alive if len(adj[v] & alive) < k}
        if not drop:
            break
        alive -= drop
    rows = [(v, len(adj[v] & alive)) for v in sorted(alive)]
    return spark.createDataFrame(rows, f"node_id {id_type}, degree long")


def kcore(
    edges: DataFrame,
    k: int = 2,
    max_rounds: int = 30,
    local_threshold: int = _LOCAL_KCORE_MAX_EDGES,
) -> DataFrame:
    """DataFrame(src, dst) -> DataFrame(node_id, degree): the nodes of
    the k-core of the UNDIRECTED simple graph, with their degree
    inside the core."""
    # Symmetric closure as ONE conditional two-way explode instead of
    # a self-union (a union's two children re-execute the upstream
    # chain once per direction — see components.py). Replays the
    # original union's exact row multiset: the forward direction only
    # for non-null non-loop edges (the old pre-union filter), the
    # reversed direction unconditionally (the old union branch was
    # unfiltered), then distinct.
    und = (
        edges.select("src", "dst")
        .selectExpr(
            "inline(concat("
            "CASE WHEN src IS NOT NULL AND dst IS NOT NULL"
            " AND src != dst"
            " THEN array(named_struct('src', src, 'dst', dst))"
            " ELSE array() END,"
            " array(named_struct('src', dst, 'dst', src))))"
        )
        .distinct()
        .persist()
    )
    # symmetric set = 2x edges
    n_und, _local = count_and_fits(und, 2 * local_threshold, tag="kcore")
    if _local:
        try:
            seen = set()
            for r in und.collect():
                a, b = r["src"], r["dst"]
                if (b, a) not in seen:
                    seen.add((a, b))
            return _local_kcore(
                und.sparkSession,
                seen,
                k,
                und.schema["src"].dataType.simpleString(),
            )
        finally:
            und.unpersist()
    try:
        alive = und.select(F.col("src").alias("v")).distinct().transform(_materialize)
        n_alive = alive.count()
        for _ in range(max_rounds):
            deg = (
                und.join(alive.withColumnRenamed("v", "src"), "src")
                .join(alive.withColumnRenamed("v", "dst"), "dst")
                .groupBy(F.col("src").alias("v"))
                .agg(F.count(F.lit(1)).alias("deg"))
            )
            nxt = deg.where(F.col("deg") >= k).select("v").transform(_materialize)
            n_nxt = nxt.count()
            alive = nxt
            if n_nxt == n_alive or n_nxt == 0:
                break
            n_alive = n_nxt
        # Materialize before unpersisting ``und`` — returning the lazy
        # plan would silently recompute the symmetrized edge set from
        # source at the caller's action.
        out = (
            und.join(alive.withColumnRenamed("v", "src"), "src")
            .join(alive.withColumnRenamed("v", "dst"), "dst")
            .groupBy(F.col("src").alias("node_id"))
            .agg(F.count(F.lit(1)).cast("long").alias("degree"))
            .transform(_materialize)
        )
    finally:
        und.unpersist()
    return out
