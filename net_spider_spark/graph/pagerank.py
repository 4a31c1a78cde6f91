"""PageRank over snapshot link graphs: fixed-iteration power method,
GraphX ``staticPageRank`` conventions.

Semantics (deterministic, reproducible anywhere): FIXED-POINT power
iteration in integer micro-units. With damping d = d_num/1000:
  pr_0(v) = 1_000_000
  pr_{t+1}(v) = (1_000_000 * (1000 - d_num)) // 1000
                + (d_num * sum_{u->v} (pr_t(u) // outdeg(u))) // 1000
over the DISTINCT directed edge set with self-loops dropped, reported
as pr / 1e6. Dangling nodes simply leak mass (no redistribution),
matching GraphX's static variant. Integer arithmetic is the point:
floating-point partial sums are ORDER-dependent at ~1e-15 per round,
the engines (Spark / DuckDB / Python) all reduce in different orders,
and any post-hoc grid rounding systematically lands on half-way
boundaries after a few rounds — whereas integer sums and divisions are
bit-exact everywhere. The truncation bias (< outdeg micro-units per
round) is orders of magnitude below anything rank-relevant.

Scale shape: the out-degree edge list is computed once and persisted;
each iteration is one join (edge list x current ranks, both
hash-partitioned on the join key) + one map-side-combinable sum per
destination. ``localCheckpoint`` every few rounds truncates the
growing lineage exactly like the BFS/components loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from net_spider_spark.sizing import count_and_fits
from net_spider_spark.reliability import (
    materialize as _materialize,
    materialize_lazy as _materialize_lazy,
)

#: fixed-point scale: 1.0 == 1e6 micro-units
_SCALE = 1_000_000

# Same rationale as components._LOCAL_CC_MAX_EDGES: snapshot graphs are
# usually tiny next to their observation history — below this many
# distinct edges the iterative Spark rounds are pure scheduling
# overhead, and a driver-local power iteration (identical integer
# arithmetic) wins by an order of magnitude.
_LOCAL_PR_MAX_EDGES = 2_000_000


def _damping_ints(damping: float) -> tuple[int, int]:
    d_num = int(round(damping * 1000))
    if not 0 <= d_num <= 1000:
        raise ValueError(f"damping out of range: {damping}")
    return d_num, (_SCALE * (1000 - d_num)) // 1000


def _local_pagerank(spark, pairs, n_iter, damping, id_type):
    d_num, base_int = _damping_ints(damping)
    out: dict = {}
    nodes = set()
    for s, t in pairs:
        out.setdefault(s, []).append(t)
        nodes.add(s)
        nodes.add(t)
    pr = {v: _SCALE for v in nodes}
    for _ in range(n_iter):
        acc = {v: 0 for v in nodes}
        for s, ts in out.items():
            share = pr[s] // len(ts)
            for t in ts:
                acc[t] += share
        pr = {v: base_int + (d_num * acc[v]) // 1000 for v in nodes}
    rows = [(v, pr[v] / float(_SCALE)) for v in sorted(nodes)]
    return spark.createDataFrame(rows, f"node_id {id_type}, pagerank double")


def pagerank(
    edges: DataFrame,
    n_iter: int = 10,
    damping: float = 0.85,
    checkpoint_every: int = 4,
    local_threshold: int = _LOCAL_PR_MAX_EDGES,
) -> DataFrame:
    """DataFrame(src, dst) -> DataFrame(node_id, pagerank) after
    ``n_iter`` synchronous fixed-point power-method rounds."""
    d_num, base_int = _damping_ints(damping)
    e = (
        edges.select("src", "dst")
        .where(
            F.col("src").isNotNull()
            & F.col("dst").isNotNull()
            & (F.col("src") != F.col("dst"))
        )
        .distinct()
        .persist()
    )
    n_edges, _local = count_and_fits(e, local_threshold, tag="pagerank")
    if _local:
        try:
            pairs = [(r["src"], r["dst"]) for r in e.collect()]
            return _local_pagerank(
                e.sparkSession,
                pairs,
                n_iter,
                damping,
                e.schema["src"].dataType.simpleString(),
            )
        finally:
            e.unpersist()
    nodes = (
        e.select(F.col("src").alias("node_id"))
        .unionByName(e.select(F.col("dst").alias("node_id")))
        .distinct()
        .persist()
    )
    # static out-degree edge list — computed once, reused per round
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("_od"))
    ew = e.join(outdeg, "src").select("src", "dst", "_od").persist()
    try:
        ew.count()

        ranks = nodes.withColumn("pr", F.lit(_SCALE).cast("long"))
        for i in range(n_iter):
            contribs = (
                ew.join(ranks.withColumnRenamed("node_id", "src"), "src")
                .withColumn("_c", F.expr("pr div _od"))
                .groupBy(F.col("dst").alias("node_id"))
                .agg(F.sum("_c").alias("_in"))
            )
            ranks = (
                nodes.join(contribs, "node_id", "left")
                .withColumn("_in", F.coalesce("_in", F.lit(0).cast("long")))
                .selectExpr(
                    "node_id",
                    f"CAST({base_int} AS BIGINT)"
                    f" + (({d_num} * _in) div 1000) AS pr",
                )
            )
            if (i + 1) % checkpoint_every == 0 and i + 1 < n_iter:
                ranks = ranks.transform(_materialize_lazy)

        # Materialize the final ranks so the returned plan owns RDD
        # blocks (ContextCleaner-freed) and references none of the
        # three caches this call created — they unpersist in finally
        # with no recompute and no session-lifetime CacheManager leak.
        ranks = ranks.transform(_materialize)
    finally:
        e.unpersist()
        nodes.unpersist()
        ew.unpersist()
    return ranks.select(
        "node_id", (F.col("pr") / F.lit(float(_SCALE))).alias("pagerank")
    )
