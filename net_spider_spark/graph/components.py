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
from pyspark.sql import types as T

from net_spider_spark.sizing import count_and_fits
from net_spider_spark.reliability import (
    materialize as _materialize,
    materialize_lazy as _materialize_lazy,
)


# Same rationale as traverse._LOCAL_BFS_MAX_EDGES: below this size the
# iterative rounds are pure scheduling overhead.
_LOCAL_CC_MAX_EDGES = 2_000_000


def connected_components(
    edges: DataFrame, max_iter: int = 50,
    local_threshold: int = _LOCAL_CC_MAX_EDGES,
    edges_distinct: bool = False,
) -> DataFrame:
    """DataFrame(src, dst) -> DataFrame(node_id, component) where
    component = min node ID in the (undirected) component.

    ``edges_distinct=True`` declares the input duplicate-free and
    one-directional (e.g. verified dedup pairs with ``a < b``), which
    skips the symmetric-union dedup — semantics are unchanged either
    way (min-label propagation and union-find are idempotent to
    duplicate edges; the distinct only bounds rows per round), but for
    a pre-distinct input it is a pure extra shuffle of the pair table."""
    # Symmetric closure as ONE two-way explode, not a self-union: a
    # union's two children are separate plan subtrees, so
    # ``edges ∪ reversed(edges)`` executed the ENTIRE upstream chain
    # twice per action (measured on dedup_representatives: the
    # candidate+verify pipeline ran once per direction). The explode
    # emits the same two rows per input edge from a single pass; the
    # pre-explode null filter equals the old post-union filter because
    # it applied to both directions symmetrically.
    und = (
        edges.select("src", "dst")
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .selectExpr(
            "inline(array(named_struct('src', src, 'dst', dst),"
            " named_struct('src', dst, 'dst', src)))"
        )
    )
    if not edges_distinct:
        und = und.distinct()
    und = und.persist()
    n_edges, local = count_and_fits(und, local_threshold, tag="components")
    if local:
        try:
            return _local_components(und)
        finally:
            und.unpersist()
    labels = (
        und.select(F.col("src").alias("node_id"))
        .distinct()
        .withColumn("component", F.col("node_id"))
        .transform(_materialize)
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
            propagated = labels.join(neighbor_min, "node_id", "left").select(
                "node_id",
                F.least(
                    F.col("component"), F.coalesce("_nmin", F.col("component"))
                ).alias("component"),
            )
            # Pointer halving: also adopt the label OF the current
            # label's node. Neighbor-min alone converges in O(diameter)
            # rounds — a path graph at 100x scale means hundreds of
            # shuffle rounds; label-of-label shortcutting makes label
            # chains collapse geometrically, so rounds drop to
            # O(log n) for one extra equi-join per round. Fixpoint is
            # unchanged (labels only decrease, and any label reachable
            # this way is a component member's), so local/dist parity
            # holds.
            lab2 = propagated.select(
                F.col("node_id").alias("_lbl_node"),
                F.col("component").alias("_lbl_comp"),
            )
            updated = (
                propagated.join(
                    lab2,
                    propagated["component"] == lab2["_lbl_node"],
                    "left",
                )
                .select(
                    "node_id",
                    F.least(
                        F.col("component"),
                        F.coalesce("_lbl_comp", F.col("component")),
                    ).alias("component"),
                )
                .transform(_materialize_lazy)
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


def _local_components(und: DataFrame) -> DataFrame:
    """Driver-local union-find over a collected edge list (fast path)."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for row in und.collect():
        a, b = row["src"], row["dst"]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min label so the representative is the min ID
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    rows = sorted((n, find(n)) for n in parent)
    spark = und.sparkSession
    # Node IDs keep the edge table's type (string node IDs, long doc
    # IDs, ...) — min-label semantics then match a SQL min() over the
    # same type, which matters for numeric IDs ("10" < "2" as strings).
    id_type = und.schema["src"].dataType
    schema = T.StructType(
        [T.StructField("node_id", id_type), T.StructField("component", id_type)]
    )
    return spark.createDataFrame(rows, schema)
