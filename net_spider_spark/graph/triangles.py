"""Triangle counting and local clustering coefficients over snapshot
links — the classic cohesion analytics the reference's graph outputs
feed into external tools for (SURVEY §2.6 analytics family; same
consumer role as ``graph/analyze.py`` degrees / ``components.py``).

Scale shape: the degree-ordered orientation trick. Every undirected
edge is directed from its (degree, id)-smaller endpoint to the larger,
which makes the oriented out-degree O(sqrt(|E|)) for any graph — so
the wedge self-join (the only quadratic-risk step) is bounded by
sum(out_deg^2) <= |E|^{1.5} instead of sum(deg^2), which a single hub
node would otherwise blow up. Each triangle is counted exactly once
(its corners appear in one canonical orientation order). Three hash
equi-joins + hash aggregates, all broadcastable on the degree side —
no window sorts, no cartesian products.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from net_spider_spark.sizing import count_and_fits

# Below this many canonical edges the distributed plan's ~10 stages of
# 32-task shuffles are pure scheduling overhead (measured 2.0-2.3 s at
# sf0.1 for 160 KB of shuffle), so a collected wedge-intersection pass
# wins. Kept well under components' 2M: union-find is O(E α) but the
# wedge intersection is O(E^1.5) worst case, so the driver budget here
# is compute, not just bytes.
_LOCAL_TRI_MAX_EDGES = 200_000


def triangle_stats(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    local_threshold: int = _LOCAL_TRI_MAX_EDGES,
) -> DataFrame:
    """Per-node triangle counts and local clustering coefficient from a
    (possibly directed / repeated) edge list. Self-loops are dropped;
    direction and multiplicity are ignored (the snapshot's physical
    link is one undirected edge).

    Returns (node_id, degree, triangles, clustering_coeff) for every
    node incident to at least one edge, where ``clustering_coeff =
    2 * triangles / (degree * (degree - 1))`` and 0.0 when degree < 2.

    Small graphs take a guarded driver-local fast path (same device as
    ``components``/``pagerank``/``kcore``: :func:`count_and_fits` logs
    the decision; ``local_threshold=0`` forces the distributed plan).
    Both paths replay the identical degree-ordered orientation, so the
    counts — and the single IEEE division per node — agree exactly.
    """
    from pyspark import StorageLevel

    # The canonical edge set is read three times (both degree branches,
    # the orientation join) and `oriented` three more (two wedge sides,
    # the closure) — persist both so an expensive upstream lineage
    # (e.g. a full snapshot query) runs once, not six times. Both are
    # bounded by the graph's edge count, not the history size.
    e = (
        edges.where(F.col(src) != F.col(dst))
        .select(
            F.least(F.col(src), F.col(dst)).alias("p"),
            F.greatest(F.col(src), F.col(dst)).alias("q"),
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _, local = count_and_fits(e, local_threshold, tag="triangles")
    if local:
        try:
            return _local_triangles(e)
        finally:
            e.unpersist()
    # One scan of the cached edge set instead of a two-branch union.
    # deg feeds three consumers (dp/dq/final join) but is NOT
    # persisted: its aggregate exchange is plan-identical across the
    # consumers, so AQE dedups it as ReusedExchange — an explicit
    # cache here measured +95 tasks of fill/scan overhead at bench
    # scale for zero recompute saved.
    deg = (
        e.select(F.explode(F.array(F.col("p"), F.col("q"))).alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # No broadcast hint on the degree table: it is one row per NODE,
    # which is broadcastable for typical snapshot graphs but not for a
    # 100 TB corpus graph — and a forced broadcast must be *built* on
    # the driver from the table's full upstream lineage, which blew a
    # small-heap driver in end-to-end testing. AQE broadcasts it
    # adaptively whenever the measured size allows.
    dp = deg.select(F.col("v").alias("p"), F.col("deg").alias("dp"))
    dq = deg.select(F.col("v").alias("q"), F.col("deg").alias("dq"))
    ranked = e.join(dp, "p").join(dq, "q")
    p_first = (F.col("dp") < F.col("dq")) | (
        (F.col("dp") == F.col("dq")) & (F.col("p") < F.col("q"))
    )
    oriented = ranked.select(
        F.when(p_first, F.col("p")).otherwise(F.col("q")).alias("a"),
        F.when(p_first, F.col("q")).otherwise(F.col("p")).alias("b"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # wedges a->m->c, closed by the oriented edge a->c
    wedge = (
        oriented.select(F.col("a"), F.col("b").alias("m"))
        .join(
            oriented.select(F.col("a").alias("m"), F.col("b").alias("c")),
            "m",
        )
    )
    tri = wedge.join(
        oriented.select(F.col("a"), F.col("b").alias("c")), ["a", "c"]
    )
    # Corner counting as ONE explode over the triangle rows: the
    # three-branch union scanned `tri` three times, and `tri` is the
    # UNPERSISTED wedge+closure join subtree — each extra scan re-ran
    # both joins (the same double-execution device the round-11
    # symmetric-closure fix removed from components/kcore). The corner
    # multiset is identical, so the per-node counts are too.
    corner_counts = (
        tri.select(
            F.explode(F.array(F.col("a"), F.col("m"), F.col("c"))).alias("v")
        )
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return (
        deg.join(corner_counts, "v", "left")
        .select(
            F.col("v").alias("node_id"),
            F.col("deg").alias("degree"),
            F.coalesce(F.col("triangles"), F.lit(0)).cast("long").alias(
                "triangles"
            ),
            F.when(
                F.col("deg") >= 2,
                2.0
                * F.coalesce(F.col("triangles"), F.lit(0))
                / (F.col("deg") * (F.col("deg") - 1)),
            )
            .otherwise(0.0)
            .alias("clustering_coeff"),
        )
    )


def _local_triangles(e: DataFrame) -> DataFrame:
    """Driver-local twin of the distributed plan over the collected
    canonical edge list: same (degree, id) orientation, same wedge
    a->m closed by m->c and a->c, so each triangle increments the same
    three corners exactly once. The clustering coefficient is the same
    single IEEE division (2.0*t exact, deg*(deg-1) exact below 2^53),
    so values match the distributed path bit for bit."""
    pairs = [(r["p"], r["q"]) for r in e.collect()]
    deg: dict = {}
    for p, q in pairs:
        deg[p] = deg.get(p, 0) + 1
        deg[q] = deg.get(q, 0) + 1
    out: dict = {}
    for p, q in pairs:
        # orient from the (deg, id)-smaller endpoint; p < q already
        a, b = (p, q) if deg[p] <= deg[q] else (q, p)
        out.setdefault(a, set()).add(b)
    tri: dict = {}
    empty: set = set()
    for a, nbrs in out.items():
        for m in nbrs:
            common = nbrs & out.get(m, empty)
            if not common:
                continue
            tri[a] = tri.get(a, 0) + len(common)
            tri[m] = tri.get(m, 0) + len(common)
            for c in common:
                tri[c] = tri.get(c, 0) + 1
    rows = [
        (
            v,
            d,
            tri.get(v, 0),
            (2.0 * tri.get(v, 0)) / (d * (d - 1)) if d >= 2 else 0.0,
        )
        for v, d in sorted(deg.items())
    ]
    id_type = e.schema["p"].dataType
    schema = T.StructType(
        [
            T.StructField("node_id", id_type),
            T.StructField("degree", T.LongType()),
            T.StructField("triangles", T.LongType()),
            T.StructField("clustering_coeff", T.DoubleType()),
        ]
    )
    return e.sparkSession.createDataFrame(rows, schema)
