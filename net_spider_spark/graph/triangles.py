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


def triangle_stats(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle counts and local clustering coefficient from a
    (possibly directed / repeated) edge list. Self-loops are dropped;
    direction and multiplicity are ignored (the snapshot's physical
    link is one undirected edge).

    Returns (node_id, degree, triangles, clustering_coeff) for every
    node incident to at least one edge, where ``clustering_coeff =
    2 * triangles / (degree * (degree - 1))`` and 0.0 when degree < 2.
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
    deg = (
        e.select(F.col("p").alias("v"))
        .unionAll(e.select(F.col("q").alias("v")))
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
    corner_counts = (
        tri.select(F.col("a").alias("v"))
        .unionAll(tri.select(F.col("m").alias("v")))
        .unionAll(tri.select(F.col("c").alias("v")))
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
