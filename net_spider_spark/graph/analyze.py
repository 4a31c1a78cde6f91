"""DODAG analytics: node/edge counts, root detection, tree depth.

Parity target: ``net-spider-rpl-cli/src/NetSpider/RPL/CLI/Analyze.hs``
(DODAGAttributes {node_num, edge_num, depth, root, time}, :39-151).

Root detection (getRoot, :116-135): candidates are nodes with zero
"parent-side" degree — out-degree for DIO graphs (``RootDest``: DIO
links point child -> preferred parent) or in-degree for DAO graphs
(``RootSource``: DAO links point parent -> child). A unique candidate
wins; multiple candidates are OK only when exactly one of them has
children and the rest are orphans. Depth (getDepth, :137-151) is the
max BFS level from the root, following edges toward the leaves.

Degrees and counts are DataFrame aggregates; depth reuses the BFS in
``traverse`` with per-level tracking.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROOT_SOURCE = "source"  # root has no incoming edges (DAO)
ROOT_DEST = "dest"      # root has no outgoing edges (DIO)


@dataclass(frozen=True)
class DodagAttributes:
    node_num: int
    edge_num: int
    depth: int
    root: str
    time: Optional[int]


class AnalyzeError(ValueError):
    pass


def degrees(nodes: DataFrame, links: DataFrame) -> DataFrame:
    """Per-node in/out degree over the snapshot links (A10)."""
    out_deg = links.groupBy(F.col("source_node").alias("node_id")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    in_deg = links.groupBy(F.col("dest_node").alias("node_id")).agg(
        F.count(F.lit(1)).alias("in_degree")
    )
    return (
        nodes.select("node_id")
        .join(out_deg, "node_id", "left")
        .join(in_deg, "node_id", "left")
        .select(
            "node_id",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
    )


def find_root(nodes: DataFrame, links: DataFrame, root_type: str) -> str:
    """``getRoot`` with its sanity rules; raises AnalyzeError with the
    reference's error conditions."""
    deg = degrees(nodes, links)
    parent_col, child_col = (
        ("in_degree", "out_degree")
        if root_type == ROOT_SOURCE
        else ("out_degree", "in_degree")
    )
    # Aggregate the sanity rules instead of collecting the candidate
    # list: a hub-skewed graph can have millions of zero-parent nodes
    # (all orphans) and the old collect() was a driver OOM at scale.
    # The rules only need (candidate count, count with children, head).
    candidates = deg.where(F.col(parent_col) == 0).select(
        "node_id", F.col(child_col).alias("child_num")
    )
    stats = candidates.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("child_num") > 0).cast("long")).alias("n_with_children"),
    ).collect()[0]
    if stats["n"] == 0:
        raise AnalyzeError("The graph has no node that has no parent.")
    head = (
        candidates.orderBy(F.desc("child_num"), F.asc("node_id"))
        .limit(1)
        .collect()[0]
    )
    if stats["n"] == 1:
        return head["node_id"]
    if head["child_num"] > 0 and stats["n_with_children"] == 1:
        return head["node_id"]
    if head["child_num"] == 0:
        raise AnalyzeError("The graph contains orphan nodes only.")
    raise AnalyzeError("The graph contains multiple root candidates.")


def tree_depth(links: DataFrame, root: str, root_type: str) -> int:
    """Max BFS level from the root, edges oriented away from it.

    Delegates to ``traverse.reachable_with_levels``, which takes a
    driver-local fast path for small deduplicated edge projections and
    a one-job-per-level distributed BFS above the threshold — no
    unguarded edge collect (the reference's FGL spTree is inherently
    single-node; this isn't)."""
    from net_spider_spark.traverse import reachable_with_levels

    spark = links.sparkSession
    if root_type == ROOT_SOURCE:
        edges = links.select(
            F.col("source_node").alias("src"), F.col("dest_node").alias("dst")
        )
    else:
        edges = links.select(
            F.col("dest_node").alias("src"), F.col("source_node").alias("dst")
        )
    starts = spark.createDataFrame([(root,)], "node_id string")
    levels = reachable_with_levels(edges, starts)
    return levels.agg(F.max("level")).collect()[0][0] or 0


def analyze_dodag(
    nodes: DataFrame, links: DataFrame, root_type: str
) -> DodagAttributes:
    """``analyzeGeneric``: full DODAG health summary.

    ``root_type``: ROOT_DEST for DIO graphs, ROOT_SOURCE for DAO.
    """
    from net_spider_spark.snapshot import graph_timestamp

    node_num = nodes.count()
    edge_num = links.count()
    root = find_root(nodes, links, root_type)
    depth = tree_depth(links, root, root_type)
    ts = graph_timestamp(nodes, links)
    return DodagAttributes(node_num, edge_num, depth, root, ts)


def analyze_dio(nodes: DataFrame, links: DataFrame) -> DodagAttributes:
    return analyze_dodag(nodes, links, ROOT_DEST)


def analyze_dao(nodes: DataFrame, links: DataFrame) -> DodagAttributes:
    return analyze_dodag(nodes, links, ROOT_SOURCE)
