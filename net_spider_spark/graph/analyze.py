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
    candidates = (
        deg.where(F.col(parent_col) == 0)
        .orderBy(F.desc(child_col), F.asc("node_id"))
        .select("node_id", F.col(child_col).alias("child_num"))
        .collect()
    )
    if not candidates:
        raise AnalyzeError("The graph has no node that has no parent.")
    if len(candidates) == 1:
        return candidates[0]["node_id"]
    head, rest = candidates[0], candidates[1:]
    if head["child_num"] > 0 and all(c["child_num"] == 0 for c in rest):
        return head["node_id"]
    if head["child_num"] == 0:
        raise AnalyzeError("The graph contains orphan nodes only.")
    raise AnalyzeError("The graph contains multiple root candidates.")


def tree_depth(links: DataFrame, root: str, root_type: str) -> int:
    """Max BFS level from the root, edges oriented away from it."""
    spark = links.sparkSession
    if root_type == ROOT_SOURCE:
        edges = links.select(
            F.col("source_node").alias("src"), F.col("dest_node").alias("dst")
        )
    else:
        edges = links.select(
            F.col("dest_node").alias("src"), F.col("source_node").alias("dst")
        )
    adj: dict[str, list[str]] = {}
    for row in edges.collect():
        adj.setdefault(row["src"], []).append(row["dst"])
    # Snapshot graphs are query *results* (bounded); a driver-side BFS
    # mirrors the reference's FGL spTree. For bulk depth over huge edge
    # sets, use traverse.reachable_nodes level tracking instead.
    depth = 0
    visited = {root}
    frontier = {root}
    while frontier:
        nxt = {d for s in frontier for d in adj.get(s, ()) if d not in visited}
        if not nxt:
            break
        visited |= nxt
        frontier = nxt
        depth += 1
    return depth


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
