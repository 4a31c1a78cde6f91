"""SeqID: stable dense integer IDs for arbitrary node-ID types.

Parity target: ``net-spider/src/NetSpider/SeqID.hs:42-109`` — graph
interop layers (FGL there, GraphX/GraphFrames here) need integer
vertex IDs; SeqIDMaker assigns sequential ints and remembers the
mapping for reverse lookup (``originalIDFor``).

Distributed form: ``zipWithIndex``-style dense numbering via a window
over a canonical ordering would serialize; instead the mapping is a
small dimension table built once per graph (node sets are the compact
end product of snapshot queries) and joined back wherever needed —
broadcast-sized by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from net_spider_spark.reliability import materialize as _materialize


def make_seq_ids(nodes: DataFrame, id_col: str = "node_id",
                 start: int = 0) -> DataFrame:
    """Dense mapping (node_id, seq_id): deterministic (sorted by node
    ID), seq ids ``start..start+n-1``."""
    w = Window.orderBy(F.col(id_col))
    return (
        nodes.select(id_col)
        .distinct()
        .withColumn("seq_id", F.row_number().over(w) - 1 + F.lit(start))
    )


def convert_graph(
    nodes: DataFrame, links: DataFrame, start: int = 0
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """``convertGraph``: relabel a snapshot graph with dense int IDs.

    Returns (mapping, nodes_int, links_int); reverse lookup
    (``originalIDFor``) is a join against the mapping.

    Evaluation contract: the mapping materializes eagerly at call time
    (``localCheckpoint``), and its blocks are unreplicated — executor
    loss on a cluster fails downstream actions instead of recomputing.
    """
    # The mapping is consumed three times (returned, node relabel, two
    # link-endpoint joins); localCheckpoint materializes the
    # single-partition row_number once, with blocks freed by the
    # ContextCleaner when the caller drops the mapping — unlike
    # persist(), which would pin a CacheManager entry nobody owns.
    mapping = make_seq_ids(nodes, start=start).transform(_materialize)
    nodes_int = (
        nodes.join(mapping, "node_id")
        .drop("node_id")
        .withColumnRenamed("seq_id", "node_id")
    )
    src_map = mapping.select(
        F.col("node_id").alias("source_node"), F.col("seq_id").alias("_src")
    )
    dst_map = mapping.select(
        F.col("node_id").alias("dest_node"), F.col("seq_id").alias("_dst")
    )
    links_int = (
        links.join(F.broadcast(src_map), "source_node")
        .join(F.broadcast(dst_map), "dest_node")
        .drop("source_node", "dest_node")
        .withColumnRenamed("_src", "source_node")
        .withColumnRenamed("_dst", "dest_node")
    )
    return mapping, nodes_int, links_int


def original_id_for(mapping: DataFrame, seq_id: int):
    """``originalIDFor`` (SeqID.hs:106-109)."""
    rows = mapping.where(F.col("seq_id") == seq_id).collect()
    return rows[0]["node_id"] if rows else None
