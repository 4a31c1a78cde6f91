"""Combined-graph merge and DODAG analytics tests
(AnalyzeSpec.hs:120-300 error paths and happy paths; CombinedSpec)."""

import pytest

from net_spider_spark.graph.analyze import (
    ROOT_DEST,
    ROOT_SOURCE,
    AnalyzeError,
    analyze_dao,
    analyze_dio,
    find_root,
)
from net_spider_spark.model import SNAPSHOT_LINK_SCHEMA, SNAPSHOT_NODE_SCHEMA
from net_spider_spark.rpl.combined import combine_graphs


def nodes_df(spark, rows):
    return spark.createDataFrame(
        [(n, False, ts, attrs, None, None, None) for (n, ts, attrs) in rows],
        SNAPSHOT_NODE_SCHEMA,
    )


def links_df(spark, rows):
    return spark.createDataFrame(
        [(s, d, True, ts, attrs) for (s, d, ts, attrs) in rows],
        SNAPSHOT_LINK_SCHEMA,
    )


def test_analyze_dao_happy(spark):
    # DAO: parent -> child; root = no incoming edges.
    nodes = nodes_df(spark, [(f"n{i}", 100 + i, {}) for i in range(4)])
    links = links_df(
        spark,
        [("n0", "n1", 100, {}), ("n1", "n2", 101, {}), ("n1", "n3", 102, {})],
    )
    got = analyze_dao(nodes, links)
    assert (got.node_num, got.edge_num, got.depth, got.root) == (4, 3, 2, "n0")
    assert got.time == 103


def test_analyze_dio_happy(spark):
    # DIO: child -> preferred parent; root = no outgoing edges.
    nodes = nodes_df(spark, [(f"n{i}", 100, {}) for i in range(3)])
    links = links_df(spark, [("n1", "n0", 100, {}), ("n2", "n1", 100, {})])
    got = analyze_dio(nodes, links)
    assert (got.root, got.depth) == ("n0", 2)


def test_root_errors(spark):
    nodes = nodes_df(spark, [("a", 1, {}), ("b", 1, {})])
    # cycle: no parentless node
    cyc = links_df(spark, [("a", "b", 1, {}), ("b", "a", 1, {})])
    with pytest.raises(AnalyzeError, match="no node"):
        find_root(nodes, cyc, ROOT_SOURCE)
    # orphans only: two isolated nodes
    empty = links_df(spark, [])
    with pytest.raises(AnalyzeError, match="orphan"):
        find_root(nodes, empty, ROOT_SOURCE)
    # multiple true roots
    nodes4 = nodes_df(spark, [("a", 1, {}), ("b", 1, {}), ("c", 1, {}), ("d", 1, {})])
    two_trees = links_df(spark, [("a", "b", 1, {}), ("c", "d", 1, {})])
    with pytest.raises(AnalyzeError, match="multiple root"):
        find_root(nodes4, two_trees, ROOT_SOURCE)
    # one real root + orphan: allowed
    nodes3 = nodes_df(spark, [("a", 1, {}), ("b", 1, {}), ("c", 1, {})])
    tree_plus_orphan = links_df(spark, [("a", "b", 1, {})])
    assert find_root(nodes3, tree_plus_orphan, ROOT_SOURCE) == "a"


def test_combine_graphs(spark):
    dio_nodes = nodes_df(
        spark, [("dio://[fd00::1]", 200, {"rank": "128"}),
                ("dio://[fd00::2]", 150, {"rank": "256"})]
    )
    dio_links = links_df(
        spark, [("dio://[fd00::2]", "dio://[fd00::1]", 200,
                 {"neighbor_type": "preferred_parent"})]
    )
    dao_nodes = nodes_df(
        spark, [("dao://[fd00::1]", 100, {"dao_route_num": "2"}),
                ("dao://[fd00::3]", 120, {})]
    )
    dao_links = links_df(
        spark, [("dao://[fd00::1]", "dao://[fd00::2]", 100,
                 {"path_lifetime_sec": "600"})]
    )
    nodes, links = combine_graphs((dio_nodes, dio_links), (dao_nodes, dao_links))
    node_rows = {r["node_id"]: r.asDict(recursive=True) for r in nodes.collect()}
    assert set(node_rows) == {"fd00::1", "fd00::2", "fd00::3"}
    n1 = node_rows["fd00::1"]
    assert n1["node_ts"] == 200
    # unprefixed keys, the reference's toAttributes concatenation
    # (Combined.hs:62-64)
    assert n1["node_attrs"] == {"rank": "128", "dao_route_num": "2"}
    link_rows = sorted(
        (r["source_node"], r["dest_node"], r["link_attrs"]["link_type"])
        for r in links.collect()
    )
    assert link_rows == [
        ("fd00::1", "fd00::2", "dao"),
        ("fd00::2", "fd00::1", "dio"),
    ]


def test_find_root_hub_skew_aggregated(spark):
    # Many orphan zero-parent candidates beside one real root: the
    # sanity rules must resolve via aggregates (no unbounded collect
    # of the candidate list on the driver).
    from net_spider_spark.graph.analyze import ROOT_SOURCE, find_root

    links = spark.createDataFrame(
        [("root", f"c{i}") for i in range(50)],
        "source_node string, dest_node string",
    )
    orphans = spark.createDataFrame(
        [(f"orphan{i}",) for i in range(5000)] + [("root",)]
        + [(f"c{i}",) for i in range(50)],
        "node_id string",
    )
    assert find_root(orphans, links, ROOT_SOURCE) == "root"


def test_tree_depth_distributed_path(spark):
    # Depth through the distributed BFS (threshold forced to 0 via a
    # chain) must match the known chain depth.
    from net_spider_spark.graph.analyze import ROOT_SOURCE, tree_depth
    from net_spider_spark.traverse import reachable_with_levels
    import pyspark.sql.functions as F

    links = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(6)],
        "source_node string, dest_node string",
    )
    assert tree_depth(links, "n0", ROOT_SOURCE) == 6
    # distributed variant agrees
    edges = links.select(
        F.col("source_node").alias("src"), F.col("dest_node").alias("dst")
    )
    starts = spark.createDataFrame([("n0",)], "node_id string")
    lv = reachable_with_levels(edges, starts, local_threshold=0)
    assert lv.agg(F.max("level")).collect()[0][0] == 6
