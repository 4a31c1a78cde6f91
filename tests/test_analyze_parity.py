"""The reference's AnalyzeSpec cases end-to-end: the SAME FoundNodes
the spec feeds through Weaver + dioDefQuery/daoDefQuery
(``net-spider-rpl-cli/test/NetSpider/RPL/CLI/AnalyzeSpec.hs:127-296``)
run through this engine's snapshot + analyze, asserting the exact
DODAGAttributes (node_num, edge_num, depth, root, time) and the exact
error conditions. Root here is the FindingID text (node IDs are
strings end-to-end); the spec's bare-IPv6 root is its address part."""

import pytest

from net_spider_spark.findings import FoundLink, FoundNode, findings_to_df
from net_spider_spark.graph.analyze import AnalyzeError, analyze_dao, analyze_dio
from net_spider_spark.rpl.dao import dao_def_query
from net_spider_spark.rpl.dio import dio_def_query
from net_spider_spark.snapshot import get_snapshot


def dio_node(ts, sub, targets):
    # dioNode (AnalyzeSpec.hs:85-103): rank 256 / dioint 10, every
    # neighbor a preferred parent with rank 512 and no metric
    return FoundNode(
        sub,
        ts,
        [
            FoundLink(
                t,
                "to_target",
                {"neighbor_type": "preferred_parent", "neighbor_rank": "512"},
            )
            for t in targets
        ],
        {"rank": "256", "dio_interval": "10"},
    )


def dao_node(ts, mroutes, sub, targets):
    # daoNode (AnalyzeSpec.hs:66-83): DAONode mroutes, links with the
    # default 3600 s path lifetime
    attrs = (
        {"dao_route_num": str(mroutes)}
        if mroutes is not None
        else {"dao_present": "true"}
    )
    return FoundNode(
        sub,
        ts,
        [
            FoundLink(t, "to_target", {"path_lifetime_sec": "3600"})
            for t in targets
        ],
        attrs,
    )


def run_dio(spark, fns):
    nodes, links = get_snapshot(findings_to_df(spark, fns), dio_def_query())
    return analyze_dio(nodes, links)


def run_dao(spark, fns):
    nodes, links = get_snapshot(findings_to_df(spark, fns), dao_def_query())
    return analyze_dao(nodes, links)


def check(got, node_num, edge_num, depth, root_ip, time):
    assert (
        got.node_num, got.edge_num, got.depth, got.root, got.time
    ) == (node_num, edge_num, depth, root_ip, time)


def test_dio_root_only(spark):
    got = run_dio(spark, [dio_node(100, "dio://[fd00::1]", [])])
    check(got, 1, 0, 0, "dio://[fd00::1]", 100)


def test_dio_depth_1(spark):
    got = run_dio(spark, [
        dio_node(100, "dio://[fd00::1]", []),
        dio_node(120, "dio://[fd00::2]", ["dio://[fd00::1]"]),
        dio_node(140, "dio://[fd00::3]", ["dio://[fd00::1]"]),
        dio_node(110, "dio://[fd00::4]", ["dio://[fd00::1]"]),
    ])
    check(got, 4, 3, 1, "dio://[fd00::1]", 140)


def test_dio_depth_4(spark):
    got = run_dio(spark, [
        dio_node(150, "dio://[fd00::1]", []),
        dio_node(110, "dio://[fd00::4]", ["dio://[fd00::3]"]),
        dio_node(120, "dio://[fd00::2]", ["dio://[fd00::1]"]),
        dio_node(200, "dio://[fd00::3]", ["dio://[fd00::2]"]),
        dio_node(170, "dio://[fd00::5]", ["dio://[fd00::4]"]),
        dio_node(189, "dio://[fd00::6]", ["dio://[fd00::2]"]),
    ])
    check(got, 6, 5, 4, "dio://[fd00::1]", 200)


def test_dio_orphans_with_one_root(spark):
    # multiple zero-out-degree candidates, but only fd00::2 has
    # children: it wins, the rest are orphans (getRoot's second rule)
    got = run_dio(spark, [
        dio_node(110, "dio://[fd00::1]", []),
        dio_node(120, "dio://[fd00::2]", []),
        dio_node(130, "dio://[fd00::3]", []),
        dio_node(100, "dio://[fd00::4]", ["dio://[fd00::2]"]),
    ])
    check(got, 4, 1, 1, "dio://[fd00::2]", 130)


def test_dio_multiple_roots_error(spark):
    with pytest.raises(AnalyzeError, match="multiple root"):
        run_dio(spark, [
            dio_node(100, "dio://[fd00::1]", []),
            dio_node(200, "dio://[fd00::2]", ["dio://[fd00::1]"]),
            dio_node(150, "dio://[fd00::3]", []),
            dio_node(130, "dio://[fd00::4]", ["dio://[fd00::3]"]),
        ])


def test_dio_all_orphans_error(spark):
    with pytest.raises(AnalyzeError, match="orphan nodes only"):
        run_dio(spark, [
            dio_node(120, "dio://[fd00::1]", []),
            dio_node(170, "dio://[fd00::2]", []),
            dio_node(110, "dio://[fd00::5]", []),
            dio_node(100, "dio://[fd00::3]", []),
            dio_node(180, "dio://[fd00::4]", []),
        ])


def test_dao_root_only(spark):
    got = run_dao(spark, [dao_node(100, 0, "dao://[fd00::1]", [])])
    check(got, 1, 0, 0, "dao://[fd00::1]", 100)


def test_dao_depth_1(spark):
    got = run_dao(spark, [
        dao_node(100, 3, "dao://[fd00::1]",
                 ["dao://[fd00::2]", "dao://[fd00::3]", "dao://[fd00::4]"]),
        dao_node(100, None, "dao://[fd00::2]", []),
        dao_node(100, None, "dao://[fd00::3]", []),
        dao_node(100, None, "dao://[fd00::4]", []),
    ])
    check(got, 4, 3, 1, "dao://[fd00::1]", 100)


def test_dao_depth_4(spark):
    got = run_dao(spark, [
        dao_node(100, None, "dao://[fd00::3]", ["dao://[fd00::4]"]),
        dao_node(100, 4, "dao://[fd00::1]", ["dao://[fd00::2]"]),
        dao_node(100, None, "dao://[fd00::5]", []),
        dao_node(100, None, "dao://[fd00::2]", ["dao://[fd00::3]"]),
        dao_node(100, None, "dao://[fd00::4]", ["dao://[fd00::5]"]),
    ])
    check(got, 5, 4, 4, "dao://[fd00::1]", 100)


def test_dao_multiple_timestamps(spark):
    # fd00::3 re-observed at ts 200 with a new child: policyOverwrite
    # keeps only the newer observation's links; graph time is the max
    got = run_dao(spark, [
        dao_node(100, 4, "dao://[fd00::1]",
                 ["dao://[fd00::2]", "dao://[fd00::3]"]),
        dao_node(100, None, "dao://[fd00::2]",
                 ["dao://[fd00::4]", "dao://[fd00::5]"]),
        dao_node(100, None, "dao://[fd00::3]", []),
        dao_node(100, None, "dao://[fd00::4]", []),
        dao_node(100, None, "dao://[fd00::5]", []),
        dao_node(200, None, "dao://[fd00::3]", ["dao://[fd00::6]"]),
        dao_node(200, None, "dao://[fd00::6]", []),
    ])
    check(got, 6, 5, 2, "dao://[fd00::1]", 200)
