"""Weaver-class behavior (WeaverSpec.hs:40-165) + timezone threading."""

from net_spider_spark.findings import FoundLink, FoundNode, findings_to_df
from net_spider_spark.graphml import write_graphml
from net_spider_spark.snapshot import BOUNDARY_MARK, Query, get_snapshot
from net_spider_spark.timestamp import Timestamp, parse_timestamp
from net_spider_spark.weaver import Weaver


def test_weaver_accumulate_and_boundary(spark):
    w = Weaver(spark, policy="overwrite")
    w.add_found_node(
        FoundNode("n1", 2000, [FoundLink("n2", "to_target")])
    )
    w.add_found_node(FoundNode("n1", 1000, [FoundLink("n3", "to_target")]))
    # overwrite policy applies at query time: only n1@2000's targets count
    assert w.get_boundary_nodes() == ["n2"]
    assert w.is_visited("n1") and not w.is_visited("n2")
    nodes, links = w.get_snapshot()
    got = sorted((r["node_id"], r["is_on_boundary"]) for r in nodes.collect())
    assert got == [("n1", False), ("n2", False)]  # visit mode default


def test_weaver_mark_as_visited(spark):
    w = Weaver(spark, policy="append")
    w.add_found_node(FoundNode("a", 100, [FoundLink("b", "to_target")]))
    w.mark_as_visited("isolated")
    nodes, _ = w.get_snapshot(boundary_mode=BOUNDARY_MARK)
    got = {r["node_id"]: r["is_on_boundary"] for r in nodes.collect()}
    # marked node appears visited with no observation; b is boundary
    assert got == {"a": False, "b": True, "isolated": False}


def test_timezone_threading_to_graphml(spark):
    ts = parse_timestamp("2020-06-01T12:00+09:00")
    assert ts.tz_offset_min == 540
    findings = [
        FoundNode("tokyo", ts, [FoundLink("osaka", "to_target")]),
        FoundNode("utc", Timestamp(ts.epoch_ms + 1000), []),
    ]
    nodes, links = get_snapshot(findings_to_df(spark, findings), Query())
    row = {r["node_id"]: r for r in nodes.collect()}
    assert row["tokyo"]["tz_offset_min"] == 540
    assert row["utc"]["tz_offset_min"] is None
    xml = write_graphml(nodes, links)
    assert '@tz_offset_min" attr.type="int"' in xml
    assert ">540</data>" in xml


def test_weaver_get_found_nodes_spec(spark):
    # WeaverSpec.hs:40-107 verbatim: mark/add in both orders, and the
    # policy semantics of getFoundNodes including the >= tie rule.
    from net_spider_spark.findings import FoundNode
    from net_spider_spark.weaver import Weaver

    fn = FoundNode("5", 100, [])
    for order in ("mark_first", "add_first"):
        w = Weaver(spark)
        if order == "mark_first":
            w.mark_as_visited("10").mark_as_visited("5").add_found_node(fn)
        else:
            w.add_found_node(fn).mark_as_visited("10").mark_as_visited("5")
        assert not w.is_visited("1")
        assert w.is_visited("5") and w.is_visited("10")
        assert w.get_found_nodes("1") is None
        assert w.get_found_nodes("5") == [fn]
        assert w.get_found_nodes("10") == []

    fn1 = FoundNode("5", 100, [], {"a": "foobar"})
    fn2 = FoundNode("5", 150, [], {"a": "quux"})
    w = Weaver(spark, policy="overwrite")
    w.add_found_node(fn1)
    assert w.get_found_nodes("5") == [fn1]
    w2 = Weaver(spark, policy="overwrite")
    w2.add_found_node(fn2).add_found_node(fn1)   # older added later loses
    assert w2.get_found_nodes("5") == [fn2]
    w3 = Weaver(spark, policy="overwrite")
    w3.add_found_node(fn1).add_found_node(fn2)
    assert w3.get_found_nodes("5") == [fn2]
    # ties: the most recently added wins (new >= old, Weaver.hs:81-86)
    fn2b = FoundNode("5", 150, [], {"a": "later"})
    w4 = Weaver(spark, policy="overwrite")
    w4.add_found_node(fn2).add_found_node(fn2b)
    assert w4.get_found_nodes("5") == [fn2b]

    wa = Weaver(spark, policy="append")
    wa.add_found_node(fn1).add_found_node(fn2)
    assert sorted(f.found_at for f in wa.get_found_nodes("5")) == [100, 150]


def test_weaver_visit_all_boundary_nodes(spark):
    from net_spider_spark.findings import FoundLink, FoundNode
    from net_spider_spark.weaver import Weaver

    w = Weaver(spark)
    w.add_found_node(FoundNode("a", 100, [FoundLink("b"), FoundLink("c")]))
    assert sorted(w.get_boundary_nodes()) == ["b", "c"]
    w.visit_all_boundary_nodes()
    assert w.is_visited("b") and w.is_visited("c")
    assert w.get_boundary_nodes() == []
    assert w.get_found_nodes("b") == []
