"""Shipped RPL unifier configs: the DIO two-endpoint MergedDIOLink
merge (net-spider-rpl/src/NetSpider/RPL/DIO.hs:254-288) and the DAO
no-negation default merge (DAO.hs:139-140), driven through the full
snapshot pipeline. The merged-attribute expectations mirror the
MergedDIOLink example in test/NetSpider/RPL/DIOSpec.hs:36-44."""

from net_spider_spark.findings import FoundLink, FoundNode, findings_to_df
from net_spider_spark.rpl.dao import dao_def_query, dao_unifier_conf
from net_spider_spark.rpl.dio import dio_def_query, dio_link_state, dio_unifier_conf
from net_spider_spark.snapshot import Query, get_snapshot


def _dio_link(target, nt, rank, metric=None, ts_state=None):
    attrs = {"neighbor_type": nt, "neighbor_rank": str(rank)}
    if metric is not None:
        attrs["metric"] = str(metric)
    return FoundLink(target, ts_state or dio_link_state(nt), attrs)


def _links(spark, findings, query):
    _, links = get_snapshot(findings_to_df(spark, findings), query)
    return [r.asDict(recursive=True) for r in links.collect()]


def test_dio_merge_both_endpoints(spark):
    # DIOSpec.hs:36-44 golden shape: preferred_parent side wins, its
    # attrs become source_*, the other endpoint's become dest_*; the
    # absent Maybe metric is omitted, not empty.
    findings = [
        FoundNode("a", 2000, [_dio_link("b", "preferred_parent", 590, 132)]),
        FoundNode("b", 1000, [_dio_link("a", "other_neighbor", 722)]),
    ]
    rows = _links(spark, findings, dio_def_query())
    assert len(rows) == 1
    r = rows[0]
    assert (r["source_node"], r["dest_node"], r["is_directed"]) == ("a", "b", True)
    assert r["link_ts"] == 2000
    assert r["link_attrs"] == {
        "source_neighbor_type": "preferred_parent",
        "source_neighbor_rank": "590",
        "source_metric": "132",
        "dest_neighbor_type": "other_neighbor",
        "dest_neighbor_rank": "722",
    }


def test_dio_merge_more_parentish_side_wins(spark):
    # The base sample comes from whichever endpoint reports the more
    # parent-ish neighbor type (DIO.hs:270-276) — even when the OTHER
    # side's observation is newer. Negation is off, so the newer
    # "unused" observation by `a` does not kill the link either.
    findings = [
        FoundNode("a", 2000, [_dio_link("b", "other_neighbor", 900)]),
        FoundNode("b", 1000, [_dio_link("a", "preferred_parent", 300, 7)]),
    ]
    rows = _links(spark, findings, dio_def_query())
    assert len(rows) == 1
    r = rows[0]
    # winner = b's sample (to_target): link b -> a, at b's timestamp
    assert (r["source_node"], r["dest_node"]) == ("b", "a")
    assert r["link_ts"] == 1000
    assert r["link_attrs"]["source_neighbor_type"] == "preferred_parent"
    assert r["link_attrs"]["source_metric"] == "7"
    assert r["link_attrs"]["dest_neighbor_type"] == "other_neighbor"
    assert "dest_metric" not in r["link_attrs"]


def test_dio_one_sided_has_no_dest_attrs(spark):
    findings = [
        FoundNode("a", 1500, [_dio_link("b", "preferred_parent", 256)]),
    ]
    rows = _links(spark, findings, dio_def_query())
    assert len(rows) == 1
    attrs = rows[0]["link_attrs"]
    assert attrs["source_neighbor_type"] == "preferred_parent"
    assert not any(k.startswith("dest_") for k in attrs)


def test_dio_both_non_preferred_dropped(spark):
    # dioLinkState: no preferred parent on either side -> both samples
    # are 'unused' -> the merged link is dropped from the snapshot.
    findings = [
        FoundNode("a", 2000, [_dio_link("b", "parent_candidate", 10)]),
        FoundNode("b", 1000, [_dio_link("a", "other_neighbor", 20)]),
    ]
    assert _links(spark, findings, dio_def_query()) == []


def test_dio_latest_sample_per_side(spark):
    # Each endpoint contributes its LATEST sample to the merge; stale
    # observations (a@1000 parent_candidate) are ignored.
    findings = [
        FoundNode("a", 1000, [_dio_link("b", "parent_candidate", 11)]),
        FoundNode("a", 3000, [_dio_link("b", "preferred_parent", 12)]),
        FoundNode("b", 2000, [_dio_link("a", "other_neighbor", 13)]),
    ]
    rows = _links(spark, findings, dio_def_query(found_node_policy="append"))
    assert len(rows) == 1
    r = rows[0]
    assert r["link_ts"] == 3000
    assert r["link_attrs"]["source_neighbor_rank"] == "12"
    assert r["link_attrs"]["dest_neighbor_rank"] == "13"


def test_dio_tie_keeps_lesser_endpoint(spark):
    # Equal neighbor types: main = the pair's lesser node ID (the
    # left operand of mergeSamples), per `neighborType main <= sub`.
    findings = [
        FoundNode("b", 2000, [_dio_link("a", "preferred_parent", 2)]),
        FoundNode("a", 1000, [_dio_link("b", "preferred_parent", 1)]),
    ]
    rows = _links(spark, findings, dio_def_query())
    assert len(rows) == 1
    r = rows[0]
    assert (r["source_node"], r["dest_node"]) == ("a", "b")
    assert r["link_ts"] == 1000
    assert r["link_attrs"]["source_neighbor_rank"] == "1"
    assert r["link_attrs"]["dest_neighbor_rank"] == "2"


def test_dao_unifier_disables_negation(spark):
    # defNegatesLinkSample would kill this link (b has a newer node
    # timestamp and no link back); daoUnifierConf must keep it.
    findings = [
        FoundNode("a", 1000, [FoundLink("b", "to_target", {"path_lifetime_sec": "2560"})]),
        FoundNode("b", 2000, []),
    ]
    default_rows = _links(spark, findings, Query())
    dao_rows = _links(spark, findings, dao_def_query())
    assert default_rows == []
    assert len(dao_rows) == 1
    assert dao_rows[0]["link_attrs"] == {"path_lifetime_sec": "2560"}


def test_unifier_conf_shapes():
    dio = dio_unifier_conf()
    assert dio.merge_samples is not None and dio.merge_output_schema is not None
    dao = dao_unifier_conf()
    assert dao.merge_samples is None  # stays on the pure-Catalyst path


# ---------------------------------------------------------------------------
# Combined-graph JSON wire codecs (JSONUtil.hs:24-46, Combined.hs:67-93)
# ---------------------------------------------------------------------------

def test_combined_node_json_wire_and_roundtrip(spark):
    import json

    from net_spider_spark.rpl.jsonutil import (
        combined_nodes_from_json,
        combined_nodes_to_json,
    )

    rows = [
        ("fd00::1", {"rank": "256", "dio_interval": "12",
                     "dao_route_num": "3"}),
        ("fd00::2", {"rank": "512", "dio_interval": "8"}),
        ("fd00::3", {"dao_route_num": "0"}),
    ]
    nodes = spark.createDataFrame(
        rows, "node_id string, node_attrs map<string,string>"
    )
    enc = {r["node_id"]: json.loads(r["json"])
           for r in combined_nodes_to_json(nodes).collect()}
    # exact reference field names: optCombinedNode lowers + strips
    # "attrs" (JSONUtil.hs:26-29); inner records are optSnake.
    assert enc["fd00::1"] == {"dio": {"rank": 256, "dio_interval": 12},
                              "dao": {"dao_route_num": 3}}
    assert enc["fd00::2"] == {"dio": {"rank": 512, "dio_interval": 8},
                              "dao": None}
    assert enc["fd00::3"] == {"dio": None, "dao": {"dao_route_num": 0}}

    back = {r["node_id"]: r["node_attrs"]
            for r in combined_nodes_from_json(
                combined_nodes_to_json(nodes)).collect()}
    assert back == {nid: attrs for nid, attrs in rows}


def test_nonroot_dao_node_encodes_present_dao(spark):
    # The normal non-root DAO case is `Just (DAONode Nothing)`
    # (DAO.hs:55-61): contiki's non-root branch emits the dao_present
    # marker, combine_nodes carries it, and the wire document must be
    # {"dao": {"dao_route_num": null}} — NOT dao-absent. The marker
    # itself never round-trips into serializer output.
    import json

    from net_spider_spark.graphml import write_graphml
    from net_spider_spark.pangraph import make_vertices
    from net_spider_spark.rpl.combined import combine_nodes
    from net_spider_spark.rpl.jsonutil import combined_nodes_to_json

    dio_nodes = spark.createDataFrame(
        [("dio://[fd00::2]", False, 1000,
          {"rank": "512", "dio_interval": "8"})],
        "node_id string, is_on_boundary boolean, node_ts long, "
        "node_attrs map<string,string>",
    )
    dao_nodes = spark.createDataFrame(
        [("dao://[fd00::2]", False, 2000, {"dao_present": "true"})],
        "node_id string, is_on_boundary boolean, node_ts long, "
        "node_attrs map<string,string>",
    )
    combined = combine_nodes(dio_nodes, dao_nodes)
    enc = json.loads(combined_nodes_to_json(combined).collect()[0]["json"])
    assert enc == {"dio": {"rank": 512, "dio_interval": 8},
                   "dao": {"dao_route_num": None}}

    # GraphML hides the marker (`toAttributes (DAONode Nothing) = []`)
    empty_links = spark.createDataFrame(
        [],
        "source_node string, dest_node string, is_directed boolean, "
        "link_ts long, link_attrs map<string,string>",
    )
    xml = write_graphml(combined, empty_links)
    assert "dao_present" not in xml
    assert "rank" in xml
    # ... and so does the pangraph vertex conversion
    vat = make_vertices(combined).collect()[0]["attributes"]
    assert "dao_present" not in vat and vat["rank"] == "512"


def test_combined_link_json_wire_and_roundtrip(spark):
    import json

    from net_spider_spark.rpl.jsonutil import (
        combined_links_from_json,
        combined_links_to_json,
    )

    rows = [
        ("fd00::1", "fd00::2", True, 2000,
         {"link_type": "dio",
          "source_neighbor_type": "preferred_parent",
          "source_neighbor_rank": "256",
          "source_metric": "128",
          "dest_neighbor_type": "other_neighbor",
          "dest_neighbor_rank": "512"}),
        ("fd00::1", "fd00::3", True, 1500,
         {"link_type": "dio",
          "source_neighbor_type": "parent_candidate",
          "source_neighbor_rank": "300"}),
        ("fd00::2", "fd00::3", True, 1000,
         {"link_type": "dao", "path_lifetime_sec": "300"}),
    ]
    links = spark.createDataFrame(
        rows,
        "source_node string, dest_node string, is_directed boolean, "
        "link_ts long, link_attrs map<string,string>",
    )
    enc = {(r["source_node"], r["dest_node"]): json.loads(r["json"])
           for r in combined_links_to_json(links).collect()}
    # TaggedObject wire: tagFieldName "link_type", contentsFieldName
    # "link", tags lowercased to dio/dao (JSONUtil.hs:31-46).
    assert enc[("fd00::1", "fd00::2")] == {
        "link_type": "dio",
        "link": {"from_source": {"neighbor_type": "preferred_parent",
                                 "neighbor_rank": 256, "metric": 128},
                 "from_dest": {"neighbor_type": "other_neighbor",
                               "neighbor_rank": 512, "metric": None}},
    }
    assert enc[("fd00::1", "fd00::3")] == {
        "link_type": "dio",
        "link": {"from_source": {"neighbor_type": "parent_candidate",
                                 "neighbor_rank": 300, "metric": None},
                 "from_dest": None},
    }
    assert enc[("fd00::2", "fd00::3")] == {
        "link_type": "dao", "link": {"path_lifetime_sec": 300}}

    back = {(r["source_node"], r["dest_node"]): r["link_attrs"]
            for r in combined_links_from_json(
                combined_links_to_json(links)).collect()}
    assert back == {(s, d): attrs for s, d, _, _, attrs in rows}


def test_combined_json_reference_golden_fixtures(spark):
    # Verbatim wire documents from the reference's own test suite
    # (net-spider-rpl/test/NetSpider/RPL/CombinedSpec.hs:18-55):
    # decode -> re-encode must reproduce each document exactly.
    import json

    from net_spider_spark.rpl.jsonutil import (
        combined_links_from_json,
        combined_links_to_json,
        combined_nodes_from_json,
        combined_nodes_to_json,
    )

    node_doc = ('{"dio": {"rank": 256, "dio_interval": 12},'
                ' "dao": {"dao_route_num": null}}')
    nodes = spark.createDataFrame(
        [("fd00::1", node_doc)], "node_id string, json string"
    )
    back = combined_nodes_to_json(
        combined_nodes_from_json(nodes)).collect()[0]
    assert json.loads(back["json"]) == json.loads(node_doc)

    link_docs = [
        ('{"link_type": "dio", "link": {"from_dest": null, "from_source":'
         ' {"neighbor_type": "preferred_parent", "neighbor_rank": 332,'
         ' "metric": 183}}}'),
        '{"link_type": "dao", "link": {"path_lifetime_sec": 1990}}',
    ]
    links = spark.createDataFrame(
        [("a", "b", True, 1, d) for d in link_docs],
        "source_node string, dest_node string, is_directed boolean, "
        "link_ts long, json string",
    )
    back_links = combined_links_to_json(
        combined_links_from_json(links)).collect()
    got = [json.loads(r["json"]) for r in back_links]
    want = [json.loads(d) for d in link_docs]
    assert sorted(got, key=str) == sorted(want, key=str)


def test_internal_marker_never_serializes(spark):
    # review fix: the dao_present presence marker must not leak into
    # the SnapshotElement JSON wire either (GraphML/pangraph already
    # strip it) — the reference's Aeson encoding has no such key.
    import json

    from net_spider_spark.snapshot import snapshot_to_json

    nodes = spark.createDataFrame(
        [("n1", False, 1000, {"dao_present": "true", "x": "1"},
          None, None, None)],
        "node_id string, is_on_boundary boolean, node_ts long, "
        "node_attrs map<string,string>, tz_offset_min int, "
        "tz_summer_only boolean, tz_name string",
    )
    links = spark.createDataFrame(
        [],
        "source_node string, dest_node string, is_directed boolean, "
        "link_ts long, link_attrs map<string,string>",
    )
    nj, _ = snapshot_to_json(nodes, links)
    doc = json.loads(nj.collect()[0]["json"])
    assert doc["node_attrs"] == {"x": "1"}
