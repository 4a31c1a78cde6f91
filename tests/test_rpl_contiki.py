"""RPL Contiki-NG log parser tests (grammar per ContikiNG.hs; fixtures
are this repo's own, following the reference's captured-log format)."""

import os

import pytest

from net_spider_spark.rpl.contiki import parse_contiki_logs

DATA = os.path.join(os.path.dirname(__file__), "data")


def _collect(df):
    return [r.asDict(recursive=True) for r in df.orderBy("found_at", "subject_node").collect()]


def test_syslog_parse(spark):
    dio, dao = parse_contiki_logs(
        spark, f"{DATA}/syslog_sample.log", head="syslog", year=2021
    )
    dio_rows = _collect(dio)
    dao_rows = _collect(dao)

    # Block 2 (subject fd00::eee...) contains a foreign line -> discarded.
    assert len(dio_rows) == 1
    d = dio_rows[0]
    assert d["subject_node"] == "dio://[fd00::aaa:1:2:3]"
    # Feb 3 2021 09:00:02 UTC
    assert d["found_at"] == 1612342802000
    assert d["node_attrs"] == {"rank": "256", "dio_interval": "12"}
    links = d["neighbor_links"]
    assert [l["target_node"] for l in links] == [
        "dio://[fd00::bbb:4:5:6]",   # link-local rewritten with subject prefix
        "dio://[fd00::ccc:7:8:9]",
        "dio://[fd00::ddd:1:1:1]",   # global addr kept; glued 5-digit rank split
    ]
    assert [l["link_state"] for l in links] == ["to_target", "unused", "unused"]
    assert links[0]["link_attrs"] == {
        "neighbor_type": "preferred_parent",
        "neighbor_rank": "128",
        "metric": "100",
    }
    assert links[1]["link_attrs"]["neighbor_type"] == "parent_candidate"
    assert links[2]["link_attrs"] == {
        "neighbor_type": "other_neighbor",
        "neighbor_rank": "65535",
        "metric": "65535",
    }

    # DAO: one finding per parent; root finding carries route_num.
    assert len(dao_rows) == 2
    by_subject = {r["subject_node"]: r for r in dao_rows}
    root = by_subject["dao://[fd00::aaa:1:2:3]"]
    assert root["node_attrs"] == {"dao_route_num": "3"}
    assert [l["target_node"] for l in root["neighbor_links"]] == [
        "dao://[fd00::bbb:4:5:6]"
    ]
    assert root["neighbor_links"][0]["link_attrs"] == {"path_lifetime_sec": "1080"}
    mid = by_subject["dao://[fd00::bbb:4:5:6]"]
    assert mid["node_attrs"] == {}
    assert [l["target_node"] for l in mid["neighbor_links"]] == [
        "dao://[fd00::ccc:7:8:9]",
        "dao://[::42]",              # compact 6G-0042 -> low-16-bit address
    ]
    assert root["found_at"] == mid["found_at"] == 1612342803000


def test_cooja_parse(spark):
    dio, dao = parse_contiki_logs(
        spark, f"{DATA}/cooja_sample.log", head="cooja"
    )
    rows = _collect(dio)
    assert len(rows) == 1
    d = rows[0]
    assert d["subject_node"] == "dio://[fd00::201:7:7:7]"
    assert d["found_at"] == (1 * 60 + 2) * 1000 + 500
    assert d["neighbor_links"][0]["target_node"] == "dio://[fd00::202:8:8:8]"
    assert d["neighbor_links"][0]["link_state"] == "to_target"
    assert dao.count() == 0


def test_syslog_requires_year(spark):
    with pytest.raises(ValueError):
        parse_contiki_logs(spark, f"{DATA}/syslog_sample.log", head="syslog")
