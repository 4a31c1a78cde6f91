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
    # non-root: `DAONode Nothing` — presence marker only (DAO.hs:55-61),
    # dropped by the GraphML/pangraph writers, consumed by the JSON wire
    assert mid["node_attrs"] == {"dao_present": "true"}
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


# ---------------------------------------------------------------------------
# Reference golden fixtures: drive OUR parser over the reference's own
# test/data logs and assert the exact findings its ContikiNGSpec.hs
# pins (read in place from /root/reference — nothing is copied).
# ---------------------------------------------------------------------------

_REF_DATA = "/root/reference/net-spider-rpl/test/data"


def _dio_tuple(row):
    return (
        row["subject_node"],
        row["found_at"],
        row["node_attrs"]["rank"],
        row["node_attrs"]["dio_interval"],
        [
            (
                l["target_node"],
                l["link_state"],
                l["link_attrs"]["neighbor_type"],
                l["link_attrs"]["neighbor_rank"],
                l["link_attrs"].get("metric"),
            )
            for l in row["neighbor_links"]
        ],
    )


def _dao_tuple(row):
    return (
        row["subject_node"],
        row["found_at"],
        row["node_attrs"].get("dao_route_num"),
        sorted(
            (l["target_node"], l["link_attrs"]["path_lifetime_sec"])
            for l in row["neighbor_links"]
        ),
    )


def test_reference_golden_syslog_root(spark):
    # ContikiNGSpec.hs:65-118
    import os

    if not os.path.exists(_REF_DATA):
        import pytest

        pytest.skip("reference data not present")
    dio, dao = parse_contiki_logs(
        spark, f"{_REF_DATA}/syslog_root.log", head="syslog", year=2019
    )
    ts = 1546968337000
    assert [_dio_tuple(r) for r in _collect(dio)] == [(
        "dio://[fd00::212:1199:eebb:62c4]", ts, "128", "14",
        [("dio://[fd00::212:1199:bbcc:4fdf]", "unused", "parent_candidate", "262", "128"),
         ("dio://[fd00::212:1199:bbcc:d52d]", "unused", "parent_candidate", "263", "128"),
         ("dio://[fd00::212:1199:bbcc:5e88]", "unused", "parent_candidate", "256", "128"),
         ("dio://[fd00::212:1199:eebb:62fe]", "unused", "parent_candidate", "256", "129")],
    )]
    assert [_dao_tuple(r) for r in _collect(dao)] == [(
        "dao://[fd00::212:1199:eebb:62c4]", ts, "5",
        sorted([("dao://[fd00::212:1199:bbcc:d52d]", "1080"),
                ("dao://[fd00::212:1199:bbcc:4fdf]", "1260"),
                ("dao://[fd00::212:1199:eebb:62fe]", "1440"),
                ("dao://[fd00::212:1199:bbcc:5e88]", "1140")]),
    )]


def test_reference_golden_syslog_nonroot(spark):
    # ContikiNGSpec.hs:119-188 — preferred parent mid-list, 65535 metric
    dio, dao = parse_contiki_logs(
        spark, f"{_REF_DATA}/syslog_nonroot.log", head="syslog", year=2019
    )
    ts = 1547558149000
    assert [_dio_tuple(r) for r in _collect(dio)] == [(
        # the spec writes this address as ...eeaa:0077:2f9c and compares
        # PARSED values; our text is the canonical rendering (no
        # leading zeros) of the same address
        "dio://[fd00::212:eeaa:77:2f9c]", ts, "423", "16",
        [("dio://[fd00::212:eeaa:33cc:632a]", "unused", "parent_candidate", "256", "198"),
         ("dio://[fd00::212:eeaa:33ff:a874]", "unused", "parent_candidate", "256", "177"),
         ("dio://[fd00::212:eeaa:33cc:63d0]", "to_target", "preferred_parent", "272", "151"),
         ("dio://[fd00::212:eeaa:9977:13ba]", "unused", "parent_candidate", "283", "152"),
         ("dio://[fd00::212:eeaa:33cc:6350]", "unused", "parent_candidate", "400", "171"),
         ("dio://[fd00::212:eeaa:e88:db36]", "unused", "parent_candidate", "432", "166"),
         ("dio://[fd00::212:eeaa:9977:b4]", "unused", "other_neighbor", "584", "65535")],
    )]
    assert _collect(dao) == []


def test_reference_golden_syslog_inf_rank(spark):
    # ContikiNGSpec.hs:264-301 — infinite (65535) own and neighbor rank
    dio, dao = parse_contiki_logs(
        spark, f"{_REF_DATA}/syslog_inf_rank.log", head="syslog", year=2019
    )
    ts = 1551104666000
    assert [_dio_tuple(r) for r in _collect(dio)] == [(
        "dio://[fd00::aaa:bbbb:bcc:1008]", ts, "65535", "12",
        [("dio://[fd00::aaa:bbbb:bcc:100a]", "unused", "other_neighbor", "492", "601"),
         ("dio://[fd00::aaa:bbbb:9221:d51a]", "unused", "other_neighbor", "422", "601"),
         ("dio://[fd00::aaa:bbbb:bcc:d5e8]", "unused", "other_neighbor", "65535", "133")],
    )]
    assert _collect(dao) == []


def test_reference_golden_syslog_sr_tables(spark):
    # ContikiNGSpec.hs:189-263 — two observations of one subject across
    # months; per-parent DAO grouping with a non-root sub-table
    dio, dao = parse_contiki_logs(
        spark, f"{_REF_DATA}/syslog_sr_tables.log", head="syslog", year=2019
    )
    ts_jan, ts_feb = 1548843376000, 1549373162000
    got_dio = sorted((_dio_tuple(r) for r in _collect(dio)),
                     key=lambda t: t[1])
    assert got_dio[0] == (
        "dio://[fd00::222:5566:cc99:62c4]", ts_jan, "128", "15", [])
    assert got_dio[1] == (
        "dio://[fd00::222:5566:cc99:62c4]", ts_feb, "128", "18",
        [("dio://[fd00::222:5566:ddee:4fdf]", "unused", "parent_candidate", "256", "128"),
         ("dio://[fd00::222:5566:ddee:d52d]", "unused", "parent_candidate", "396", "128"),
         ("dio://[fd00::222:5566:cc99:62fe]", "unused", "parent_candidate", "266", "137"),
         ("dio://[fd00::222:5566:ddee:401e]", "unused", "parent_candidate", "384", "128"),
         ("dio://[fd00::222:5566:ddee:5e88]", "unused", "parent_candidate", "406", "128")],
    )
    got_dao = sorted(_dao_tuple(r) for r in _collect(dao))
    assert got_dao == sorted([
        ("dao://[fd00::222:5566:cc99:62c4]", ts_feb, "6",
         sorted([("dao://[fd00::222:5566:ddee:4fdf]", "1140"),
                 ("dao://[fd00::222:5566:cc99:62fe]", "1380")])),
        ("dao://[fd00::222:5566:ddee:4fdf]", ts_feb, None,
         sorted([("dao://[fd00::222:5566:ddee:d52d]", "1380"),
                 ("dao://[fd00::222:5566:ddee:401e]", "1740"),
                 ("dao://[fd00::222:5566:ddee:5e88]", "1740")])),
    ])


def test_reference_golden_cooja(spark):
    # ContikiNGSpec.hs:42-64 — simulator-clock timestamps (ms offsets)
    dio, dao = parse_contiki_logs(spark, f"{_REF_DATA}/cooja.log", head="cooja")
    assert [_dio_tuple(r) for r in _collect(dio)] == [(
        "dio://[fd00::201:1:1:1]", 60382, "128", "15",
        [("dio://[fd00::202:2:2:2]", "unused", "parent_candidate", "299", "141")],
    )]
    assert [_dao_tuple(r) for r in _collect(dao)] == [(
        "dao://[fd00::201:1:1:1]", 60382, "2",
        [("dao://[fd00::202:2:2:2]", "1740")],
    )]


def test_reference_golden_syslog_interleaving(spark):
    # ContikiNGSpec.hs:302-341 — a foreign log line INSIDE the DIO
    # block is skipped (the reference warns and continues); the block
    # still parses whole.
    dio, dao = parse_contiki_logs(
        spark, f"{_REF_DATA}/syslog_interleaving.log", head="syslog", year=2019
    )
    assert [_dio_tuple(r) for r in _collect(dio)] == [(
        "dio://[fd00::212:eeaa:77:2f9c]", 1547558152000, "332", "14",
        [("dio://[fd00::212:eeaa:33cc:63d0]", "to_target", "preferred_parent", "188", "144"),
         ("dio://[fd00::212:eeaa:9977:13ba]", "unused", "parent_candidate", "263", "152")],
    )]
    assert _collect(dao) == []


def test_reference_ipv6_prefix_spec():
    # IPv6Spec.hs:12-20 exact values
    from net_spider_spark.rpl.ipv6 import get_prefix, parse_ipv6, set_prefix

    addr = parse_ipv6("fe00:12:4310:20:aa9d:d393:aa00:49be")
    assert get_prefix(addr) == 0xFE00001243100020
    got = set_prefix(0xF055AA0D00329391, addr)
    assert got == parse_ipv6("f055:aa0d:32:9391:aa9d:d393:aa00:49be")
