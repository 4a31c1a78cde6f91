"""Time-interval and policy x interval snapshot queries.

Parity target: ``net-spider/test/ServerTest/Snapshot.hs:97-265`` —
interval endpoint semantics (lower/upper, inclusive/exclusive) and the
interplay of foundNodePolicy with the interval (policyOverwrite picks
the latest *within* the interval), including traversal reachability
effects (nodes whose only kept findings fall outside the interval
don't expand the frontier).
"""

import pytest

from net_spider_spark.findings import FoundLink, FoundNode, findings_to_df
from net_spider_spark.interval import NEG_INF, POS_INF, Interval
from net_spider_spark.snapshot import Query, get_snapshot
from net_spider_spark.timestamp import parse_timestamp
from net_spider_spark.unify import UnifyConfig, no_negation, sub_id_by_subject


def ts(minute: str) -> int:
    return parse_timestamp(f"2018-12-01T01:{minute}").epoch_ms


def node(n, t, targets):
    return FoundNode(
        n, ts(t) if isinstance(t, str) else t,
        [FoundLink(x, "to_target", {}) for x in targets], {}
    )


INTERVAL_FNS = [
    node("n1", "10", ["n2"]),
    node("n1", "20", ["n2", "n3"]),
    node("n1", "30", []),
    node("n1", "40", ["n3"]),
    node("n2", "15", []),
    node("n2", "25", ["n4"]),
    node("n2", "35", ["n4", "n3", "n5"]),
    node("n3", "10", ["n4", "n2"]),
    node("n3", "30", ["n4"]),
    node("n4", "05", []),
    node("n4", "15", ["n1"]),
    node("n4", "25", ["n1", "n5"]),
    node("n4", "35", []),
]

SIMPLE_UNIFY = UnifyConfig(negates=no_negation)


def run(spark, findings, starts, interval, policy="overwrite", unify=SIMPLE_UNIFY):
    df = findings_to_df(spark, findings)
    nodes_df, links_df = get_snapshot(
        df,
        Query(
            starts_from=starts,
            time_interval=interval,
            found_node_policy=policy,
            unify=unify,
        ),
    )
    nodes = sorted(
        (r["node_id"], r["node_ts"], r["node_attrs"] is not None)
        for r in nodes_df.collect()
    )
    links = sorted(
        (r["source_node"], r["dest_node"], r["link_ts"])
        for r in links_df.collect()
    )
    return nodes, links


def test_only_lower_bound_exclusive(spark):
    nodes, links = run(
        spark, INTERVAL_FNS, ["n1", "n2"],
        Interval(ts("30"), POS_INF, lower_inclusive=False),
    )
    assert [n[0] for n in nodes] == ["n1", "n2", "n3", "n4", "n5"]
    assert [not n[2] for n in nodes] == [False, False, True, False, True]
    assert links == [
        ("n1", "n3", ts("40")),
        ("n2", "n3", ts("35")),
        ("n2", "n4", ts("35")),
        ("n2", "n5", ts("35")),
    ]


def test_only_upper_bound_exclusive(spark):
    nodes, links = run(
        spark, INTERVAL_FNS, ["n1"],
        Interval(NEG_INF, ts("30"), upper_inclusive=False),
    )
    assert [n[0] for n in nodes] == ["n1", "n2", "n3", "n4", "n5"]
    assert [not n[2] for n in nodes] == [False, False, False, False, True]
    assert links == [
        ("n1", "n2", ts("20")),
        ("n1", "n3", ts("20")),
        ("n2", "n4", ts("25")),
        ("n3", "n2", ts("10")),
        ("n3", "n4", ts("10")),
        ("n4", "n1", ts("25")),
        ("n4", "n5", ts("25")),
    ]


def test_only_upper_bound_inclusive(spark):
    nodes, links = run(
        spark, INTERVAL_FNS, ["n3"],
        Interval(NEG_INF, ts("30"), upper_inclusive=True),
    )
    # n2 is NOT reachable: n3's kept finding (30) links only to n4.
    assert [n[0] for n in nodes] == ["n1", "n3", "n4", "n5"]
    assert [not n[2] for n in nodes] == [False, False, False, True]
    assert links == [
        ("n3", "n4", ts("30")),
        ("n4", "n1", ts("25")),
        ("n4", "n5", ts("25")),
    ]


def test_both_bounded(spark):
    nodes, links = run(
        spark, INTERVAL_FNS, ["n2"],
        Interval(ts("20"), ts("25"), lower_inclusive=False, upper_inclusive=True),
    )
    assert [n[0] for n in nodes] == ["n1", "n2", "n4", "n5"]
    assert [not n[2] for n in nodes] == [True, False, False, True]
    assert links == [
        ("n2", "n4", ts("25")),
        ("n4", "n1", ts("25")),
        ("n4", "n5", ts("25")),
    ]


# --- policy x interval (ServerTest/Snapshot.hs:197-265) -----------------

POLICY_FNS = [
    node("n1", 10, ["n2"]),
    node("n1", 20, ["n3"]),
    node("n1", 30, ["n2"]),
    node("n2", 15, ["n1"]),
    node("n2", 25, ["n4"]),
    node("n2", 35, ["n4", "n1"]),
    node("n3", 17, []),
    node("n3", 27, ["n1", "n4"]),
    node("n3", 37, []),
    node("n4", 8, ["n2"]),
    node("n4", 18, []),
    node("n4", 28, ["n2", "n3"]),
]

POLICY_UNIFY = UnifyConfig(sub_id=sub_id_by_subject, negates=no_negation)


def test_policy_overwrite_with_time_interval(spark):
    nodes, links = run(
        spark, POLICY_FNS, ["n1"],
        Interval(NEG_INF, 27, upper_inclusive=True),
        policy="overwrite", unify=POLICY_UNIFY,
    )
    assert links == [("n1", "n3", 20), ("n3", "n1", 27), ("n3", "n4", 27)]
    assert [n[0] for n in nodes] == ["n1", "n3", "n4"]
    assert [not n[2] for n in nodes] == [False, False, False]


def test_policy_append_with_time_interval(spark):
    nodes, links = run(
        spark, POLICY_FNS, ["n1"],
        Interval(15, 30, lower_inclusive=True, upper_inclusive=True),
        policy="append", unify=POLICY_UNIFY,
    )
    assert links == [
        ("n1", "n2", 30),
        ("n1", "n3", 20),
        ("n2", "n1", 15),
        ("n2", "n4", 25),
        ("n3", "n1", 27),
        ("n3", "n4", 27),
        ("n4", "n2", 28),
        ("n4", "n3", 28),
    ]
    assert [n[0] for n in nodes] == ["n1", "n2", "n3", "n4"]


def test_snapshot_timeline_asof_points(spark):
    """snapshot_timeline = the interval query with upper bound t, run at
    K points at once: each (ts, node) row is the node's then-latest
    finding (found_at <= ts), absent before the node's first finding."""
    from net_spider_spark.snapshot import snapshot_timeline

    fns = [
        node("a", "10", ["b"]),
        node("a", "20", []),
        node("b", "15", ["a"]),
    ]
    df = findings_to_df(spark, fns)
    got = {
        (r["ts"], r["node_id"]): r["node_ts"]
        for r in snapshot_timeline(df, [ts("12"), ts("16"), ts("20")]).collect()
    }
    assert got == {
        (ts("12"), "a"): ts("10"),
        (ts("16"), "a"): ts("10"),
        (ts("16"), "b"): ts("15"),
        (ts("20"), "a"): ts("20"),
        (ts("20"), "b"): ts("15"),
    }
