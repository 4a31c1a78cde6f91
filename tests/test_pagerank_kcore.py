"""PageRank and k-core: parity with pure-Python specs on handcrafted
and generated graphs."""

import pytest
from pyspark.sql import functions as F

from net_spider_spark.graph.kcore import kcore
from net_spider_spark.graph.pagerank import pagerank


def _py_pagerank(edges, n_iter=10, d=0.85):
    from collections import defaultdict

    edges = {(s, t) for s, t in edges if s != t}
    nodes = {s for s, _ in edges} | {t for _, t in edges}
    out = defaultdict(list)
    for s, t in edges:
        out[s].append(t)
    pr = {v: 1.0 for v in nodes}
    for _ in range(n_iter):
        nxt = {v: 1.0 - d for v in nodes}
        for s, ts in out.items():
            share = d * pr[s] / len(ts)
            for t in ts:
                nxt[t] += share
        pr = nxt
    return pr


def _py_kcore(edges, k):
    adj = {}
    for s, t in {(s, t) for s, t in edges if s != t}:
        adj.setdefault(s, set()).add(t)
        adj.setdefault(t, set()).add(s)
    alive = set(adj)
    while True:
        drop = {v for v in alive if len(adj[v] & alive) < k}
        if not drop:
            break
        alive -= drop
    return {v: len(adj[v] & alive) for v in alive}


@pytest.fixture(scope="module")
def gen_edges(spark):
    df = spark.range(300).select(
        (F.col("id") % 53).alias("src"), ((F.col("id") * 7 + 3) % 53).alias("dst")
    )
    return df, [(r["src"], r["dst"]) for r in df.collect()]


def test_pagerank_chain(spark):
    # a -> b -> c: closed form after enough iterations
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    pr = {r["node_id"]: r["pagerank"] for r in pagerank(edges, n_iter=20).collect()}
    assert abs(pr["a"] - 0.15) < 1e-6
    assert abs(pr["b"] - (0.15 + 0.85 * 0.15)) < 1e-6
    assert pr["c"] > pr["b"] > pr["a"]


def test_pagerank_matches_python(spark, gen_edges):
    df, pairs = gen_edges
    got = {r["node_id"]: r["pagerank"] for r in pagerank(df, n_iter=10).collect()}
    want = _py_pagerank(pairs, n_iter=10)
    assert set(got) == set(want)
    # fixed-point truncation bias: < indeg micro-units per round
    for v in want:
        assert abs(got[v] - want[v]) < 1e-3, v


def test_kcore_triangle_plus_tail(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e")],
        "src string, dst string",
    )
    core2 = {r["node_id"]: r["degree"] for r in kcore(edges, k=2).collect()}
    assert core2 == {"a": 2, "b": 2, "c": 2}  # tail d,e peeled
    core3 = kcore(edges, k=3).collect()
    assert core3 == []


def test_kcore_matches_python(spark, gen_edges):
    df, pairs = gen_edges
    for k in (2, 3, 4):
        got = {r["node_id"]: r["degree"] for r in kcore(df, k=k).collect()}
        want = _py_kcore(pairs, k)
        assert got == want, k


def test_distributed_paths_match_local(spark, gen_edges):
    """local_threshold=0 forces the iterative Spark loops; results must
    match the driver-local fast paths exactly (pagerank to the shared
    6-decimal rounding, kcore bit-for-bit)."""
    df, _ = gen_edges
    pr_local = {r["node_id"]: r["pagerank"] for r in pagerank(df, n_iter=6).collect()}
    pr_dist = {
        r["node_id"]: r["pagerank"]
        for r in pagerank(df, n_iter=6, local_threshold=0).collect()
    }
    # both paths run the same integer fixed-point rounds -> bit-equal
    assert pr_local == pr_dist

    kc_local = {r["node_id"]: r["degree"] for r in kcore(df, k=3).collect()}
    kc_dist = {
        r["node_id"]: r["degree"]
        for r in kcore(df, k=3, local_threshold=0).collect()
    }
    assert kc_local == kc_dist


def test_kcore_self_loops_ignored(spark):
    edges = spark.createDataFrame(
        [("a", "a"), ("a", "b")], "src string, dst string"
    )
    assert kcore(edges, k=2).collect() == []
