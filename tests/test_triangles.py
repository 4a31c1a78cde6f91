"""Triangle counting on known graphs, plus brute-force parity on a
random graph and hub-skew safety of the oriented wedge join."""

import itertools
import random

from pyspark.sql import functions as F

from net_spider_spark.graph.triangles import triangle_stats


def _stats(spark, pairs):
    df = spark.createDataFrame(pairs, "src string, dst string")
    return {r["node_id"]: r for r in triangle_stats(df).collect()}


def test_k4_every_node_in_three_triangles(spark):
    nodes = ["a", "b", "c", "d"]
    edges = [(u, v) for u, v in itertools.combinations(nodes, 2)]
    got = _stats(spark, edges)
    for n in nodes:
        assert got[n]["degree"] == 3
        assert got[n]["triangles"] == 3
        assert got[n]["clustering_coeff"] == 1.0


def test_path_has_no_triangles_and_direction_ignored(spark):
    got = _stats(spark, [("a", "b"), ("c", "b"), ("c", "d"), ("b", "a")])
    assert all(r["triangles"] == 0 for r in got.values())
    assert got["b"]["degree"] == 2 and got["b"]["clustering_coeff"] == 0.0
    assert got["a"]["degree"] == 1


def test_triangle_with_pendant(spark):
    got = _stats(
        spark, [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("c", "c")]
    )
    assert (got["a"]["triangles"], got["b"]["triangles"]) == (1, 1)
    assert got["c"]["triangles"] == 1
    # c: degree 3 (self-loop dropped), one closed pair of neighbors
    assert got["c"]["clustering_coeff"] == 2 * 1 / (3 * 2)
    assert got["d"]["triangles"] == 0


def test_random_graph_matches_bruteforce(spark):
    rng = random.Random(7)
    nodes = [f"n{i}" for i in range(30)]
    edges = sorted(
        {
            tuple(sorted((rng.choice(nodes), rng.choice(nodes))))
            for _ in range(120)
        }
    )
    edges = [(u, v) for u, v in edges if u != v]
    adj = {n: set() for n in nodes}
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    expect = {}
    for n in nodes:
        nb = sorted(adj[n])
        t = sum(
            1
            for x, y in itertools.combinations(nb, 2)
            if y in adj[x]
        )
        if adj[n]:
            expect[n] = (len(adj[n]), t)
    got = _stats(spark, edges)
    assert {k: (v["degree"], v["triangles"]) for k, v in got.items()} == expect


def test_hub_graph_completes_without_blowup(spark):
    # one hub connected to 2000 leaves + a few closing edges: the
    # degree orientation points every leaf at the hub, so the wedge
    # join never enumerates hub-centered leaf pairs.
    edges = [("hub", f"l{i}") for i in range(2000)]
    edges += [(f"l{i}", f"l{i+1}") for i in range(0, 50, 2)]
    got = _stats(spark, edges)
    assert got["hub"]["degree"] == 2000
    # each leaf-leaf edge closes exactly one triangle through the hub
    assert got["hub"]["triangles"] == 25
    assert got["l0"]["triangles"] == 1 and got["l1999"]["triangles"] == 0
