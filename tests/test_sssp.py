"""Weighted shortest paths (graph/sssp.py): local fast path and the
distributed Bellman-Ford loop must agree with hand-computed distances,
including cycles and the hop bound."""

import pytest

from net_spider_spark.graph.sssp import shortest_paths

EDGES = [
    # a -> b -> d is cheaper than the direct a -> d
    ("a", "b", 1),
    ("b", "d", 1),
    ("a", "d", 5),
    ("b", "c", 2),
    ("c", "a", 1),   # cycle back — must not loop forever
    ("d", "e", 10),
    ("x", "y", 1),   # disconnected from sources
]
EXPECTED = {"a": 0, "b": 1, "c": 3, "d": 2, "e": 12}


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(EDGES, "src string, dst string, weight long")


def test_sssp_local_fast_path(edges_df):
    got = {
        r["node_id"]: r["dist"]
        for r in shortest_paths(edges_df, ["a"], max_hops=6).collect()
    }
    assert got == EXPECTED


def test_sssp_distributed_loop_matches(edges_df):
    got = {
        r["node_id"]: r["dist"]
        for r in shortest_paths(
            edges_df, ["a"], max_hops=6, local_threshold=0
        ).collect()
    }
    assert got == EXPECTED


def test_sssp_hop_bound(edges_df):
    # with 1 hop, only the direct neighbors are reachable
    got = {
        r["node_id"]: r["dist"]
        for r in shortest_paths(edges_df, ["a"], max_hops=1).collect()
    }
    assert got == {"a": 0, "b": 1, "d": 5}


def test_sssp_multi_source_min(edges_df):
    got = {
        r["node_id"]: r["dist"]
        for r in shortest_paths(edges_df, ["a", "d"], max_hops=6).collect()
    }
    # d as a source makes e cheap; everything else keeps a's distances
    assert got["e"] == 10 and got["d"] == 0 and got["b"] == 1


def test_sssp_properties_random_graphs(spark):
    # Property check over deterministic pseudo-random graphs: the
    # distributed loop must match a plain-Python hop-bounded
    # Bellman-Ford on every instance.
    import random

    rng = random.Random(7)
    for trial in range(3):
        n = 12
        edges = []
        for _ in range(30):
            s, t = rng.randrange(n), rng.randrange(n)
            edges.append((f"v{s}", f"v{t}", rng.randrange(1, 10)))
        df = spark.createDataFrame(edges, "src string, dst string, weight long")
        got = {
            r["node_id"]: r["dist"]
            for r in shortest_paths(
                df, ["v0"], max_hops=5, local_threshold=0
            ).collect()
        }
        # reference: Bellman-Ford, 5 rounds, min-weight parallel edges
        best = {}
        for s, t, w in edges:
            best[(s, t)] = min(w, best.get((s, t), w))
        dist = {"v0": 0}
        for _ in range(5):
            nxt = dict(dist)
            for (s, t), w in best.items():
                if s in dist and dist[s] + w < nxt.get(t, 1 << 60):
                    nxt[t] = dist[s] + w
            dist = nxt
        assert got == dist, f"trial {trial}"
