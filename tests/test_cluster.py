"""Deterministic k-means + SemDeDup semantic dedup
(net_spider_spark/pipeline/cluster.py).

The operator claims engine-reproducibility, so the strongest test is an
independent reimplementation: a pure-numpy Lloyd's with the same md5
bottom-k init and (dist, cid) tie-break must produce the exact same
assignment the distributed path does.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from net_spider_spark.pipeline import cluster as CL


def _np_kmeans(ids, vecs, k, iters, seed="s42"):
    """Reference Lloyd's: same init/tie-break/update as the Spark path."""
    order = sorted(
        range(len(ids)),
        key=lambda i: (
            hashlib.md5(f"{seed}:{ids[i]}".encode()).hexdigest(),
            ids[i],
        ),
    )
    centroids = [vecs[i].copy() for i in order[:k]]

    def assign():
        out = {}
        for i, v in enumerate(vecs):
            dists = [float(((v - c) ** 2).sum()) for c in centroids]
            out[ids[i]] = min(range(k), key=lambda c: (dists[c], c))
        return out

    a = assign()
    for _ in range(iters):
        for cid in range(k):
            members = [vecs[i] for i in range(len(ids)) if a[ids[i]] == cid]
            if members:
                centroids[cid] = np.mean(members, axis=0)
        a = assign()
    return a, centroids


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(7)
    rows = [
        (int(i), [float(x) for x in rng.normal(size=16)]) for i in range(120)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_kmeans_matches_numpy_reference(emb):
    got = {
        r["vec_id"]: r["cluster_id"]
        for r in CL.kmeans_assign(emb, k=5, iters=2).collect()
    }
    rows = emb.orderBy("vec_id").collect()
    ids = [r["vec_id"] for r in rows]
    vecs = [np.array(r["embedding"], dtype=np.float64) for r in rows]
    want, _ = _np_kmeans(ids, vecs, k=5, iters=2)
    assert got == want
    assert len(set(got.values())) > 1  # the clustering is non-trivial


def test_kmeans_deterministic_across_runs(emb):
    a = sorted(map(tuple, CL.kmeans_assign(emb, k=4, iters=1).collect()))
    b = sorted(map(tuple, CL.kmeans_assign(emb, k=4, iters=1).collect()))
    assert a == b


def test_kmeans_iters_zero_assigns_against_seeds(emb):
    # iters=0: centroids ARE the bottom-k-by-hash rows, so each seed row
    # must land in its own cluster (distance 0 beats everything else).
    cents, assigned = CL.kmeans_fit(emb, k=4, iters=0)
    got = {r["_id"]: r["cluster_id"] for r in assigned.collect()}
    rows = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    for cid, cv in cents:
        seed_ids = [
            i for i, v in rows.items()
            if np.allclose(np.array(v, dtype=np.float64), cv)
        ]
        assert len(seed_ids) == 1
        assert got[seed_ids[0]] == cid


def test_empty_cluster_keeps_previous_centroid(spark):
    # All vectors identical: every row ties to cid 0, clusters 1..k-1
    # empty out — their centroids must survive the update unchanged.
    df = spark.createDataFrame(
        [(i, [1.0, 2.0]) for i in range(6)],
        "vec_id long, embedding array<float>",
    )
    cents, assigned = CL.kmeans_fit(df, k=3, iters=2)
    assert {r["cluster_id"] for r in assigned.collect()} == {0}
    assert [cv for _, cv in cents] == [[1.0, 2.0]] * 3


def test_semantic_dedup_matches_bruteforce(emb):
    t = 0.2
    out = CL.semantic_dedup(emb, k=5, iters=2, threshold=t).collect()
    got_dups = {r["vec_id"] for r in out if r["is_dup"]}
    clusters = {r["vec_id"]: r["cluster_id"] for r in out}

    rows = emb.orderBy("vec_id").collect()
    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows
    }
    want = set()
    for i in vecs:
        for j in vecs:
            if j < i and clusters[i] == clusters[j]:
                a, b = vecs[i], vecs[j]
                cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
                if cos >= t:
                    want.add(i)
    assert got_dups == want
    assert want  # threshold chosen so the rule actually fires


def test_semantic_dedup_keeps_all_when_threshold_high(emb):
    out = CL.semantic_dedup(emb, k=5, iters=1, threshold=1.1)
    assert out.where(F.col("is_dup")).count() == 0
    assert out.count() == 120


def test_kmeans_plan_is_catalyst_only(emb):
    # The per-iteration work (broadcast argmin + mean aggregate) must
    # stay JVM-side: no Python row UDFs anywhere in the final plan.
    plan = CL.kmeans_assign(emb, k=4, iters=1)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_kmeans_fit_train_n_assigns_full_corpus(spark):
    # Sampled training must still assign EVERY input row (one frozen-
    # centroid argmin over the full table), and the centroids must
    # differ only through the sample — train_n >= corpus reproduces
    # unbounded training exactly.
    import numpy as np

    rng = np.random.default_rng(5)
    rows = [
        (int(i), [float(x) for x in rng.normal(size=4)]) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents, assigned = CL.kmeans_fit(df, k=3, iters=1, train_n=20)
    got = assigned.select("_id").distinct().count()
    assert got == 60
    cents_full, _ = CL.kmeans_fit(df, k=3, iters=1, train_n=None)
    cents_cap, _ = CL.kmeans_fit(df, k=3, iters=1, train_n=10_000)
    for (c1, v1), (c2, v2) in zip(cents_full, cents_cap):
        assert c1 == c2
        np.testing.assert_allclose(v1, v2, rtol=0)


def test_local_fit_matches_distributed_loop(emb, monkeypatch):
    # Driver fast path (bounded train_n -> collect + numpy Lloyd's) vs
    # the distributed loop: same cluster ids, centroids equal to well
    # inside the oracle's round(9) normalization (the paths differ only
    # in partial-sum combine order), and identical full-corpus
    # assignment under those centroids.
    import numpy as np

    cents_local, asg_local = CL.kmeans_fit(emb, k=3, iters=2, train_n=40)
    monkeypatch.setenv("NET_SPIDER_LOCAL_TRAIN", "0")
    cents_dist, asg_dist = CL.kmeans_fit(emb, k=3, iters=2, train_n=40)
    assert [c for c, _ in cents_local] == [c for c, _ in cents_dist]
    for (_, v1), (_, v2) in zip(cents_local, cents_dist):
        np.testing.assert_allclose(v1, v2, rtol=0, atol=1e-9)
    rows = lambda a: sorted(
        (r["_id"], r["cluster_id"]) for r in a.select("_id", "cluster_id").collect()
    )
    assert rows(asg_local) == rows(asg_dist)
