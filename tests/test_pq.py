"""Product quantization (net_spider_spark/pipeline/pq.py): numpy spec
parity for train/encode/ADC, determinism, and plan shape."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from net_spider_spark.pipeline import pq as PQ


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(11)
    rows = [
        (int(i), [float(x) for x in rng.normal(size=8)]) for i in range(80)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _np_pq(ids, vecs, dim, m, k, iters, seed="s42"):
    """Reference PQ: per-subspace Lloyd's with the library's init and
    tie-break rules, then codes = per-subspace argmin."""
    sub = dim // m
    order = sorted(
        range(len(ids)),
        key=lambda i: (
            hashlib.md5(f"{seed}:{ids[i]}".encode()).hexdigest(),
            ids[i],
        ),
    )
    books = {}
    for s in range(m):
        sv = [v[s * sub:(s + 1) * sub] for v in vecs]
        cents = [sv[i].copy() for i in order[:k]]

        def assign():
            return [
                min(
                    range(k),
                    key=lambda c: (float(((x - cents[c]) ** 2).sum()), c),
                )
                for x in sv
            ]

        a = assign()
        for _ in range(iters):
            for cid in range(k):
                members = [sv[i] for i in range(len(sv)) if a[i] == cid]
                if members:
                    cents[cid] = np.mean(members, axis=0)
            a = assign()
        books[s] = (cents, a)
    return books


def test_encode_matches_numpy_reference(emb):
    rows = emb.orderBy("vec_id").collect()
    ids = [r["vec_id"] for r in rows]
    vecs = [np.array(r["embedding"], dtype=np.float64) for r in rows]
    books = PQ.pq_train(emb, dim=8, m=2, k=4, iters=1)
    ref = _np_pq(ids, vecs, dim=8, m=2, k=4, iters=1)
    for s, cid, cv in books:
        assert np.allclose(ref[s][0][cid], cv)
    got = {
        r["vec_id"]: list(r["codes"])
        for r in PQ.pq_encode(emb, books).collect()
    }
    for i, vid in enumerate(ids):
        assert got[vid] == [ref[s][1][i] for s in range(2)]


def test_topk_matches_numpy_adc(emb):
    rows = emb.orderBy("vec_id").collect()
    ids = [r["vec_id"] for r in rows]
    vecs = [np.array(r["embedding"], dtype=np.float64) for r in rows]
    books = PQ.pq_train(emb, dim=8, m=2, k=4, iters=1)
    codes = PQ.pq_encode(emb, books)
    out = PQ.pq_topk(emb.where(F.col("vec_id") < 3), codes, books, k=2)
    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["adist"])
        for r in out.collect()
    }
    ref = _np_pq(ids, vecs, dim=8, m=2, k=4, iters=1)
    cents = {s: np.array(ref[s][0]) for s in ref}
    for q in range(3):
        qi = ids.index(q)
        dists = []
        for i, vid in enumerate(ids):
            d = sum(
                float(
                    ((vecs[qi][s * 4:(s + 1) * 4] - cents[s][ref[s][1][i]]) ** 2).sum()
                )
                for s in range(2)
            )
            dists.append((d, vid))
        dists.sort()
        for rank, (d, vid) in enumerate(dists[:2], start=1):
            nid, adist = got[(q, rank)]
            assert nid == vid
            assert abs(adist - d) < 1e-9


def test_train_rejects_indivisible_dim(emb):
    with pytest.raises(ValueError):
        PQ.pq_train(emb, dim=8, m=3)


def test_plan_broadcasts_and_no_python_udf(emb):
    books = PQ.pq_train(emb, dim=8, m=2, k=4, iters=0)
    codes = PQ.pq_encode(emb, books)
    plan = (
        PQ.pq_topk(emb.where(F.col("vec_id") < 3), codes, books, k=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # codebook + LUT joins must broadcast (the corpus never shuffles
    # vectors), and everything stays JVM-side.
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
