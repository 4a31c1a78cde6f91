"""Efraimidis-Spirakis weighted sampling: exact python-spec parity,
weight bias, determinism, zero-weight exclusion."""

import hashlib
import math

from pyspark.sql import functions as F

from net_spider_spark.pipeline.curate import weighted_sample

_HEX = "0123456789abcdef"


def _py_key(doc_id, weight, seed="s42"):
    h = hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()
    v = 0
    for i in range(15):
        v = v * 16 + _HEX.index(h[i])
    u = float(v) / float(1 << 60)
    return math.log(u) / float(weight)


def test_matches_python_spec_exactly(spark):
    rows = [(i, 10 + (i * 13) % 90) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    got = [
        (r["doc_id"], r["es_key"], r["wr_rank"])
        for r in weighted_sample(df, k=20, weight_col="n_chars")
        .orderBy("wr_rank")
        .collect()
    ]
    keys = sorted(
        ((_py_key(i, w), i) for i, w in rows), key=lambda t: (-t[0], t[1])
    )[:20]
    want = [(i, k, rank + 1) for rank, (k, i) in enumerate(keys)]
    assert [(g[0], g[2]) for g in got] == [(w[0], w[2]) for w in want]
    for g, w in zip(got, want):
        assert g[1] == w[1], g  # bit-identical keys


def test_weight_bias(spark):
    # 500 light rows (w=1) + 100 heavy rows (w=100): heavy rows should
    # dominate the sample far beyond their 1/6 population share.
    rows = [(i, 1) for i in range(500)] + [(1000 + i, 100) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    picked = {
        r["doc_id"]
        for r in weighted_sample(df, k=60, weight_col="n_chars").collect()
    }
    heavy = sum(1 for d in picked if d >= 1000)
    assert heavy > 40  # expected ~55; chance level would be ~10


def test_zero_weight_excluded_and_deterministic(spark):
    df = spark.createDataFrame(
        [(1, 0), (2, -5), (3, 10), (4, 10)], "doc_id long, n_chars long"
    )
    out1 = weighted_sample(df, k=10, weight_col="n_chars").collect()
    out2 = weighted_sample(df, k=10, weight_col="n_chars").collect()
    assert {r["doc_id"] for r in out1} == {3, 4}
    assert [r.asDict() for r in out1] == [r.asDict() for r in out2]
