"""common_ngrams (boilerplate detection), BM25 retrieval, exact
per-group quantiles."""

import pytest
from pyspark.sql import functions as F

from net_spider_spark.pipeline import events as EV
from net_spider_spark.pipeline import text as TX


def test_common_ngrams_finds_planted_boilerplate(spark):
    boiler = "all rights reserved worldwide"
    rows = [(i, f"doc body {i} unique words here {boiler}") for i in range(50)]
    rows += [(100 + i, f"totally different text {i} nothing shared") for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    top = TX.common_ngrams(docs, n=3, top_k=5).collect()
    assert top[0]["rank"] == 1
    # the planted 4-word phrase yields 2 trigrams present in 50 docs
    assert top[0]["doc_freq"] == 50
    assert "rights" in top[0]["ngram"] or "reserved" in top[0]["ngram"]
    # each doc counted once per gram (distinct per doc)
    assert all(r["doc_freq"] <= 55 for r in top)


def test_bm25_ranks_relevant_docs(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark spark spark join window"),  # high tf for spark
            (2, "spark join"),                     # short, both terms
            (3, "the quick brown fox"),            # no terms
            (4, "join join join join join join join join"),  # common term
            (5, "window functions only"),
        ],
        "doc_id long, text string",
    )
    out = TX.bm25_search(docs, ["spark", "join"], top_k=5).collect()
    ids = [r["doc_id"] for r in out]
    assert 3 not in ids  # zero-score docs excluded
    assert ids[0] in (1, 2)  # docs matching the rarer term rank first
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    ranks = [r["rank"] for r in out]
    assert ranks == list(range(1, len(out) + 1))


def test_bm25_case_insensitive_and_dedup_terms(spark):
    docs = spark.createDataFrame(
        [(1, "Spark SPARK spark"), (2, "nothing")], "doc_id long, text string"
    )
    out = TX.bm25_search(docs, ["SPARK", "spark"], top_k=5).collect()
    assert [r["doc_id"] for r in out] == [1]


def test_value_quantiles_match_numpy(spark):
    import numpy as np

    vals = [float(v % 97) for v in range(500)]
    df = spark.createDataFrame(
        [("a", v) for v in vals], "event_type string, value double"
    )
    r = EV.value_quantiles(df).collect()[0]
    assert r["n_events"] == 500
    for q, col in [(0.5, "p50"), (0.9, "p90"), (0.99, "p99")]:
        want = float(np.quantile(np.array(vals), q))  # linear interp
        assert abs(r[col] - want) < 1e-9, col
    assert r["value_min"] == 0.0 and r["value_max"] == 96.0
