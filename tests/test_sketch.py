"""KMV distinct sketch: exactness below k, estimator accuracy above k,
and the merge property (sketch of union == merge of sketches)."""

import pytest
from pyspark.sql import functions as F

from net_spider_spark.pipeline.sketch import (
    kmv_distinct,
    kmv_estimate,
    kmv_merge,
    kmv_sketch,
)


@pytest.fixture(scope="module")
def users(spark):
    # 3 groups with known cardinalities: 10, 300, 5000
    return spark.range(5000).select(
        F.when(F.col("id") < 10, "small")
        .when(F.col("id") < 310, "mid")
        .otherwise("big")
        .alias("grp"),
        F.col("id").alias("uid"),
    ).union(
        # duplicates must not change any estimate
        spark.range(5000).select(
            F.when(F.col("id") < 10, "small")
            .when(F.col("id") < 310, "mid")
            .otherwise("big")
            .alias("grp"),
            F.col("id").alias("uid"),
        )
    )


def test_exact_below_k(spark, users):
    out = {
        r["grp"]: (r["n_kept"], r["est_distinct"])
        for r in kmv_distinct(users, ["grp"], "uid", k=64).collect()
    }
    assert out["small"] == (10, 10)
    # mid (300) and big (4690) exceed k=64 -> estimator path
    assert out["mid"][0] == 64 and out["big"][0] == 64


def test_estimator_accuracy(spark, users):
    k = 256
    out = {
        r["grp"]: r["est_distinct"]
        for r in kmv_distinct(users, ["grp"], "uid", k=k).collect()
    }
    # big group: 4690 true distinct; SE ~ 1/sqrt(k-2) ~ 6.3%; allow 4 SE
    assert abs(out["big"] - 4690) / 4690 < 0.25
    assert abs(out["mid"] - 300) / 300 < 0.25


def test_merge_property(spark, users):
    k = 32
    evens = users.where(F.col("uid") % 2 == 0)
    odds = users.where(F.col("uid") % 2 == 1)
    merged = kmv_merge(
        kmv_sketch(evens, ["grp"], "uid", k=k),
        kmv_sketch(odds, ["grp"], "uid", k=k),
        ["grp"],
        k=k,
    )
    whole = kmv_sketch(users, ["grp"], "uid", k=k)
    m = {r["grp"]: r["kmv"] for r in merged.collect()}
    w = {r["grp"]: r["kmv"] for r in whole.collect()}
    assert m == w
    # and the estimate off the merged sketch matches too
    em = {
        r["grp"]: r["est_distinct"]
        for r in kmv_estimate(merged, k=k).collect()
    }
    ew = {
        r["grp"]: r["est_distinct"]
        for r in kmv_estimate(whole, k=k).collect()
    }
    assert em == ew


def test_determinism_and_seed(spark, users):
    a = {
        r["grp"]: r["est_distinct"]
        for r in kmv_distinct(users, ["grp"], "uid", k=64).collect()
    }
    b = {
        r["grp"]: r["est_distinct"]
        for r in kmv_distinct(users, ["grp"], "uid", k=64).collect()
    }
    assert a == b  # same seed -> bit-identical
    c = {
        r["grp"]: r["est_distinct"]
        for r in kmv_distinct(users, ["grp"], "uid", k=64, seed="other").collect()
    }
    assert c["small"] == a["small"] == 10  # below-k exact path seed-free
