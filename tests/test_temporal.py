"""Temporal operators: as-of join, interval (range) join, hypertable
rollup. Semantics pinned with handcrafted rows; the as-of join is also
cross-checked against a slow exact formulation (inequality join +
row_number) on generated data, and the rollup's coarse resolutions
against direct aggregation of the raw rows.
"""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from net_spider_spark.pipeline.temporal import (
    asof_join,
    interval_join,
    time_rollup,
)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    # (key, ts, id) streams: quotes are the reference, trades probe.
    quotes = spark.createDataFrame(
        [
            ("a", 10, 1, 100.0),
            ("a", 20, 2, 101.0),
            ("a", 20, 3, 102.0),  # duplicate ts: max id wins backward
            ("a", 40, 4, 103.0),
            ("b", 15, 5, 200.0),
        ],
        "key string, ts long, qid long, px double",
    )
    trades = spark.createDataFrame(
        [
            ("a", 5, 100),   # before any quote -> null
            ("a", 20, 101),  # exact tie -> qid 3 (exact) / qid 1 (strict)
            ("a", 39, 102),  # -> qid 3
            ("a", 40, 103),  # -> qid 4 exact / qid 3 strict
            ("b", 100, 104),  # -> qid 5 (or null under tolerance)
            ("c", 7, 105),   # key with no quotes -> null
        ],
        "key string, ts long, tid long",
    )
    return trades, quotes


def _asof_map(df):
    return {
        r["tid"]: (r["asof_ts"], r["asof_qid"])
        for r in df.collect()
    }


def test_asof_backward_exact(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on="ts", by=["key"], ref_cols=["qid", "px"],
        ref_order="qid",
    )
    assert set(out.columns) == {
        "key", "ts", "tid", "asof_ts", "asof_qid", "asof_px"
    }
    m = _asof_map(out)
    assert m[100] == (None, None)
    assert m[101] == (20, 3)
    assert m[102] == (20, 3)
    assert m[103] == (40, 4)
    assert m[104] == (15, 5)
    assert m[105] == (None, None)


def test_asof_backward_strict(spark, trades_quotes):
    trades, quotes = trades_quotes
    m = _asof_map(
        asof_join(
            trades, quotes, on="ts", by=["key"], ref_cols=["qid"],
            allow_exact_matches=False, ref_order="qid",
        )
    )
    assert m[101] == (10, 1)  # equal-ts quotes invisible
    assert m[103] == (20, 3)


def test_asof_forward(spark, trades_quotes):
    trades, quotes = trades_quotes
    m = _asof_map(
        asof_join(
            trades, quotes, on="ts", by=["key"], ref_cols=["qid"],
            direction="forward", ref_order="qid",
        )
    )
    assert m[100] == (10, 1)
    assert m[101] == (20, 2)  # least qid at the tied timestamp
    assert m[102] == (40, 4)
    assert m[104] == (None, None)  # nothing after ts=100 for key b

    strict = _asof_map(
        asof_join(
            trades, quotes, on="ts", by=["key"], ref_cols=["qid"],
            direction="forward", allow_exact_matches=False,
            ref_order="qid",
        )
    )
    assert strict[103] == (None, None)  # 40 is exact; nothing later


def test_asof_tolerance(spark, trades_quotes):
    trades, quotes = trades_quotes
    m = _asof_map(
        asof_join(
            trades, quotes, on="ts", by=["key"], ref_cols=["qid"],
            tolerance=10, ref_order="qid",
        )
    )
    assert m[104] == (None, None)  # gap 85 > 10
    assert m[102] == (None, None)  # gap 19 > 10
    assert m[101] == (20, 3)       # gap 0


def test_asof_matches_slow_exact(spark):
    """Window formulation == inequality-join formulation on a dense
    generated stream (the slow path is the obviously-correct spec)."""
    probe = spark.range(200).select(
        (F.col("id") % 7).alias("key"),
        ((F.col("id") * 37) % 101).alias("ts"),
        F.col("id").alias("pid"),
    )
    ref = spark.range(120).select(
        (F.col("id") % 7).alias("key"),
        ((F.col("id") * 53) % 97).alias("ts"),
        F.col("id").alias("rid"),
    )
    fast = asof_join(
        probe, ref, on="ts", by=["key"], ref_cols=["rid"], ref_order="rid"
    )
    w = Window.partitionBy("pid").orderBy(
        F.desc("r_ts"), F.desc("rid")
    )
    slow = (
        probe.join(
            ref.select(
                "key", F.col("ts").alias("r_ts"), "rid"
            ),
            on=["key"],
            how="left",
        )
        .where(F.col("r_ts") <= F.col("ts"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("pid", F.col("r_ts").alias("asof_ts"), F.col("rid").alias("asof_rid"))
    )
    fast_m = {r["pid"]: (r["asof_ts"], r["asof_rid"]) for r in fast.collect()}
    slow_m = {r["pid"]: (r["asof_ts"], r["asof_rid"]) for r in slow.collect()}
    for pid, got in fast_m.items():
        assert got == slow_m.get(pid, (None, None)), pid
    assert len(fast_m) == probe.count()


def test_interval_join(spark):
    intervals = spark.createDataFrame(
        [
            ("a", 0, 100, 1),
            ("a", 90, 250, 2),   # overlaps interval 1 on [90, 100]
            ("b", 50, 60, 3),
            ("a", 5000, 12000, 4),  # spans many buckets
        ],
        "key string, lo long, hi long, iv_id long",
    )
    points = spark.createDataFrame(
        [
            ("a", 95, 10),    # in 1 AND 2
            ("a", 100, 11),   # inclusive end of 1, in 2
            ("a", 300, 12),   # in none
            ("b", 55, 13),    # in 3
            ("a", 55, 14),    # in 1 (wrong key for 3)
            ("a", 11999, 15),  # in 4
        ],
        "key string, ts long, pt_id long",
    )
    out = interval_join(
        points, intervals, point_ts="ts", start_col="lo", end_col="hi",
        by=["key"], bucket=64,
    )
    pairs = {(r["pt_id"], r["iv_id"]) for r in out.collect()}
    assert pairs == {
        (10, 1), (10, 2), (11, 1), (11, 2), (13, 3), (14, 1), (15, 4)
    }
    # each qualifying pair appears exactly once (no bucket double-count)
    assert out.count() == len(pairs)


def test_interval_join_no_cartesian(spark):
    intervals = spark.createDataFrame(
        [(0, 100, 1)], "lo long, hi long, iv_id long"
    )
    points = spark.createDataFrame([(5, 10)], "ts long, pt_id long")
    plan = interval_join(
        points, intervals, "ts", "lo", "hi", bucket=1000
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_time_rollup(spark):
    events = spark.createDataFrame(
        [
            ("x", 30_000, 1.0),
            ("x", 59_000, 3.0),
            ("x", 61_000, 5.0),
            ("y", 3_599_000, 7.0),
            ("y", 3_600_000, 9.0),
        ],
        "event_type string, ts_ms long, value double",
    )
    out = time_rollup(events, resolutions=(60_000, 3_600_000))
    rows = {
        (r["event_type"], r["resolution"], r["bucket_start"]): r
        for r in out.collect()
    }
    fine = rows[("x", 60_000, 0)]
    assert fine["n_events"] == 2 and fine["value_sum"] == 4.0
    assert fine["value_min"] == 1.0 and fine["value_max"] == 3.0
    assert rows[("x", 60_000, 60_000)]["value_sum"] == 5.0
    hour_x = rows[("x", 3_600_000, 0)]
    assert hour_x["n_events"] == 3 and hour_x["value_sum"] == 9.0
    assert hour_x["value_avg"] == 3.0
    assert rows[("y", 3_600_000, 0)]["n_events"] == 1
    assert rows[("y", 3_600_000, 3_600_000)]["value_sum"] == 9.0


def test_time_rollup_coarse_equals_direct(spark):
    """Re-aggregated coarse buckets == direct aggregation of raw rows."""
    events = spark.range(5000).select(
        (F.col("id") % 3).cast("string").alias("event_type"),
        ((F.col("id") * 977) % 10_000_000).alias("ts_ms"),
        ((F.col("id") % 100) / 4.0).alias("value"),
    )
    out = time_rollup(events, resolutions=(60_000, 3_600_000)).where(
        F.col("resolution") == 3_600_000
    )
    direct = events.groupBy(
        "event_type",
        ((F.col("ts_ms") / F.lit(3_600_000)).cast("long") * 3_600_000).alias(
            "bucket_start"
        ),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("value_sum"),
    )
    got = {
        (r["event_type"], r["bucket_start"]): (r["n_events"], r["value_sum"])
        for r in out.collect()
    }
    want = {
        (r["event_type"], r["bucket_start"]): (r["n_events"], r["value_sum"])
        for r in direct.collect()
    }
    assert got == want

    with pytest.raises(ValueError):
        time_rollup(events, resolutions=(60_000, 90_000))


def test_gap_fill_modes(spark):
    from net_spider_spark.pipeline import temporal as TP

    # group a: buckets 0,2,5 (of 0..5); group b: dense already
    rows = [
        ("a", 0, 10, 1.5), ("a", 200, 20, 2.5), ("a", 500, 30, 3.5),
        ("b", 100, 7, 0.5), ("b", 200, 8, 1.0),
    ]
    df = spark.createDataFrame(
        rows, "grp string, bucket_start long, n_events long, value_sum double"
    )
    zero = {
        (r["grp"], r["bucket_start"]): (r["n_events"], r["value_sum"], r["is_gap"])
        for r in TP.gap_fill(
            df, ["grp"], step=100, value_cols=["n_events", "value_sum"],
            fill="zero",
        ).collect()
    }
    assert len(zero) == 6 + 2
    assert zero[("a", 100)] == (0, 0.0, True)
    assert zero[("a", 300)] == (0, 0.0, True)
    assert zero[("a", 200)] == (20, 2.5, False)
    assert zero[("b", 100)] == (7, 0.5, False)
    ffill = {
        (r["grp"], r["bucket_start"]): (r["n_events"], r["is_gap"])
        for r in TP.gap_fill(
            df, ["grp"], step=100, value_cols=["n_events"], fill="ffill"
        ).collect()
    }
    # carried forward from the last observed bucket
    assert ffill[("a", 100)] == (10, True)
    assert ffill[("a", 300)] == (20, True)
    assert ffill[("a", 400)] == (20, True)
    assert ffill[("a", 500)] == (30, False)
    nul = {
        (r["grp"], r["bucket_start"]): (r["n_events"], r["is_gap"])
        for r in TP.gap_fill(
            df, ["grp"], step=100, value_cols=["n_events"], fill="null"
        ).collect()
    }
    assert nul[("a", 300)] == (None, True)
    import pytest as _pt

    with _pt.raises(ValueError):
        TP.gap_fill(df, ["grp"], step=0)
    with _pt.raises(ValueError):
        TP.gap_fill(df, ["grp"], fill="bogus")
