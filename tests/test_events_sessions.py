"""Sessionization behavior: planted gaps split sessions, ties are
deterministic, rollups match the islands."""

from net_spider_spark.pipeline import events as EV

MIN = 60_000


def test_sessionize_planted_gaps(spark):
    rows = [
        # user 1: two sessions (40-min gap between e3 and e4)
        (1, 1, 0), (2, 1, 10 * MIN), (3, 1, 25 * MIN),
        (4, 1, 65 * MIN), (5, 1, 70 * MIN),
        # user 2: one long session — every gap exactly 30 min (boundary:
        # NOT a break, the contract is strictly-greater)
        (6, 2, 0), (7, 2, 30 * MIN), (8, 2, 60 * MIN),
        # user 3: single event
        (9, 3, 5 * MIN),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts_ms long")
    got = {r["event_id"]: r for r in EV.sessionize(df).collect()}
    assert [got[i]["session_idx"] for i in (1, 2, 3, 4, 5)] == [0, 0, 0, 1, 1]
    assert [got[i]["session_idx"] for i in (6, 7, 8)] == [0, 0, 0]
    assert got[9]["session_idx"] == 0
    assert got[4]["session_id"] == (1 << 20) + 1
    assert got[6]["session_id"] == 2 << 20

    stats = {r["session_id"]: r for r in
             EV.session_stats(EV.sessionize(df)).collect()}
    s2 = stats[(1 << 20) + 1]
    assert (s2["n_events"], s2["duration_ms"]) == (2, 5 * MIN)
    assert (s2["session_start"], s2["session_end"]) == (65 * MIN, 70 * MIN)
    s_u2 = stats[2 << 20]
    assert s_u2["n_events"] == 3 and s_u2["duration_ms"] == 60 * MIN


def test_sessionize_tie_break_deterministic(spark):
    # same timestamp, different event_ids: ordering (and thus session
    # numbering after a gap) must not depend on partitioning
    rows = [(i, 1, 0) for i in range(20)] + [(100, 1, 120 * MIN)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts_ms long")
    a = sorted((r["event_id"], r["session_idx"])
               for r in EV.sessionize(df).collect())
    b = sorted((r["event_id"], r["session_idx"])
               for r in EV.sessionize(df.repartition(7)).collect())
    assert a == b
    assert dict(a)[100] == 1


def test_funnel_order_matters(spark):
    from net_spider_spark.pipeline.events import funnel

    rows = [
        # u1 completes all three in order
        (1, "signup", 100), (1, "click", 200), (1, "purchase", 300),
        # u2 purchased BEFORE clicking -> reaches click, not purchase
        (2, "signup", 100), (2, "purchase", 150), (2, "click", 200),
        # u3 clicked before signup -> stops at signup
        (3, "click", 50), (3, "signup", 100),
        # u4 never signed up
        (4, "click", 10), (4, "purchase", 20),
        # u5: same-ts signup+click counts (>= chaining)
        (5, "signup", 100), (5, "click", 100), (5, "purchase", 100),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts_ms long"
    )
    got = {
        r["stage"]: r["n_users"]
        for r in funnel(ev, ("signup", "click", "purchase")).collect()
    }
    assert got == {"signup": 4, "click": 3, "purchase": 2}


def test_retention_cohorts(spark):
    from net_spider_spark.pipeline import events as EV

    day = 86_400_000
    # u1: days 0,1,3; u2: days 0,2; u3: day 1 only
    rows = [(1, 0), (1, day), (1, 3 * day), (1, day + 500),
            (2, 100), (2, 2 * day), (3, day)]
    df = spark.createDataFrame(rows, "user_id long, ts_ms long")
    got = {
        (r["cohort_start"], r["day_offset"]): (
            r["n_active"], r["cohort_size"], r["retention"])
        for r in EV.retention_cohorts(df).collect()
    }
    # cohort day0 = {u1, u2}; cohort day1 = {u3}
    assert got[(0, 0)] == (2, 2, 1.0)
    assert got[(0, 1)] == (1, 2, 0.5)   # u1 back on day 1
    assert got[(0, 2)] == (1, 2, 0.5)   # u2 back on day 2
    assert got[(0, 3)] == (1, 2, 0.5)   # u1 back on day 3
    assert got[(day, 0)] == (1, 1, 1.0)
    assert len(got) == 5
    # max_offset drops the tail
    trimmed = EV.retention_cohorts(df, max_offset=1).collect()
    assert {(r["cohort_start"], r["day_offset"]) for r in trimmed} == {
        (0, 0), (0, 1), (day, 0)
    }
