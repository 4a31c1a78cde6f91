"""Z-order layout: interleave math vs a python spec, and the property
that actually matters — per-file min/max stats prune on BOTH columns."""

import pytest
from pyspark.sql import functions as F

from net_spider_spark import layout as LY


def py_interleave(a: int, b: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_interleave_matches_spec(spark):
    rows = [(a, b) for a in (0, 1, 5, 255, 1023) for b in (0, 2, 7, 255, 1023)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select(
            "a", "b", LY.zorder_interleave(F.col("a"), F.col("b"), 10).alias("z")
        ).collect()
    }
    for (a, b), z in got.items():
        assert z == py_interleave(a, b, 10), (a, b)
    # z-order locality: adjacent points differ in few low bits
    assert got[(0, 0)] == 0 and got[(1, 0)] == 1 and got[(0, 2)] == 8
    with pytest.raises(ValueError):
        LY.zorder_interleave(F.col("a"), F.col("b"), 0)


def test_zorder_value_null_and_determinism(spark):
    df = spark.createDataFrame(
        [(0, 1.0, 10.0), (1, None, 20.0), (2, 3.0, None), (3, 4.0, 40.0)],
        "rid long, x double, y double",
    )
    out = {r["rid"]: r["z_value"]
           for r in LY.zorder_value(df, ["x", "y"], bits=8).collect()}
    assert out[1] is None and out[2] is None
    assert out[0] is not None and out[3] is not None
    again = {r["rid"]: r["z_value"]
             for r in LY.zorder_value(df, ["x", "y"], bits=8).collect()}
    assert out == again
    with pytest.raises(ValueError):
        LY.zorder_value(df, ["x"], bits=8)


def _file_extents(spark, path, cols):
    """Per parquet file: (min, max) of each col — what a stats-based
    scan pruner sees."""
    import glob

    exts = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        row = (
            spark.read.parquet(f)
            .agg(
                *[F.min(c).alias(f"lo_{c}") for c in cols],
                *[F.max(c).alias(f"hi_{c}") for c in cols],
            )
            .first()
        )
        exts.append({c: (row[f"lo_{c}"], row[f"hi_{c}"]) for c in cols})
    return exts


def test_write_zordered_prunes_both_columns(spark, tmp_path):
    # 2-D uniform grid: a layout sorted by x alone would leave y stats
    # useless (every file spans all of y). Z-order must keep BOTH
    # per-file ranges narrow enough that a point predicate on either
    # column skips most files.
    import random

    rng = random.Random(42)
    rows = [(i, rng.randrange(1 << 20), rng.randrange(1 << 20))
            for i in range(20000)]
    df = spark.createDataFrame(rows, "rid long, x long, y long")
    path = str(tmp_path / "zord")
    LY.write_zordered(df, path, ["x", "y"], n_files=16, bits=10)
    back = spark.read.parquet(path)
    assert back.count() == 20000 and "z_value" in back.columns
    exts = _file_extents(spark, path, ["x", "y"])
    assert len(exts) >= 8  # files actually split along the curve

    def hit_fraction(col):
        probes = [rng.randrange(1 << 20) for _ in range(50)]
        hits = sum(
            sum(1 for e in exts if e[col][0] <= p <= e[col][1])
            for p in probes
        )
        return hits / (len(probes) * len(exts))

    fx, fy = hit_fraction("x"), hit_fraction("y")
    # balanced curve: a point survives ~sqrt(1/n_files) of files per
    # dimension (~25% at 16) — assert well under the 100% a
    # single-column sort leaves for the OTHER column
    assert fx < 0.6, fx
    assert fy < 0.6, fy
    # and within each file, rows are in z order
    for i, _ in enumerate(exts):
        pass  # extents existence already proves the partitioning; order:
    import glob

    f0 = sorted(glob.glob(f"{path}/part-*.parquet"))[0]
    zs = [r["z_value"] for r in spark.read.parquet(f0).select("z_value").collect()]
    assert zs == sorted(zs)


def test_write_findings_zordered_prunes_subject_lookups(spark, tmp_path):
    """The r8 history-table layout claim: vs write_findings (whose
    per-file subject stats are useless — every write task spans the
    full subject range), write_findings_zordered must (a) return
    byte-identical query results and (b) leave per-file subject_node
    min/max ranges narrow enough that an F2 point lookup skips most
    files on stats alone, while found_at stats still prune intervals."""
    import glob

    from net_spider_spark import demo
    from net_spider_spark import ingest as IG

    findings = demo.events_findings(spark, "/root/testdata/sf0.001")
    flat = str(tmp_path / "flat")
    zord = str(tmp_path / "zord")
    IG.write_findings(findings, flat, mode="overwrite", partition_by_day=False)
    IG.write_findings_zordered(findings, zord, n_files=16, bits=12)

    back_flat = spark.read.parquet(flat)
    back_zord = spark.read.parquet(zord)
    # identical schema (no layout columns leak) and identical data
    assert sorted(back_zord.columns) == sorted(back_flat.columns)
    key = [r["finding_id"] for r in back_zord.select("finding_id").collect()]
    assert sorted(key) == sorted(
        r["finding_id"] for r in back_flat.select("finding_id").collect()
    )
    probe = back_flat.select("subject_node").first()["subject_node"]
    got = sorted(
        r["finding_id"]
        for r in back_zord.where(F.col("subject_node") == probe).collect()
    )
    want = sorted(
        r["finding_id"]
        for r in back_flat.where(F.col("subject_node") == probe).collect()
    )
    assert got == want and got

    def hit_fraction(path, col, probes):
        exts = _file_extents(spark, path, [col])
        hits = sum(
            sum(1 for e in exts if e[col][0] <= p <= e[col][1])
            for p in probes
        )
        return hits / (len(probes) * len(exts)), len(exts)

    subjects = [
        r["subject_node"]
        for r in back_flat.select("subject_node").distinct().limit(20).collect()
    ]
    f_zord, n_zord = hit_fraction(zord, "subject_node", subjects)
    f_flat, n_flat = hit_fraction(flat, "subject_node", subjects)
    assert n_zord >= 8  # layout actually split along the curve
    # flat layout: every file spans ~all subjects -> ~1.0; z-order must
    # skip most files for a point subject
    assert f_flat > 0.9, f_flat
    assert f_zord < 0.5, (f_zord, f_flat)
    # and the time axis still prunes: a tight found_at probe hits few files
    ts = [r["found_at"] for r in back_flat.select("found_at").limit(10).collect()]
    f_time, _ = hit_fraction(zord, "found_at", ts)
    assert f_time < 0.7, f_time


def test_compact_history_zorder_relayouts_day_table(spark, tmp_path):
    """OPTIMIZE-ZORDER: a stream-appended day-partitioned table (whose
    per-file subject stats are useless) compacts into a globally
    Z-curve-laid table — same rows, subject lookups now prune."""
    from net_spider_spark import demo
    from net_spider_spark import ingest as IG

    findings = demo.events_findings(spark, "/root/testdata/sf0.001")
    path = str(tmp_path / "hist")
    IG.write_findings(findings, path, mode="overwrite")  # day-partitioned
    before = spark.read.parquet(path)
    n = before.count()
    stats = IG.compact_history(
        spark, path, target_rows_per_file=32, zorder=True
    )
    assert stats["rows"] == n and stats["files_after"] >= 4
    back = spark.read.parquet(path)
    assert back.count() == n and "found_day" not in back.columns
    subjects = [
        r["subject_node"]
        for r in back.select("subject_node").distinct().limit(15).collect()
    ]
    # unoccupied curve slices write empty files (None stats — a pruner
    # skips them for free); measure over the occupied ones
    exts = [
        e
        for e in _file_extents(spark, path, ["subject_node"])
        if e["subject_node"][0] is not None
    ]
    assert len(exts) >= 4
    hits = sum(
        sum(1 for e in exts if e["subject_node"][0] <= s <= e["subject_node"][1])
        for s in subjects
    )
    assert hits / (len(subjects) * len(exts)) < 0.6


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    from net_spider_spark import layout as LY

    left = spark.range(200).selectExpr("id AS k", "id * 2 AS a")
    right = spark.range(200).selectExpr("id AS k", "id * 3 AS b")
    lt = LY.write_bucketed(
        left, "t_bkt_left", ["k"], n_buckets=4, sort_cols=["k"],
        path=str(tmp_path / "l"),
    )
    rt = LY.write_bucketed(
        right, "t_bkt_right", ["k"], n_buckets=4, sort_cols=["k"],
        path=str(tmp_path / "r"),
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = lt.join(rt, "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located: the join runs on the write-time hash layout —
        # no shuffle on either side, and the scans are bucketed
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert "Bucketed: true" in plan
        # and bucketing never changes the answer
        assert joined.count() == 200
        got = {r["k"]: (r["a"], r["b"]) for r in joined.collect()}
        assert got[7] == (14, 21)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_bkt_left")
        spark.sql("DROP TABLE IF EXISTS t_bkt_right")


def test_bucketed_groupby_on_bucket_key_no_exchange(spark, tmp_path):
    from net_spider_spark import layout as LY

    df = spark.range(100).selectExpr("id % 10 AS k", "id AS v")
    t = LY.write_bucketed(
        df, "t_bkt_agg", ["k"], n_buckets=4, path=str(tmp_path / "g")
    )
    try:
        agg = t.groupBy("k").count()
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert agg.count() == 10
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bkt_agg")


def test_write_bucketed_replaces_stale_table(spark, tmp_path):
    from net_spider_spark import layout as LY

    df1 = spark.range(10).selectExpr("id AS k")
    LY.write_bucketed(df1, "t_bkt_stale", ["k"], path=str(tmp_path / "a"))
    # same name, different location: the drop-first contract means the
    # second write wins cleanly
    df2 = spark.range(20).selectExpr("id AS k")
    t = LY.write_bucketed(df2, "t_bkt_stale", ["k"], path=str(tmp_path / "b"))
    try:
        assert t.count() == 20
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bkt_stale")
