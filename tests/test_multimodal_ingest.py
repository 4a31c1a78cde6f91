"""Multimodal plumbing + partitioned ingest layout tests."""

import glob

from pyspark.sql import functions as F

from net_spider_spark.findings import FoundLink, FoundNode, findings_to_df
from net_spider_spark.ingest import clear_all, read_findings, write_findings
from net_spider_spark.pipeline.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    frame_sample_plan,
    media_stats,
)


def _media(spark):
    rows = [
        (1, "image/png", b"\x89PNG fakebytes", {"width": "64", "height": "64"}),
        (2, "audio/wav", b"RIFF fakebytes", {"sample_rate": "16000"}),
        (3, "video/mp4", b"\x00mp4 fakebytes", {"duration_ms": "3500"}),
        (4, "image/png", None, {}),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_with_error_channel(spark):
    out = {r["media_id"]: r.asDict() for r in extract_features(_media(spark)).collect()}
    assert len(out[1]["feature"]) == 8
    assert out[1]["error"] is None
    assert out[1]["digest"] is not None and out[1]["n_bytes"] == 14
    # None payload -> error channel, not a task failure
    assert out[4]["feature"] is None
    assert "ValueError" in out[4]["error"]


def test_media_stats_and_frame_plan(spark):
    stats = {r["mime"]: r["n_items"] for r in media_stats(_media(spark)).collect()}
    assert stats == {"image/png": 2, "audio/wav": 1, "video/mp4": 1}
    frames = frame_sample_plan(_media(spark), every_n_ms=1000).collect()
    assert [(r["media_id"], r["frame_ts_ms"]) for r in frames] == [
        (3, 0), (3, 1000), (3, 2000), (3, 3000)
    ]


def test_partitioned_ingest_roundtrip(spark, tmp_path):
    findings = [
        FoundNode("a", 1_700_000_000_000, [FoundLink("b")]),   # 2023-11-14
        FoundNode("b", 1_700_100_000_000, []),                 # 2023-11-16
    ]
    path = str(tmp_path / "history")
    write_findings(findings_to_df(spark, findings), path)
    # layout: one dir per observation day
    days = sorted(p.split("found_day=")[1] for p in glob.glob(f"{path}/found_day=*"))
    assert days == ["2023-11-14", "2023-11-16"]
    back = read_findings(spark, path)
    assert back.count() == 2 and "found_day" not in back.columns
    # interval-driven partition pruning: only the matching day is read
    from net_spider_spark.interval import Interval

    pruned = read_findings(spark, path, Interval.since(1_700_050_000_000))
    assert pruned.count() == 1
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "2023-11-14" not in plan  # pruned partition absent from scan
    clear_all(spark, path)
    assert read_findings(spark, path).count() == 0


def test_bucketed_table_skips_shuffle(spark, tmp_path):
    from net_spider_spark.ingest import write_findings_bucketed
    from net_spider_spark.snapshot import latest_findings_per_node

    findings = findings_to_df(
        spark,
        [FoundNode(f"n{i % 7}", 1000 + i, [FoundLink("x")]) for i in range(50)],
    )
    spark.sql("DROP TABLE IF EXISTS findings_bucketed")
    write_findings_bucketed(findings, "findings_bucketed", n_buckets=4)
    table = spark.table("findings_bucketed")
    assert table.count() == 50
    # the per-subject aggregate over the bucketed table plans NO shuffle
    agg = table.groupBy("subject_node").count()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # and the policy dedup still computes correctly from it
    assert latest_findings_per_node(table).count() == 7
    spark.sql("DROP TABLE findings_bucketed")


def test_sniff_media_headers(spark):
    import struct

    from net_spider_spark.pipeline.multimodal import sniff_media_headers

    png = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
           + struct.pack(">II", 640, 480) + b"\x08\x06\x00\x00\x00")
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\xf7\x00\x00"
    wav = (b"RIFF" + struct.pack("<I", 36) + b"WAVE" + b"fmt "
           + struct.pack("<IHHIIHH", 16, 1, 2, 44100, 176400, 4, 16))
    jpeg = b"\xff\xd8\xff\xe0\x00\x10JFIF\x00"
    mp3 = b"ID3\x04\x00\x00\x00\x00\x00\x00"
    junk = b"not a media file at all"
    rows = [(1, png), (2, gif), (3, wav), (4, jpeg), (5, mp3), (6, junk)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in sniff_media_headers(df).collect()}
    assert got[1]["sniffed_format"] == "png"
    assert (got[1]["sniffed_width"], got[1]["sniffed_height"]) == (640, 480)
    assert got[2]["sniffed_format"] == "gif"
    assert (got[2]["sniffed_width"], got[2]["sniffed_height"]) == (320, 200)
    assert got[3]["sniffed_format"] == "wav"
    assert got[3]["sniffed_sample_rate"] == 44100
    assert got[3]["sniffed_channels"] == 2
    assert got[4]["sniffed_format"] == "jpeg"
    assert got[4]["sniffed_width"] is None  # SOF scan is the decoder's job
    assert got[5]["sniffed_format"] == "mp3"
    assert got[6]["sniffed_format"] is None
    # codegen-only: no Exchange in the plan
    plan = sniff_media_headers(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
