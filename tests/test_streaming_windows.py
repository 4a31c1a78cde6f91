"""Watermarked windowed aggregation: closed windows emit once with
correct stats, too-late rows are dropped, stream agrees with the batch
twin on in-time data."""

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from net_spider_spark.streaming.windows import stream_windowed_stats

SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for et, ts, v in rows:
            f.write(
                json.dumps({"event_type": et, "ts": ts, "value": v}) + "\n"
            )


def _run_append(spark, src, ckpt, out):
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    q = (
        stream_windowed_stats(
            stream, window="1 hour", watermark="30 minutes"
        )
        .writeStream.outputMode("append")
        .foreachBatch(
            lambda df, _id: out.extend(
                r.asDict() for r in df.collect()
            )
        )
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_windows_close_and_late_rows_drop(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    _write_jsonl(
        src / "b1.jsonl",
        [
            ("click", "2024-01-01T00:10:00Z", 1.0),
            ("click", "2024-01-01T00:50:00Z", 3.0),
            ("error", "2024-01-01T00:20:00Z", 5.0),
        ],
    )
    out = []
    _run_append(spark, src, tmp_path / "ck1", out)
    # watermark hasn't passed 01:00 yet -> nothing emitted
    assert out == []

    # batch 2: watermark jumps past hour 0 (event at 02:00, wm 30min ->
    # 01:30) and a too-late straggler for hour 0 arrives WITH it
    _write_jsonl(
        src / "b2.jsonl",
        [
            ("click", "2024-01-01T02:00:00Z", 7.0),
            ("click", "2024-01-01T00:55:00Z", 100.0),  # late, pre-wm batch
        ],
    )
    out2 = []
    _run_append(spark, src, tmp_path / "ck1", out2)
    got = {
        (r["event_type"], r["window_start"].isoformat()): (
            r["n_events"],
            r["value_sum"],
        )
        for r in out2
    }
    # the straggler is in the same batch as the wm-advancing event, so
    # it still lands (watermark moves at batch END); hour-0 windows
    # close with it included
    assert got[("click", "2024-01-01T00:00:00")] == (3, 104.0)
    assert got[("error", "2024-01-01T00:00:00")] == (1, 5.0)

    # batch 3: a row for hour 0 arriving AFTER the watermark passed
    # 01:00 is dropped — the closed window never re-emits
    _write_jsonl(
        src / "b3.jsonl",
        [
            ("click", "2024-01-01T00:05:00Z", 999.0),  # too late
            ("click", "2024-01-01T04:00:00Z", 1.0),  # wm -> 03:30 > 03:00
        ],
    )
    out3 = []
    _run_append(spark, src, tmp_path / "ck1", out3)
    starts = {r["window_start"].isoformat() for r in out3}
    assert "2024-01-01T00:00:00" not in starts  # no re-emit of hour 0
    assert ("2024-01-01T02:00:00") in starts  # hour-2 window closed


def test_stream_agrees_with_batch_twin(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    rows = [
        ("click", f"2024-01-01T0{h}:{m:02d}:00Z", float(h * 60 + m))
        for h in range(3)
        for m in (5, 25, 45)
    ]
    _write_jsonl(src / "b1.jsonl", rows)
    # sentinel far in the future closes every real window
    _write_jsonl(src / "b2.jsonl", [("click", "2024-02-01T00:00:00Z", 0.0)])
    out = []
    _run_append(spark, src, tmp_path / "ck", out)

    batch = spark.read.schema(SCHEMA).json(str(src / "b1.jsonl"))
    want = {
        (r["event_type"], r["window_start"]): (
            r["n_events"],
            r["value_sum"],
            r["value_min"],
            r["value_max"],
        )
        for r in stream_windowed_stats(batch, window="1 hour").collect()
    }
    got = {
        (r["event_type"], r["window_start"]): (
            r["n_events"],
            r["value_sum"],
            r["value_min"],
            r["value_max"],
        )
        for r in out
    }
    assert got == want


def test_sliding_windows(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    _write_jsonl(
        src / "b1.jsonl",
        [
            ("click", "2024-01-01T00:40:00Z", 2.0),
            ("click", "2024-01-01T05:00:00Z", 1.0),  # closes hour-0 wins
        ],
    )
    out = []
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    q = (
        stream_windowed_stats(
            stream,
            window="1 hour",
            slide="30 minutes",
            watermark="10 minutes",
        )
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, _id: out.extend(r.asDict() for r in df.collect()))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    starts = sorted(
        r["window_start"].isoformat()
        for r in out
        if r["window_start"].year == 2024 and r["window_start"].hour == 0
    )
    # the 00:40 event belongs to the [00:00,01:00) and [00:30,01:30) panes
    assert starts == ["2024-01-01T00:00:00", "2024-01-01T00:30:00"]
