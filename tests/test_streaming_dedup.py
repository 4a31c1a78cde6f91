"""Streaming exact-dedup lifecycle: forever mode (state = every
digest, cross-batch suppression), the RocksDB state-store provider
(same answers, off-heap state, real metrics), and the watermark-TTL
contract (within-horizon dropped, past-horizon re-emitted)."""

import json
import os
import time
import uuid

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from net_spider_spark.streaming.dedup import (
    rocksdb_state_conf,
    state_store_metrics,
    stream_dedup_digests,
)

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("event_time", T.TimestampType()),
    ]
)


def _write_batches(tmp_path, batches):
    """One JSON-lines file per batch with strictly increasing mtimes so
    the file source (maxFilesPerTrigger=1) replays them in order."""
    src = tmp_path / "in"
    src.mkdir()
    t0 = time.time() - len(batches)
    for i, rows in enumerate(batches):
        p = src / f"b{i}.jsonl"
        with open(p, "w") as fh:
            for doc_id, text, ts in rows:
                fh.write(
                    json.dumps(
                        {"doc_id": doc_id, "text": text, "event_time": ts}
                    )
                    + "\n"
                )
        os.utime(p, (t0 + i, t0 + i))
    return str(src)


def _read_stream(spark, src):
    raw = (
        spark.readStream.schema(
            "doc_id string, text string, event_time string"
        )
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    return raw.withColumn(
        "event_time", F.to_timestamp("event_time")
    )


def _run_append(spark, out, tmp_path, name):
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_forever_mode_suppresses_across_batches(spark, tmp_path):
    src = _write_batches(
        tmp_path,
        [
            [("d1", "alpha", "2024-01-01 00:00:00"),
             ("d2", "beta", "2024-01-01 00:01:00")],
            # alpha again in a later micro-batch: cross-batch state
            # must suppress it; gamma is new.
            [("d3", "alpha", "2024-01-01 01:00:00"),
             ("d4", "gamma", "2024-01-01 01:01:00")],
        ],
    )
    name = f"sdd_{uuid.uuid4().hex[:8]}"
    q = _run_append(spark, stream_dedup_digests(_read_stream(spark, src)),
                    tmp_path, name)
    got = {r["digest"] for r in spark.table(name).collect()}
    want = {r["d"] for r in spark.createDataFrame(
        [("alpha",), ("beta",), ("gamma",)], ["t"]
    ).select(F.md5("t").alias("d")).collect()}
    assert got == want
    # Exactly one emission per digest (no re-emit in batch 2).
    assert spark.table(name).count() == 3
    m = state_store_metrics(q)
    assert m["state_rows"] == 3  # one state row per distinct digest


def test_rocksdb_provider_same_answers_with_metrics(spark, tmp_path):
    src = _write_batches(
        tmp_path,
        [
            [("d1", "alpha", "2024-01-01 00:00:00")],
            [("d2", "alpha", "2024-01-01 01:00:00"),
             ("d3", "delta", "2024-01-01 01:01:00")],
        ],
    )
    saved = {}
    conf = rocksdb_state_conf(max_memory_mb=256)
    for k, v in conf.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        name = f"sddr_{uuid.uuid4().hex[:8]}"
        q = _run_append(
            spark, stream_dedup_digests(_read_stream(spark, src)),
            tmp_path, name,
        )
        assert spark.table(name).count() == 2  # alpha once, delta once
        m = state_store_metrics(q)
        assert m["state_rows"] == 2
        # Provider actually engaged: RocksDB custom metrics present.
        assert any(k.startswith("rocksdb") for k in m["custom"])
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_ttl_contract_within_and_past_horizon(spark, tmp_path):
    # ttl = 1 hour. Watermark advances at batch ENDS and evictions in
    # batch N use the watermark computed at the end of batch N-1, so
    # the horizon needs two batches to take effect: b1's filler@04:00
    # moves the watermark to 03:00, b2 runs under it (evicting alpha,
    # whose expiry is 00:00+1h) and admits beta, and b3 then probes:
    # alpha@04:30 RE-EMITS (state evicted — past horizon), beta@04:31
    # is dropped (within horizon).
    src = _write_batches(
        tmp_path,
        [
            [("d1", "alpha", "2024-01-01 00:00:00")],
            [("d2", "filler", "2024-01-01 04:00:00")],
            [("d3", "beta", "2024-01-01 04:11:00")],
            [("d4", "alpha", "2024-01-01 04:30:00"),
             ("d5", "beta", "2024-01-01 04:31:00")],
        ],
    )
    out = stream_dedup_digests(
        _read_stream(spark, src), event_time_col="event_time", ttl="1 hour"
    )
    name = f"sddt_{uuid.uuid4().hex[:8]}"
    _run_append(spark, out, tmp_path, name)
    alpha, beta = [
        r["d"]
        for r in spark.createDataFrame([("alpha",), ("beta",)], ["t"])
        .select(F.md5("t").alias("d"))
        .collect()
    ]
    counts = {
        r["digest"]: r["n"]
        for r in spark.table(name).groupBy("digest")
        .agg(F.count("*").alias("n")).collect()
    }
    assert counts[alpha] == 2  # re-emitted past the horizon
    assert counts[beta] == 1  # duplicate within the horizon dropped
    assert counts[
        [r["d"] for r in spark.createDataFrame([("filler",)], ["t"])
         .select(F.md5("t").alias("d")).collect()][0]
    ] == 1


def test_ttl_mode_requires_event_time():
    with pytest.raises(ValueError):
        stream_dedup_digests(None, ttl="1 hour")


def test_stream_cms_multibatch_equals_batch(spark, tmp_path):
    # The CMS cells aggregate maintained across MANY micro-batches must
    # equal the batch sketch bit-for-bit, and its state is bounded by
    # depth*width however long the stream runs.
    import pyspark.sql.functions as F

    from net_spider_spark.pipeline import sketch as SK

    src = str(tmp_path / "cms_src")
    rows = spark.range(3000).select(
        (F.col("id") % 97).cast("string").alias("val")
    )
    # three separate files -> three micro-batches at maxFilesPerTrigger=1
    for i in range(3):
        rows.where(F.col("val").cast("long") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema("val string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    cells = SK.cms_build(stream, "val", depth=4, width=64)
    ckpt = str(tmp_path / "cms_ckpt")
    q = (
        cells.writeStream.format("memory")
        .queryName("cms_mb_sink")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(map(tuple, spark.table("cms_mb_sink").collect()))
    want = sorted(
        map(tuple, SK.cms_build(
            spark.read.parquet(src), "val", depth=4, width=64
        ).collect())
    )
    assert got == want and len(got) <= 4 * 64


def test_stream_dedup_phash_collapses_cross_batch_reencodes(spark, tmp_path):
    """A picture arriving again in a LATER micro-batch as a different
    container (same pixels, different bytes) must collapse onto the
    first batch's keeper — the state row outlives the batch, and the
    content key is perceptual, not a byte digest."""
    import numpy as np

    from net_spider_spark.pipeline.multimodal import encode_png
    from net_spider_spark.streaming.dedup import stream_dedup_phash

    def picture(seed):
        from numpy.lib.stride_tricks import sliding_window_view

        r = np.random.RandomState(seed)
        n = r.rand(12, 16) * 255
        big = np.kron(n, np.ones((4, 4)))
        pad = np.pad(big, 2, mode="edge")
        sm = sliding_window_view(pad, (5, 5)).reshape(48, 64, 25) @ (
            np.ones(25) / 25
        )
        return (
            np.stack([sm, sm, sm], axis=2).clip(0, 255).astype(np.uint8)
        )

    def to_ppm(px):
        h, w = px.shape[:2]
        return b"P6 %d %d 255\n" % (w, h) + px.tobytes()

    a, b, c = picture(1), picture(2), picture(3)
    batch1 = [
        (10, "image/png", bytearray(encode_png(a)), None),
        (11, "image/png", bytearray(encode_png(b)), None),
    ]
    batch2 = [
        (20, "image/x-portable-pixmap", bytearray(to_ppm(a)), None),  # re-encode of a
        (21, "image/png", bytearray(encode_png(c)), None),
    ]
    schema = (
        "media_id long, mime string, payload binary, "
        "meta map<string,string>"
    )
    src = tmp_path / "media_in"
    src.mkdir()
    t0 = time.time() - 2
    for i, rows in enumerate([batch1, batch2]):
        sub = str(src / f"b{i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(sub)
        for f in os.listdir(sub):
            os.utime(os.path.join(sub, f), (t0 + i, t0 + i))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    out = stream_dedup_phash(stream)
    ckpt = str(tmp_path / "ckpt")
    q = (
        out.writeStream.format("memory")
        .queryName(f"phash_sink_{uuid.uuid4().hex[:8]}")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    res = spark.sql(f"select * from {q.name}")
    final = {
        r["phash"]: r["keeper_id"]
        for r in res.groupBy("phash")
        .agg(F.min("keeper_id").alias("keeper_id"))
        .collect()
    }
    # three distinct pictures -> three state rows; the re-encode of a
    # keeps batch 1's id 10, never 20
    assert len(final) == 3
    assert sorted(final.values()) == [10, 11, 21]


def test_stream_phash_near_catches_perturbed_hash_cross_batch(
    spark, tmp_path
):
    """A 1-bit-perturbed pHash arriving in a LATER micro-batch — the
    case the exact-hash keeper misses until the batch pass — must be
    flagged in-stream by the band-sliced state, and the replay verdict
    must agree with the batch dominated rule (image_phash_dedup)."""
    from net_spider_spark.pipeline.dedup import image_phash_dedup
    from net_spider_spark.streaming.dedup import (
        _phash_near_stream,
        phash_near_keepers,
    )

    H = 0x0123456789ABCDEF & ((1 << 63) - 1)
    FAR = 0x7EDCBA9876543210
    batch1 = [(10, H), (11, FAR)]
    batch2 = [(20, H ^ 1), (21, (FAR >> 8) ^ 0x55AA55AA)]
    schema = "media_id long, phash long"
    src = tmp_path / "hashes_in"
    src.mkdir()
    t0 = time.time() - 2
    for i, rows in enumerate([batch1, batch2]):
        sub = str(src / f"b{i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(sub)
        for f in os.listdir(sub):
            os.utime(os.path.join(sub, f), (t0 + i, t0 + i))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    out = _phash_near_stream(stream, max_hamming=2, bands=4)
    ckpt = str(tmp_path / "ckpt_near")
    q = (
        out.writeStream.format("memory")
        .queryName(f"phash_near_{uuid.uuid4().hex[:8]}")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    sink = spark.sql(f"select * from {q.name}")
    got = {
        r["media_id"]: r["is_dup"]
        for r in phash_near_keepers(sink).collect()
    }
    assert got == {10: False, 11: False, 20: True, 21: False}
    # batch/stream agreement on the full corpus
    batch_df = spark.createDataFrame(batch1 + batch2, schema)
    want = {
        r["media_id"]: r["is_dup"]
        for r in image_phash_dedup(
            batch_df, max_hamming=2, bands=4
        ).collect()
    }
    assert got == want


def test_stream_phash_near_rejects_bad_banding():
    import pytest as _pytest

    from net_spider_spark.streaming.dedup import _phash_near_stream

    with _pytest.raises(ValueError, match="max_hamming < bands"):
        _phash_near_stream(None, max_hamming=4, bands=4)
