"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with Arrow-batched transform plumbing.

A 100 TB training-data pipeline carries media as ``binary`` columns
beside typed metadata (mime, width/height, duration, sample rate). The
Spark-side contract here is real and tested — schema, partition-size
control, ``mapInPandas`` batch shape, error channels — while the
actual codec work is stubbed behind ``decoder=`` hooks because this
container ships no image/audio libraries (install pillow/torchaudio
and pass a real decoder in production).
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterable, Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id BIGINT, mime STRING, n_bytes BIGINT, digest STRING, "
    "feature ARRAY<FLOAT>, error STRING"
)


def deterministic_fake_decoder(payload: bytes, mime: str) -> list[float]:
    """Stand-in decode+feature-extract: a deterministic 8-dim feature
    from the payload digest. Replace with a real codec in production —
    the pipeline shape (batching, schema, error channel) is identical.
    """
    if payload is None:
        raise ValueError("empty payload")
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:8]]


def extract_features(
    media: DataFrame,
    decoder: Optional[Callable[[bytes, str], list[float]]] = None,
    batch_rows: int = 256,
) -> DataFrame:
    """Decode/feature-extract media payloads via ``mapInPandas``.

    * Arrow batches keep payload bytes off the Python heap until the
      batch arrives; ``spark.sql.execution.arrow.maxRecordsPerBatch``
      (or ``batch_rows`` here) bounds peak memory for large blobs.
    * Per-row failures land in the ``error`` column instead of killing
      the task — corrupt media is data, not an exception, at corpus
      scale.
    """
    decode = decoder or deterministic_fake_decoder

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                out = {
                    "media_id": [], "mime": [], "n_bytes": [],
                    "digest": [], "feature": [], "error": [],
                }
                for _, row in chunk.iterrows():
                    payload = row["payload"]
                    out["media_id"].append(row["media_id"])
                    out["mime"].append(row["mime"])
                    out["n_bytes"].append(
                        len(payload) if payload is not None else 0
                    )
                    out["digest"].append(
                        hashlib.sha256(payload).hexdigest()
                        if payload is not None
                        else None
                    )
                    try:
                        out["feature"].append(decode(payload, row["mime"]))
                        out["error"].append(None)
                    except Exception as e:  # error channel, not task failure
                        out["feature"].append(None)
                        out["error"].append(f"{type(e).__name__}: {e}")
                yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def _be(payload, pos: int, length: int):
    """Big-endian unsigned int from payload bytes [pos, pos+length)."""
    return F.conv(F.hex(F.substring(payload, pos + 1, length)), 16, 10).cast(
        "long"
    )


def _le(payload, pos: int, length: int):
    """Little-endian unsigned int: reverse the bytes, then read BE."""
    swapped = F.concat(
        *[F.substring(payload, pos + length - i, 1) for i in range(length)]
    )
    return F.conv(F.hex(swapped), 16, 10).cast("long")


def sniff_media_headers(
    media: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """Detect container format and basic dimensions from header bytes —
    magic numbers and fixed-offset fields only, so this is REAL (not a
    stub): pure Catalyst byte arithmetic, no codec library, runs in
    whole-stage codegen over the binary column.

    Returns the input plus ``sniffed_format`` (png/jpeg/gif/wav/mp3 or
    null) and, where the format stores them at fixed offsets,
    ``sniffed_width``/``sniffed_height`` (PNG IHDR big-endian, GIF
    logical screen little-endian) and ``sniffed_sample_rate``/
    ``sniffed_channels`` (canonical RIFF/WAVE fmt chunk). JPEG
    dimensions live in variable-position SOF markers — that genuinely
    needs a scan, so they stay null here (the `decoder=` hook's job).
    """
    p = F.col(payload_col)
    head = F.hex(F.substring(p, 1, 12))
    fmt = (
        F.when(head.startswith("89504E470D0A1A0A"), "png")
        .when(head.startswith("FFD8FF"), "jpeg")
        .when(
            head.startswith("474946383761") | head.startswith("474946383961"),
            "gif",
        )
        .when(
            head.startswith("52494646")
            & (F.hex(F.substring(p, 9, 4)) == "57415645"),
            "wav",
        )
        .when(head.startswith("494433") | head.startswith("FFFB"), "mp3")
        .otherwise(F.lit(None).cast("string"))
    )
    out = media.withColumn("sniffed_format", fmt)
    is_png = F.col("sniffed_format") == "png"
    is_gif = F.col("sniffed_format") == "gif"
    is_wav = F.col("sniffed_format") == "wav"
    return (
        out.withColumn(
            "sniffed_width",
            F.when(is_png, _be(p, 16, 4)).when(is_gif, _le(p, 6, 2)),
        )
        .withColumn(
            "sniffed_height",
            F.when(is_png, _be(p, 20, 4)).when(is_gif, _le(p, 8, 2)),
        )
        .withColumn("sniffed_sample_rate", F.when(is_wav, _le(p, 24, 4)))
        .withColumn("sniffed_channels", F.when(is_wav, _le(p, 22, 2)))
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Pure-Catalyst media accounting (no decode): size and digest per
    mime class — the cheap pre-pass that sizes the decode job."""
    return media.groupBy("mime").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.length(F.col("payload"))).alias("total_bytes"),
        F.avg(F.length(F.col("payload"))).alias("avg_bytes"),
    )


def frame_sample_plan(
    media: DataFrame, every_n_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media, frame_ts) from
    the duration metadata — the explode that fans a video into frame
    work items before the decoder runs (decode itself is the stubbed
    step)."""
    duration = F.col("meta").getItem("duration_ms").cast("long")
    return media.where(duration.isNotNull()).select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), duration - 1, F.lit(every_n_ms))
        ).alias("frame_ts_ms"),
    )
