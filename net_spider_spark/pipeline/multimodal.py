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
