"""Streaming exact dedup with an explicit state-lifecycle story.

Extension-suite operator (no reference counterpart — the reference is
a bounded-log system): the streaming face of
``pipeline.dedup.exact_duplicates``, keeping the FIRST occurrence per
content digest across an unbounded stream.

State growth is the defining problem here, not the dedup logic.
``dropDuplicates`` keeps one state row per distinct key forever; for a
year-long document stream that is billions of rows, which must not
live in executor heap. Two lifecycle modes are offered, and the choice
is a CONTRACT, not a tuning knob:

* **Exact forever** (``ttl=None``): state is unbounded by definition
  (exact dedup over an unbounded stream requires remembering every
  key). Run it on the RocksDB state store (:func:`rocksdb_state_conf`)
  so state lives in off-heap block cache + local SST files and
  checkpoints as changelog deltas — executor heap stays flat as keys
  grow. This is the right mode when re-emitting a duplicate is
  unacceptable (training-corpus ingestion).
* **Exact within a horizon** (``ttl='7 days'`` + an event-time
  column): ``dropDuplicatesWithinWatermark`` evicts a key's state once
  the watermark passes ``event_time + ttl``, so state size is bounded
  by the horizon's key arrival rate. The contract weakens: a duplicate
  arriving more than ``ttl`` after the retained occurrence is
  RE-EMITTED. Right mode when duplicates cluster in time (crawl
  re-fetches, retry storms) and the table has a downstream batch dedup
  anyway.

``tools/bench_streaming.py`` reports state rows + state-store bytes at
1M+ keys for the forever mode under RocksDB.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Session confs for the RocksDB state store provider (bundled with
# Spark since 3.2; no extra jars). Read at query START from the
# session conf — set these before .start(), e.g.
#   for k, v in rocksdb_state_conf().items(): spark.conf.set(k, v)
# They apply to every stateful query started afterwards on the session.
_ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


def rocksdb_state_conf(max_memory_mb: int = 2048) -> dict[str, str]:
    """Spark confs moving streaming state off the executor heap.

    * provider = RocksDB: state rows live in native block cache +
      local SST files; heap holds only iterators. The default
      HDFSBackedStateStoreProvider keeps EVERY state row as JVM
      objects on heap — at 1e9 digests that is the heap, gone.
    * changelog checkpointing: each commit uploads the batch's delta,
      not a full SST snapshot — checkpoint cost stays O(batch), not
      O(total state), which is what makes year-long state viable.
    * bounded memory: one shared block-cache/memtable budget of
      ``max_memory_mb`` across all RocksDB instances on the executor,
      so 32 state partitions cannot each grab their own cache.
    """
    return {
        "spark.sql.streaming.stateStore.providerClass": _ROCKSDB_PROVIDER,
        "spark.sql.streaming.stateStore.rocksdb"
        ".changelogCheckpointing.enabled": "true",
        "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage": "true",
        "spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB": str(
            max_memory_mb
        ),
    }


def stream_dedup_digests(
    docs_stream: DataFrame,
    text_col: str = "text",
    event_time_col: Optional[str] = None,
    ttl: Optional[str] = None,
) -> DataFrame:
    """First occurrence per md5 content digest over a stream.

    ``ttl=None``: exact forever — one state row per distinct digest,
    monotone growth (run under :func:`rocksdb_state_conf`). Emits only
    the digest: which doc_id survives a within-batch tie depends on
    partition order, the digest set does not, so results stay
    deterministic and replay-checkable against the batch path.

    ``ttl`` + ``event_time_col``: the horizon contract — duplicates
    whose event times fall within ``ttl`` of the retained occurrence
    are dropped; a key silent for longer than ``ttl`` (watermark past
    ``event_time + ttl``) is evicted and its next occurrence
    re-emitted. Output carries the surviving row's event time so
    downstream windows keep working.
    """
    digest = F.md5(F.col(text_col)).alias("digest")
    if ttl is None:
        return docs_stream.select(digest).dropDuplicates(["digest"])
    if event_time_col is None:
        raise ValueError("ttl mode needs event_time_col to watermark on")
    return (
        docs_stream.select(
            digest, F.col(event_time_col).alias("event_time")
        )
        .withWatermark("event_time", ttl)
        .dropDuplicatesWithinWatermark(["digest"])
    )


def state_store_metrics(query) -> dict:
    """State size of a (finished or running) streaming query: rows,
    bytes, and the provider's custom metrics (RocksDB SST/memory
    numbers when the provider is RocksDB) from the last progress.
    This is the observability half of the lifecycle contract: a
    forever-mode dedup deploy should alert on these, not on heap.
    """
    prog = query.lastProgress
    if not prog or not prog.get("stateOperators"):
        return {}
    op = prog["stateOperators"][0]
    return {
        "operator": op.get("operatorName"),
        "state_rows": op.get("numRowsTotal"),
        "state_bytes": op.get("memoryUsedBytes"),
        "custom": op.get("customMetrics", {}),
    }


def stream_dedup_phash(media_stream: DataFrame) -> DataFrame:
    """Perceptual streaming dedup: the first-occurrence keeper per
    64-bit pHash over an unbounded image stream — the content-based
    sibling of :func:`stream_dedup_digests` (a transcoded/re-encoded
    copy changes every byte, so the digest dedup re-admits it; its
    pHash does not change for lossless re-encodes).

    Shape: ``image_phash`` is a STATELESS ``mapInPandas`` (legal on
    streams), followed by a streaming ``min(media_id)`` aggregate
    keyed by the hash — state is one row per distinct picture, the
    minimum possible for this contract, and lives happily on the
    RocksDB store (:func:`rocksdb_state_conf`) at corpus scale.
    Decode failures (error != NULL) are dropped here; route the error
    channel separately if it matters. Emits (phash, keeper_id) in
    update mode; near-duplicate (hamming > 0) grouping stays a batch
    concern (`pipeline.dedup.image_phash_dedup`) — banded self-joins
    do not stream."""
    from net_spider_spark.pipeline.multimodal import image_phash

    hashes = image_phash(media_stream).where(F.col("error").isNull())
    return hashes.groupBy("phash").agg(
        F.min("media_id").alias("keeper_id")
    )
