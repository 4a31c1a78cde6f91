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


def stream_url_dedup(
    urls_stream: DataFrame,
    url_col: str = "url",
    event_time_col: Optional[str] = None,
    ttl: Optional[str] = None,
) -> DataFrame:
    """First occurrence per CANONICAL URL over a crawl-frontier stream
    — the streaming face of :func:`pipeline.url.url_dedup`, the dedup
    a live crawler runs BEFORE fetching (two URL variants that
    canonicalize together are the same fetch; catching them in-flight
    saves the request, not just the storage).

    Same state-lifecycle contract as :func:`stream_dedup_digests`:
    ``ttl=None`` is exact-forever (one state row per distinct
    canonical URL — run under :func:`rocksdb_state_conf`), ``ttl`` +
    ``event_time_col`` bounds state to the horizon's URL arrival rate
    and re-emits a URL silent for longer than ``ttl`` (a crawler
    usually WANTS that — it is a natural refetch policy). Emits only
    ``canonical_url``: which variant survives a within-batch tie
    depends on partition order, the canonical set does not, so the
    replay stays deterministic against the batch dedup.
    """
    from net_spider_spark.pipeline.url import canonical_url

    canon = canonical_url(F.col(url_col)).alias("canonical_url")
    if ttl is None:
        return urls_stream.select(canon).dropDuplicates(["canonical_url"])
    if event_time_col is None:
        raise ValueError("ttl mode needs event_time_col to watermark on")
    # project the watermark column away AFTER the stateful dedup: which
    # variant's event_time survives a within-batch tie is partition-
    # order dependent, so emitting it would break the deterministic-
    # replay contract the docstring promises (the canonical set itself
    # is tie-invariant)
    return (
        urls_stream.select(canon, F.col(event_time_col).alias("event_time"))
        .withWatermark("event_time", ttl)
        .dropDuplicatesWithinWatermark(["canonical_url"])
        .select("canonical_url")
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


def _phash_near_stream(
    hashes_stream: DataFrame,
    max_hamming: int = 2,
    bands: int = 4,
    id_col: str = "media_id",
    hash_col: str = "phash",
) -> DataFrame:
    """Core of :func:`stream_dedup_phash_near` over a pre-hashed
    stream (media_id, phash) — split out so tests can plant exact
    hash values without constructing decodable images.

    One stateful operator, keyed by (band, sig): each arriving hash
    is exploded into its ``bands`` bit-slices (the batch banding of
    ``pipeline.dedup.phash_candidates``), and the per-bucket state
    holds every distinct full 64-bit hash seen in that bucket with
    its minimum id. Pigeonhole: a pair within Hamming distance
    ``max_hamming < bands`` agrees exactly on at least one band, so
    at least one shared bucket verifies the full-hash distance — the
    same recall guarantee as the batch path, evaluated in-stream.
    Each input row emits one row per band:
    (media_id, phash, band, prior_min_id) where ``prior_min_id`` is
    the smallest id among hamming-close hashes ALREADY seen (earlier
    micro-batches, or earlier ids within this batch — rows are
    processed in id order for replay-deterministic results), NULL if
    the bucket has no close prior.

    The per-media verdict is the OR/min across its bands. All band
    rows of one input row are emitted in the same micro-batch, so
    that reduction is batch-local — but Spark cannot chain another
    shuffling aggregate after ``applyInPandasWithState`` in a
    streaming plan, so it runs at the SINK:
    :func:`phash_near_keepers` over the (memory/table) sink contents,
    exactly the availableNow-replay shape the rest of the streaming
    suite uses. State size: ``bands`` rows per distinct picture —
    ``bands``× the exact keeper's state, still one entry per distinct
    hash per band, fine on RocksDB (:func:`rocksdb_state_conf`).
    """
    import pandas as pd

    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    if max_hamming >= bands:
        raise ValueError(
            "banding guarantees recall only for max_hamming < bands"
        )
    if 64 % bands != 0:
        raise ValueError("bands must divide 64")
    width = 64 // bands
    mask = (1 << width) - 1
    sigs = hashes_stream.select(
        F.col(id_col).alias("media_id"),
        F.col(hash_col).alias("phash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(F.col(hash_col), i * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("sig"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bs"),
    ).select("media_id", "phash", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))

    def bucket_fn(key, pdf_iter, state: GroupState):
        if state.exists:
            st_hashes, st_mins = state.get
            seen = dict(zip(st_hashes, st_mins))
        else:
            seen = {}
        out_ids, out_hashes, out_bands, out_prior = [], [], [], []
        rows = pd.concat(list(pdf_iter), ignore_index=True)
        rows = rows.sort_values("media_id")
        for mid, ph, band in zip(
            rows["media_id"], rows["phash"], rows["band"]
        ):
            mid, ph = int(mid), int(ph)
            prior = None
            for h, m in seen.items():
                if bin((h ^ ph) & 0xFFFFFFFFFFFFFFFF).count("1") <= max_hamming:
                    prior = m if prior is None else min(prior, m)
            out_ids.append(mid)
            out_hashes.append(ph)
            out_bands.append(int(band))
            out_prior.append(prior)
            if ph not in seen or mid < seen[ph]:
                seen[ph] = mid
        state.update((list(seen.keys()), list(seen.values())))
        yield pd.DataFrame(
            {
                "media_id": pd.Series(out_ids, dtype="int64"),
                "phash": pd.Series(out_hashes, dtype="int64"),
                "band": pd.Series(out_bands, dtype="int32"),
                "prior_min_id": pd.Series(out_prior, dtype="Int64"),
            }
        )

    return sigs.groupBy("band", "sig").applyInPandasWithState(
        bucket_fn,
        outputStructType=(
            "media_id long, phash long, band int, prior_min_id long"
        ),
        stateStructType="hashes array<long>, min_ids array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_dedup_phash_near(
    media_stream: DataFrame,
    max_hamming: int = 2,
    bands: int = 4,
) -> DataFrame:
    """NEAR-duplicate streaming perceptual dedup: unlike
    :func:`stream_dedup_phash` (exact-hash keeper — a hamming-1
    re-encode slips through until the batch pass), this catches any
    arrival within ``max_hamming`` pHash bits of an earlier picture
    in-stream, via band-sliced state (see :func:`_phash_near_stream`).
    Decode failures are dropped here, as in the exact variant. Reduce
    the sink with :func:`phash_near_keepers` for per-media verdicts.
    """
    from net_spider_spark.pipeline.multimodal import image_phash

    hashes = image_phash(media_stream).where(F.col("error").isNull())
    return _phash_near_stream(
        hashes, max_hamming=max_hamming, bands=bands
    )


def phash_near_keepers(sink_df: DataFrame) -> DataFrame:
    """Batch reduction of a :func:`stream_dedup_phash_near` sink:
    (media_id, phash, is_dup) — a row is a duplicate iff ANY of its
    band rows saw a hamming-close prior with a smaller id. Mirrors
    the batch dominated rule of ``pipeline.dedup.image_phash_dedup``,
    so an ordered replay agrees with the batch pass."""
    return (
        sink_df.groupBy("media_id", "phash")
        .agg(F.min("prior_min_id").alias("_prior"))
        .select(
            "media_id",
            "phash",
            (
                F.col("_prior").isNotNull()
                & (F.col("_prior") < F.col("media_id"))
            ).alias("is_dup"),
        )
    )
