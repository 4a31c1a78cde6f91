"""Batch-incremental maintenance of the latest-per-node state — the
materialized-view counterpart of ``streaming/ingest.stream_latest_per_node``
for deployments that land findings in periodic batches rather than a
stream.

The policyOverwrite reduction (``latest_findings_per_node``,
Spider.hs:273-281 latest-foundAt semantics) is associative: reducing
yesterday's reduced state unioned with today's batch equals reducing
the full history. So the maintained state stays one row per node —
reading it back and folding in a batch costs O(state + batch), never
O(history) — and a full recompute is always available as the audit
path.

At 100 TB this is the difference between touching the day's findings
plus a node-sized state table, and re-scanning years of history per
refresh. On a real deployment store the state in a table format with
atomic swap (Delta/Iceberg); the parquet temp-dir rename here is the
local stand-in.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from net_spider_spark.snapshot import latest_findings_per_node


def fold_latest_nodes(state: DataFrame | None, batch: DataFrame) -> DataFrame:
    """One incremental step: previous reduced state (or None on the
    first batch) + a new findings batch -> new reduced state. Both
    sides carry the findings schema; the result keeps exactly the
    winning finding row per subject.

    Idempotent under at-least-once delivery: a batch replayed after a
    crashed swap meets its own rows already in the state, and the
    argmax's semi-join keeps every row tied on (found_at, finding_id) —
    so identical observations are deduplicated by finding identity
    first, making fold(fold(s, b), b) == fold(s, b)."""
    combined = batch if state is None else state.unionByName(batch)
    combined = combined.dropDuplicates(["subject_node", "finding_id"])
    return latest_findings_per_node(combined)


def _fold_and_swap(
    spark: SparkSession, state_path: str, batch: DataFrame, fold
) -> DataFrame:
    """Fold ``batch`` into the parquet state at ``state_path`` (created
    on first call) with a crash-safe swap, and return the new state.

    Swap order: write the new state to ``._tmp``, rename the current
    state aside to ``._old``, rename ``._tmp`` into place, delete
    ``._old`` — at every instant at least one complete readable state
    exists on disk (the naive rmtree-then-rename ordering has a window
    with none). A crash mid-swap leaves either the state in place or at
    ``._old``; the next call recovers it automatically. The RETURNED
    DataFrame lazily reads the just-swapped files — consume it before
    the next update replaces them (snapshot isolation across updates is
    what Delta/Iceberg buy you in production)."""
    base = state_path.rstrip("/")
    tmp, old = base + "._tmp", base + "._old"
    # Recovery: a crash between rename-aside and rename-into-place
    # leaves the only good state at ._old.
    if not os.path.exists(state_path) and os.path.exists(old):
        os.rename(old, state_path)
    if os.path.exists(tmp):
        shutil.rmtree(tmp)  # stale partial write from a crashed run

    state = None
    if os.path.exists(state_path):
        # the previous swap replaced the directory contents; drop any
        # cached file listing for the path or the read resolves to
        # deleted part files
        spark.catalog.refreshByPath(state_path)
        state = spark.read.parquet(state_path)
    new_state = fold(state, batch)
    new_state.write.mode("overwrite").parquet(tmp)
    if os.path.exists(old):
        shutil.rmtree(old)  # leftover from a crash after rename-new
    if os.path.exists(state_path):
        os.rename(state_path, old)
    os.rename(tmp, state_path)
    if os.path.exists(old):
        shutil.rmtree(old)
    return spark.read.parquet(state_path)


def update_latest_state(
    spark: SparkSession, state_path: str, batch: DataFrame
) -> DataFrame:
    """Crash-safe incremental update of the latest-per-NODE state (see
    :func:`_fold_and_swap` for the swap protocol)."""
    return _fold_and_swap(spark, state_path, batch, fold_latest_nodes)


def update_latest_links_state(
    spark: SparkSession, state_path: str, batch: DataFrame
) -> DataFrame:
    """Crash-safe incremental update of the per-pair latest-LINK state
    (the batch twin of ``stream_latest_link_per_pair`` persisted to
    parquet; ``fold_latest_links`` is an associative argmax, so the
    folded state always equals the full-history reduction and refolding
    a replayed batch is a no-op)."""
    return _fold_and_swap(spark, state_path, batch, fold_latest_links)


from pyspark.sql import functions as F  # noqa: E402

_LINK_COLS = [
    "finding_id", "link_pos", "subject_node", "target_node",
    "link_state", "found_at", "link_attrs",
]


def _link_samples(findings: DataFrame) -> DataFrame:
    """Explode nested findings into per-pair link samples (the default
    unify's input shape, keyed by the unordered endpoint pair)."""
    s = findings.select(
        "subject_node",
        "found_at",
        "finding_id",
        F.posexplode("neighbor_links").alias("link_pos", "_nl"),
    ).select(
        "finding_id",
        F.col("link_pos").cast("int").alias("link_pos"),
        "subject_node",
        F.col("_nl.target_node").alias("target_node"),
        F.col("_nl.link_state").alias("link_state"),
        "found_at",
        F.col("_nl.link_attrs").alias("link_attrs"),
    )
    return s.withColumn(
        "p1", F.least("subject_node", "target_node")
    ).withColumn("p2", F.greatest("subject_node", "target_node"))


def fold_latest_links(state: DataFrame | None, batch: DataFrame) -> DataFrame:
    """Links-side incremental step: previous per-pair winner state (or
    None) + a new findings batch -> new state holding each unordered
    pair's maximal sample under (found_at, finding_id, link_pos) — the
    batch twin of ``streaming/ingest.stream_latest_link_per_pair``.
    The argmax is associative, so the folded state always equals the
    full-history reduction."""
    samples = _link_samples(batch)
    combined = samples if state is None else state.unionByName(samples)
    ordering = F.struct("found_at", "finding_id", "link_pos")
    return (
        combined.groupBy("p1", "p2")
        .agg(
            F.max_by(
                F.struct(*[F.col(c) for c in _LINK_COLS]), ordering
            ).alias("_w")
        )
        .select("p1", "p2", *[F.col(f"_w.{c}").alias(c) for c in _LINK_COLS])
    )
