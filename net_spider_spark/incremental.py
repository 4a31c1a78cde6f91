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
    winning finding row per subject."""
    combined = batch if state is None else state.unionByName(batch)
    return latest_findings_per_node(combined)


def update_latest_state(
    spark: SparkSession, state_path: str, batch: DataFrame
) -> DataFrame:
    """Fold ``batch`` into the parquet state at ``state_path`` (created
    on first call) and return the new state. Write-then-rename keeps
    readers off partial output locally; use a transactional table
    format in production."""
    state = None
    if os.path.exists(state_path):
        state = spark.read.parquet(state_path)
    new_state = fold_latest_nodes(state, batch)
    tmp = state_path.rstrip("/") + "._tmp"
    new_state.write.mode("overwrite").parquet(tmp)
    if os.path.exists(state_path):
        shutil.rmtree(state_path)
    os.rename(tmp, state_path)
    return spark.read.parquet(state_path)
