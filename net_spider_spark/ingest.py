"""History-table storage layout: partitioned, pruning-friendly writes.

The reference ingests row-at-a-time over a WebSocket and warns about
bulk loads (CLI.hs:86-88); here ingest is one vectorized append. The
layout choices are the 100 TB levers:

* **Partition by observation day** (``found_day`` derived from
  ``found_at``): snapshot queries carry a time-interval predicate
  (F1), so partition pruning turns "scan the history" into "scan the
  interval" — the same effect as the reference pushing its timestamp
  filter into the Gremlin traversal, but at the storage layer.
* **Bucket-ish layout by subject**: within a partition, sorting by
  ``subject_node`` clusters each node's findings for the
  policy-dedup aggregate and gives parquet column statistics that
  prune point lookups (the reference's @node_id composite index,
  janusgraph-conf/net-spider-index.groovy:18-34).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_findings(
    findings: DataFrame,
    path: str,
    mode: str = "append",
    partition_by_day: bool = True,
) -> None:
    """Vectorized batch append of findings (S2 ``addFoundNode`` x N)."""
    df = findings
    writer = None
    if partition_by_day:
        df = df.withColumn(
            "found_day",
            F.date_format(
                F.timestamp_millis(F.col("found_at")), "yyyy-MM-dd"
            ),
        )
        df = df.sortWithinPartitions("subject_node")
        writer = df.write.partitionBy("found_day")
    else:
        writer = df.sortWithinPartitions("subject_node").write
    writer.mode(mode).parquet(path)


def read_findings(
    spark: SparkSession, path: str, interval=None
) -> DataFrame:
    """Read the history table; optionally prune partitions by a query
    interval BEFORE dropping the layout column.

    Spark cannot infer ``found_day`` bounds from a ``found_at``
    predicate on its own (the dependency is ours, not the planner's),
    so the interval is translated into an explicit partition filter
    here — this is the step that turns a 100 TB history scan into a
    per-interval scan.
    """
    df = spark.read.parquet(path)
    if "found_day" not in df.columns:
        return df
    if interval is not None:
        from datetime import datetime, timezone

        from net_spider_spark.interval import _NegInf, _PosInf
        from net_spider_spark.timestamp import to_epoch_ms

        def day_of(bound) -> str:
            ms = to_epoch_ms(bound)
            return datetime.fromtimestamp(ms / 1000.0, timezone.utc).strftime(
                "%Y-%m-%d"
            )

        pred = F.lit(True)
        if not isinstance(interval.lower, _NegInf):
            pred = pred & (F.col("found_day") >= day_of(interval.lower))
        if not isinstance(interval.upper, _PosInf):
            pred = pred & (F.col("found_day") <= day_of(interval.upper))
        df = df.filter(pred)
    return df.drop("found_day")


def subject_prefix_key(col) -> "F.Column":
    """Order-preserving integer key for a node-ID string: the first 6
    chars base-256 big-endian (absent chars are 0, so shorter strings
    sort first — lexicographic order for ASCII; code points above 255
    clamp, mildly distorting order for non-ASCII IDs, which only costs
    a little pruning selectivity, never correctness). 6 chars = 48
    bits — exact in the double arithmetic the quantizer uses. Pure
    codegen; gives a STRING column a numeric axis for Z-order
    quantization that agrees with the parquet min/max string stats a
    scan pruner consults."""
    k = F.lit(0).cast("long")
    for i in range(1, 7):
        k = k * 256 + F.least(
            F.coalesce(F.ascii(F.substring(col, i, 1)), F.lit(0)),
            F.lit(255),
        )
    return k


def write_findings_zordered(
    findings: DataFrame,
    path: str,
    mode: str = "overwrite",
    n_files: int = 64,
    bits: int = 16,
) -> None:
    """History table laid out along the (subject_node, found_at)
    Z-curve — the storage answer to the reference's @node_id composite
    index (janusgraph-conf/net-spider-index.groovy:18-34), but one
    that ALSO serves the time axis.

    Why not :func:`write_findings`'s day-partition + per-file subject
    sort: that layout prunes F1 interval queries perfectly but leaves
    F2 point lookups reading every file of every day (each write task
    spans the full subject range, so per-file subject stats are
    useless). Z-ordering interleaves a quantized subject prefix with
    found_at, so every file covers a narrow range of BOTH — a point
    lookup on subject_node skips ~(1 - 1/sqrt(n_files)) of files by
    parquet min/max stats alone, and interval predicates still skip
    along the time axis. tests/test_layout.py measures both.

    The written schema is exactly the findings schema (the z machinery
    columns are dropped); readers need no layout knowledge — the
    benefit arrives through pushed-down predicates. ``mode="append"``
    z-orders the new batch independently (per-batch clustering;
    :func:`compact_history` can re-layout later).
    """
    from net_spider_spark import layout as LY

    df = findings.withColumn(
        "_subj_key", subject_prefix_key(F.col("subject_node"))
    )
    LY.write_zordered(
        df,
        path,
        ["_subj_key", "found_at"],
        n_files=n_files,
        bits=bits,
        mode=mode,
        keep_z=False,
        drop_cols=["_subj_key"],
    )


def write_findings_bucketed(
    findings: DataFrame,
    table_name: str,
    n_buckets: int = 64,
    mode: str = "append",
) -> None:
    """Bucketed history table: hash-bucket + sort by ``subject_node``.

    The bucketing lever: every per-subject operation downstream — the
    policy-dedup aggregate, point lookups (F2), subject-keyed joins —
    reads pre-partitioned data and skips its shuffle entirely (the
    relational analogue of the reference's @node_id composite index,
    but it also co-locates *joins*, which an index cannot).
    Catalog-table based (``saveAsTable``); read back with
    ``spark.table(table_name)``.
    """
    (
        findings.write.bucketBy(n_buckets, "subject_node")
        .sortBy("subject_node", "found_at")
        .mode(mode)
        .format("parquet")
        .saveAsTable(table_name)
    )


def compact_history(
    spark: SparkSession,
    path: str,
    target_rows_per_file: int = 1_000_000,
    zorder: bool = False,
) -> dict:
    """Small-file compaction for the partitioned history table.

    Streaming/micro-batch appends leave each day partition littered
    with per-trigger files; at 100 TB the file-listing and
    footer-reading overhead dominates short-interval queries long
    before the data does. Rewrite each day partition into
    ``ceil(rows / target_rows_per_file)`` files, preserving the
    ``sortWithinPartitions(subject_node)`` clustering the layout
    promises. Atomicity note: this local implementation writes to a
    sibling temp dir, renames the live table aside, renames the temp
    into place, then deletes the old copy — every intermediate state
    keeps a complete table on disk (as ``path`` or ``path + ".old"``),
    so a crash mid-swap loses nothing. Concurrent readers can still see
    a brief gap between the two renames; on a real deployment use a
    table format's (Delta/Iceberg) rewrite for reader-visible atomicity.

    ``zorder=True`` is the OPTIMIZE-ZORDER shape: instead of the
    per-day subject sort, the whole rewrite lands along the
    (subject_node, found_at) Z-curve (:func:`write_findings_zordered`)
    — use it to convert a stream-appended day-partitioned table (or a
    pile of per-batch z-ordered appends, whose clustering is only
    per-batch) into one globally curve-laid table where point lookups
    AND interval scans prune by file stats. The ``found_day`` layout
    column is dropped in this mode (the time axis moves into the
    curve).

    Returns {"files_before": n, "files_after": m, "rows": r}.
    """
    import math
    import os
    import shutil

    df = spark.read.parquet(path)
    rows = df.count()
    files_before = sum(
        len([f for f in fs if f.endswith(".parquet")])
        for _, _, fs in os.walk(path)
    )
    tmp = path.rstrip("/") + "._compact_tmp"
    if zorder:
        from net_spider_spark import layout as LY

        n_files = max(1, math.ceil(rows / target_rows_per_file))
        zdf = df.drop("found_day").withColumn(
            "_subj_key", subject_prefix_key(F.col("subject_node"))
        )
        LY.write_zordered(
            zdf,
            tmp,
            ["_subj_key", "found_at"],
            n_files=n_files,
            bits=16,
            mode="overwrite",
            keep_z=False,
            drop_cols=["_subj_key"],
        )
        old = path.rstrip("/") + ".old"
        if os.path.exists(old):
            shutil.rmtree(old)
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old)
        files_after = sum(
            len([f for f in fs if f.endswith(".parquet")])
            for _, _, fs in os.walk(path)
        )
        return {
            "files_before": files_before,
            "files_after": files_after,
            "rows": rows,
        }
    has_day = "found_day" in df.columns
    if has_day:
        # per-day file budget: ceil(day_rows / target) files for big
        # days, one for small ones. Clustering rows by (day, file-slot)
        # makes each task hold whole slots, so the output file count is
        # at most the budget (hash collisions only merge slots).
        per_day = df.groupBy("found_day").agg(
            F.ceil(F.count(F.lit(1)) / target_rows_per_file)
            .cast("int")
            .alias("_slots")
        )
        out = (
            df.join(F.broadcast(per_day), "found_day")
            .withColumn(
                "_slot",
                F.pmod(
                    F.xxhash64("subject_node"),
                    F.greatest(F.col("_slots"), F.lit(1)),
                ),
            )
            .repartition(F.col("found_day"), F.col("_slot"))
            .drop("_slots", "_slot")
            .sortWithinPartitions("subject_node")
        )
        writer = out.write.mode("overwrite").partitionBy("found_day")
    else:
        n_files = max(1, math.ceil(rows / target_rows_per_file))
        out = df.repartition(n_files).sortWithinPartitions("subject_node")
        writer = out.write.mode("overwrite")
    writer.parquet(tmp)
    old = path.rstrip("/") + ".old"
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    files_after = sum(
        len([f for f in fs if f.endswith(".parquet")])
        for _, _, fs in os.walk(path)
    )
    return {"files_before": files_before, "files_after": files_after, "rows": rows}


def clear_all(spark: SparkSession, path: str) -> None:
    """S4 ``clearAll``: truncate the history (overwrite with empty)."""
    from net_spider_spark.model import FINDINGS_SCHEMA

    spark.createDataFrame([], FINDINGS_SCHEMA).write.mode("overwrite").parquet(path)
