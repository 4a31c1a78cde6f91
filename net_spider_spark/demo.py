"""Canonical derivation of a findings table from the synthetic `events`
table (TESTDATA.md / FIXTURES.md §5).

Each event becomes one finding: ``subject_node = user_id``,
``found_at = epoch-ms of ts``, and one deterministic neighbor link
(``target = (user_id*7 + event_id) % 50``, state cycling through the
four LinkStates by ``event_id % 4``). The same derivation is mirrored
as ANSI SQL in ``__spark_entry__.oracle_sql`` so every engine operator
can be checked against a DuckDB oracle.

The events parquet has shipped ``ts`` as INT64 TIMESTAMP(NANOS) (Spark
reads it as LongType nanoseconds under
``spark.sql.legacy.parquet.nanosAsLong=true``) and as TIMESTAMP(MICROS)
(Spark reads timestamp_ntz). :func:`ts_epoch_ms` derives the canonical
epoch-ms ``BIGINT`` from whichever physical type is on disk — the
naive-UTC reading matches DuckDB's ``epoch_ms(ts)`` bit-for-bit, which
is what keeps the oracle comparisons schema-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Number of synthetic nodes the link targets are folded onto.
N_TARGET_NODES = 50

LINK_STATE_CASE = (
    "CASE CAST(event_id % 4 AS INT) WHEN 0 THEN 'to_target' WHEN 1 THEN 'to_subject' "
    "WHEN 2 THEN 'bidirectional' ELSE 'unused' END"
)

# The identical derivation as a SQL fragment (DuckDB oracle side lives in
# __spark_entry__; keep the two in sync).
FINDINGS_SQL_DUCKDB = f"""
    SELECT event_id AS finding_id,
           CAST(user_id AS VARCHAR) AS subject_node,
           epoch_ms(ts) AS found_at,
           CAST((user_id * 7 + event_id) % {N_TARGET_NODES} AS VARCHAR) AS target_node,
           {LINK_STATE_CASE} AS link_state
    FROM events
"""


def configure(spark: SparkSession) -> SparkSession:
    """Session settings the engine depends on; idempotent and safe to
    call on a session we don't own (the external driver's)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Disable PySpark's per-call origin capture (Python call-site info
    # for error messages): it wraps every Column/DataFrame API call with
    # a conf-get py4j round-trip + stack walk + origin set/clear, ~2 ms
    # per call of pure driver overhead — measured as the single largest
    # component of query plan-construction time.  Affects error-message
    # rendering only; plans and results are identical.  PySpark caches
    # the flag on first wrapped call, so set it as early as possible;
    # best-effort (the conf may not exist on future versions).
    try:
        spark.conf.set("spark.python.sql.dataFrameDebugging.enabled", "false")
        # The flag is memoized on first wrapped call; if one already
        # happened in this process (session we don't own), drop the
        # memo so the conf above is re-read.
        import pyspark.errors.utils as _peu

        if getattr(_peu, "_enable_debugging_cache", None) is True:
            _peu._enable_debugging_cache = None
    except Exception:
        pass
    return spark


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    configure(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def ts_epoch_ms(df: DataFrame, col: str = "ts"):
    """Epoch-milliseconds BIGINT column for ``events.ts``, whatever the
    parquet physical type: INT64 nanos (via nanosAsLong), TIMESTAMP_NTZ
    (naive micros — ``timestampdiff`` against the epoch is timezone-free
    and equals DuckDB ``epoch_ms``), or TIMESTAMP (instant micros)."""
    kind = df.schema[col].dataType.typeName()
    if kind in ("long", "bigint"):
        return F.expr(f"CAST({col} DIV 1000000 AS BIGINT)")
    if kind == "timestamp_ntz":
        return F.expr(
            "CAST(timestampdiff(MICROSECOND, "
            f"TIMESTAMP_NTZ '1970-01-01 00:00:00', {col}) DIV 1000 AS BIGINT)"
        )
    if kind == "timestamp":
        # unix_micros is instant-based; a naive-micros column read as
        # TIMESTAMP only matches DuckDB's naive epoch_ms when the
        # session runs UTC — configure() pins spark.sql.session.timeZone
        # for exactly this branch.
        return F.expr(f"CAST(unix_micros({col}) DIV 1000 AS BIGINT)")
    raise TypeError(f"unsupported type for {col!r}: {kind}")


def events_findings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> nested findings DataFrame (model.FINDINGS_SCHEMA)."""
    return events_findings_from(read_table(spark, sf_dir, "events"))


def events_findings_from(ev: DataFrame) -> DataFrame:
    """The same findings projection over an already-loaded events
    DataFrame — batch or streaming (the projection is stateless, so it
    applies unchanged to a ``readStream`` source)."""
    return ev.select(
        F.col("event_id").alias("finding_id"),
        F.col("user_id").cast("string").alias("subject_node"),
        ts_epoch_ms(ev).alias("found_at"),
        F.lit(None).cast("int").alias("tz_offset_min"),
        F.lit(None).cast("boolean").alias("tz_summer_only"),
        F.lit(None).cast("string").alias("tz_name"),
        F.create_map(F.lit("event_type"), F.col("event_type")).alias("node_attrs"),
        F.array(
            F.struct(
                ((F.col("user_id") * 7 + F.col("event_id")) % N_TARGET_NODES)
                .cast("string")
                .alias("target_node"),
                F.expr(LINK_STATE_CASE).alias("link_state"),
                F.create_map(
                    F.lit("v"), F.col("value").cast("string")
                ).alias("link_attrs"),
            )
        ).alias("neighbor_links"),
    )


def events_findings_multilink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alternative derivation: one finding per (user, hour) with ALL of
    that hour's links collected — exercises nested collect_list ingest
    and multi-link explode (the reference's normal shape: one
    observation reports a whole neighbor set).

    finding_id = user_id * 1e6 + hour-index (deterministic); found_at =
    max event time in the bucket; links ordered by event_id.
    """
    ev = read_table(spark, sf_dir, "events")
    base = ev.select(
        F.col("user_id"),
        F.col("event_id"),
        ts_epoch_ms(ev).alias("ts_ms"),
        ((F.col("user_id") * 7 + F.col("event_id")) % N_TARGET_NODES)
        .cast("string")
        .alias("target_node"),
        F.expr(LINK_STATE_CASE).alias("link_state"),
    ).withColumn("hour_idx", F.expr("ts_ms DIV 3600000"))
    return (
        base.groupBy("user_id", "hour_idx")
        .agg(
            F.max("ts_ms").alias("found_at"),
            F.array_sort(
                F.collect_list(
                    F.struct("event_id", "target_node", "link_state")
                )
            ).alias("_ls"),
        )
        .select(
            (F.col("user_id") * 1_000_000 + F.col("hour_idx")).alias("finding_id"),
            F.col("user_id").cast("string").alias("subject_node"),
            "found_at",
            F.lit(None).cast("int").alias("tz_offset_min"),
            F.lit(None).cast("boolean").alias("tz_summer_only"),
            F.lit(None).cast("string").alias("tz_name"),
            F.create_map(F.lit("n_events"), F.size("_ls").cast("string")).alias(
                "node_attrs"
            ),
            F.transform(
                F.col("_ls"),
                lambda e: F.struct(
                    e["target_node"].alias("target_node"),
                    e["link_state"].alias("link_state"),
                    F.map_from_arrays(
                        F.array().cast("array<string>"),
                        F.array().cast("array<string>"),
                    ).alias("link_attrs"),
                ),
            ).alias("neighbor_links"),
        )
    )


def events_findings_dio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIO-shaped findings from events: a dense 50-node RPL-like graph
    where each observation carries ``neighbor_type`` / ``neighbor_rank``
    / optional ``metric`` link attrs and ``dioLinkState`` semantics
    (``to_target`` iff preferred parent, else ``unused``). Deterministic
    functions of (user_id, event_id) so a SQL oracle can mirror every
    column; subjects are folded mod 50 so both endpoints of many pairs
    actually observe each other (the MergedDIOLink case)."""
    return events_findings_dio_from(read_table(spark, sf_dir, "events"))


def events_findings_dio_from(ev: DataFrame) -> DataFrame:
    """The same DIO findings projection over an already-loaded events
    DataFrame — batch or streaming (the projection is stateless)."""
    subject = F.col("user_id") % 50
    # Subjects < 30 pair up mutually (0<->1, 2<->3, ...) so both
    # endpoints observe the same physical link — the MergedDIOLink
    # two-sided case; the rest scatter pseudo-randomly (one-sided).
    partner = F.when(subject % 2 == 0, subject + 1).otherwise(subject - 1)
    target = F.when(subject < 30, partner).otherwise(
        (subject + 1 + (F.col("event_id") * 7 % 49)) % 50
    )
    nt = (
        F.when((F.col("user_id") + F.col("event_id")) % 3 == 0, "preferred_parent")
        .when((F.col("user_id") + F.col("event_id")) % 3 == 1, "parent_candidate")
        .otherwise("other_neighbor")
    )
    metric = F.when(
        F.col("event_id") % 3 != 0, (F.col("event_id") % 100).cast("string")
    )
    attrs = F.map_filter(
        F.map_from_arrays(
            F.array(
                F.lit("neighbor_type"), F.lit("neighbor_rank"), F.lit("metric")
            ),
            F.array(
                nt,
                ((F.col("user_id") + 2 * F.col("event_id")) % 1024).cast("string"),
                metric,
            ),
        ),
        lambda k, v: v.isNotNull(),
    )
    return ev.select(
        F.col("event_id").alias("finding_id"),
        subject.cast("string").alias("subject_node"),
        ts_epoch_ms(ev).alias("found_at"),
        F.lit(None).cast("int").alias("tz_offset_min"),
        F.lit(None).cast("boolean").alias("tz_summer_only"),
        F.lit(None).cast("string").alias("tz_name"),
        F.create_map(
            F.lit("rank"), (F.col("user_id") % 1024).cast("string")
        ).alias("node_attrs"),
        F.array(
            F.struct(
                target.cast("string").alias("target_node"),
                F.when(nt == "preferred_parent", "to_target")
                .otherwise("unused")
                .alias("link_state"),
                attrs.alias("link_attrs"),
            )
        ).alias("neighbor_links"),
    )


def events_link_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat link-sample view of the same derivation (skips the nested
    struct round-trip; same rows as explode(events_findings))."""
    ev = read_table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id").alias("finding_id"),
        F.col("user_id").cast("string").alias("subject_node"),
        ts_epoch_ms(ev).alias("found_at"),
        ((F.col("user_id") * 7 + F.col("event_id")) % N_TARGET_NODES)
        .cast("string")
        .alias("target_node"),
        F.expr(LINK_STATE_CASE).alias("link_state"),
    )
