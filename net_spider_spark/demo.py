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
    """Lazy relation over one sf table, memoized per session+path.

    ``spark.read.parquet`` re-lists the path and re-reads the footer
    schema on every call (~0.1-0.2 s of driver time); the 92-query
    bench calls it 1-2x per query per pass.  The memo returns the same
    LAZY DataFrame (an unexecuted scan plan) for repeated reads of the
    same immutable sf table in one session — plan/metadata reuse only:
    no rows, no persist, every action still scans the parquet files.
    """
    configure(spark)
    try:
        memo = spark._ns_read_table_memo
    except AttributeError:
        memo = {}
        spark._ns_read_table_memo = memo
    path = f"{sf_dir}/{name}.parquet"
    df = memo.get(path)
    if df is None:
        df = spark.read.parquet(path)
        memo[path] = df
    return df


def ts_epoch_ms_sql(df: DataFrame, col: str = "ts") -> str:
    """SQL fragment for the epoch-milliseconds BIGINT of ``events.ts``,
    whatever the parquet physical type: INT64 nanos (via nanosAsLong),
    TIMESTAMP_NTZ (naive micros — ``timestampdiff`` against the epoch is
    timezone-free and equals DuckDB ``epoch_ms``), or TIMESTAMP (instant
    micros). Returned as a string so callers can fold it into one
    ``selectExpr`` (one py4j round-trip) instead of per-op Column calls."""
    kind = df.schema[col].dataType.typeName()
    if kind in ("long", "bigint"):
        return f"CAST({col} DIV 1000000 AS BIGINT)"
    if kind == "timestamp_ntz":
        return (
            "CAST(timestampdiff(MICROSECOND, "
            f"TIMESTAMP_NTZ '1970-01-01 00:00:00', {col}) DIV 1000 AS BIGINT)"
        )
    if kind == "timestamp":
        # unix_micros is instant-based; a naive-micros column read as
        # TIMESTAMP only matches DuckDB's naive epoch_ms when the
        # session runs UTC — configure() pins spark.sql.session.timeZone
        # for exactly this branch.
        return f"CAST(unix_micros({col}) DIV 1000 AS BIGINT)"
    raise TypeError(f"unsupported type for {col!r}: {kind}")


def ts_epoch_ms(df: DataFrame, col: str = "ts"):
    """Column form of :func:`ts_epoch_ms_sql` (same expression)."""
    return F.expr(ts_epoch_ms_sql(df, col))


def events_findings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> nested findings DataFrame (model.FINDINGS_SCHEMA)."""
    return events_findings_from(read_table(spark, sf_dir, "events"))


def events_findings_from(ev: DataFrame) -> DataFrame:
    """The same findings projection over an already-loaded events
    DataFrame — batch or streaming (the projection is stateless, so it
    applies unchanged to a ``readStream`` source).

    One ``selectExpr`` (expressions identical to the former per-Column
    construction, oracle/golden-pinned): the Column form cost ~35 py4j
    round-trips per call and this helper is built 1-2x per query per
    bench pass."""
    return ev.selectExpr(
        "event_id AS finding_id",
        "CAST(user_id AS STRING) AS subject_node",
        f"{ts_epoch_ms_sql(ev)} AS found_at",
        "CAST(NULL AS INT) AS tz_offset_min",
        "CAST(NULL AS BOOLEAN) AS tz_summer_only",
        "CAST(NULL AS STRING) AS tz_name",
        "map('event_type', event_type) AS node_attrs",
        "array(struct("
        f"CAST((user_id * 7 + event_id) % {N_TARGET_NODES} AS STRING) AS target_node, "
        f"{LINK_STATE_CASE} AS link_state, "
        "map('v', CAST(value AS STRING)) AS link_attrs"
        ")) AS neighbor_links",
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
    DataFrame — batch or streaming (the projection is stateless).

    One ``selectExpr`` built from shared SQL fragments (expressions
    identical to the former per-Column construction — the Column form
    also duplicated the reused subtrees — oracle/golden-pinned)."""
    subject = "(user_id % 50)"
    # Subjects < 30 pair up mutually (0<->1, 2<->3, ...) so both
    # endpoints observe the same physical link — the MergedDIOLink
    # two-sided case; the rest scatter pseudo-randomly (one-sided).
    partner = (
        f"CASE WHEN {subject} % 2 = 0 THEN {subject} + 1"
        f" ELSE {subject} - 1 END"
    )
    target = (
        f"CASE WHEN {subject} < 30 THEN {partner}"
        f" ELSE ({subject} + 1 + ((event_id * 7) % 49)) % 50 END"
    )
    nt = (
        "CASE WHEN (user_id + event_id) % 3 = 0 THEN 'preferred_parent'"
        " WHEN (user_id + event_id) % 3 = 1 THEN 'parent_candidate'"
        " ELSE 'other_neighbor' END"
    )
    metric = (
        "CASE WHEN event_id % 3 != 0"
        " THEN CAST(event_id % 100 AS STRING) END"
    )
    attrs = (
        "map_filter(map_from_arrays("
        "array('neighbor_type', 'neighbor_rank', 'metric'), "
        f"array({nt}, CAST((user_id + 2 * event_id) % 1024 AS STRING), {metric})"
        "), (k, v) -> v IS NOT NULL)"
    )
    return ev.selectExpr(
        "event_id AS finding_id",
        f"CAST({subject} AS STRING) AS subject_node",
        f"{ts_epoch_ms_sql(ev)} AS found_at",
        "CAST(NULL AS INT) AS tz_offset_min",
        "CAST(NULL AS BOOLEAN) AS tz_summer_only",
        "CAST(NULL AS STRING) AS tz_name",
        "map('rank', CAST(user_id % 1024 AS STRING)) AS node_attrs",
        "array(struct("
        f"CAST({target} AS STRING) AS target_node, "
        f"CASE WHEN {nt} = 'preferred_parent' THEN 'to_target'"
        " ELSE 'unused' END AS link_state, "
        f"{attrs} AS link_attrs"
        ")) AS neighbor_links",
    )


def events_link_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat link-sample view of the same derivation (skips the nested
    struct round-trip; same rows as explode(events_findings))."""
    ev = read_table(spark, sf_dir, "events")
    return ev.selectExpr(
        "event_id AS finding_id",
        "CAST(user_id AS STRING) AS subject_node",
        f"{ts_epoch_ms_sql(ev)} AS found_at",
        f"CAST((user_id * 7 + event_id) % {N_TARGET_NODES} AS STRING)"
        " AS target_node",
        f"{LINK_STATE_CASE} AS link_state",
    )
