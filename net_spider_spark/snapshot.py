"""The snapshot query: reconstruct the graph state at a point/interval
in the past from the append-only findings table.

Parity target: ``getSnapshot`` (``net-spider/src/NetSpider/Spider.hs:175-185``)
and its pure specification ``Weaver.getSnapshot'``
(``net-spider/src/NetSpider/Weaver.hs:156-203``). Pipeline:

    findings
      |> time-interval filter          (F1; Catalyst pushdown)
      |> found-node policy             (A1/A2; max_by groupBy, map-side combine)
      |> [starts_from] BFS restriction (J4/J5; driver loop, traverse.py)
      |> node states                   (latest kept finding per node)
      |> explode link samples          (J2)
      |> unify per undirected pair     (A3-A6; unify.py)
      |> negation                      (J8; two equi-joins on node states)
      |> direction resolution          (C8; CASE expressions)
      -> (snapshot_nodes, snapshot_links)

Everything on the default path is built-in DataFrame ops — one Spark
job graph, no Python in the row loop. Scale notes per stage are inline.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from net_spider_spark.findings import explode_link_samples
from net_spider_spark.interval import Interval
from net_spider_spark.traverse import reachable_nodes
from net_spider_spark.unify import UnifyConfig, unify_to_one

POLICY_OVERWRITE = "overwrite"
POLICY_APPEND = "append"

# Weaver-mode boundary handling (Weaver.hs:120-134): 'mark' reports
# target-only nodes with is_on_boundary=true (raw Weaver); 'visit'
# treats them as visited (visitAllBoundaryNodes — also what the
# reference's unbounded server traversal produces, since `out("finds")`
# reaches every target).
BOUNDARY_MARK = "mark"
BOUNDARY_VISIT = "visit"


@dataclass
class Query:
    """Snapshot query parameters (``NetSpider/Query.hs:47-101``).

    ``starts_from=None`` means whole-graph (Weaver semantics,
    README.md:316-321); a node list bounds the result to what is
    reachable from those nodes through kept findings.
    """

    starts_from: Optional[Sequence[str]] = None
    time_interval: Interval = field(default_factory=Interval.always)
    found_node_policy: str = POLICY_OVERWRITE
    unify: UnifyConfig = field(default_factory=unify_to_one)
    boundary_mode: str = BOUNDARY_VISIT
    max_hops: Optional[int] = None
    # Extra node IDs to treat as visited even without findings
    # (markAsVisited, Weaver.hs:93-96). Whole-graph mode only.
    extra_visited: Sequence[str] = ()


_SAMPLE_COLS = [
    "finding_id",
    "link_pos",
    "subject_node",
    "target_node",
    "link_state",
    "found_at",
    "link_attrs",
]


def keep_argmax(
    df: DataFrame, group_cols: list[str], order_cols: list[str]
) -> DataFrame:
    """Keep each group's row(s) maximal under the lexicographic order
    of ``order_cols`` — the engine's scalable argmax.

    Shape: per order column, a scalar-``max`` hash aggregate over
    (group key, long) followed by a semi-join of the full rows. Scalar
    longs keep the aggregate a map-side-combinable HashAggregate;
    ``max_by(struct(...))``/``max(struct)``/window-``row_number`` all
    degrade to sort-based plans because struct buffers and wide rows
    aren't hash-aggregation buffer types — sorting the full history by
    key is exactly what must not happen at 100 TB. The winner-key table
    is one row per group (node/pair count << row count), so the
    semi-joins broadcast under AQE at typical scales.
    """
    out = df
    for oc in order_cols:
        keys = out.groupBy(*group_cols).agg(F.max(F.col(oc)).alias(oc))
        out = out.join(keys, on=group_cols + [oc], how="left_semi")
    return out


def latest_findings_per_node(findings: DataFrame) -> DataFrame:
    """policyOverwrite (A1): keep only each subject's latest finding
    (ties broken by ingest order = finding_id, Weaver.hs:84-88).

    Shape choice, measured at 6.4M findings / 1.5k subjects on
    local[32] with FULL materialization (xxhash64(to_json) over every
    column — a bare ``count()`` prunes the payload and flatters
    ``max_by``): keep_argmax 10-18 s, ``max_by(struct)`` 8-21 s,
    window ``row_number`` 17-20 s — a wash within this box's noise.
    keep_argmax stays: its aggregates are map-side-combinable scalar
    hash-aggs and its winner-key table is one row per *node*, which in
    this domain (network nodes, not events) always broadcasts; the
    ``max_by`` SortAggregate buffers full-width rows map-side, which
    loses when findings carry large attr maps / many links.
    """
    return keep_argmax(findings, ["subject_node"], ["found_at", "finding_id"])


def snapshot_timeline(
    findings: DataFrame, timestamps: Sequence[int]
) -> DataFrame:
    """Latest-per-node state as of each of K timeline points — the
    reference's interval query with upper bound t (``Interval.hs``
    upper-end semantics, ``Spider.hs`` timeInterval) evaluated at every
    t at once, i.e. an as-of join of the node history against a
    timeline. One call answers "how did the network evolve?" instead of
    K full snapshot runs over the same history.

    Returns (ts, node_id, node_ts, finding_id): for each timeline
    timestamp and each node observed at or before it, the node's
    then-latest finding.

    Scale shape: the K timeline points broadcast into a nested-loop
    theta-join (``found_at <= ts``), expanding the history by at most
    K, then one :func:`keep_argmax` per (ts, node). K is small (a
    report axis, not data); the history is never self-joined and never
    sorted. For K in the thousands, bucket the points and range-join
    instead.
    """
    spark = findings.sparkSession
    tl = spark.createDataFrame([(int(t),) for t in timestamps], "ts bigint")
    joined = findings.join(F.broadcast(tl), F.col("found_at") <= F.col("ts"))
    kept = keep_argmax(joined, ["ts", "subject_node"], ["found_at", "finding_id"])
    return kept.select(
        "ts",
        F.col("subject_node").alias("node_id"),
        F.col("found_at").alias("node_ts"),
        "finding_id",
    )


_NODE_STATE_COLS = [
    "subject_node", "found_at", "finding_id", "node_attrs",
    "tz_offset_min", "tz_summer_only", "tz_name",
]


def _node_states(node_src: DataFrame, already_latest: bool) -> DataFrame:
    """Per-node latest timestamp + attributes over the kept findings
    (makeSnapshotNode, Weaver.hs:136-151).

    Under the overwrite policy the input is the policy dedup's own
    output — already exactly one row per subject (finding_id is
    unique) — so ``already_latest=True`` skips the argmax entirely.
    The append path reduces the NARROW node projection (no
    neighbor_links array — the one payload that makes sorting rows a
    100 TB hazard) with a single ``max_by(struct)`` aggregate: one
    map-side-combinable pass whose partial collapses every partition
    to ~one row per subject before the shuffle — the same shape (and
    justification) as the unify merge below. The former
    ``keep_argmax`` rounds cost two aggregates plus two joins over the
    full history; measured at 12.8M findings they shuffled 704 MB in
    581 tasks where this aggregate shuffles only the per-partition
    partials. The winner is identical: lexicographic max over
    (found_at, finding_id), finding_id unique. The winner's display
    timezone travels with the timestamp (the reference round-trips tz
    meta-properties through the history graph into GraphML,
    Graph/Internal.hs:84-98 / GraphML/Writer.hs:252-259).
    """
    latest = (
        node_src
        if already_latest
        else node_src.groupBy("subject_node")
        .agg(
            F.expr(
                "max_by(struct("
                + ", ".join(c for c in _NODE_STATE_COLS if c != "subject_node")
                + "), struct(found_at, finding_id))"
            ).alias("_w")
        )
        .selectExpr(
            "subject_node",
            *[
                f"_w.{c} AS {c}"
                for c in _NODE_STATE_COLS
                if c != "subject_node"
            ],
        )
    )
    return latest.selectExpr(
        "subject_node",
        "found_at AS node_ts",
        "node_attrs",
        "tz_offset_min",
        "tz_summer_only",
        "tz_name",
    )


def get_snapshot(
    findings: DataFrame, query: Optional[Query] = None,
    log_sink: Optional[list] = None,
) -> tuple[DataFrame, DataFrame]:
    """Run the snapshot query; returns (snapshot_nodes, snapshot_links).

    Output schemas: model.SNAPSHOT_NODE_SCHEMA / SNAPSHOT_LINK_SCHEMA
    (``NetSpider/Snapshot/Internal.hs:34-114``).

    ``log_sink``: optional list; when given, debug log lines in the
    spirit of ``Weaver.getSnapshot'``'s ``[LogLine]`` channel
    (Weaver.hs:156-160, Log.hs) are appended in place — policy choice,
    traversal/boundary accounting, and unify group counts. The counts
    run extra (cheap) actions over the persisted narrow intermediates,
    so leave ``log_sink`` off on production paths; unlike the
    reference's per-group lines the unify entry is an aggregate, which
    is the only shape that survives a 10^9-pair graph.
    """
    query = query or Query()
    spark = findings.sparkSession

    def _log(msg: str) -> None:
        if log_sink is not None:
            log_sink.append(msg)

    kept = findings.filter(query.time_interval.predicate(F.col("found_at")))
    overwrite = query.found_node_policy == POLICY_OVERWRITE
    if overwrite:
        kept = latest_findings_per_node(kept)
    elif query.found_node_policy != POLICY_APPEND:
        raise ValueError(f"unknown found_node_policy: {query.found_node_policy}")
    _log(
        f"found-node policy: {query.found_node_policy}"
        + (" (latest finding per subject)" if overwrite else " (full history)")
    )

    # What gets persisted depends on the policy. Overwrite: `kept` is
    # the policy aggregate's output — bounded by node count, tiny —
    # persist it whole so the argmax runs once, not once per consumer.
    # Append: `kept` IS the full filtered history, and NOTHING
    # history-sized is cached: the consumers are narrow projections
    # (targets reads one column, visited one, the unify merge a
    # handful), so each re-derives straight off the column-pruned
    # source scan. Measured at 51M findings, caching the exploded
    # samples for its two whole-graph consumers cost 110 s (38 s fill
    # + 40 s of GC + slow heap reads) against 15 s recomputing the
    # explode per consumer, and the narrow node projection cache lost
    # 33.6 s vs 12.7 s the same way — the §5 caching rule measured:
    # a cheap codegen projection is not worth corpus-sized memory
    # pressure, and the cache also defeats per-consumer column
    # pruning. Traversal mode still persists the samples: the BFS
    # loop reads them once per level.
    from pyspark import StorageLevel

    if overwrite:
        kept = kept.persist(StorageLevel.MEMORY_AND_DISK)
    node_src = kept.select(*_NODE_STATE_COLS)
    samples = explode_link_samples(kept)
    # Overwrite mode: samples explode off the TINY persisted kept —
    # keep the r11 persist (cheap, and the consumers stay cache-local).
    # Traversal mode: the BFS loop reads samples once per level.
    # Append whole-graph mode: stream (the measurement above).
    if overwrite or query.starts_from is not None:
        samples = samples.persist(StorageLevel.MEMORY_AND_DISK)

    if query.starts_from is not None:
        # The traversal can only begin at nodes that exist in the history
        # graph at all — identity vertices persist outside the query
        # interval (getOrMakeNode, Spider.hs:146-158), so existence is
        # checked against the FULL findings table, not the kept subset.
        starts_df = spark.createDataFrame(
            [(str(s),) for s in query.starts_from], "node_id string"
        )
        universe = (
            findings.select(F.col("subject_node").alias("node_id"))
            .unionByName(
                findings.select(
                    F.explode("neighbor_links.target_node").alias("node_id")
                )
            )
            .distinct()
        )
        starts_df = starts_df.join(universe, "node_id", "left_semi")
        edges = samples.select(
            F.col("subject_node").alias("src"), F.col("target_node").alias("dst")
        )
        visited = reachable_nodes(edges, starts_df, max_hops=query.max_hops)
        node_src = node_src.join(
            visited.withColumnRenamed("node_id", "subject_node"),
            "subject_node",
            "left_semi",
        )
        samples = samples.join(
            visited.withColumnRenamed("node_id", "subject_node"),
            "subject_node",
            "left_semi",
        )
        # With an unbounded traversal every link target is itself
        # visited; under max_hops, targets past the bound are boundary
        # nodes (observed but not visited, Weaver.hs:120-129) — they
        # must still appear so the output graph is closed over its
        # links.
        targets = samples.select(F.col("target_node").alias("node_id")).distinct()
        boundary = targets.join(visited, "node_id", "left_anti")
        node_ids = visited.withColumn("is_on_boundary", F.lit(False)).unionByName(
            boundary.withColumn("is_on_boundary", F.lit(True))
        )
        if log_sink is not None:
            _log(
                f"traverse: starts_from={sorted(str(s) for s in query.starts_from)}"
                f" max_hops={query.max_hops}:"
                f" visited {visited.count()} nodes,"
                f" {boundary.count()} past-bound targets on boundary"
            )
    else:
        # Whole-graph (Weaver) mode: visited = subjects (+ explicit marks),
        # boundary = link targets never visited (Weaver.hs:120-129).
        visited = node_src.select(F.col("subject_node").alias("node_id")).distinct()
        if query.extra_visited:
            extra = spark.createDataFrame(
                [(str(s),) for s in query.extra_visited], "node_id string"
            )
            visited = visited.unionByName(extra).distinct()
        targets = samples.select(F.col("target_node").alias("node_id")).distinct()
        boundary = targets.join(visited, "node_id", "left_anti")
        flag = F.lit(query.boundary_mode == BOUNDARY_MARK)
        node_ids = visited.withColumn("is_on_boundary", F.lit(False)).unionByName(
            boundary.withColumn("is_on_boundary", flag)
        )
        if log_sink is not None:
            _log(
                f"boundary (mode={query.boundary_mode}):"
                f" {visited.count()} visited nodes,"
                f" {boundary.count()} observed-only targets"
                + (" marked on boundary"
                   if query.boundary_mode == BOUNDARY_MARK
                   else " included unmarked")
            )

    # --- snapshot nodes -------------------------------------------------
    node_states = _node_states(node_src, already_latest=overwrite)
    nodes = (
        node_ids.join(
            node_states.withColumnRenamed("subject_node", "node_id"),
            "node_id",
            "left",
        ).select(
            "node_id", "is_on_boundary", "node_ts", "node_attrs",
            "tz_offset_min", "tz_summer_only", "tz_name",
        )
    )

    # --- unify ----------------------------------------------------------
    if log_sink is not None:
        # Aggregate twin of Weaver.hs:186-191's per-group "Unify link
        # [a]-[b]: from N samples" lines: total samples and distinct
        # unify groups, both off the persisted narrow sample table.
        n_samples = samples.count()
        n_groups = (
            samples.select(
                F.least("subject_node", "target_node"),
                F.greatest("subject_node", "target_node"),
            )
            .distinct()
            .count()
        )
        _log(f"unify: {n_groups} link groups from {n_samples} samples")
    links = _unify_links(
        samples, nodes, query.unify, persist_node_ts=not overwrite
    )
    return nodes, links


def get_snapshot_logged(
    findings: DataFrame, query: Optional[Query] = None
) -> tuple[DataFrame, DataFrame, list]:
    """``Weaver.getSnapshot'`` (Weaver.hs:156-160): the snapshot plus
    its debug-log channel. Returns (nodes, links, logs) where ``logs``
    is a list of strings."""
    logs: list = []
    nodes, links = get_snapshot(findings, query, log_sink=logs)
    return nodes, links, logs


def _unify_links(
    samples: DataFrame,
    nodes: DataFrame,
    conf: UnifyConfig,
    persist_node_ts: bool = False,
) -> DataFrame:
    """Steps 1-3 of unifyStd (Unify.hs:169-193) + direction resolution
    (Weaver.hs:190-203)."""
    # Swap-insensitive link identity (Pair.hs:17-30). The pair columns
    # are the shuffle key; the un-swapped subject/target stay inside the
    # sample struct because output direction depends on them.
    # One selectExpr instead of three withColumn (each withColumn
    # re-analyzes the whole accumulated plan and pays its own py4j
    # round-trips); the custom sub_id hook still receives/returns a
    # Column, mixed into the same single select.
    pair_exprs = [
        "*",
        "least(subject_node, target_node) AS p1",
        "greatest(subject_node, target_node) AS p2",
    ]
    if conf.sub_id is not None:
        with_pair = samples.select(
            "*",
            F.expr(pair_exprs[1]),
            F.expr(pair_exprs[2]),
            conf.sub_id().alias("sub_id"),
        )
    else:
        with_pair = samples.selectExpr(*pair_exprs, "'' AS sub_id")

    if conf.merge_samples is not None:
        # Custom merge: Arrow-batched grouped-map per (pair, sub_id).
        if conf.merge_output_schema is None:
            raise ValueError("merge_output_schema required with merge_samples")
        merged = (
            with_pair.groupBy("p1", "p2", "sub_id")
            .applyInPandas(conf.merge_samples, schema=conf.merge_output_schema)
        )
    else:
        # Default merge = latestLinkSample over both endpoints' samples,
        # deterministic tie-break on (found_at, finding_id, link_pos).
        # Samples are NARROW rows (no nested arrays), so a single
        # max_by aggregate — sort-based because of the attrs map, but
        # one shuffle and map-side partial — wins here. Measured at
        # both 6.4M and 51M samples: a max(found_at) hash-agg +
        # semi-join prefilter before the max_by added ~17 s at 6.4M
        # and paid for itself nowhere — the partial aggregate already
        # collapses each map partition to ~one row per pair before the
        # shuffle. The argmax-join shape is reserved for the wide
        # nested findings (latest_findings_per_node), where sorting
        # full rows is the 100 TB hazard.
        merged = (
            with_pair.groupBy("p1", "p2", "sub_id")
            .agg(
                F.expr(
                    "max_by(struct(" + ", ".join(_SAMPLE_COLS) + "), "
                    "struct(found_at, finding_id, link_pos))"
                ).alias("_w")
            )
            .selectExpr(
                "p1", "p2", *[f"_w.{c} AS {c}" for c in _SAMPLE_COLS]
            )
        )

    if conf.winner_transform is not None:
        for name, col in conf.winner_transform().items():
            merged = merged.withColumn(name, col)

    return negate_and_resolve(
        merged, nodes, conf, persist_node_ts=persist_node_ts
    )


def negate_and_resolve(
    merged: DataFrame,
    nodes: DataFrame,
    conf: Optional[UnifyConfig] = None,
    persist_node_ts: bool = False,
) -> DataFrame:
    """The unify tail: negation + direction resolution over MERGED link
    samples (p1/p2 pair keys + subject/target/state/found_at/attrs).

    Shared by the batch pipeline and the incremental path: apply it to
    the contents of the stream-maintained views
    (``streaming.ingest.stream_latest_per_node`` renamed to
    (node_id, node_ts) + ``stream_latest_link_per_pair`` /
    ``stream_unified_link_per_pair``) to complete them into the exact
    snapshot link rows the batch query produces on full replay.
    """
    if conf is None:
        conf = unify_to_one()
    # Negation (Unify.hs:184-193): check the merged sample against BOTH
    # endpoints' snapshot-node timestamps. Node states are a per-node
    # aggregate — orders of magnitude smaller than the sample table — so
    # these two equi-joins broadcast under AQE at typical scales.
    # ``persist_node_ts`` (the append path sets it): the table is
    # joined once per endpoint, and each broadcast build otherwise
    # re-executes the whole nodes subtree — node-state reduction +
    # visited/boundary union over the FULL history, measured as the
    # dominant repeat in the append path at 128x scale. One row per
    # node, narrow. Overwrite mode skips the persist: its nodes
    # subtree reads the tiny cached kept table, and the cache-fill
    # stages cost more than the repeat there.
    node_ts = nodes.selectExpr("node_id", "node_ts AS _end_ts")
    if persist_node_ts:
        from pyspark import StorageLevel

        node_ts = node_ts.persist(StorageLevel.MEMORY_AND_DISK)
    for end in ("p1", "p2"):
        nt = node_ts.selectExpr(
            f"node_id AS _{end}_id", f"_end_ts AS _{end}_ts"
        )
        merged = merged.join(nt, merged[end] == nt[f"_{end}_id"], "left")
        merged = merged.filter(
            ~conf.negates(F.col(f"_{end}_id"), F.col(f"_{end}_ts"))
        ).drop(f"_{end}_id", f"_{end}_ts")

    # Direction resolution (Weaver.hs:190-203; C8).
    resolved = merged.where("link_state != 'unused'").selectExpr(
        "CASE WHEN link_state = 'to_subject' THEN target_node"
        " ELSE subject_node END AS source_node",
        "CASE WHEN link_state = 'to_subject' THEN subject_node"
        " ELSE target_node END AS dest_node",
        "(link_state != 'bidirectional') AS is_directed",
        "found_at AS link_ts",
        "link_attrs",
    )
    return resolved


def get_snapshot_simple(
    findings: DataFrame, starts_from: Sequence[str]
) -> tuple[DataFrame, DataFrame]:
    """``getSnapshotSimple`` (Spider.hs:161-173): defaults everywhere,
    just start nodes. The reference warns it is for small graphs only —
    here it is the same scalable pipeline as the full query."""
    return get_snapshot(findings, Query(starts_from=list(starts_from)))


def snapshot_to_json(nodes: DataFrame, links: DataFrame) -> tuple[DataFrame, DataFrame]:
    """JSON documents per element, snake_case wire format
    (SnapshotElement ToJSON, Snapshot/Internal.hs:88-137): one column
    ``json`` per DataFrame. JVM-side to_json — exportable at any scale
    via a normal distributed write."""
    # Aeson's generic encoding (no omitNothingFields) writes Nothing as
    # an EXPLICIT null, while the Timestamp object itself omits tz
    # fields when there is no timezone (Timestamp.hs:89-100). Two
    # to_json shapes with ignoreNullFields=false reproduce both rules.
    opts = {"ignoreNullFields": "false"}
    # engine-internal presence markers (model.INTERNAL_ATTR_KEYS, e.g.
    # dao_present) never reach serialized output — the reference's
    # Aeson encoding has no such keys
    from net_spider_spark.model import INTERNAL_ATTR_KEYS

    attrs_t = dict(nodes.dtypes).get("node_attrs", "")
    if attrs_t.startswith("map<"):
        nodes = nodes.withColumn(
            "node_attrs",
            F.when(
                F.col("node_attrs").isNotNull(),
                F.map_filter(
                    F.col("node_attrs"),
                    lambda k, _: ~k.isin(*INTERNAL_ATTR_KEYS),
                ),
            ),
        )
    tz_present = F.col("tz_offset_min").isNotNull()
    node_with_tz = nodes.where(tz_present).select(
        F.to_json(
            F.struct(
                F.col("node_id"),
                F.col("is_on_boundary"),
                F.struct(
                    F.col("node_ts").alias("epoch_time"),
                    F.col("tz_offset_min"),
                    F.col("tz_summer_only"),
                    F.col("tz_name"),
                ).alias("timestamp"),
                F.col("node_attrs"),
            ),
            opts,
        ).alias("json")
    )
    node_no_tz = nodes.where(~tz_present).select(
        F.to_json(
            F.struct(
                F.col("node_id"),
                F.col("is_on_boundary"),
                F.when(
                    F.col("node_ts").isNotNull(),
                    F.struct(F.col("node_ts").alias("epoch_time")),
                ).alias("timestamp"),
                F.col("node_attrs"),
            ),
            opts,
        ).alias("json")
    )
    node_json = node_with_tz.unionByName(node_no_tz)
    link_json = links.select(
        F.to_json(
            F.struct(
                F.col("source_node"),
                F.col("dest_node"),
                F.col("is_directed"),
                F.struct(F.col("link_ts").alias("epoch_time")).alias("timestamp"),
                F.col("link_attrs"),
            ),
            opts,
        ).alias("json")
    )
    return node_json, link_json


#: Wire schemas for snapshot elements (FromJSON SnapshotNode /
#: SnapshotLink, Snapshot/Internal.hs:88-137 + Timestamp.hs:74-85).
_TS_WIRE = T.StructType(
    [
        T.StructField("epoch_time", T.LongType()),
        T.StructField("tz_offset_min", T.IntegerType()),
        T.StructField("tz_summer_only", T.BooleanType()),
        T.StructField("tz_name", T.StringType()),
    ]
)
SNAPSHOT_NODE_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("node_id", T.StringType()),
        T.StructField("is_on_boundary", T.BooleanType()),
        T.StructField("timestamp", _TS_WIRE),
        T.StructField("node_attrs", T.MapType(T.StringType(), T.StringType())),
    ]
)
SNAPSHOT_LINK_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("source_node", T.StringType()),
        T.StructField("dest_node", T.StringType()),
        T.StructField("is_directed", T.BooleanType()),
        T.StructField("timestamp", _TS_WIRE),
        T.StructField("link_attrs", T.MapType(T.StringType(), T.StringType())),
    ]
)


def snapshot_from_json(
    node_json: DataFrame, link_json: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Parse-back of :func:`snapshot_to_json` (FromJSON for snapshot
    elements, Snapshot/Internal.hs:88-137): ``json`` string columns ->
    (nodes, links) in the engine's snapshot schema. from_json is
    JVM-side; a malformed document yields null required fields and is
    dropped."""
    n = node_json.select(
        F.from_json(F.col("json"), SNAPSHOT_NODE_WIRE_SCHEMA).alias("d")
    ).where(F.col("d.node_id").isNotNull())
    nodes = n.select(
        F.col("d.node_id").alias("node_id"),
        F.coalesce(F.col("d.is_on_boundary"), F.lit(False)).alias("is_on_boundary"),
        F.col("d.timestamp.epoch_time").alias("node_ts"),
        F.col("d.node_attrs").alias("node_attrs"),
        F.col("d.timestamp.tz_offset_min").alias("tz_offset_min"),
        F.col("d.timestamp.tz_summer_only").alias("tz_summer_only"),
        F.col("d.timestamp.tz_name").alias("tz_name"),
    )
    l = link_json.select(
        F.from_json(F.col("json"), SNAPSHOT_LINK_WIRE_SCHEMA).alias("d")
    ).where(
        F.col("d.source_node").isNotNull() & F.col("d.dest_node").isNotNull()
    )
    links = l.select(
        F.col("d.source_node").alias("source_node"),
        F.col("d.dest_node").alias("dest_node"),
        F.coalesce(F.col("d.is_directed"), F.lit(True)).alias("is_directed"),
        F.col("d.timestamp.epoch_time").alias("link_ts"),
        F.col("d.link_attrs").alias("link_attrs"),
    )
    return nodes, links


def graph_timestamp(nodes: DataFrame, links: DataFrame):
    """Max timestamp over all nodes and links (``graphTimestamp``,
    NetSpider/Snapshot.hs:40-50). Returns int epoch-ms or None."""
    ts = (
        nodes.select(F.col("node_ts").alias("ts"))
        .unionByName(links.select(F.col("link_ts").alias("ts")))
        .agg(F.max("ts").alias("ts"))
        .collect()[0]["ts"]
    )
    return ts
