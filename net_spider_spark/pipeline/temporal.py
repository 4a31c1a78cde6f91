"""Temporal joins and time-bucketed rollups.

Operators Spark lacks as built-ins but a time-series/event pipeline
needs constantly (the reference's domain is time-varying observation
logs — net-spider's findings are exactly such an event stream):

* ``asof_join`` — for every probe row, the nearest reference row at or
  before (or after) its timestamp, per key. Implemented as ONE union +
  ONE window pass: both inputs shuffle once on the key, a per-key sort
  orders the interleaved stream, and ``last(..., ignorenulls=True)``
  carries the most recent reference payload forward. No range
  explosion, no per-key Python loop, no O(|probe| x |ref|) join — the
  standard scalable formulation (wall-clock is one shuffle regardless
  of how many probe rows share a key).
* ``interval_join`` — points joined to the intervals containing them.
  Spark would otherwise plan an inequality join as BroadcastNestedLoop
  (all-pairs). Chunking every interval onto a fixed time-bucket grid
  turns it into an EQUI-join on (key, bucket): each interval explodes
  to ceil(len/bucket)+1 rows, each point maps to exactly one bucket,
  so every qualifying pair meets exactly once (no post-dedup needed).
* ``time_rollup`` — hypertable-style continuous aggregate at several
  resolutions. The finest rollup aggregates the raw events ONCE; every
  coarser resolution re-aggregates the finest (sum-of-sums, min-of-
  mins), so raw data is scanned a single time no matter how many
  resolutions are materialized.

At 100 TB: ``asof_join`` is bound by one shuffle of each side keyed by
``by`` (salt hot keys upstream if one key dominates); ``interval_join``
is an equi-join AQE can re-plan (pick ``bucket_ms`` near the typical
interval length so explosion stays ~2x); ``time_rollup`` is a pair of
map-side-combinable hash aggregates.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from net_spider_spark.reliability import materialize as _materialize

__all__ = ["asof_join", "interval_join", "time_rollup", "gap_fill"]


def asof_join(
    probe: DataFrame,
    ref: DataFrame,
    on: str,
    by: Sequence[str] = (),
    ref_cols: Sequence[str] = (),
    prefix: str = "asof_",
    direction: str = "backward",
    allow_exact_matches: bool = True,
    tolerance: int | None = None,
    ref_order: str | None = None,
) -> DataFrame:
    """As-of join: every ``probe`` row gains the payload of the nearest
    ``ref`` row per ``by`` key — at-or-before its ``on`` value for
    ``direction="backward"``, at-or-after for ``"forward"``.

    Output = all probe rows (left outer semantics) plus ``prefix+on``
    (the matched reference timestamp, null when no match) and
    ``prefix+c`` for every ``c`` in ``ref_cols``.

    * ``allow_exact_matches=False`` makes the comparison strict
      (``<`` / ``>``): equal-timestamp reference rows are ordered on
      the far side of the probe row, so the window never sees them.
    * ``tolerance`` (same unit as ``on``) nulls out matches farther
      than the bound — sound as a post-filter because the window picks
      the NEAREST candidate: if that one is out of tolerance, every
      other candidate is too.
    * When several reference rows share (key, timestamp), the winner is
      the greatest ``ref_order`` for backward / least for forward —
      deterministic, mirroring a latest-wins event log.

    Plan shape: union -> single shuffle on ``by`` -> per-key window
    sort -> filter. Runs at |probe|+|ref| rows with no join operator.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward: {direction}")
    by = list(by)
    ref_cols = [c for c in ref_cols if c != on]
    ord_col = F.col(ref_order) if ref_order is not None else F.lit(0)

    payload = F.struct(
        F.col(on).alias("_ts"), *[F.col(c).alias(c) for c in ref_cols]
    )
    # Sort position of ref rows relative to an equal-timestamp probe
    # row: visible side for exact matches, far side for strict ones.
    if direction == "backward":
        ref_side = 0 if allow_exact_matches else 2
    else:
        ref_side = 2 if allow_exact_matches else 0
    r = ref.select(
        *by,
        F.col(on).alias("_t"),
        F.lit(ref_side).alias("_side"),
        ord_col.cast("long").alias("_ord"),
        payload.alias("_ref"),
    )
    p = probe.withColumn("_t", F.col(on)).withColumn(
        "_side", F.lit(1)
    ).withColumn("_ord", F.lit(0).cast("long")).withColumn(
        "_ref", F.lit(None).cast(r.schema["_ref"].dataType)
    )
    probe_cols = probe.columns
    aux = ["_t", "_side", "_ord", "_ref"]
    unioned = p.select(*probe_cols, *aux).unionByName(
        r.select(
            *[
                F.col(c)
                if c in by
                else F.lit(None).cast(probe.schema[c].dataType).alias(c)
                for c in probe_cols
            ],
            *aux,
        )
    )

    if direction == "backward":
        w = (
            Window.partitionBy(*by)
            .orderBy("_t", "_side", "_ord")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        matched = F.last("_ref", ignorenulls=True).over(w)
    else:
        # forward: nearest ref at-or-after; tie on _ord broken toward
        # the LEAST order value (first eligible row in sort order).
        w = (
            Window.partitionBy(*by)
            .orderBy("_t", "_side", "_ord")
            .rowsBetween(0, Window.unboundedFollowing)
        )
        matched = F.first("_ref", ignorenulls=True).over(w)

    out = unioned.withColumn("_m", matched).where(F.col("_side") == 1)
    if tolerance is not None:
        gap = (
            F.col(on) - F.col("_m._ts")
            if direction == "backward"
            else F.col("_m._ts") - F.col(on)
        )
        out = out.withColumn(
            "_m",
            F.when(gap <= F.lit(tolerance), F.col("_m")),
        )
    return out.select(
        *probe_cols,
        F.col("_m._ts").alias(prefix + on),
        *[F.col(f"_m.{c}").alias(prefix + c) for c in ref_cols],
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    by: Sequence[str] = (),
    bucket: int = 3_600_000,
) -> DataFrame:
    """Inner-join every point to every interval containing it
    (``start <= ts <= end``, both ends inclusive), optionally also
    matching on ``by`` keys.

    Each interval is exploded onto the bucket grid it overlaps
    (``sequence(start div b, end div b)``) and each point lands in its
    single bucket, so the match becomes an equi-join on
    (by..., bucket) + a residual range filter, and every qualifying
    (point, interval) pair meets exactly once.

    Pick ``bucket`` near the typical interval length: explosion factor
    is ~(len/bucket + 1) per interval, and bucket population drives the
    join fan-out. Degenerate long intervals explode linearly — split
    them upstream or raise ``bucket``.
    """
    by = list(by)
    b = F.lit(int(bucket))
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                (F.col(start_col).cast("long") / b).cast("long"),
                (F.col(end_col).cast("long") / b).cast("long"),
            )
        ),
    )
    pt = points.withColumn(
        "_bucket", (F.col(point_ts).cast("long") / b).cast("long")
    )
    cond = (F.col(point_ts) >= F.col(start_col)) & (
        F.col(point_ts) <= F.col(end_col)
    )
    return pt.join(iv, on=by + ["_bucket"], how="inner").where(cond).drop(
        "_bucket"
    )


def time_rollup(
    events: DataFrame,
    ts_col: str = "ts_ms",
    value_col: str = "value",
    group_cols: Sequence[str] = ("event_type",),
    resolutions: Sequence[int] = (60_000, 3_600_000),
) -> DataFrame:
    """Hypertable-style multi-resolution tumbling rollup.

    For each resolution r (ms) and group key: row count, sum/min/max/
    avg of ``value_col`` over ``[k*r, (k+1)*r)`` buckets. The FINEST
    resolution aggregates the raw events; every coarser resolution
    (which must be a multiple of the finest) re-aggregates those
    partials — sum of sums, sum of counts, min of mins — so the raw
    table is scanned once regardless of how many resolutions ship.

    Sums/avgs are rounded to 4 decimals so results are reproducible
    across aggregation orders (floating-point sums re-associated by the
    partial tree stay within 1e-10 of the direct sum).

    Returns ``group_cols + [resolution, bucket_start, n_events,
    value_sum, value_min, value_max, value_avg]``.

    Evaluation contract: the finest-resolution partials materialize
    EAGERLY at call time (``localCheckpoint(eager=True)``) — the call
    runs Spark jobs even if the result is never acted on, and caller
    filters do not prune below the checkpoint. Checkpoint blocks are
    unreplicated: executor loss (failure / dynamic-allocation
    decommission) fails the downstream action instead of recomputing.
    """
    group_cols = list(group_cols)
    res = sorted(int(r) for r in resolutions)
    finest = res[0]
    for r in res[1:]:
        if r % finest:
            raise ValueError(
                f"resolution {r} is not a multiple of the finest {finest}"
            )

    base = events.groupBy(
        *group_cols,
        (
            (F.col(ts_col).cast("long") / F.lit(finest)).cast("long")
            * F.lit(finest)
        ).alias("bucket_start"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col(value_col).cast("double")).alias("_sum"),
        F.min(F.col(value_col).cast("double")).alias("value_min"),
        F.max(F.col(value_col).cast("double")).alias("value_max"),
    )
    # The finest-resolution partials feed every coarser rollup;
    # localCheckpoint (not persist) materializes them once with
    # RDD-owned blocks the ContextCleaner frees when the caller drops
    # the result — a persist() here would leak a CacheManager entry
    # for the session lifetime since this function never sees the
    # caller's final action.
    base = base.transform(_materialize)

    def _finish(df: DataFrame, r: int) -> DataFrame:
        return df.select(
            *group_cols,
            F.lit(int(r)).cast("long").alias("resolution"),
            "bucket_start",
            "n_events",
            F.round(F.col("_sum"), 4).alias("value_sum"),
            "value_min",
            "value_max",
            # divide the ROUNDED sum: identical operands -> identical
            # IEEE quotient on any engine, with no half-way-boundary
            # sensitivity a second rounding step would introduce.
            (F.round(F.col("_sum"), 4) / F.col("n_events")).alias("value_avg"),
        )

    parts = [_finish(base, finest)]
    for r in res[1:]:
        coarser = base.groupBy(
            *group_cols,
            (
                (F.col("bucket_start") / F.lit(r)).cast("long") * F.lit(r)
            ).alias("bucket_start"),
        ).agg(
            F.sum("n_events").alias("n_events"),
            F.sum("_sum").alias("_sum"),
            F.min("value_min").alias("value_min"),
            F.max("value_max").alias("value_max"),
        )
        parts.append(_finish(coarser, r))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def gap_fill(
    buckets: DataFrame,
    group_cols: Sequence[str] = ("event_type",),
    bucket_col: str = "bucket_start",
    step: int = 3_600_000,
    value_cols: Sequence[str] = ("n_events",),
    fill: str = "zero",
) -> DataFrame:
    """Densify a per-group bucket series (e.g. :func:`time_rollup`
    output at one resolution): emit one row for EVERY ``step``-spaced
    bucket between each group's min and max observed bucket, marking
    synthesized rows with ``is_gap`` and filling their ``value_cols``
    by policy — ``"zero"`` (counts/sums), ``"null"`` (leave holes
    visible), or ``"ffill"`` (carry the last observed value forward;
    never null because a group's first bucket is observed by
    construction). Gauges resample with ffill, counters with zero —
    downstream window/lag analytics need the dense grid either way.

    Observed ``bucket_col`` values must lie on a common ``step`` grid
    (true for any tumbling-bucket aggregate); rows off-grid would
    simply never be matched.

    Scale shape: extents are one tiny aggregate; the dense grid is a
    codegen ``explode(sequence(lo, hi, step))`` whose row count is the
    OUTPUT size (time-range/step per group — a function of calendar
    span, not corpus size); observed rows attach by equi-join; the
    ffill window orders each group's buckets — state bounded by the
    same calendar span, so it cannot grow with data volume.
    """
    if fill not in ("zero", "null", "ffill"):
        raise ValueError(f"unknown fill: {fill!r}")
    if step <= 0:
        raise ValueError("step must be positive")
    group_cols = list(group_cols)
    value_cols = list(value_cols)
    ext = buckets.groupBy(*group_cols).agg(
        F.min(bucket_col).alias("_lo"), F.max(bucket_col).alias("_hi")
    )
    dense = ext.select(
        *group_cols,
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.lit(int(step)))
        ).alias(bucket_col),
    )
    joined = dense.join(
        buckets, group_cols + [bucket_col], "left"
    ).withColumn("is_gap", F.col(value_cols[0]).isNull())
    if fill == "zero":
        out = joined.select(
            *group_cols,
            bucket_col,
            *[
                F.coalesce(F.col(c), F.lit(0).cast(joined.schema[c].dataType))
                .alias(c)
                for c in value_cols
            ],
            "is_gap",
        )
    elif fill == "ffill":
        w = (
            Window.partitionBy(*group_cols)
            .orderBy(bucket_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        out = joined.select(
            *group_cols,
            bucket_col,
            *[
                F.last(F.col(c), ignorenulls=True).over(w).alias(c)
                for c in value_cols
            ],
            "is_gap",
        )
    else:
        out = joined.select(*group_cols, bucket_col, *value_cols, "is_gap")
    return out
