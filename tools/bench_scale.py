"""Scale benchmark: replicate the sf0.1 findings derivation by
$SPARK_GRAFT_REPLICATE (default 64 -> 6.4M findings; 512 -> ~51M) with
distinct finding_ids and perturbed timestamps, then time the core
engine paths where shuffles actually bite. Prints one JSON line per
run, mirroring bench.py's shape.

Timings force FULL materialization of every output column by hashing
the row payload (xxhash64 over to_json(struct(*))). A bare ``count()``
lets Spark prune the payload out of the aggregate — measured on the
argmax shapes that flattered ``max_by(struct)`` by 5x+ (the struct
never got built) and is exactly the artifact this harness exists to
avoid.

Usage: [SPARK_GRAFT_REPLICATE=512] python tools/bench_scale.py

Protocol: idle machine only (check `ps aux | grep java` first); numbers
on this box swing 2x under load.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def force(df):
    """Materialize every column: hash the full row payload into one
    scalar.  The modulo keeps the ANSI-mode sum from long-overflowing."""
    h = F.xxhash64(F.to_json(F.struct(*[F.col(c) for c in df.columns])))
    return df.select(F.sum(h % 1000000)).first()[0]


def main() -> None:
    factor = int(os.environ.get("SPARK_GRAFT_REPLICATE", "64"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # Shuffle width: measured at 51M findings, oversizing to 512 with
    # AQE coalesce REGRESSED the argmax paths ~3x on this single-JVM
    # box (tiny shuffle blocks + task-launch overhead dominate long
    # before per-partition sorts spill); shuffle = cores stays the
    # default. On a real multi-executor cluster, size this to keep
    # post-filter partitions near 128-256 MB instead.
    shuffle = os.environ.get("SPARK_GRAFT_SHUFFLE", cpus)

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("net_spider_spark_bench_scale")
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", "64g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from net_spider_spark import demo
    from net_spider_spark.snapshot import (
        Query,
        get_snapshot,
        latest_findings_per_node,
    )
    from net_spider_spark.traverse import reachable_nodes

    base = demo.events_findings(spark, sf_dir)
    rep = spark.range(factor).select(F.col("id").alias("_r"))
    # Repartition BEFORE the replicating crossJoin: the local events
    # table is ONE parquet file, so everything upstream of the first
    # exchange runs as one task — and putting the exchange after the
    # blow-up makes that one task derive AND shuffle-write all 51M
    # rows (at 512x) while 31 cores idle. Exchanging the small base
    # first costs a 100k-row shuffle and makes the x512 expansion
    # data-parallel with no post-expansion shuffle at all. A real
    # corpus gets this parallelism from the scan.
    findings = (
        base.repartition(4 * int(cpus))
        .crossJoin(rep)
        .withColumn("finding_id", F.col("finding_id") * factor + F.col("_r"))
        .withColumn("found_at", F.col("found_at") + F.col("_r"))
        .drop("_r")
        .persist()
    )
    n = findings.count()

    from net_spider_spark.metrics import (
    counters_delta,
    executor_counters,
    host_steal_jiffies,
)

    timings: dict[str, float] = {}
    env: dict[str, dict] = {}
    counters: dict[str, dict] = {}
    # SPARK_GRAFT_SCALE_ONLY=a,b,c times just the named rows (their
    # inputs still build); anything a skipped row would have produced
    # for a LATER row still runs, untimed.
    only = {
        s for s in os.environ.get("SPARK_GRAFT_SCALE_ONLY", "").split(",") if s
    }

    def timed(name, fn):
        if only and name not in only:
            if name in _FEEDS:  # result feeds a later timed row
                fn()
            return
        before = executor_counters(spark)
        steal0 = host_steal_jiffies()
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 3)
        counters[name] = counters_delta(executor_counters(spark), before)
        # steal delta + load: on a shared-host VM, "identical counters,
        # inflated wall" is hypervisor steal — commit the evidence.
        env[name] = {
            "steal_j": host_steal_jiffies() - steal0,
            "load1": round(os.getloadavg()[0], 2),
        }

    _FEEDS = {"text_bpe_learned_256", "text_wordpiece_vocab"}

    timed("latest_per_node", lambda: force(latest_findings_per_node(findings)))
    timed(
        "snapshot_links_overwrite",
        lambda: force(get_snapshot(findings, Query(found_node_policy="overwrite"))[1]),
    )
    timed(
        "snapshot_links_append",
        lambda: force(get_snapshot(findings, Query(found_node_policy="append"))[1]),
    )
    edges = findings.select(
        F.col("subject_node").alias("src"),
        F.explode("neighbor_links").alias("nl"),
    ).select("src", F.col("nl.target_node").alias("dst"))
    starts = findings.select(F.col("subject_node").alias("node_id")).limit(1)
    timed("bfs_reachability", lambda: force(reachable_nodes(edges, starts)))
    findings.unpersist()

    # ---- round-4/5 headline families over replicated corpora ----
    from net_spider_spark.pipeline import dedup as D
    from net_spider_spark.pipeline import temporal as TP

    # Documents replicated verbatim with distinct ids: the duplicated-
    # gram set joins each gram OCCURRENCE against the distinct dup set
    # (never pairwise), so replication scales the gram table linearly
    # while driving duplication density up — the hostile-but-linear case.
    # Repartition BEFORE the replicating crossJoin: the local sf0.1
    # corpus is ONE small parquet file, so the replicated frame
    # inherits 1-2 input partitions and every pre-shuffle map (the
    # tokenizer especially — split inside higher-order filters is
    # interpreted, not codegen) runs single-task; exchanging the small
    # base first also keeps the x-factor expansion from being shuffle-
    # written by that one task. A real 100 TB corpus arrives as many
    # files and gets this parallelism from the scan; locally we
    # restore it explicitly. Measured before the fix: ONE task burned
    # 18+ min of CPU tokenizing 3.2 M docs while 31 cores idled.
    docs = demo.read_table(spark, sf_dir, "documents")
    docs_rep = (
        docs.repartition(4 * int(cpus))
        .crossJoin(rep)
        .withColumn("doc_id", F.col("doc_id") * factor + F.col("_r"))
        .drop("_r")
        .persist()
    )
    n_docs = docs_rep.count()
    timed(
        "dedup_span_removal",
        lambda: force(D.remove_duplicate_spans(docs_rep, n=10)),
    )

    # ---- curate/text headline rows (round-6) ----
    from net_spider_spark.pipeline import curate as CU
    from net_spider_spark.pipeline import text as TX

    timed(
        "curate_mixture_sample",
        lambda: force(
            CU.mixture_sample(docs_rep, {"src0": 2.0, "src1": 1.0, "src2": 1.0})
        ),
    )
    # Per-task sort bound for the quota-rank: each window partition
    # sorts exactly one (source, 3-hex-key-prefix) bucket, so the
    # largest bucket IS the per-task input — reported directly to show
    # it stays ~n_source/4096 while the corpus replicates.
    mix_hist = CU._mix_bucket_histogram(docs_rep, "source", "s42", "doc_id")
    mixture_max_bucket = max(
        (max(b.values()) for b in mix_hist.values()), default=0
    )
    timed(
        "text_bm25",
        lambda: force(TX.bm25_search(docs_rep, ["the", "data", "model"], top_k=10)),
    )
    # Boilerplate-line removal over the replicated corpus: replication
    # makes every line cross the min_docs threshold (each text repeats
    # in `factor` docs), so this measures the hostile all-lines-
    # removed case — marking join carries every line occurrence.
    timed(
        "dedup_boilerplate_lines",
        lambda: force(D.remove_boilerplate_lines(docs_rep, min_docs=2)),
    )
    timed("text_common_ngrams", lambda: force(TX.common_ngrams(docs_rep, n=3)))

    # ---- round-8 headline families (round-9 scale artifact) ----
    # Fuzzy decontamination: the replicated corpus probes a FIXED
    # 200-doc eval index — the daily-batch shape; work scales with the
    # train side's banded candidates, never train x eval.
    eval_docs = docs.limit(200)
    timed(
        "curate_decontaminate_fuzzy",
        lambda: force(CU.decontaminate_fuzzy(docs_rep, eval_docs)),
    )
    # Learned BPE at a REAL merge count: replication multiplies word
    # FREQUENCIES but not the vocabulary, so the corpus-side word
    # aggregate scales with the corpus while the guarded driver solver
    # (one collect of the vocab table) is replication-invariant.
    learned: dict = {}
    timed(
        "text_bpe_learned_256",
        lambda: learned.setdefault(
            "m", TX.bpe_learn(docs_rep, n_merges=256)
        ),
    )
    # Arrow encode under that REAL vocabulary over the replicated
    # corpus: per-partition distinct-word caching means the encoder's
    # CPU cost scales with the vocabulary, while the scan scales with
    # the corpus — the expr chain would be a 256-deep expression here.
    timed(
        "text_bpe_encode_arrow_256",
        lambda: force(
            TX.bpe_encode_stats(docs_rep, learned["m"], method="arrow")
        ),
    )

    # ---- round-9 crawl-policy / quality / tokenizer families ----
    from net_spider_spark.pipeline import url as URL

    # Rule filters are scan-shaped projections: the flat-linear rows.
    timed("text_gopher_rules", lambda: force(TX.gopher_rules(docs_rep)))
    timed("text_c4_clean", lambda: force(TX.c4_clean(docs_rep)))
    # WordPiece: vocab selection aggregates over the DISTINCT word
    # table (replication-invariant input), encode scales with the scan
    # but its CPU with the vocabulary (distinct-word cache).
    wp: dict = {}
    timed(
        "text_wordpiece_vocab",
        lambda: wp.setdefault(
            "v",
            [
                r["piece"]
                for r in TX.wordpiece_vocab(
                    docs_rep, vocab_size=256, max_piece_len=4
                ).collect()
            ],
        ),
    )
    timed(
        "text_wordpiece_encode",
        lambda: force(TX.wordpiece_encode_stats(docs_rep, wp["v"])),
    )
    # URL dedup over 1000 synthesized hosts: one hash aggregate + a
    # marking join; replication multiplies copies per canonical URL.
    dd = F.col("doc_id")
    messy = docs_rep.select(
        "doc_id",
        F.concat(
            F.lit("HTTP://WWW.Site"), (dd % 1000).cast("string"),
            F.lit(".com:80/page/"), (dd % 40).cast("string"),
            F.when(dd % 3 == 0, F.lit("?utm_source=x&b=2&a=1"))
            .otherwise(F.lit("?a=1&b=2")),
        ).alias("url"),
    )
    timed("curate_url_dedup", lambda: force(URL.url_dedup(messy)))
    # robots filtering: frontier x (2 rules x 1000 hosts) equi-join +
    # max-struct aggregate — rules broadcast, frontier never sorts.
    rules = spark.createDataFrame(
        [(f"site{h}.com", False, "/private/") for h in range(1000)]
        + [(f"site{h}.com", True, "/private/ok/") for h in range(1000)],
        "host string, allow boolean, path_prefix string",
    )
    frontier = docs_rep.select(
        "doc_id",
        F.concat(
            F.lit("http://site"), (dd % 1000).cast("string"), F.lit(".com"),
            F.when(dd % 4 == 0, F.concat(F.lit("/private/ok/"), dd.cast("string")))
            .when(dd % 4 == 1, F.concat(F.lit("/private/p"), dd.cast("string")))
            .otherwise(F.concat(F.lit("/doc/"), dd.cast("string"))),
        ).alias("url"),
    )
    timed(
        "curate_robots_filter",
        lambda: force(URL.robots_filter(frontier, rules)),
    )
    # host link graph: regexp extraction + explode (3x rows) + one
    # hash aggregate onto the bounded (src, dst) host key space.
    pages = docs_rep.select(
        "doc_id",
        F.concat(
            F.lit('<a href="http://site'), ((dd + 1) % 1000).cast("string"),
            F.lit('.com/x">a</a><a href="/rel">r</a><a href="HTTPS://WWW.Site'),
            ((dd + 7) % 1000).cast("string"), F.lit('.com:443/y">b</a>'),
        ).alias("html"),
        F.concat(
            F.lit("http://site"), (dd % 1000).cast("string"), F.lit(".com/p")
        ).alias("url"),
    )
    timed(
        "graph_host_links",
        lambda: force(URL.host_link_graph(URL.extract_links(pages))),
    )
    docs_rep.unpersist()

    ev = demo.read_table(spark, sf_dir, "events")
    ev_rep = (
        ev.crossJoin(rep)
        .select(
            (F.col("event_id") * factor + F.col("_r")).alias("event_id"),
            "user_id",
            "event_type",
            "value",
            (demo.ts_epoch_ms(ev) + F.col("_r")).alias("ts_ms"),
        )
        .repartition(4 * int(cpus))
        .persist()
    )
    n_events = ev_rep.count()
    clicks = ev_rep.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts_ms"
    )
    errors = (
        ev_rep.where(F.col("event_type") == "error")
        .groupBy("user_id", "ts_ms")
        .agg(F.max("event_id").alias("err_id"))
    )
    timed(
        "temporal_asof",
        lambda: force(
            TP.asof_join(
                clicks, errors, on="ts_ms", by=["user_id"], ref_cols=["err_id"]
            )
        ),
    )
    # Interval join against synthesized hour-wide incident windows (the
    # operator under test is the bucket-chunked range join; the window
    # list derivation is kept O(distinct hours) on purpose).
    incidents = (
        ev_rep.where(F.col("event_type") == "error")
        .select((F.col("ts_ms") - F.col("ts_ms") % 3_600_000).alias("w_start"))
        .distinct()
        .select(
            F.col("w_start"),
            (F.col("w_start") + 3_599_999).alias("w_end"),
            F.col("w_start").alias("incident_id"),
        )
    )
    timed(
        "temporal_interval_join",
        lambda: force(
            TP.interval_join(
                clicks, incidents, point_ts="ts_ms",
                start_col="w_start", end_col="w_end",
            )
        ),
    )
    timed(
        "temporal_rollup",
        lambda: force(
            TP.time_rollup(ev_rep, resolutions=(3_600_000, 86_400_000))
        ),
    )

    # Perceptual dedup over synthesized hash classes: ~n_events/8
    # distinct pictures, each event one copy, 1-in-10 copies
    # bit-perturbed (the transcode-with-loss case). Replication
    # multiplies COPIES per class, which the exact-class
    # pre-aggregation collapses to one row each before banding — the
    # r9 design whose scaling this artifact exists to prove (the
    # banded self-join is over distinct hashes, so its input is
    # replication-invariant while the class aggregate scales
    # linearly).
    n_classes = max(1000, n_events // (8 * factor))
    phashes = ev_rep.select(
        F.col("event_id").alias("media_id"),
        F.xxhash64((F.col("event_id") % n_classes).cast("string"))
        .bitwiseXOR(
            F.when(
                F.col("event_id") % 10 == 0,
                F.expr("shiftleft(1L, cast(event_id % 60 as int))"),
            ).otherwise(F.lit(0).cast("long"))
        )
        .alias("phash"),
    )
    timed(
        "dedup_image_phash",
        lambda: force(D.image_phash_dedup(phashes, max_hamming=2, bands=4)),
    )

    # HLL distinct users per event type: sketch state is O(2^p) per
    # group regardless of input size — the shuffle-volume-flat row.
    from net_spider_spark.pipeline import sketch as SK

    timed(
        "sketch_hll_distinct",
        lambda: force(
            SK.hll_distinct(ev_rep, ["event_type"], "user_id", p=12)
        ),
    )

    # Watermarked streaming window over the replicated events, replayed
    # through a real file-source stream (write untimed, stream timed).
    import shutil
    import tempfile

    from net_spider_spark.streaming.windows import stream_windowed_stats

    stream_dir = tempfile.mkdtemp(prefix="nss_scale_stream_")
    try:
        ev_rep.repartition(int(cpus)).write.mode("overwrite").parquet(
            f"{stream_dir}/events"
        )
        ev_rep.unpersist()

        def run_stream():
            src = (
                spark.readStream.schema(
                    spark.read.parquet(f"{stream_dir}/events").schema
                ).parquet(f"{stream_dir}/events")
            )
            evs = src.select(
                "event_type",
                "value",
                F.timestamp_millis(F.col("ts_ms")).alias("event_time"),
            )
            out = stream_windowed_stats(
                evs,
                ts_col="event_time",
                group_cols=("event_type",),
                value_col="value",
                window="1 hour",
                watermark="2 hours",
            )
            ckpt = tempfile.mkdtemp(prefix="nss_scale_ckpt_")
            q = (
                out.writeStream.format("memory")
                .queryName("scale_ws_sink")
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            spark.table("scale_ws_sink").count()
            shutil.rmtree(ckpt, ignore_errors=True)

        timed("stream_windowed_stats", run_stream)
    finally:
        shutil.rmtree(stream_dir, ignore_errors=True)

    print(
        json.dumps(
            {
                "metric": "scale_bench_total_wall",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "counters": counters,
                "env": env,
                "rows": n,
                "mixture_max_bucket_rows": mixture_max_bucket,
                "docs": n_docs,
                "events": n_events,
                "replicate": factor,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
