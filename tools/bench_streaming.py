"""Streaming ingest throughput: N JSON-lines findings (default 100k)
through the two structured-streaming paths, availableNow trigger:

* ingest   — stream_findings_json -> append_to_history (parquet sink,
             exactly-once): the S2 addFoundNode path as a stream.
* stateful — stream_latest_per_node (applyInPandasWithState keyed by
             subject_node) into a memory sink: the incrementally
             maintained policyOverwrite view.

Prints one JSON line with rows/sec per path. Protocol: idle machine
(this box swings 2x under load).

Usage: [SPARK_GRAFT_STREAM_ROWS=100000] python tools/bench_streaming.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from net_spider_spark.streaming.ingest import (
    append_to_history,
    stream_findings_json,
    stream_latest_per_node,
)


def main() -> None:
    n = int(os.environ.get("SPARK_GRAFT_STREAM_ROWS", "100000"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_nodes = max(n // 64, 1)

    work = tempfile.mkdtemp(prefix="ns_stream_bench_")
    in_dir = os.path.join(work, "in")
    os.makedirs(in_dir)
    # 8 input files so the file source parallelizes the read.
    n_files = 8
    per = (n + n_files - 1) // n_files
    row = 0
    for fi in range(n_files):
        with open(os.path.join(in_dir, f"f{fi}.jsonl"), "w") as fh:
            for _ in range(min(per, n - row)):
                doc = {
                    "subject_node": f"n{row % n_nodes}",
                    "found_at": {"epoch_time": 1_600_000_000_000 + row},
                    "node_attrs": {"seq": str(row)},
                    "neighbor_links": [
                        {
                            "target_node": f"n{(row * 7 + 1) % n_nodes}",
                            "link_state": "to_target",
                            "link_attrs": {"w": "1"},
                        }
                    ],
                }
                fh.write(json.dumps(doc) + "\n")
                row += 1

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("net_spider_spark_bench_streaming")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # Warm the JVM so the first timed query isn't paying startup cost.
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    from net_spider_spark.metrics import counters_delta, executor_counters

    timings: dict[str, float] = {}
    counters: dict[str, dict] = {}

    before = executor_counters(spark)
    t0 = time.time()
    q = append_to_history(
        stream_findings_json(spark, in_dir),
        os.path.join(work, "history"),
        os.path.join(work, "ckpt_ingest"),
    )
    q.awaitTermination()
    timings["ingest_parquet"] = round(time.time() - t0, 3)
    counters["ingest_parquet"] = counters_delta(executor_counters(spark), before)
    got = spark.read.parquet(os.path.join(work, "history")).count()
    assert got == n, f"ingest wrote {got} rows, expected {n}"

    before = executor_counters(spark)
    t0 = time.time()
    q = (
        stream_latest_per_node(stream_findings_json(spark, in_dir))
        .writeStream.format("memory")
        .queryName("latest_bench")
        .outputMode("update")
        .option("checkpointLocation", os.path.join(work, "ckpt_state"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    timings["stateful_latest"] = round(time.time() - t0, 3)
    counters["stateful_latest"] = counters_delta(executor_counters(spark), before)
    states = spark.table("latest_bench").count()
    assert states >= n_nodes, f"{states} states < {n_nodes} subjects"

    # custom-unifier incremental link view (the reference's flagship
    # two-endpoint DIO merge maintained as state + per-batch re-merge)
    from net_spider_spark.rpl.dio import dio_unifier_conf
    from net_spider_spark.streaming.ingest import stream_unified_link_per_pair

    before = executor_counters(spark)
    t0 = time.time()
    q = (
        stream_unified_link_per_pair(
            stream_findings_json(spark, in_dir), dio_unifier_conf()
        )
        .writeStream.format("memory")
        .queryName("unified_bench")
        .outputMode("update")
        .option("checkpointLocation", os.path.join(work, "ckpt_unify"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    timings["stateful_unified_link"] = round(time.time() - t0, 3)
    counters["stateful_unified_link"] = counters_delta(
        executor_counters(spark), before
    )
    pairs = spark.table("unified_bench").count()
    assert pairs > 0, "no merged link emissions"

    # Forever-mode streaming dedup at 1M+ distinct keys under the
    # RocksDB state store: the state-lifecycle row. Reports state rows
    # and state-store bytes from the query progress — the numbers a
    # year-long deploy alerts on (streaming/dedup.py contract).
    from net_spider_spark.streaming.dedup import (
        rocksdb_state_conf,
        state_store_metrics,
        stream_dedup_digests,
    )

    n_keys = int(os.environ.get("SPARK_GRAFT_STREAM_KEYS", "1000000"))
    dd_in = os.path.join(work, "dedup_in")
    # ~10% duplicates so the dedup actually suppresses rows.
    (
        spark.range(int(n_keys * 1.1))
        .selectExpr(f"concat('doc-', id % {n_keys}) AS text")
        .repartition(8)
        .write.parquet(dd_in)
    )
    for k, v in rocksdb_state_conf().items():
        spark.conf.set(k, v)
    before = executor_counters(spark)
    t0 = time.time()
    q = (
        stream_dedup_digests(
            spark.readStream.schema("text string").parquet(dd_in)
        )
        .writeStream.format("noop")
        .option("checkpointLocation", os.path.join(work, "ckpt_dedup"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    timings["stateful_dedup_rocksdb"] = round(time.time() - t0, 3)
    counters["stateful_dedup_rocksdb"] = counters_delta(
        executor_counters(spark), before
    )
    state = state_store_metrics(q)
    assert state.get("state_rows") == n_keys, (
        f"dedup state holds {state.get('state_rows')} rows, "
        f"expected {n_keys}"
    )
    counters["stateful_dedup_rocksdb"]["state_rows"] = state["state_rows"]
    counters["stateful_dedup_rocksdb"]["state_bytes"] = state["state_bytes"]
    counters["stateful_dedup_rocksdb"]["rocksdb_pinned_mem_bytes"] = state[
        "custom"
    ].get("rocksdbPinnedBlocksMemoryUsage")
    counters["stateful_dedup_rocksdb"]["rocksdb_bytes_written"] = state[
        "custom"
    ].get("rocksdbTotalBytesWritten")
    counters["stateful_dedup_rocksdb"]["rocksdb_sst_bytes"] = state[
        "custom"
    ].get("rocksdbSstFileSize")

    print(
        json.dumps(
            {
                "metric": "stream_bench_total_wall",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "counters": counters,
                "rows": n,
                "rows_per_sec": {
                    k: round(
                        (int(n_keys * 1.1) if k == "stateful_dedup_rocksdb" else n)
                        / v
                    )
                    for k, v in timings.items()
                },
            }
        )
    )
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
