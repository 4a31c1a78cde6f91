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
    findings = (
        base.crossJoin(rep)
        .withColumn("finding_id", F.col("finding_id") * factor + F.col("_r"))
        .withColumn("found_at", F.col("found_at") + F.col("_r"))
        .drop("_r")
        .persist()
    )
    n = findings.count()

    from net_spider_spark.metrics import counters_delta, executor_counters

    timings: dict[str, float] = {}
    counters: dict[str, dict] = {}

    def timed(name, fn):
        before = executor_counters(spark)
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 3)
        counters[name] = counters_delta(executor_counters(spark), before)

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

    print(
        json.dumps(
            {
                "metric": "scale_bench_total_wall",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "counters": counters,
                "rows": n,
                "replicate": factor,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
