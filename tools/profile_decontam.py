"""Piece-by-piece profile of curate.decontaminate_fuzzy at scale.

Replicates bench_scale.py's corpus generation, then times each internal
stage of the decontamination with executor counter deltas so the
shuffle bytes can be attributed to a specific plan piece.

Usage: [SPARK_GRAFT_REPLICATE=128] python tools/profile_decontam.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    factor = int(os.environ.get("SPARK_GRAFT_REPLICATE", "128"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile_decontam")
        .config("spark.sql.shuffle.partitions", cpus)
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
    from net_spider_spark.metrics import (
        counters_delta,
        executor_counters,
        host_steal_jiffies,
    )
    from net_spider_spark.pipeline import dedup as D
    from net_spider_spark.reliability import materialize as _materialize

    rep = spark.range(factor).select(F.col("id").alias("_r"))
    docs = demo.read_table(spark, sf_dir, "documents")
    docs_rep = (
        docs.repartition(4 * int(cpus))
        .crossJoin(rep)
        .withColumn("doc_id", F.col("doc_id") * factor + F.col("_r"))
        .drop("_r")
        .persist()
    )
    n_docs = docs_rep.count()
    eval_docs = docs.limit(200)
    print(f"docs={n_docs}", flush=True)

    out = {}

    def timed(name, fn):
        before = executor_counters(spark)
        s0 = host_steal_jiffies()
        t0 = time.time()
        r = fn()
        w = round(time.time() - t0, 3)
        d = counters_delta(executor_counters(spark), before)
        out[name] = {
            "wall": w,
            "steal_j": host_steal_jiffies() - s0,
            **{k: d[k] for k in ("tasks", "shuffle_write_bytes")},
        }
        print(name, json.dumps(out[name]), flush=True)
        return r

    # --- the function's internals, step by step ---
    n, n_hashes = 3, 4
    text_col, id_col = "text", "doc_id"

    def _with_cid(df, prefix):
        return D.doc_shingle_sets(
            df, text_col=text_col, id_col=id_col, n=n
        ).select(
            F.col(id_col),
            "shingles",
            F.concat(
                F.lit(prefix), F.md5(F.to_json(F.col("shingles")))
            ).alias("_cid"),
        )

    train_sets = timed(
        "1_train_sets_ckpt", lambda: _with_cid(docs_rep, "t").transform(_materialize)
    )
    eval_sets = timed(
        "2_eval_sets_ckpt", lambda: _with_cid(eval_docs, "e").transform(_materialize)
    )

    def _reps(sets):
        keys = sets.groupBy("_cid").agg(F.min(F.col(id_col)).alias(id_col))
        return sets.join(keys, ["_cid", id_col], "left_semi").select(
            "_cid", "shingles"
        )

    tr_c = _reps(train_sets)
    ev_c = _reps(eval_sets)
    timed("3_tr_c_count", lambda: tr_c.count())
    cand = D.minhash_candidates_against(
        D.minhash_signatures_sets(tr_c, n_hashes=n_hashes, id_col="_cid"),
        D.minhash_signatures_sets(ev_c, n_hashes=n_hashes, id_col="_cid"),
        id_col="_cid",
        max_bucket_size=None,
    )
    timed("4_cand_count", lambda: cand.count())

    from net_spider_spark.pipeline import curate as CU

    def force(df):
        h = F.xxhash64(F.to_json(F.struct(*[F.col(c) for c in df.columns])))
        return df.select(F.sum(h % 1000000)).first()[0]

    timed(
        "5_full_query",
        lambda: force(CU.decontaminate_fuzzy(docs_rep, eval_docs)),
    )
    print(json.dumps({"profile": out, "factor": factor}), flush=True)


if __name__ == "__main__":
    main()
