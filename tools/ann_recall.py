"""ANN quality artifact: recall@k of every approximate index against
the exact baseline on the real embeddings table.

bench.py measures speed; this measures the other axis — how much of
the true top-k each approximate method keeps at its contract-default
parameters. Cosine-ranked methods (sign-LSH buckets, MLlib IVF) score
against exact cosine top-k; L2/ADC methods (PQ, IVF-PQ) against exact
squared-L2 top-k, since those are the orderings they approximate.

Usage: PYTHONPATH=/root/repo python tools/ann_recall.py
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
Prints one JSON line: per-method recall@10, candidate wall seconds,
and the query/corpus sizes.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

N_QUERIES = 50
K = 10


def _collect_topk(df) -> dict[int, set]:
    got: dict[int, set] = {}
    for r in df.collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return got


def _recall(approx: dict[int, set], exact: dict[int, set]) -> float:
    num = sum(len(approx.get(q, set()) & hits) for q, hits in exact.items())
    den = sum(len(hits) for hits in exact.values())
    return round(num / den, 4)


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("net_spider_spark_ann_recall")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from net_spider_spark.pipeline import pq as PQ
    from net_spider_spark.pipeline import similarity as SIM

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_corpus = emb.count()
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    dim = len(emb.select("embedding").first()[0])

    # exact baselines
    gt_cos = _collect_topk(SIM.brute_force_topk(queries, emb, k=K))
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("_qv"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("_cv"),
    )
    sq = F.aggregate(
        F.zip_with(
            F.col("_qv"), F.col("_cv"), lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    w = Window.partitionBy("query_id").orderBy("_d", "neighbor_id")
    gt_l2 = _collect_topk(
        c.crossJoin(F.broadcast(q))
        .select("query_id", "neighbor_id", sq.alias("_d"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= K)
    )

    results: dict[str, dict] = {}

    def timed(name, fn, gt):
        t0 = time.time()
        approx = _collect_topk(fn())
        results[name] = {
            "recall_at_10": _recall(approx, gt),
            "wall_s": round(time.time() - t0, 2),
        }

    timed(
        "lsh_bucket",  # contract defaults: 4 sign planes
        lambda: SIM.lsh_bucket_topk(queries, emb, dim=dim, k=K, n_planes=4),
        gt_cos,
    )
    timed(
        "ivf",  # contract defaults: 16 cells, probe 4
        lambda: SIM.ivf_topk(queries, emb, k=K, n_centroids=16, n_probe=4),
        gt_cos,
    )

    # Contract defaults since r10: m=32/k=256 codebooks, probe 6 of 8
    # (the old m=4/k=16/probe-2 demo params gave recall@10 = 0.15 —
    # near-random neighbors — on this isotropic corpus; RECALL_r09).
    # train_n=1024: the bounded-sample training the contract queries
    # use (pq_train samples bottom-1024-by-md5; FAISS-style recipe)
    books = PQ.pq_train(emb, dim=dim, m=32, k=256, iters=1, train_n=1024)
    codes = PQ.pq_encode(emb, books)
    timed(
        "pq_adc",  # 32x256 codebooks = dim/8 compression
        lambda: PQ.pq_topk(queries, codes, books, k=K),
        gt_l2,
    )
    timed(
        "ivfpq",  # 8 cells probe 7 on top of the same code size
        lambda: PQ.ivfpq_topk(
            queries, emb, dim=dim, k=K, n_cells=8, n_probe=7,
            coarse_iters=2, m=32, k_codes=256, pq_iters=1, train_n=1024,
        ),
        gt_l2,
    )
    timed(
        "ivfpq_residual",  # same budget, codes store within-cell
        # residuals; pq_iters=2 so the codebooks center on the
        # residual distribution (contract default)
        lambda: PQ.ivfpq_topk(
            queries, emb, dim=dim, k=K, n_cells=8, n_probe=7,
            coarse_iters=2, m=32, k_codes=256, pq_iters=2, residual=True,
            train_n=1024,
        ),
        gt_l2,
    )

    # The same operators with the dials turned toward recall — the
    # artifact's point is that recall is a PARAMETER, not a property:
    # more/larger codebooks (finer quantization), more probes, fewer
    # planes (bigger buckets) must move recall up on the same data.
    timed(
        "lsh_bucket_tuned",  # 2 planes -> 4 buckets, ~4x candidates
        lambda: SIM.lsh_bucket_topk(queries, emb, dim=dim, k=K, n_planes=2),
        gt_cos,
    )
    timed(
        "ivf_tuned",  # probe half the cells
        lambda: SIM.ivf_topk(queries, emb, k=K, n_centroids=16, n_probe=8),
        gt_cos,
    )
    books_t = PQ.pq_train(emb, dim=dim, m=32, k=256, iters=2,
                          train_n=1024)
    codes_t = PQ.pq_encode(emb, books_t)
    timed(
        "pq_adc_tuned",  # extra Lloyd iteration on the same code size
        lambda: PQ.pq_topk(queries, codes_t, books_t, k=K),
        gt_l2,
    )
    timed(
        "ivfpq_tuned",  # probe 7 of 8 cells, extra Lloyd iteration
        lambda: PQ.ivfpq_topk(
            queries, emb, dim=dim, k=K, n_cells=8, n_probe=7,
            coarse_iters=2, m=32, k_codes=256, pq_iters=2,
        ),
        gt_l2,
    )

    print(
        json.dumps(
            {
                "metric": "ann_recall_at_10",
                "queries": N_QUERIES,
                "corpus": n_corpus,
                "dim": dim,
                "methods": results,
                "sf_dir": sf_dir,
            }
        )
    )
    sys.stdout.flush()


if __name__ == "__main__":
    main()
