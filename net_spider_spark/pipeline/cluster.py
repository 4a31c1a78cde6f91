"""Embedding clustering + SemDeDup-style semantic deduplication.

Two operators a curation pipeline runs between embedding generation and
training-set assembly:

* :func:`kmeans_assign` — deterministic Lloyd's k-means over an
  ``array<float>`` column. Unlike MLlib's KMeans (random init, engine-
  private tie-breaks) every step here is engine-reproducible, so an
  external system (the DuckDB oracle, a downstream auditor) can recompute
  the exact same assignment:

  - **init**: the k rows with the smallest ``md5(seed:id)`` — the same
    portable bottom-k-by-hash device as
    :mod:`net_spider_spark.pipeline.sketch`. In Spark this is
    ``orderBy(hash).limit(k)`` = ``TakeOrderedAndProject`` (per-partition
    top-k, only k rows cross the wire — no global sort).
  - **assign**: squared-L2 argmin against the k broadcast centroids,
    ties broken by centroid id. The argmin is ``min(struct(dist, cid))``
    — a map-side-combinable hash aggregate, NOT a window (no per-vector
    row_number sort at scale).
  - **update**: element-wise mean per cluster via ``posexplode`` +
    ``avg`` — one map-side-combinable shuffle of (cluster, pos) cells;
    the k*dim result is collected to the driver (tiny, by construction)
    and re-broadcast for the next round.

  Per iteration: one broadcast join + one hash aggregate. At 100 TB the
  only data-sized shuffle is the (cluster, pos) partial-mean combine,
  whose post-combine width is k*dim regardless of row count.

* :func:`semantic_dedup` — SemDeDup (Abbas et al. 2023,
  arXiv:2303.09540): cluster the corpus, then compare vectors ONLY
  within their cluster and flag every vector that has a smaller-id
  neighbor above the cosine threshold. The cluster equi-join bounds
  the pair space to sum(|cluster|^2) instead of n^2 — k is the knob
  that keeps per-cluster blocks executor-sized. For skewed/giant
  clusters, ``sub_bucket_planes`` further splits blocks by a sign-LSH
  signature (approximate: cross-bucket pairs are not compared — the
  standard SemDeDup accuracy/cost trade).

Reference n/a: extension suite (LLM-data-pipeline operators), not a
net-spider port.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from net_spider_spark.pipeline.similarity import cosine, hyperplanes, lsh_signature

__all__ = ["kmeans_assign", "kmeans_fit", "semantic_dedup"]


def _hash_expr(id_col: str, seed: str):
    return F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string")))


def _local_train_ok(df: DataFrame, id_col: str) -> bool:
    """True when the bounded-sample training loop may run in the driver.

    The driver path replays ``_hash_expr`` with ``hashlib.md5`` over
    ``str(id)``, so it is only taken for id types whose Spark
    string-cast Python's ``str`` reproduces exactly (integers and
    strings — never floats/decimals/timestamps). Set
    ``NET_SPIDER_LOCAL_TRAIN=0`` to force the distributed loop (A/B
    harness + the fast-path parity test)."""
    if os.environ.get("NET_SPIDER_LOCAL_TRAIN", "1") == "0":
        return False
    return df.schema[id_col].dataType.simpleString() in (
        "tinyint", "smallint", "int", "bigint", "string"
    )


def _argmin_rows(vecs, cent):
    """Row-wise squared-L2 argmin of ``vecs`` against ``cent``,
    replicating :func:`_assign`'s float64 accumulation order (d starts
    at zeros, adds (x_j-c_j)^2 one dimension at a time) and numpy's
    first-min (= lowest-cid) tie-break. Chunked so the (rows, k)
    distance buffer stays bounded; chunking cannot change results —
    rows are independent."""
    import numpy as np

    n, dim = vecs.shape
    k = cent.shape[0]
    chunk = max(1, (1 << 22) // max(k, 1))
    out = np.empty(n, dtype=np.int64)
    for lo in range(0, n, chunk):
        v = vecs[lo:lo + chunk]
        d = np.zeros((len(v), k))
        for j in range(dim):
            dj = v[:, j, None] - cent[None, :, j]
            d += dj * dj
        out[lo:lo + chunk] = d.argmin(-1)
    return out


def _fit_local(rows, k: int, iters: int, seed: str):
    """Lloyd's over the COLLECTED bounded sample, entirely in the
    driver: seed selection (bottom-k by md5, replayed with hashlib on
    the same ``seed + ":" + str(id)`` strings Spark hashes) plus every
    centroid update as numpy on the one in-memory batch.

    Motivation (guide §1.3/§4): with ``train_n`` bounded the sample is
    driver-sized by construction, yet the distributed loop pays a
    repartition + Arrow-worker + aggregate JOB per iteration — 0.7-1.4 s
    of pure scheduling per action on local[32] for a 1024-row sample,
    ~3-6 s per ANN query. One collect replaces (2 + iters) actions; the
    corpus-sized passes (sample selection, final assignment) stay
    distributed. Arithmetic: same float64 ops as :func:`_assign` and
    the posexplode/avg update (sum then divide); summation ORDER within
    a mean differs from the shuffle's arrival order, which the round(9)
    oracle normalization provably tolerates — DuckDB already re-sums
    every mean in its own order."""
    import hashlib

    import numpy as np

    vecs = np.array([r["_v"] for r in rows], dtype=np.float64)
    ids = [r["_id"] for r in rows]
    order = sorted(
        range(len(ids)),
        key=lambda i: (
            hashlib.md5((seed + ":" + str(ids[i])).encode()).hexdigest(),
            ids[i],
        ),
    )
    cent = vecs[order[:k]].copy()
    for _ in range(iters):
        idx = _argmin_rows(vecs, cent)
        acc = np.zeros_like(cent)
        cnt = np.zeros(len(cent), dtype=np.int64)
        np.add.at(acc, idx, vecs)
        np.add.at(cnt, idx, 1)
        nz = cnt > 0
        # clusters that lost every member keep their previous centroid
        cent = np.where(nz[:, None], acc / np.maximum(cnt, 1)[:, None], cent)
    return [(cid, [float(x) for x in cent[cid]]) for cid in range(len(cent))]


def _sq_dist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _centroid_df(df: DataFrame, centroids: list[tuple[int, list[float]]]):
    spark = df.sparkSession
    return spark.createDataFrame(
        [(cid, [float(x) for x in vec]) for cid, vec in centroids],
        "cid long, cv array<double>",
    )


def _assign(vecs: DataFrame, centroids: list[tuple[int, list[float]]]) -> DataFrame:
    """(id, v) -> (id, cluster_id, v): squared-L2 argmin against the
    broadcast centroids, as ONE vectorized Arrow pass — no crossJoin,
    no shuffle. The n*k candidate space is pure per-row compute
    against a driver-sized table, the shape a Pandas UDF wins at: the
    former ``min(struct(dist, cid, v))`` aggregate carried the VECTOR
    in its buffer, and a struct buffer is not hash-aggregable — Spark
    planned the argmin as a SortAggregate over all n*k candidate rows
    (see pipeline/pq.py's module docstring for the measured family of
    alternatives). Numeric parity is exact: the numpy accumulation
    replays the ``aggregate``-expression's float64 left fold from 0.0
    term-by-term, and ``argmin`` returns the first (= lowest-cid)
    index of the minimum — the same (dist, cid) tie-break."""
    import numpy as np
    import pandas as pd

    spark = vecs.sparkSession
    cent = sorted(centroids)
    cids = np.array([c for c, _ in cent], dtype=np.int64)
    cmat = np.array([v for _, v in cent], dtype=np.float64)
    bb = spark.sparkContext.broadcast((cids, cmat))
    id_type = vecs.schema["_id"].dataType.simpleString()
    # Thin-input guard (cf. pq._arrow_codes): a one-footer scan or a
    # sample arrives as 1 partition and would argmin single-threaded.
    target = spark.sparkContext.defaultParallelism
    if vecs.rdd.getNumPartitions() < target:
        vecs = vecs.repartition(target, "_id")

    def assign(batches):
        bcids, bcmat = bb.value
        dim = bcmat.shape[1]
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.array(pdf["_v"].tolist(), dtype=np.float64)
            d = np.zeros((len(pdf), bcmat.shape[0]))
            for j in range(dim):
                dj = v[:, j, None] - bcmat[None, :, j]
                d += dj * dj
            idx = d.argmin(-1)
            yield pd.DataFrame(
                {
                    "_id": pdf["_id"].values,
                    "cluster_id": bcids[idx],
                    "_v": pdf["_v"].values,
                }
            )

    return vecs.mapInPandas(
        assign,
        f"`_id` {id_type}, cluster_id long, `_v` array<double>",
    )


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: str = "s42",
    train_n: int | None = None,
) -> tuple[list[tuple[int, list[float]]], DataFrame]:
    """Run deterministic Lloyd's; return (final centroids, assignment).

    ``iters`` counts centroid UPDATE steps: the returned assignment is
    against the centroids after ``iters`` updates (iters=0 assigns
    against the raw bottom-k-by-hash seeds).

    ``train_n`` bounds seed selection and every Lloyd's iteration to a
    deterministic bottom-train_n-by-``md5(seed:sample:id)`` sample
    (same device as :func:`net_spider_spark.pipeline.pq._train_sample`)
    — centroid estimation needs a distribution sample, not the corpus.
    The RETURNED assignment always covers the full ``df``: one final
    frozen-centroid argmin over everything, the only corpus-sized pass.
    """
    vecs = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    train = vecs
    if train_n is not None:
        h = F.md5(
            F.concat(F.lit(seed + ":sample:"), F.col("_id").cast("string"))
        )
        sample = vecs.orderBy(h, "_id").limit(train_n)
        if _local_train_ok(vecs, "_id"):
            # Driver fast path (see _fit_local): ONE collect of the
            # bounded sample replaces the persist, the seed collect and
            # the per-iteration means-collect jobs. The only corpus-
            # sized passes left are the TakeOrderedAndProject behind
            # this collect and the final frozen-centroid assignment.
            centroids = _fit_local(sample.collect(), k, iters, seed)
            return centroids, _assign(vecs, centroids)
        # Distributed fallback (train_n=None trains on the corpus;
        # non-integer/string ids can't replay the seed hash driver-
        # side). Persist the bounded sample: seed selection plus every
        # Lloyd's means-collect is an action over it, and without the
        # persist each one re-runs the bottom-train_n
        # TakeOrderedAndProject — a corpus scan per action at scale.
        # The cache is train_n rows by construction and is released
        # before return (the returned assignment re-reads the full
        # input, not the sample).
        train = sample.persist()
    seed_rows = (
        train.withColumn("_h", _hash_expr("_id", seed))
        .orderBy("_h", "_id")
        .limit(k)
        .collect()
    )
    centroids = [(cid, list(r["_v"])) for cid, r in enumerate(seed_rows)]

    assigned = _assign(train, centroids)
    for _ in range(iters):
        means = (
            assigned.select("cluster_id", F.posexplode("_v").alias("pos", "x"))
            .groupBy("cluster_id", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in means:
            by_cid.setdefault(r["cluster_id"], {})[r["pos"]] = r["m"]
        # clusters that lost every member keep their previous centroid
        centroids = [
            (
                cid,
                [by_cid[cid][p] for p in sorted(by_cid[cid])]
                if cid in by_cid
                else vec,
            )
            for cid, vec in centroids
        ]
        assigned = _assign(train, centroids)
    if train_n is not None:
        train.unpersist(blocking=False)
        assigned = _assign(vecs, centroids)
    return centroids, assigned


def kmeans_assign(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: str = "s42",
    train_n: int | None = None,
) -> DataFrame:
    """Deterministic k-means assignment: (id_col, cluster_id).
    ``train_n`` bounds centroid training to the md5 sample (see
    :func:`kmeans_fit`); the assignment still covers every row."""
    _, assigned = kmeans_fit(
        df, k=k, iters=iters, id_col=id_col, vec_col=vec_col, seed=seed,
        train_n=train_n,
    )
    return assigned.select(
        F.col("_id").alias(id_col), F.col("cluster_id").cast("long").alias("cluster_id")
    )


def semantic_dedup(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: str = "s42",
    sub_bucket_planes: int = 0,
    train_n: int | None = None,
) -> DataFrame:
    """SemDeDup: flag vectors dominated by a smaller-id same-cluster
    neighbor with cosine >= threshold. ``train_n`` bounds the
    clustering step's centroid training to the deterministic md5
    sample (:func:`kmeans_fit`) — block assignment and the in-block
    comparisons still cover every row.

    Returns (id_col, cluster_id, is_dup). Keep rows with
    ``is_dup = false``; the dominated rule (ANY smaller-id neighbor
    above threshold) needs no connected-components pass, so the whole
    operator is one cluster-keyed self-join over per-cluster blocks.

    ``sub_bucket_planes > 0`` additionally splits each cluster's block
    by a sign-LSH signature before the self-join (for corpora whose
    cluster sizes outgrow an executor); pairs split across sub-buckets
    are then not compared, so only the exact default is oracle-gated.
    """
    _, assigned = kmeans_fit(
        df, k=k, iters=iters, id_col=id_col, vec_col=vec_col, seed=seed,
        train_n=train_n,
    )
    join_keys = ["cluster_id"]
    if sub_bucket_planes > 0:
        dim = len(assigned.select("_v").first()["_v"])
        planes = hyperplanes(dim, sub_bucket_planes, seed=42)
        assigned = assigned.withColumn("_bkt", lsh_signature(F.col("_v"), planes))
        join_keys.append("_bkt")
    a = assigned.select(
        *join_keys, F.col("_id").alias("_ida"), F.col("_v").alias("_va")
    )
    b = assigned.select(
        *join_keys, F.col("_id").alias("_idb"), F.col("_v").alias("_vb")
    )
    dup_ids = (
        a.join(b, on=join_keys)
        .where(F.col("_idb") < F.col("_ida"))
        .where(cosine(F.col("_va"), F.col("_vb")) >= threshold)
        .select(F.col("_ida").alias("_id"))
        .distinct()
    )
    return (
        assigned.join(dup_ids.withColumn("_dup", F.lit(True)), on="_id", how="left")
        .select(
            F.col("_id").alias(id_col),
            F.col("cluster_id").cast("long").alias("cluster_id"),
            F.coalesce(F.col("_dup"), F.lit(False)).alias("is_dup"),
        )
    )
