"""Similarity search over an embedding column (array<float>).

* ``brute_force_topk`` — exact cosine top-k: cross join + zip_with dot
  product, rank with a per-query window. The baseline and the verifier
  for approximate variants.
* ``lsh_bucket_topk`` — random-hyperplane LSH: queries only compare
  against candidates sharing a signature bucket (the scale path — the
  cross join shrinks from |Q|x|C| to per-bucket blocks).

The dot product runs as Catalyst higher-order functions over the
arrays (JVM-side, codegen), not a Python UDF.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    # try_divide: NULL on a zero-norm operand under EVERY ANSI setting
    # (plain Divide returns NULL only non-ANSI and THROWS under ANSI,
    # Spark 4's default) — NULL sorts last under desc(cos), and the
    # Arrow scan fast path masks zero denominators to sort-last the
    # same way, so both paths rank a zero embedding identically.
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors by cosine for each query vector.

    Returns (query_id, neighbor_id, rank). At scale, broadcast the
    query side (typically small) so the corpus never shuffles.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        cosine(F.col("_qv"), F.col("_cv")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"))
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes for sign-LSH."""
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket id: bit b = 1 iff vec . plane_b >= 0."""
    sig = F.lit(0).cast("long")
    for b, plane in enumerate(planes):
        arr = F.array(*[F.lit(w) for w in plane])
        bit = (dot(vec, arr) >= 0).cast("long") * (1 << b)
        sig = sig + bit
    return sig


def _ivf_scan_topk(cand: DataFrame, k: int, qids, qmat, probes,
                   q_id_type: str, chunk: int = 256) -> DataFrame:
    """IVF exact-cosine top-k as ONE Arrow pass over the assigned
    corpus — the same device as ``pq._adc_scan_topk``: the bounded
    query batch broadcasts, each task scores its candidate rows
    against every query probing their cells and emits a per-batch
    partial top-k, and the only exchange left is the final per-query
    window over batch winners. Replaces the probe subtree (crossJoin +
    window + exchange), the broadcast probe join that shipped query
    vectors beside every candidate row, and the per-pair interpreted
    higher-order-function cosine.

    Numeric parity is exact, op for op: dot and norm replay the
    ``aggregate``-expression's float64 left fold from 0.0 one element
    at a time (queries pre-cast to array<double> — elementwise
    float->double widening is exact), ``sqrt`` and the final division
    are single IEEE ops, and rank order handles NaN the way Spark's
    DESC sort does (NaN first, then ties by neighbor id)."""
    import numpy as np
    import pandas as pd

    spark = cand.sparkSession
    n_id_type = cand.schema["neighbor_id"].dataType.simpleString()
    src = cand.select("neighbor_id", "_cell", "_cv")
    bb = spark.sparkContext.broadcast((qids, qmat, probes))
    schema = f"query_id {q_id_type}, neighbor_id {n_id_type}, cos double"

    def scan(batches):
        b_qids, b_qmat, b_probes = bb.value
        nq = len(b_qids)
        dim = b_qmat.shape[1] if nq else 0
        qnorm = None
        for pdf in batches:
            pdf = pdf[pdf["_cell"].notna() & pdf["_cv"].notna()]
            if not len(pdf):
                continue
            nid = pdf["neighbor_id"].to_numpy()
            cmat = np.array(pdf["_cv"].tolist(), dtype=np.float64)
            cells_b = pdf["_cell"].to_numpy()
            if qnorm is None:
                acc = np.zeros(nq, dtype=np.float64)
                for j in range(dim):
                    acc = acc + b_qmat[:, j] * b_qmat[:, j]
                qnorm = np.sqrt(acc)
            cn = np.zeros(len(pdf), dtype=np.float64)
            for j in range(dim):
                cn = cn + cmat[:, j] * cmat[:, j]
            cnorm = np.sqrt(cn)
            out_q, out_n, out_c = [], [], []
            for lo in range(0, nq, chunk):
                hi = min(nq, lo + chunk)
                dotm = np.zeros((hi - lo, len(pdf)), dtype=np.float64)
                for j in range(dim):
                    dotm = dotm + b_qmat[lo:hi, j, None] * cmat[None, :, j]
                denom = qnorm[lo:hi, None] * cnorm[None, :]
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = dotm / denom
                # Zero-norm rows: Spark's (non-ANSI) Divide yields NULL
                # on a zero divisor, and NULL sorts LAST under desc —
                # while numpy's 0/0 is NaN, which the NaN-first key
                # would sort FIRST. Mask zero denominators to sort-last
                # so the partial top-k keeps the same winners the
                # relational path keeps (the NaN they carry becomes
                # NULL on the Arrow boundary, so the final window
                # agrees too).
                zero_den = denom == 0
                for qi in range(lo, hi):
                    msk = np.isin(cells_b, b_probes[qi])
                    if not msk.any():
                        continue
                    c_q, n_q = cos[qi - lo][msk], nid[msk]
                    # DESC cos with Spark NaN-first semantics -> the
                    # ascending key maps NaN below every real value,
                    # EXCEPT NULL-equivalent zero-denominator rows,
                    # which map above every value (sort last).
                    key = np.where(np.isnan(c_q), -np.inf, -c_q)
                    key = np.where(zero_den[qi - lo][msk], np.inf, key)
                    top = np.lexsort((n_q, key))[:k]
                    out_q.append(np.full(len(top), b_qids[qi]))
                    out_n.append(n_q[top])
                    out_c.append(c_q[top])
            if out_q:
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(out_q),
                        "neighbor_id": np.concatenate(out_n),
                        "cos": np.concatenate(out_c),
                    }
                )

    scored = src.mapInPandas(scan, schema)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: str = "s42",
    iters: int = 4,
    train_n: int | None = 100_000,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: k-means-partition the
    corpus, then each query scores only the ``n_probe`` nearest cells.

    The coarse quantizer is the DETERMINISTIC md5-seeded Lloyd's of
    :func:`net_spider_spark.pipeline.cluster.kmeans_fit` (bottom-k-by-
    hash init, (dist, cid) tie-breaks, fixed ``iters`` update steps —
    each step one bounded-sample pass; iters=4 buys recall@10 ~0.59
    over iters=2's ~0.53 at probe 4/16 on the isotropic test corpus,
    with diminishing returns past 8),
    not MLlib KMeans: MLlib's kmeans|| init and run-order-dependent
    partial sums make centroids — and therefore recall and the probed
    result set — drift run to run even with a fixed seed (measured
    recall@10 0.61-0.69 across identical invocations), and its
    engine-private state forced the DuckDB oracle to probe
    exhaustively. With the deterministic trainer the oracle replays
    cells, probes, and the pruned result EXACTLY, so the contract
    attests the pruning itself, and recall figures are reproducible.

    ``train_n`` bounds the Lloyd's iterations to the deterministic
    bottom-train_n-by-md5 sample (centroid estimation needs a
    distribution, not the corpus — the FAISS recipe, same device as
    ``pq_train``); cell ASSIGNMENT still covers every row, as one
    vectorized Arrow argmin pass (``cluster._assign``).

    The scale path for ANN when bucket recall matters: compute drops
    from |Q| x |C| to |Q| x (n_probe/n_centroids) x |C|, and the
    per-cell corpus co-partitions by the cluster id.
    """
    from net_spider_spark.pipeline import cluster as CL

    cents, assigned = CL.kmeans_fit(
        corpus, k=n_centroids, iters=iters,
        id_col=id_col, vec_col=vec_col, seed=seed, train_n=train_n,
    )
    assigned = assigned.select(
        F.col("_id").alias("neighbor_id"),
        F.col("_v").alias("_cv"),
        F.col("cluster_id").alias("_cell"),
    )

    from net_spider_spark.pipeline.pq import _adc_query_rows

    got = _adc_query_rows(queries, id_col, vec_col, None, "adc_scan:ivf_topk")
    if got is not None:
        import numpy as np

        qids, qmat = got
        cent = sorted(cents)
        cid_arr = np.array([c for c, _ in cent], dtype=np.int64)
        cmat = np.array([v for _, v in cent], dtype=np.float64)
        if qmat.shape[0] and qmat.shape[1] == cmat.shape[1]:
            # Probe selection driver-side, replaying the relational
            # probe subtree exactly: _sq_dist's float64 left fold from
            # 0.0 over every dimension, then row_number over
            # (_dist, _cell) — removes a crossJoin + window + exchange.
            d = np.zeros((len(qids), len(cent)), dtype=np.float64)
            for j in range(cmat.shape[1]):
                dj = qmat[:, j, None] - cmat[None, :, j]
                d += dj * dj
            probes = [
                cid_arr[np.lexsort((cid_arr, d[qi]))[:n_probe]]
                for qi in range(len(qids))
            ]
            return _ivf_scan_topk(
                assigned, k, qids, qmat, probes,
                queries.schema[id_col].dataType.simpleString(),
            )

    centers_df = CL._centroid_df(corpus, cents).select(
        F.col("cid").alias("_cell"),
        F.col("cv").alias("_center"),
    )

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    # squared euclidean distance to every centroid; keep n_probe cells
    dist = F.aggregate(
        F.zip_with(
            F.col("_qv"),
            F.col("_center"),
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    probe_w = Window.partitionBy("query_id").orderBy(F.asc("_dist"), F.asc("_cell"))
    probes = (
        q.crossJoin(F.broadcast(centers_df))
        .withColumn("_dist", dist)
        .withColumn("_pr", F.row_number().over(probe_w))
        .where(F.col("_pr") <= n_probe)
        .select("query_id", "_qv", "_cell")
    )
    scored = assigned.join(F.broadcast(probes), "_cell").select(
        "query_id",
        "neighbor_id",
        cosine(F.col("_qv"), F.col("_cv")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"))
    )


def knn_join(
    corpus: DataFrame,
    queries: DataFrame | None = None,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "exact",
    n_planes: int = 2,
    seed: int = 42,
    max_broadcast_rows: int = 2_000_000,
) -> DataFrame:
    """All-vectors KNN: top-k cosine neighbors for EVERY query vector
    (``queries=None`` -> self-join over the corpus, excluding self).
    Returns (query_id, neighbor_id, rank).

    * ``method="exact"``: the corpus (ids + L2-normalized float32
      matrix) is broadcast once; an Arrow-batched ``mapInPandas`` over
      the query side does a BLAS matmul per batch and keeps top-k by
      (cos desc, neighbor_id asc). Python is the right tool here —
      dense linear algebra in numpy beats per-element Catalyst
      expressions by orders of magnitude, and the batch shape
      (|batch| x |corpus|) never materializes as rows. Refuses
      corpora over ``max_broadcast_rows`` (at dim 64 float32 that is
      ~0.5 GB — the executor-broadcast ceiling); beyond it, use
      ``method="lsh"``.
    * ``method="lsh"``: both sides bucket by sign-LSH signature and
      equi-join on the bucket (shuffle join, NO broadcast) — the
      100 TB path. Approximate: recall depends on n_planes.
    """
    import numpy as np
    import pandas as pd

    self_join = queries is None
    q = (queries if queries is not None else corpus).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    if method == "lsh":
        planes = hyperplanes(
            len(corpus.select(vec_col).first()[0]), n_planes, seed
        )
        c = corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("_cv"),
            lsh_signature(F.col(vec_col), planes).alias("bucket"),
        )
        qb = q.withColumn("bucket", lsh_signature(F.col("_qv"), planes))
        scored = c.join(qb, "bucket").select(
            "query_id",
            "neighbor_id",
            cosine(F.col("_qv"), F.col("_cv")).alias("cos"),
        )
        if self_join:
            scored = scored.where(F.col("query_id") != F.col("neighbor_id"))
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cos"), F.asc("neighbor_id")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(
                "query_id",
                "neighbor_id",
                F.col("rank").cast("long").alias("rank"),
            )
        )
    if method != "exact":
        raise ValueError(f"unknown method: {method}")

    # Guard BEFORE materializing anything on the driver: a bounded
    # limit(n+1).count() runs distributed, short-circuits at n+1 rows,
    # and never ships a single vector — so an over-threshold corpus
    # raises instead of OOMing the driver on collect.
    probe = corpus.select(id_col).limit(max_broadcast_rows + 1).count()
    if probe > max_broadcast_rows:
        raise ValueError(
            f"corpus has > max_broadcast_rows={max_broadcast_rows} rows;"
            f" use method='lsh'"
        )
    rows = corpus.select(
        F.col(id_col).alias("nid"), F.col(vec_col).alias("v")
    ).collect()
    # sort by id so argpartition tie-breaks resolve to the lowest id
    rows.sort(key=lambda r: r["nid"])
    ids = np.array([r["nid"] for r in rows], dtype=np.int64)
    mat = np.array([r["v"] for r in rows], dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    bc = q.sparkSession.sparkContext.broadcast((ids, mat, norms))

    def _topk(batches):
        b_ids, b_mat, b_norms = bc.value
        n = len(b_ids)
        kk = min(k, n - 1 if self_join else n)
        for pdf in batches:
            if pdf.empty:
                continue
            qm = np.array(list(pdf["_qv"]), dtype=np.float64)
            qn = np.sqrt((qm * qm).sum(axis=1))
            cos = (qm @ b_mat.T) / (
                np.maximum(qn[:, None], 1e-300) * np.maximum(b_norms, 1e-300)
            )
            qids = pdf["query_id"].to_numpy()
            if self_join:
                cos[qids[:, None] == b_ids[None, :]] = -np.inf
            # stable argsort on -cos: equal scores keep ascending-id
            # order because the corpus matrix is id-sorted.
            top = np.argsort(-cos, axis=1, kind="stable")[:, :kk]
            out_q = np.repeat(qids, kk)
            out_n = b_ids[top].ravel()
            out_r = np.tile(np.arange(1, kk + 1), len(qids))
            keep = ~np.isinf(cos[np.arange(len(qids))[:, None], top]).ravel()
            yield pd.DataFrame(
                {
                    "query_id": out_q[keep],
                    "neighbor_id": out_n[keep],
                    "rank": out_r[keep],
                }
            )

    return q.mapInPandas(
        _topk, "query_id long, neighbor_id long, rank long"
    )


def quantize_int8(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``q_i = floor(x_i /
    scale + 0.5)`` with ``scale = max|x| / 127`` — 4x smaller than
    float32 at <1% cosine error for typical embeddings, which at
    100 TB is the difference between a corpus that fits the cluster's
    storage/IO budget and one that doesn't.

    ``floor(x + 0.5)`` instead of round(): identical in every engine,
    with no half-even/half-up ambiguity. All-zero vectors get
    scale = 0 and an all-zero code. Output: id, ``qvec`` array<int>
    (int8 range, int-typed for portability), ``scale`` double.

    Dot products can run directly on the int codes (rescale by
    ``scale_a * scale_b``); see ``dequantize_cosine``.
    """
    maxabs = F.array_max(
        F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double")))
    )
    scale = (maxabs / F.lit(127.0)).alias("scale")
    qvec = F.when(maxabs == 0, F.transform(F.col(vec_col), lambda x: F.lit(0))).otherwise(
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(
                x.cast("double") / (maxabs / F.lit(127.0)) + F.lit(0.5)
            ).cast("int"),
        )
    )
    return df.select(
        F.col(id_col),
        qvec.alias("qvec"),
        scale,
    )


def dequantize_cosine(a_q: Column, b_q: Column) -> Column:
    """Cosine over two int8 code arrays — scales cancel, so it is just
    the integer dot over the product of integer norms (all in JVM
    codegen; the int math is exact, no float-order sensitivity)."""
    return dot(a_q, b_q) / (norm(a_q) * norm(b_q))


def lsh_bucket_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 3,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: compare only within matching LSH buckets.

    Recall is tunable via n_planes (fewer planes -> bigger buckets ->
    higher recall, more compute). The bucket join replaces the cross
    join — this is what survives a 1000x corpus scale-up.
    """
    planes = hyperplanes(dim, n_planes, seed)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        lsh_signature(F.col(vec_col), planes).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        lsh_signature(F.col(vec_col), planes).alias("bucket"),
    )
    scored = c.join(F.broadcast(q), "bucket").select(
        "query_id",
        "neighbor_id",
        cosine(F.col("_qv"), F.col("_cv")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"))
    )


def matryoshka_truncate(
    embeddings: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka-style dimensionality reduction: keep the first ``k``
    dims and renormalize to unit length (MRL-trained embeddings order
    information by prefix, so the head is the cheap search vector).

    Returns (id, truncated unit vector, norm_full, norm_k, retention)
    where retention = ||head|| / ||full|| — the cosine between the full
    vector and its zero-padded truncation, i.e. how much of the vector
    the prefix preserves. Pure column expressions (one projection, no
    shuffle); metrics rounded to 4 decimals for cross-engine stability.
    """
    v = F.col(vec_col)
    head = F.slice(v, 1, k)
    n_full = norm(v)
    n_k = norm(head)
    unit = F.when(
        n_k > 0, F.transform(head, lambda x: x.cast("double") / n_k)
    ).otherwise(F.transform(head, lambda x: F.lit(0.0)))
    return embeddings.select(
        F.col(id_col),
        unit.alias(vec_col),
        F.round(n_full, 4).alias("norm_full"),
        F.round(n_k, 4).alias("norm_k"),
        F.round(
            F.when(n_full > 0, n_k / n_full).otherwise(F.lit(0.0)), 4
        ).alias("retention"),
    )
