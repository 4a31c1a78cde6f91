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
    return dot(a, b) / (norm(a) * norm(b))


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


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: KMeans-partition the
    corpus, then each query scores only the ``n_probe`` nearest cells.

    The scale path for ANN when bucket recall matters: compute drops
    from |Q| x |C| to |Q| x (n_probe/n_centroids) x |C|, and the
    per-cell corpus co-partitions by the cluster id. Training uses
    Spark MLlib KMeans (JVM, distributed); scoring stays in Catalyst
    expressions.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    corpus_v = corpus.withColumn(
        "_fv", array_to_vector(F.col(vec_col).cast("array<double>"))
    )
    model = KMeans(
        k=n_centroids, seed=seed, featuresCol="_fv", predictionCol="_cell"
    ).fit(corpus_v)
    assigned = corpus_v.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        F.col("_fv"),
    )
    assigned = model.transform(assigned).select(
        "neighbor_id", "_cv", F.col("_cell")
    )

    centers = model.clusterCenters()
    center_rows = [(int(i), [float(x) for x in c]) for i, c in enumerate(centers)]
    centers_df = queries.sparkSession.createDataFrame(
        center_rows, "_cell int, _center array<double>"
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
