"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

Scale design notes (the whole point of these):

* **exact**: hash-groupBy on md5(text) — one shuffle keyed by digest,
  map-side combinable; at 100 TB, digest first so the shuffle carries
  32-byte keys instead of documents.
* **minhash LSH**: shingle -> per-band min-hash -> equi-join on
  (band, signature). Candidate generation is |bands| hash aggregates
  plus one self-equi-join on a tiny key — never an O(n^2) compare.
* **simhash**: bitwise near-dup signature; bucket on the signature (or
  bands of it) for candidates.
* **n-gram Jaccard**: exact verification for candidate pairs — the
  expensive step, run only after LSH narrowed the space.

Everything is built-in expressions (md5, higher-order array functions,
joins) — no Python UDFs, so candidate generation stays in whole-stage
codegen.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from net_spider_spark.pipeline.text import tokens_col
from net_spider_spark.reliability import materialize as _materialize


def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup groups: (digest, keeper id, group size). Keeper is
    the min id; rows with n_dups > 1 are the removable mass."""
    return (
        df.select(F.md5(F.col(text_col)).alias("digest"), F.col(id_col))
        .groupBy("digest")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def shingles_col(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles of the lowercased text (array<string>).

    Guarded for short docs: Spark's ``sequence(1, 0)`` counts *down*,
    so the sequence is only built when size(tokens) >= n.
    """
    toks = tokens_col(F.lower(text))
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    return F.when(
        F.size(toks) >= n,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n))),
    ).otherwise(F.array().cast("array<string>"))


def doc_shingle_sets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    spread: bool = True,
) -> DataFrame:
    """One row per doc with its DISTINCT shingles as an array column.

    The narrow (never-exploded) shape: tokenize, window into n-gram
    shingles, and dedup all inside one projection — zero shuffles, so
    the per-doc set can feed MinHash (``array_min`` over a hash
    ``transform``) and exact Jaccard (``array_intersect``) without the
    wide (doc, shingle) table ever being built or shuffled. Documents
    are bounded-size rows, so the array stays executor-local even when
    the corpus is 100 TB. The input is repartitioned to the session's
    default parallelism first: corpora often arrive as few large files,
    and the shingling expression is compute-bound. Callers whose input
    already sits below a shuffle (so it is spread across the session's
    parallelism by construction) pass ``spread=False`` to skip that
    exchange — scheduling width only, never results. The token array is
    materialized in its own projection so Catalyst doesn't inline (and
    re-evaluate) the tokenization per element access.
    """
    if spread:
        par = df.sparkSession.sparkContext.defaultParallelism
        df = df.repartition(par)
    toks = tokens_col(F.lower(F.col(text_col)))
    with_toks = df.select(F.col(id_col), toks.alias("_toks"))
    t = F.col("_toks")
    idx = F.sequence(F.lit(1), F.size(t) - (n - 1))
    # slice+concat_ws, not n element_at calls: one bounds check and one
    # pass per gram instead of n indexed lookups — measured 2x faster
    # at 80 k docs (the gram build is interpreted eval, higher-order
    # lambdas never enter codegen, so per-element cost is everything).
    shingles = F.when(
        F.size(t) >= n,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(t, i, n))),
    ).otherwise(F.array().cast("array<string>"))
    return with_toks.select(
        F.col(id_col), F.array_distinct(shingles).alias("shingles")
    )


def doc_shingles(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """One row per (doc, distinct shingle) — the exploded inverted-index
    shape, for consumers that genuinely need it (the incremental
    signature index, hot-shingle diagnostics). Batch pipelines should
    prefer :func:`doc_shingle_sets`, which keeps the set per-row and
    avoids shuffling the exploded table."""
    return doc_shingle_sets(df, text_col=text_col, id_col=id_col, n=n).select(
        F.col(id_col), F.explode("shingles").alias("shingle")
    )


def minhash_signatures(
    shingled: DataFrame, n_hashes: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """Per-(doc, band) MinHash: the lexicographic min of
    ``md5(band || '|' || shingle)`` over the doc's shingles. md5 hex is
    uniform, so the lexicographic min is a valid min-hash; using the
    digest string avoids engine-specific integer hashing (the DuckDB
    oracle computes the identical value).

    Returns (doc_id, band, sig) — long-format signatures, one hash per
    band (classic banding with r=1).

    All band-mins are computed as columns of ONE hash aggregate over the
    shingle table (map-side combinable), then unpivoted with ``stack`` —
    this avoids exploding the shingle table x n_hashes, which at corpus
    scale multiplies the dominant shuffle.
    """
    mins = [
        F.min(F.md5(F.concat(F.lit(f"{b}|"), F.col("shingle")))).alias(f"_sig{b}")
        for b in range(1, n_hashes + 1)
    ]
    wide = shingled.groupBy(id_col).agg(*mins)
    stack_args = ", ".join(f"{b}, _sig{b}" for b in range(1, n_hashes + 1))
    return wide.select(
        F.col(id_col),
        F.expr(f"stack({n_hashes}, {stack_args}) AS (band, sig)"),
    ).select(id_col, F.col("band").cast("int").alias("band"), "sig")


def minhash_signatures_sets(
    sets: DataFrame, n_hashes: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """MinHash signatures computed from :func:`doc_shingle_sets` rows —
    bit-identical to :func:`minhash_signatures` (the lexicographic
    ``array_min`` over ``md5(band || '|' || shingle)`` equals the
    grouped ``min``), but entirely narrow: no groupBy, no shuffle — the
    only shuffles in the whole candidate pipeline are the band
    equi-join's. Docs with no shingles produce no signature rows, same
    as the grouped path. Returns (doc_id, band, sig)."""
    sig_cols = [
        F.array_min(
            F.transform(
                F.col("shingles"),
                lambda s: F.md5(F.concat(F.lit(f"{b}|"), s)),
            )
        ).alias(f"_sig{b}")
        for b in range(1, n_hashes + 1)
    ]
    wide = sets.where(F.size("shingles") > 0).select(F.col(id_col), *sig_cols)
    stack_args = ", ".join(f"{b}, _sig{b}" for b in range(1, n_hashes + 1))
    return wide.select(
        F.col(id_col),
        F.expr(f"stack({n_hashes}, {stack_args}) AS (band, sig)"),
    ).select(id_col, F.col("band").cast("int").alias("band"), "sig")


def jaccard_verify_sets(
    candidates: DataFrame,
    sets: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact Jaccard over candidate pairs from per-doc shingle arrays:
    two equi-joins hang each side's set on the pair, then one
    ``array_intersect`` computes |A∩B| in codegen and
    |A∪B| = |A'| + |B'| − |A∩B| comes from per-DOC distinct sizes
    (A'/B' the deduped arrays) — the same identity the DuckDB twin
    uses, and IEEE-identical to dividing by ``size(array_union(..))``
    (``array_union``/``array_intersect`` both dedup, so the operands
    are the same integers). The union build was half the per-pair
    work: sizes are per-doc constants, so they are computed once per
    doc row instead of once per pair. Work is
    O(|candidates| × shingles-per-doc) like
    :func:`jaccard_verify_candidates`, but with 2 shuffles instead of
    5 — no exploded (pair, shingle) table, no shared-count aggregation,
    no separate sizes join.

    The candidate side is hash-spread on ``doc_a`` across the session's
    default parallelism first: candidate pairs are a few BYTES per row,
    so AQE's byte-based coalescing packs the verify stage into one or
    two tasks while each row carries two full shingle-array
    intersections of COMPUTE — the one case where byte-sized partitions
    are the wrong unit. On a cluster the attach joins shuffle by the
    same key, so the exchange is reused, not added.

    Returns (doc_a, doc_b, jaccard) at/above ``threshold``."""
    par = candidates.sparkSession.sparkContext.defaultParallelism
    a = sets.select(
        F.col(id_col).alias("doc_a"),
        F.col("shingles").alias("_sh_a"),
        F.size(F.array_distinct("shingles")).alias("_n_a"),
    )
    b = sets.select(
        F.col(id_col).alias("doc_b"),
        F.col("shingles").alias("_sh_b"),
        F.size(F.array_distinct("shingles")).alias("_n_b"),
    )
    shared = F.size(F.array_intersect("_sh_a", "_sh_b"))
    return (
        candidates.repartition(par, "doc_a")
        .join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (shared / (F.col("_n_a") + F.col("_n_b") - shared))
            .cast("double")
            .alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def minhash_hot_buckets(
    signatures: DataFrame, max_bucket_size: int = 1000
) -> DataFrame:
    """The (band, sig, n_docs) buckets a capped candidate pass would
    drop. A pipeline that caps buckets should report this mass — the
    members of a dropped bucket are usually degenerate near-identical
    rows (empty docs, template boilerplate) better handled by exact
    dedup on the raw text than by an |bucket|² pair explosion."""
    return (
        signatures.groupBy("band", "sig")
        .agg(F.count("*").alias("n_docs"))
        .where(F.col("n_docs") > max_bucket_size)
    )


def minhash_candidates(
    signatures: DataFrame,
    id_col: str = "doc_id",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs: docs agreeing on any band's signature.
    Self-equi-join on (band, sig) — Catalyst picks the join strategy;
    the key space is tiny relative to the corpus.

    ``max_bucket_size`` bounds the self-join: a single degenerate
    (band, sig) bucket — empty documents, boilerplate sharing one
    min-shingle — otherwise produces |bucket|² candidate rows and
    dominates the stage at scale. Buckets over the cap are dropped
    from THIS banding pass (their members can still pair through
    their other bands); use :func:`minhash_hot_buckets` with the same
    cap to report the dropped mass. The default is ``None`` (no cap):
    dropping buckets silently changes which pairs are found, so the
    cap is OPT-IN — a 100 TB run should pass a cap explicitly AND
    report :func:`minhash_hot_buckets` alongside, while correctness
    callers (oracle-checked dedup, decontamination guards where recall
    dominates) keep the exact semantics.
    """
    if max_bucket_size is not None:
        # Anti-join on the same (band, sig) key as the main join: the
        # per-bucket count is one partial-aggregated shuffle over the
        # narrow signature table, and hot keys are few by definition.
        hot = (
            signatures.groupBy("band", "sig")
            .agg(F.count("*").alias("_n"))
            .where(F.col("_n") > max_bucket_size)
            .select("band", "sig")
        )
        signatures = signatures.join(hot, ["band", "sig"], "left_anti")
    a = signatures.select(
        F.col(id_col).alias("doc_a"), F.col("band"), F.col("sig")
    )
    b = signatures.select(
        F.col(id_col).alias("doc_b"), F.col("band"), F.col("sig")
    )
    return (
        a.join(b, ["band", "sig"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def exact_duplicates_against(
    new_df: DataFrame,
    corpus_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental exact dedup: flag documents of a NEW batch whose
    text already exists in the ingested corpus — the daily shape of a
    production pipeline, where re-deduping the whole corpus per batch
    is off the table.

    One md5 projection per side + a semi-join of the (small) new batch
    against the distinct corpus digests: the corpus is scanned once
    for a 32-byte column, never materialized wide, and the join key is
    the digest — at 100 TB the corpus side is a pruned single-column
    scan and the probe side is the day's batch. Returns every new
    (id, digest, is_duplicate).
    """
    new_d = new_df.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("digest")
    )
    corpus_d = corpus_df.select(
        F.md5(F.col(text_col)).alias("digest")
    ).distinct()
    hits = new_d.join(corpus_d, "digest", "left_semi").select(
        F.col(id_col), F.lit(True).alias("is_duplicate")
    )
    return (
        new_d.join(hits, id_col, "left")
        .select(
            F.col(id_col),
            "digest",
            F.coalesce(F.col("is_duplicate"), F.lit(False)).alias(
                "is_duplicate"
            ),
        )
    )


def minhash_candidates_against(
    new_sigs: DataFrame,
    corpus_sigs: DataFrame,
    id_col: str = "doc_id",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Incremental near-dup candidates: new-batch docs that agree with
    ANY corpus doc on any MinHash band. Both sides come from
    :func:`minhash_signatures` — the corpus side is the precomputed,
    incrementally-appended signature index (4 narrow rows per doc),
    NOT the corpus text. The equi-join on (band, sig) probes the index
    with the day's batch; no self-join over the corpus ever runs.
    Returns distinct (new_id, corpus_id) candidate pairs for exact
    verification (:func:`jaccard_verify_candidates`).

    ``max_bucket_size`` caps the CORPUS side of each (band, sig)
    bucket, same rationale as :func:`minhash_candidates`: a degenerate
    corpus bucket fans every matching probe row out |bucket|-wide.
    Default ``None`` (no cap) — dropping corpus buckets silently costs
    recall, so the cap is opt-in for scale runs that also report
    :func:`minhash_hot_buckets` on the corpus index.
    """
    if max_bucket_size is not None:
        hot = (
            corpus_sigs.groupBy("band", "sig")
            .agg(F.count("*").alias("_n"))
            .where(F.col("_n") > max_bucket_size)
            .select("band", "sig")
        )
        corpus_sigs = corpus_sigs.join(hot, ["band", "sig"], "left_anti")
    a = new_sigs.select(F.col(id_col).alias("new_id"), "band", "sig")
    b = corpus_sigs.select(F.col(id_col).alias("corpus_id"), "band", "sig")
    return (
        a.join(b, ["band", "sig"])
        .where(F.col("new_id") != F.col("corpus_id"))
        .select("new_id", "corpus_id")
        .distinct()
    )


def _jaccard_tail(
    shared: DataFrame, sizes: DataFrame, threshold: float, id_col: str
) -> DataFrame:
    """shared-count pairs + per-doc sizes -> (doc_a, doc_b, jaccard)."""
    na = sizes.select(F.col(id_col).alias("doc_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n").alias("nb"))
    return (
        shared.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("shared")
                / (F.col("na") + F.col("nb") - F.col("shared"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_pairs(
    shingled: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact Jaccard similarity for EVERY pair sharing >= 1 shingle.

    shared / (|A| + |B| - shared) computed from one self-join on the
    full shingle inverted index — the exhaustive verifier, for small
    corpora or spot-checks only. At scale use ``minhash_candidates``
    followed by :func:`jaccard_verify_candidates`, which bounds the
    join by the candidate set instead of the hot-shingle blowup here.
    """
    sizes = shingled.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    a = shingled.select(F.col(id_col).alias("doc_a"), "shingle")
    b = shingled.select(F.col(id_col).alias("doc_b"), "shingle")
    shared = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return _jaccard_tail(shared, sizes, threshold, id_col)


def jaccard_verify_candidates(
    candidates: DataFrame,
    shingled: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact n-gram Jaccard restricted to candidate pairs — the scale
    path (LSH-candidates-then-verify).

    ``candidates`` is (doc_a, doc_b) from :func:`minhash_candidates`
    (or any other candidate generator). The shared-shingle count
    explodes each candidate pair by doc_a's shingles, then inner-joins
    doc_b's shingles on (doc_b, shingle): total work is
    O(|candidates| x shingles-per-doc), independent of how hot any
    single shingle is — the inverted-index self-join in
    :func:`ngram_jaccard_pairs` is never built. Returns
    (doc_a, doc_b, jaccard) for pairs at/above ``threshold``.
    """
    sizes = shingled.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    a = shingled.select(F.col(id_col).alias("doc_a"), "shingle")
    b = shingled.select(F.col(id_col).alias("doc_b"), "shingle")
    shared = (
        candidates.join(a, "doc_a")
        .join(b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return _jaccard_tail(shared, sizes, threshold, id_col)


def embedding_band_signatures(
    embeddings: DataFrame,
    n_bands: int = 4,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """(id, band, sig) banded sign-LSH signatures of an embedding
    column — the shared index shape for the batch self-join
    (:func:`embedding_lsh_candidates`) and the incremental probe
    (:func:`embedding_near_dup_against`).

    All band signatures come from ONE Arrow-batched matmul per batch.
    Catalyst higher-order functions (aggregate/zip_with dots) run
    INTERPRETED — they disable whole-stage codegen — so at
    bands x planes x dim per row the expression formulation is the
    slow path, not the vectorized one. Sign agreement with the SQL
    oracle holds because a float64 dot's sign only differs across
    summation orders within ~1e-16 of zero.
    """
    from pyspark.sql.functions import pandas_udf

    from net_spider_spark.pipeline.similarity import hyperplanes

    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_bands * n_planes, seed)
    pm = np.array(planes, dtype=np.float64)  # (bands*planes) x dim
    weights = 1 << np.arange(n_planes, dtype=np.int64)

    @pandas_udf("array<bigint>")
    def _band_sigs(v: pd.Series) -> pd.Series:
        m = np.array(list(v), dtype=np.float64)
        bits = (m @ pm.T >= 0).astype(np.int64)  # B x (bands*planes)
        sigs = [
            (bits[:, b * n_planes : (b + 1) * n_planes] * weights).sum(axis=1)
            for b in range(n_bands)
        ]
        return pd.Series(list(np.stack(sigs, axis=1)))

    return embeddings.select(
        F.col(id_col), _band_sigs(F.col(vec_col)).alias("_sigs")
    ).select(
        F.col(id_col),
        F.posexplode("_sigs").alias("band", "sig"),
    )


def embedding_near_dup_against(
    new_df: DataFrame,
    corpus_df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bands: int = 4,
    n_planes: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Incremental embedding near-dup: flag NEW-batch vectors within
    cosine ``threshold`` of ANY corpus vector — the daily-batch shape
    (like :func:`exact_duplicates_against` /
    :func:`minhash_candidates_against`) for the embedding column: the
    corpus side is the precomputed sign-LSH signature index (n_bands
    narrow rows per vector), probed by the day's batch on (band, sig);
    only candidates get the exact cosine. No corpus self-join, no
    new x corpus cross product. Returns every new row as
    (id, n_near_corpus, is_near_dup): the count of verified corpus
    neighbors at/above threshold, and whether any exists.
    """
    from net_spider_spark.pipeline.similarity import cosine

    # Vector dim comes from the schema when the column is a fixed-size
    # array type is not available, so probe ONE row; guard the empty /
    # all-null corpus (first() -> None) — nothing can be a near-dup of
    # an empty corpus, and a TypeError here would mask that. The probe
    # is an eager single-row job at plan-construction time (documented
    # eager-evaluation contract of the *_against family).
    probe = corpus_df.select(vec_col).where(F.col(vec_col).isNotNull()).first()
    if probe is None:
        return new_df.select(
            F.col(id_col),
            F.lit(0).cast("long").alias("n_near_corpus"),
            F.lit(False).alias("is_near_dup"),
        )
    dim = len(probe[0])
    new_sigs = embedding_band_signatures(
        new_df, n_bands, n_planes, id_col, vec_col, seed, dim
    ).select(F.col(id_col).alias("new_id"), "band", "sig")
    corpus_sigs = embedding_band_signatures(
        corpus_df, n_bands, n_planes, id_col, vec_col, seed, dim
    ).select(F.col(id_col).alias("corpus_id"), "band", "sig")
    cand = (
        new_sigs.join(corpus_sigs, ["band", "sig"])
        .where(F.col("new_id") != F.col("corpus_id"))
        .select("new_id", "corpus_id")
        .distinct()
    )
    a = new_df.select(F.col(id_col).alias("new_id"), F.col(vec_col).alias("_va"))
    b = corpus_df.select(
        F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("_vb")
    )
    near = (
        cand.join(a, "new_id")
        .join(b, "corpus_id")
        .where(cosine(F.col("_va"), F.col("_vb")) >= threshold)
        .groupBy("new_id")
        .agg(F.count(F.lit(1)).alias("n_near_corpus"))
    )
    return (
        new_df.select(F.col(id_col))
        .join(near.select(F.col("new_id").alias(id_col), "n_near_corpus"), id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_near_corpus"), F.lit(0)).cast("long").alias(
                "n_near_corpus"
            ),
            (F.coalesce(F.col("n_near_corpus"), F.lit(0)) > 0).alias(
                "is_near_dup"
            ),
        )
    )


def embedding_lsh_candidates(
    embeddings: DataFrame,
    n_bands: int = 4,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Banded sign-LSH candidate pairs over an embedding column.

    ``n_bands`` independent signatures of ``n_planes`` sign-bits each
    (planes drawn once, deterministically, from ``seed``); a pair is a
    candidate iff it agrees on ANY band — classic OR-of-ANDs banding,
    so recall for true near-dups rises with bands while per-band
    buckets stay small enough to join. All bands' signatures come out
    of ONE narrow projection (codegen) and are unpivoted with
    ``stack``; candidates are a self-equi-join on (band, sig) — the
    corpus is never cross-joined. Returns distinct (doc_a, doc_b) with
    doc_a < doc_b.
    """
    sigs = embedding_band_signatures(
        embeddings, n_bands, n_planes, id_col, vec_col, seed, dim
    )
    a = sigs.select(F.col(id_col).alias("doc_a"), "band", "sig")
    b = sigs.select(F.col(id_col).alias("doc_b"), "band", "sig")
    return (
        a.join(b, ["band", "sig"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def embedding_near_dup_groups(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
    n_bands: int = 4,
    n_planes: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate groups.

    Candidate pairs come from banded sign-LSH by default
    (:func:`embedding_lsh_candidates`) and are verified with the EXACT
    cosine before becoming edges — the scale path: no all-pairs join
    ever materializes. ``exact=True`` switches to the exhaustive
    all-pairs verifier (small corpora / recall audits only — O(n^2)).

    Bucket sizing: candidate volume scales with bucket occupancy
    n/2^n_planes per band. 6 planes keeps per-band agreement ~0.9^6 =
    0.53 for cos=0.95 pairs -> any-of-4-bands recall ~0.95, while
    cutting bucket fan-out 4x vs 4 planes; TRUE near-dups (cos >
    0.99) agree on virtually every band. Tune n_planes up as the
    corpus grows (bucket occupancy, not recall, is the scale limit).

    Verified pairs with cosine >= threshold become edges; connected
    components merge chains of near-dups into groups; the keeper is
    each group's min ID. Returns (vec_id, group_id, is_keeper).
    """
    from net_spider_spark.graph.components import connected_components
    from net_spider_spark.pipeline.similarity import cosine

    a = embeddings.select(
        F.col(id_col).alias("_ida"), F.col(vec_col).alias("_va")
    )
    b = embeddings.select(
        F.col(id_col).alias("_idb"), F.col(vec_col).alias("_vb")
    )
    if exact:
        pairs = a.crossJoin(b).where(F.col("_ida") < F.col("_idb"))
    else:
        cand = embedding_lsh_candidates(
            embeddings,
            n_bands=n_bands,
            n_planes=n_planes,
            id_col=id_col,
            vec_col=vec_col,
            seed=seed,
        )
        pairs = (
            cand.join(a, cand.doc_a == F.col("_ida"))
            .join(b, cand.doc_b == F.col("_idb"))
            .select("_ida", "_va", "_idb", "_vb")
        )
    # Zero-pad IDs: component representatives are lexicographic-min
    # strings, padding makes that the numeric min.
    def pad(c):
        return F.lpad(c.cast("string"), 12, "0")

    edges = (
        pairs.where(cosine(F.col("_va"), F.col("_vb")) >= threshold)
        .select(pad(F.col("_ida")).alias("src"), pad(F.col("_idb")).alias("dst"))
    )
    comps = connected_components(edges)
    all_ids = embeddings.select(pad(F.col(id_col)).alias("node_id"))
    groups = (
        all_ids.join(comps, "node_id", "left")
        .select(
            F.col("node_id").cast("long").alias(id_col),
            F.coalesce(F.col("component"), F.col("node_id"))
            .cast("long")
            .alias("group_id"),
        )
    )
    return groups.withColumn(
        "is_keeper", F.col(id_col) == F.col("group_id")
    )


def _hex16(col: Column) -> Column:
    """First 16 bits of md5 as a long (cross-engine-stable hash)."""
    return F.conv(F.substring(F.md5(col), 1, 4), 16, 10).cast("long")


def simhash16(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """16-bit SimHash over the distinct token set.

    Bit i of the signature is 1 iff, over all tokens, the count of
    tokens whose 16-bit token-hash has bit i set exceeds half the
    token count (majority vote). Near-dup docs differ in few bits
    (compare via Hamming distance, or bucket by signature bands).
    """
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(tokens_col(F.lower(F.col(text_col))))
        ).alias("tok"),
    )
    hashed = toks.select(id_col, _hex16(F.col("tok")).alias("h"))
    bit_cols = [
        F.sum(F.shiftright(F.col("h"), i) % 2).alias(f"b{i}") for i in range(16)
    ]
    agg = hashed.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tok"), *bit_cols
    )
    sig = None
    for i in range(16):
        bit = (F.col(f"b{i}") * 2 > F.col("n_tok")).cast("long") * (1 << i)
        sig = bit if sig is None else sig + bit
    return agg.select(F.col(id_col), sig.alias("simhash"))


def phash_candidates(
    hashes: DataFrame,
    bands: int = 4,
    id_col: str = "media_id",
    hash_col: str = "phash",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Candidate near-dup image pairs from 64-bit perceptual hashes
    (``multimodal.image_phash``): band the hash into ``bands`` equal
    bit slices and self-equi-join per (band, slice) — the SimHash
    banding trick applied to pHash. Pigeonhole guarantee: any pair
    within Hamming distance < ``bands`` shares at least one exact
    band, so recall is 100% for the tight thresholds perceptual dedup
    uses (lossless re-encodes are distance 0; JPEG re-encodes a few
    bits). Hot buckets can be capped like :func:`minhash_candidates`
    (flat-color corpora put thousands of images in one band bucket) —
    opt-in via ``max_bucket_size``, default ``None``, because a
    dropped bucket silently loses its pairs; :func:`image_phash_dedup`
    avoids needing the cap by banding one row per DISTINCT hash.
    """
    if 64 % bands != 0:
        raise ValueError("bands must divide 64")
    width = 64 // bands
    mask = (1 << width) - 1
    sigs = hashes.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(
                            F.col(hash_col), i * width
                        ).bitwiseAND(F.lit(mask)).alias("sig"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bs"),
    ).select(id_col, "bs.band", "bs.sig")
    if max_bucket_size is not None:
        hot = (
            sigs.groupBy("band", "sig")
            .agg(F.count("*").alias("_n"))
            .where(F.col("_n") > max_bucket_size)
            .select("band", "sig")
        )
        sigs = sigs.join(hot, ["band", "sig"], "left_anti")
    a = sigs.select(F.col(id_col).alias("id_a"), "band", "sig")
    b = sigs.select(F.col(id_col).alias("id_b"), "band", "sig")
    return (
        a.join(b, ["band", "sig"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def image_phash_dedup(
    hashes: DataFrame,
    max_hamming: int = 2,
    bands: int = 4,
    id_col: str = "media_id",
    hash_col: str = "phash",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Perceptual image dedup: flag images dominated by a smaller-id
    image within ``max_hamming`` pHash bits (the byte-digest-defeating
    case: re-encoded/transcoded copies of the same picture). Returns
    (id, phash, is_dup) — keep ``is_dup = false``.

    Scale shape: images are first collapsed to HASH CLASSES — one row
    per distinct 64-bit hash, carrying the class's min id — with a
    plain hash aggregate. Whether y dominates x depends only on their
    hash values, so the dominated rule factors exactly through
    classes: x is a dup iff the min id over x's own class and every
    class within ``max_hamming`` is smaller than x's id. Banding
    (:func:`phash_candidates`; exact recall while
    ``max_hamming < bands``) and the codegen ``bit_count(xor)``
    verification then run over DISTINCT hashes only, so a
    million-copy transcode class is ONE row in the self-join, not a
    hot bucket — the headline mass-copy case is handled by the
    aggregate, and every exact copy is flagged no matter how large
    the class. ``max_bucket_size`` (opt-in, default ``None``) still
    caps distinct-hash band buckets for adversarial corpora of many
    DISTINCT hashes sharing a band slice. Rows with NULL hash (decode
    errors) pass through as is_dup = false for the caller's error
    channel to handle."""
    if max_hamming >= bands:
        raise ValueError(
            "banding guarantees recall only for max_hamming < bands"
        )
    # The hash table feeds the class aggregate and the final left
    # join; without materialization each consumer re-runs the
    # upstream image DECODE — the dominant cost. localCheckpoint
    # (RDD-owned, ContextCleaner-freed when the caller drops the
    # result; eager, so the decode runs exactly once at call time).
    hashes = hashes.transform(_materialize)
    classes = (
        hashes.where(F.col(hash_col).isNotNull())
        .groupBy(hash_col)
        .agg(F.min(id_col).alias("_min_id"))
        .transform(_materialize)  # consumed by banding + 2 verify sides
    )
    cand = phash_candidates(
        classes.select(F.col(hash_col).alias("_cls"), F.col(hash_col)),
        bands=bands,
        id_col="_cls",
        hash_col=hash_col,
        max_bucket_size=max_bucket_size,
    )
    ca = classes.select(F.col(hash_col).alias("id_a"), F.col("_min_id").alias("_ma"))
    cb = classes.select(F.col(hash_col).alias("id_b"), F.col("_min_id").alias("_mb"))
    # Verified neighbor-class pairs, emitted in both directions so each
    # class sees the min id of every neighboring class.
    near = (
        cand.join(ca, "id_a")
        .join(cb, "id_b")
        .where(
            F.bit_count(F.col("id_a").bitwiseXOR(F.col("id_b")))
            <= max_hamming
        )
    )
    neighbor_min = (
        near.select(F.col("id_a").alias(hash_col), F.col("_mb").alias("_nm"))
        .unionByName(
            near.select(
                F.col("id_b").alias(hash_col), F.col("_ma").alias("_nm")
            )
        )
        .groupBy(hash_col)
        .agg(F.min("_nm").alias("_neighbor_min"))
    )
    thresh = classes.join(neighbor_min, hash_col, "left").select(
        F.col(hash_col),
        F.least(
            F.col("_min_id"), F.coalesce(F.col("_neighbor_min"), F.col("_min_id"))
        ).alias("_thresh"),
    )
    return (
        hashes.join(thresh, hash_col, "left")
        .select(
            F.col(id_col),
            F.col(hash_col),
            F.coalesce(
                F.col(id_col) > F.col("_thresh"), F.lit(False)
            ).alias("is_dup"),
        )
    )


def dedup_representatives(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    n_hashes: int = 4,
    threshold: float = 0.5,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """The full near-dup pipeline a training-data run actually executes:
    MinHash-banded candidates -> exact Jaccard verify -> connected
    components over the verified pairs -> keep the min-ID document of
    every dup cluster (and every unclustered doc).

    Returns the KEPT corpus as (doc_id, cluster_size): cluster_size is
    how many documents the kept row represents (1 for non-duplicated
    docs), so downstream sampling can reweight if desired.

    Every stage is the scale path: banding is one hash aggregate,
    verification touches candidate pairs only, components run
    min-label-propagation with a driver fast path only under the edge
    guard, and the final filter is a broadcastable anti-join of the
    (small) loser set against the corpus. Nothing in the pipeline is
    quadratic in corpus size except a degenerate (band, sig) bucket —
    opt into ``max_bucket_size`` for adversarial corpora (and report
    :func:`minhash_hot_buckets` at the same cap); the default ``None``
    keeps exact candidate semantics.
    """
    from net_spider_spark.graph.components import connected_components

    # 3 downstream consumers re-read the per-doc shingle sets
    # (signatures, both verify join sides): one persist beats
    # re-running the tokenize+shingle scan per consumer.  The cache is
    # owned by THIS call: connected_components materializes its result
    # (localCheckpoint / driver table) before returning, so nothing in
    # the returned plan references ``sets`` — unpersist in finally, no
    # session-lifetime leak.
    sets = doc_shingle_sets(df, text_col=text_col, id_col=id_col, n=n).persist()
    try:
        cand = minhash_candidates(
            minhash_signatures_sets(sets, n_hashes=n_hashes, id_col=id_col),
            id_col=id_col,
            max_bucket_size=max_bucket_size,
        )
        verified = jaccard_verify_sets(
            cand, sets, threshold=threshold, id_col=id_col
        )
        edges = verified.select(
            F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
        )
        # verified pairs are distinct with doc_a < doc_b by
        # construction, so the components-side symmetric-union dedup
        # would be a pure extra shuffle of the pair table.
        comps = connected_components(edges, edges_distinct=True)
    finally:
        sets.unpersist()
    reps = comps.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    # component label IS the min node ID of the cluster, so the losers
    # are exactly the members whose ID differs from their label.
    losers = comps.where(F.col("node_id") != F.col("component")).select(
        F.col("node_id").alias(id_col)
    )
    kept = df.select(id_col).join(losers, id_col, "left_anti")
    return (
        kept.join(
            reps.select(
                F.col("component").alias(id_col), "cluster_size"
            ),
            id_col,
            "left",
        )
        .select(
            F.col(id_col),
            F.coalesce(F.col("cluster_size"), F.lit(1)).alias("cluster_size"),
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    n: int = 10,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document duplicated-SPAN removal (the "dedup the repeated
    50-grams, not just whole documents" pass of large-scale training
    pipelines; cf. Lee et al. 2021, "Deduplicating Training Data Makes
    Language Models Better" — public paper, reimplemented here on
    DataFrame expressions).

    A span is any run of ``n`` consecutive tokens occurring in at least
    ``min_docs`` distinct documents. Every token covered by at least one
    such span is dropped; the survivors re-join in order. Returns
    (doc_id, clean_text, n_tokens, n_removed).

    Scale shape: per-doc token/n-gram arrays are built narrow (no
    explode until the n-gram table, whose rows are (doc, start, gram) —
    bounded by corpus token count); the duplicated-gram set comes from
    one hash aggregate (distinct-doc count per gram); coverage is an
    equi-join on the gram, then duplicated-span STARTS merge into
    disjoint per-doc intervals with a gaps-and-islands window (rows =
    covered starts, never exploded positions), and reconstruction
    filters each doc's token array against its interval list inside
    whole-stage codegen — no range join, no position explosion, no
    distinct, no anti-join, nothing quadratic. (The earlier explode-
    positions → distinct → anti-join → re-collect pipeline spilled
    ~115 GB at 51 M maximally-duplicated docs on one box; this shape's
    biggest shuffle is the covered-starts window, a strict subset of
    the gram table.)
    """
    from pyspark.sql.window import Window

    toks = tokens_col(F.lower(F.col(text_col)))
    # Repartition BY id_col, not round-robin: HashPartitioning(id)
    # survives the projections and the gram explode, so the covered-
    # starts window (partitionBy id), the gap join (on id), and the
    # final piece re-assembly (groupBy id) all reuse this ONE exchange
    # — without it each of those re-shuffles a corpus-sized table
    # (the starts window alone moved every gram row again). Ids are
    # unique, so the hash spread is uniform by construction.
    base = df.repartition(
        df.sparkSession.sparkContext.defaultParallelism, F.col(id_col)
    ).select(F.col(id_col), toks.alias("_toks"))
    t = F.col("_toks")
    # Gram rows carry a 16-hex md5 PREFIX, never the gram string: the
    # doc-frequency aggregate and the duplicated-set join shuffle
    # (gkey, doc, start) at ~28 bytes/row instead of the ~70-byte
    # n-token gram text — the gram table is the corpus-sized term, so
    # this is most of the operator's shuffle (12.7 GB at the 512x
    # artifact). md5 is the engine-portable hash used throughout; the
    # DuckDB oracle groups by the identical prefix, so even a
    # ~2^-64-probability collision would reproduce on both sides.
    # Gram construction is explode(sequence) + slice/concat_ws — plain
    # codegen projections; the previous transform() lambda was
    # CodegenFallback, interpreted per gram (cf. common_ngrams).
    positions = F.when(
        F.size(t) >= n, F.sequence(F.lit(1), F.size(t) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    grams = base.select(
        F.col(id_col), t.alias("_t"), F.explode(positions).alias("start")
    ).select(
        F.col(id_col),
        "start",
        F.substring(
            F.md5(F.concat_ws(" ", F.slice(F.col("_t"), F.col("start"), n))),
            1,
            16,
        ).alias("gkey"),
    )
    # Doc-frequency test. count_distinct plans as a two-shuffle
    # distinct-pair aggregate whose FIRST exchange ships every gram
    # occurrence as a (gkey, doc) pair — the corpus-sized wire term.
    # For the min_docs=2 default, ">= 2 distinct docs" is exactly
    # "min(doc) != max(doc)": one map-side-combinable aggregate whose
    # partials compress to unique-grams-per-partition before the wire
    # (measured 25.8 s -> 8 s for the aggregate at 64x). min_docs > 2
    # genuinely needs the distinct count; min_docs <= 1 is every gram.
    if min_docs <= 1:
        dup = grams.select("gkey").distinct()
    elif min_docs == 2:
        dup = (
            grams.groupBy("gkey")
            .agg(
                F.min(F.col(id_col)).alias("_lo"),
                F.max(F.col(id_col)).alias("_hi"),
            )
            .where(F.col("_lo") != F.col("_hi"))
            .select("gkey")
        )
    else:
        dup = (
            grams.groupBy("gkey")
            .agg(F.count_distinct(F.col(id_col)).alias("_docs"))
            .where(F.col("_docs") >= min_docs)
            .select("gkey")
        )
    # Covered starts are unique per (doc, start) by construction; merge
    # overlapping/adjacent equal-length spans: a span overlaps-or-abuts
    # its predecessor (in start order) iff start <= prev_start + n.
    w = Window.partitionBy(id_col).orderBy("start")
    starts = grams.join(dup, "gkey").select(F.col(id_col), "start")
    islands = (
        starts.withColumn(
            "_brk",
            F.when(
                F.lag("start").over(w).isNull()
                | (F.col("start") > F.lag("start").over(w) + n),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "_island",
            F.sum("_brk").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy(id_col, "_island")
        .agg(
            F.min("start").alias("s"),
            (F.max("start") + (n - 1)).alias("e"),
        )
    )
    # Reconstruction by GAP SLICES, all plain codegen: the kept tokens
    # are exactly the runs BETWEEN islands, so instead of testing every
    # token against an interval list (higher-order transform/filter/
    # exists — CodegenFallback, interpreted per token x per island),
    # derive the handful of gap ranges per doc relationally (inner gaps
    # from a lag over the few island rows, plus head/tail gaps from the
    # per-doc bounds), slice each range out of the token array, and
    # re-assemble in range order. Work per doc drops from
    # O(tokens x islands) interpreted to O(islands) codegen slices.
    iw = Window.partitionBy(id_col).orderBy("s")
    inner_gaps = (
        islands.select(
            F.col(id_col),
            (F.lag("e").over(iw) + 1).alias("_gs"),
            (F.col("s") - 1).alias("_ge"),
        )
        # merged islands always leave >= 1 token between runs, so the
        # filter only drops the first island's null lag row
        .where(F.col("_gs").isNotNull() & (F.col("_gs") <= F.col("_ge")))
    )
    bounds = islands.groupBy(id_col).agg(
        F.min("s").alias("_first_s"), F.max("e").alias("_last_e")
    )
    head_gaps = bounds.where(F.col("_first_s") > 1).select(
        F.col(id_col),
        F.lit(1).alias("_gs"),
        (F.col("_first_s") - 1).alias("_ge"),
    )
    # tail gap's end is the doc's token count, unknown here — an open
    # range (_ge null) resolves to size(_toks) after the join; a doc
    # covered through its last token yields an empty slice, dropped by
    # the _klen = 0 guard below.
    tail_gaps = bounds.select(
        F.col(id_col),
        (F.col("_last_e") + 1).alias("_gs"),
        F.lit(None).cast("int").alias("_ge"),
    )
    gaps = inner_gaps.unionByName(head_gaps).unionByName(tail_gaps)
    # shuffle_hash: the stream side carries the wide token arrays — a
    # sort-merge join would SORT them (the exact wide-row-sort hazard
    # the snapshot argmax avoids); hash-building the narrow gaps side
    # keeps the wide rows unsorted. Docs with no duplicated span have
    # no gap rows: the left join's null _gs marks keep-everything.
    joined = base.join(gaps.hint("shuffle_hash"), id_col, "left")
    ge_eff = F.least(F.coalesce(F.col("_ge"), F.size(t)), F.size(t))
    klen = F.greatest(F.lit(0), ge_eff - F.col("_gs") + 1)
    pieces = joined.select(
        F.col(id_col),
        F.size(t).alias("_nt"),
        F.col("_gs"),
        F.when(F.col("_gs").isNull(), F.concat_ws(" ", t))
        .when(klen > 0, F.concat_ws(" ", F.slice(t, F.col("_gs"), klen)))
        .otherwise(F.lit(None).cast("string"))
        .alias("_piece"),
        F.when(F.col("_gs").isNull(), F.size(t))
        .otherwise(klen)
        .alias("_klen"),
    )
    return pieces.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("_gs").alias("g"), F.col("_piece").alias("p"))
                    )
                ),
                lambda s: s["p"],
            ),
        ).alias("clean_text"),
        F.max("_nt").alias("n_tokens"),
        (F.max("_nt") - F.sum("_klen")).cast("int").alias("n_removed"),
    )


def remove_boilerplate_lines(
    df: DataFrame,
    min_docs: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document boilerplate-LINE removal: drop every line whose
    trimmed content appears in at least ``min_docs`` distinct documents
    (nav menus, cookie banners, footers — the line-level cleaning pass
    of web-corpus pipelines; cf. RefinedWeb/CCNet line dedup, public
    papers, reimplemented on DataFrame expressions). Complements
    :func:`remove_duplicate_spans`, which catches duplicated token
    runs WITHIN otherwise-unique prose; this catches short exact lines
    repeated across the corpus that n-gram spans miss (a 4-token
    cookie banner never forms a 10-gram).

    Whitespace-only lines are never boilerplate (they are structure,
    not content) and a document with no text yields its empty self.
    Returns (doc_id, clean_text, n_lines, n_removed); with nothing
    removed, clean_text round-trips the input byte-exactly (split and
    re-join preserve trailing newlines).

    Scale shape: one posexplode to (doc, idx, line) — rows = corpus
    line count; the boilerplate set is one hash aggregate (distinct-doc
    count per trimmed line, map-side combinable) whose output is small
    by definition (lines repeated across >= min_docs docs); marking is
    an equi-join of line occurrences against that set (broadcastable);
    reconstruction re-groups each doc's kept lines by index — the only
    data-sized shuffles are the line aggregate and the per-doc regroup,
    both keyed on high-cardinality columns. Nothing quadratic, no
    window over a whole corpus.
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n", -1)).alias("idx", "ln"),
    ).withColumn("tln", F.trim(F.col("ln")))
    freq = (
        lines.where(F.col("tln") != "")
        .groupBy("tln")
        .agg(F.count_distinct(F.col(id_col)).alias("_dfreq"))
    )
    bp = freq.where(F.col("_dfreq") >= min_docs).select(
        "tln", F.lit(True).alias("_bp")
    )
    # shuffle_hash: the probe side is every line occurrence in the
    # corpus — a sort-merge join would sort it all on the line text;
    # hashing the (bounded) boilerplate side skips that sort, and AQE
    # still upgrades to broadcast when the set is actually small.
    marked = lines.join(bp.hint("shuffle_hash"), "tln", "left").withColumn(
        "is_bp", F.coalesce(F.col("_bp"), F.lit(False))
    )
    kept = F.transform(
        F.array_sort(
            F.collect_list(
                F.when(~F.col("is_bp"), F.struct(F.col("idx"), F.col("ln")))
            )
        ),
        lambda s: s["ln"],
    )
    return marked.groupBy(id_col).agg(
        F.concat_ws("\n", kept).alias("clean_text"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.col("is_bp").cast("long")).cast("long").alias("n_removed"),
    )
