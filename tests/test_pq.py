"""Product quantization (net_spider_spark/pipeline/pq.py): numpy spec
parity for train/encode/ADC, determinism, and plan shape."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from net_spider_spark.pipeline import pq as PQ


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(11)
    rows = [
        (int(i), [float(x) for x in rng.normal(size=8)]) for i in range(80)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _np_pq(ids, vecs, dim, m, k, iters, seed="s42"):
    """Reference PQ: per-subspace Lloyd's with the library's init and
    tie-break rules, then codes = per-subspace argmin."""
    sub = dim // m
    order = sorted(
        range(len(ids)),
        key=lambda i: (
            hashlib.md5(f"{seed}:{ids[i]}".encode()).hexdigest(),
            ids[i],
        ),
    )
    books = {}
    for s in range(m):
        sv = [v[s * sub:(s + 1) * sub] for v in vecs]
        cents = [sv[i].copy() for i in order[:k]]

        def assign():
            return [
                min(
                    range(k),
                    key=lambda c: (float(((x - cents[c]) ** 2).sum()), c),
                )
                for x in sv
            ]

        a = assign()
        for _ in range(iters):
            for cid in range(k):
                members = [sv[i] for i in range(len(sv)) if a[i] == cid]
                if members:
                    cents[cid] = np.mean(members, axis=0)
            a = assign()
        books[s] = (cents, a)
    return books


def test_encode_matches_numpy_reference(emb):
    rows = emb.orderBy("vec_id").collect()
    ids = [r["vec_id"] for r in rows]
    vecs = [np.array(r["embedding"], dtype=np.float64) for r in rows]
    books = PQ.pq_train(emb, dim=8, m=2, k=4, iters=1)
    ref = _np_pq(ids, vecs, dim=8, m=2, k=4, iters=1)
    for s, cid, cv in books:
        assert np.allclose(ref[s][0][cid], cv)
    got = {
        r["vec_id"]: list(r["codes"])
        for r in PQ.pq_encode(emb, books).collect()
    }
    for i, vid in enumerate(ids):
        assert got[vid] == [ref[s][1][i] for s in range(2)]


def test_topk_matches_numpy_adc(emb):
    rows = emb.orderBy("vec_id").collect()
    ids = [r["vec_id"] for r in rows]
    vecs = [np.array(r["embedding"], dtype=np.float64) for r in rows]
    books = PQ.pq_train(emb, dim=8, m=2, k=4, iters=1)
    codes = PQ.pq_encode(emb, books)
    out = PQ.pq_topk(emb.where(F.col("vec_id") < 3), codes, books, k=2)
    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["adist"])
        for r in out.collect()
    }
    ref = _np_pq(ids, vecs, dim=8, m=2, k=4, iters=1)
    cents = {s: np.array(ref[s][0]) for s in ref}
    for q in range(3):
        qi = ids.index(q)
        dists = []
        for i, vid in enumerate(ids):
            d = sum(
                float(
                    ((vecs[qi][s * 4:(s + 1) * 4] - cents[s][ref[s][1][i]]) ** 2).sum()
                )
                for s in range(2)
            )
            dists.append((d, vid))
        dists.sort()
        for rank, (d, vid) in enumerate(dists[:2], start=1):
            nid, adist = got[(q, rank)]
            assert nid == vid
            assert abs(adist - d) < 1e-9


def test_train_rejects_indivisible_dim(emb):
    with pytest.raises(ValueError):
        PQ.pq_train(emb, dim=8, m=3)


def test_plan_broadcasts_and_no_python_udf(emb, monkeypatch):
    books = PQ.pq_train(emb, dim=8, m=2, k=4, iters=0)
    codes = PQ.pq_encode(emb, books)
    plan = (
        PQ.pq_topk(emb.where(F.col("vec_id") < 3), codes, books, k=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # Bounded query batch -> the ADC scan path: ONE MapInPandas pass
    # over the code table, NO join of any kind on the corpus side (the
    # LUT lives in the task, built from the broadcast query batch), no
    # corpus-sized posexplode, no row-at-a-time Python.
    assert "MapInPandas" in plan
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert "Generate" not in plan  # the m-fold posexplode is gone
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    # Forced-relational fallback (unbounded query side at scale): the
    # codebook + LUT joins must broadcast and stay JVM-side.
    monkeypatch.setenv("NET_SPIDER_LOCAL_ADC", "0")
    plan = (
        PQ.pq_topk(emb.where(F.col("vec_id") < 3), codes, books, k=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ivfpq_exhaustive_probe_equals_flat_adc(emb):
    # n_probe == n_cells: cell pruning is a no-op, so IVF-PQ must
    # reproduce pq_topk row for row (adist included) — the composition
    # changed the candidate set mechanics, not the scoring algebra.
    qs = emb.where(F.col("vec_id") < 3)
    books = PQ.pq_train(emb, dim=8, m=2, k=4, iters=1)
    codes = PQ.pq_encode(emb, books)
    flat = sorted(map(tuple, PQ.pq_topk(qs, codes, books, k=2).collect()))
    ivf = sorted(
        map(
            tuple,
            PQ.ivfpq_topk(
                qs, emb, dim=8, k=2, n_cells=4, n_probe=4,
                coarse_iters=1, m=2, k_codes=4, pq_iters=1,
            ).collect(),
        )
    )
    assert flat == ivf


def test_ivfpq_pruning_restricts_to_probed_cells(emb):
    # With n_probe < n_cells every returned neighbor must live in one
    # of its query's probed cells, and the result must equal the flat
    # ADC ranking restricted to those cells — pruning may change WHICH
    # neighbors are reachable, never their scores or relative order.
    from pyspark.sql.window import Window

    from net_spider_spark.pipeline import cluster as CL

    qs = emb.where(F.col("vec_id") < 3)
    n_cells, n_probe = 4, 2
    got = PQ.ivfpq_topk(
        qs, emb, dim=8, k=2, n_cells=n_cells, n_probe=n_probe,
        coarse_iters=1, m=2, k_codes=4, pq_iters=1,
    ).collect()

    cents, assigned = CL.kmeans_fit(emb, k=n_cells, iters=1)
    cell_of = {
        r["_id"]: r["cluster_id"] for r in assigned.collect()
    }
    cdf = CL._centroid_df(emb, cents)
    probes = {}
    q = qs.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("_qv"),
    )
    pw = Window.partitionBy("query_id").orderBy("_dist", "_cell")
    prows = (
        q.crossJoin(F.broadcast(cdf))
        .select(
            "query_id", F.col("cid").alias("_cell"),
            CL._sq_dist(F.col("_qv"), F.col("cv")).alias("_dist"),
        )
        .withColumn("_pr", F.row_number().over(pw))
        .where(F.col("_pr") <= n_probe)
        .collect()
    )
    for r in prows:
        probes.setdefault(r["query_id"], set()).add(r["_cell"])
    assert got, "pruned IVF-PQ returned nothing"
    for r in got:
        assert cell_of[r["neighbor_id"]] in probes[r["query_id"]]

    # flat ADC restricted to probed cells gives the same top-k
    books = PQ.pq_train(emb, dim=8, m=2, k=4, iters=1)
    codes = PQ.pq_encode(emb, books)
    all_pairs = PQ.pq_topk(qs, codes, books, k=10_000).collect()
    want = {}
    for r in sorted(
        all_pairs, key=lambda r: (r["query_id"], r["adist"], r["neighbor_id"])
    ):
        if cell_of[r["neighbor_id"]] in probes[r["query_id"]]:
            want.setdefault(r["query_id"], [])
            if len(want[r["query_id"]]) < 2:
                want[r["query_id"]].append(
                    (r["neighbor_id"], round(r["adist"], 9))
                )
    got_by_q = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        got_by_q.setdefault(r["query_id"], []).append(
            (r["neighbor_id"], round(r["adist"], 9))
        )
    assert got_by_q == want


def test_ivfpq_plan_broadcasts_and_stays_jvm_side(emb, monkeypatch):
    plan = (
        PQ.ivfpq_topk(
            emb.where(F.col("vec_id") < 3), emb, dim=8, k=2,
            n_cells=4, n_probe=2, coarse_iters=1, m=2, k_codes=4,
            pq_iters=1,
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    # Bounded query batch -> ADC scan: the probe subtree (crossJoin +
    # window) and the LUT join are gone — the index table streams
    # through the fused build pass then the scan pass, join-free; the
    # corpus ships codes and a cell id, never embeddings.
    assert "MapInPandas" in plan
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    # Forced-relational fallback: probes + LUT + codebooks broadcast,
    # no cartesian, no Python evaluators beyond the build pass.
    monkeypatch.setenv("NET_SPIDER_LOCAL_ADC", "0")
    plan = (
        PQ.ivfpq_topk(
            emb.where(F.col("vec_id") < 3), emb, dim=8, k=2,
            n_cells=4, n_probe=2, coarse_iters=1, m=2, k_codes=4,
            pq_iters=1,
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ivfpq_residual_beats_or_matches_raw_at_exhaustive_probe(emb):
    # Residual encoding spends the same code budget on the within-cell
    # spread; with exhaustive probing (pruning off) its top-1 self-hit
    # rate must be at least the raw encoding's — on any data, a
    # vector's residual quantizes no worse than the vector itself when
    # cells carry part of the position. Also pins determinism and the
    # (query, cell)-keyed LUT join returning full results.
    qs = emb.where(F.col("vec_id") < 10)

    def self_hits(residual):
        got = PQ.ivfpq_topk(
            qs, emb, dim=8, k=1, n_cells=4, n_probe=4,
            coarse_iters=1, m=2, k_codes=8, pq_iters=1,
            residual=residual,
        ).collect()
        assert len(got) == 10
        return sum(1 for r in got if r["neighbor_id"] == r["query_id"])

    raw, res = self_hits(False), self_hits(True)
    assert res >= raw


def test_ivfpq_residual_plan_stays_broadcast_jvm(emb, monkeypatch):
    plan = (
        PQ.ivfpq_topk(
            emb.where(F.col("vec_id") < 3), emb, dim=8, k=2,
            n_cells=4, n_probe=2, coarse_iters=1, m=2, k_codes=4,
            pq_iters=1, residual=True,
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    # Bounded query batch -> ADC scan (residual LUTs built per (query
    # chunk, cell) inside the task): join-free, no cartesian.
    assert "MapInPandas" in plan
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    monkeypatch.setenv("NET_SPIDER_LOCAL_ADC", "0")
    plan = (
        PQ.ivfpq_topk(
            emb.where(F.col("vec_id") < 3), emb, dim=8, k=2,
            n_cells=4, n_probe=2, coarse_iters=1, m=2, k_codes=4,
            pq_iters=1, residual=True,
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ivfpq_build_once_search_many(emb):
    # The production shape: one ivfpq_build, many ivfpq_search calls —
    # each must equal the composed ivfpq_topk for the same parameters,
    # and different query batches reuse the same index.
    idx = PQ.ivfpq_build(
        emb, dim=8, n_cells=4, coarse_iters=1, m=2, k_codes=4,
        pq_iters=1, residual=True,
    )
    for lo, hi in ((0, 3), (3, 6)):
        qs = emb.where(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
        )
        got = sorted(map(tuple, PQ.ivfpq_search(idx, qs, k=2, n_probe=2).collect()))
        want = sorted(
            map(
                tuple,
                PQ.ivfpq_topk(
                    qs, emb, dim=8, k=2, n_cells=4, n_probe=2,
                    coarse_iters=1, m=2, k_codes=4, pq_iters=1,
                    residual=True,
                ).collect(),
            )
        )
        assert got == want


def test_ivfpq_add_frozen_codebooks(emb):
    # Incremental add: build on the first half, add the second half
    # with FROZEN codebooks. The incremented index must (a) contain
    # every vector exactly once, (b) equal an index whose cells/codes
    # were computed directly from the same frozen books over the full
    # corpus, and (c) let a query find a planted second-half neighbor.
    first = emb.where(F.col("vec_id") < 40)
    second = emb.where(F.col("vec_id") >= 40)
    idx = PQ.ivfpq_build(
        first, dim=8, n_cells=4, coarse_iters=1, m=2, k_codes=4,
        pq_iters=1, residual=True,
    )
    inc = PQ.ivfpq_add(idx, second)
    assert inc.cells.count() == 80 and inc.codes.count() == 80
    assert inc.cells.select("neighbor_id").distinct().count() == 80

    # direct frozen-book encoding of the full corpus == union result
    direct = PQ.ivfpq_add(
        PQ.IvfPqIndex(
            idx.cells.limit(0), idx.codes.limit(0), idx.cents,
            idx.books, idx.dim, idx.m, idx.residual,
        ),
        emb,
    )
    assert sorted(map(tuple, inc.cells.collect())) == sorted(
        map(tuple, direct.cells.collect())
    )
    assert sorted(map(tuple, inc.codes.collect())) == sorted(
        map(tuple, direct.codes.collect())
    )

    # a second-half vector queried against the incremented index: with
    # n_probe=1 the probed cell is its own cell (same assign rule), and
    # within one cell its own codeword is the per-subspace argmin — so
    # its ADC distance must be MINIMAL (ties by code collision allowed,
    # outright self-miss not).
    q = emb.where(F.col("vec_id") == 50)
    got = PQ.ivfpq_search(inc, q, k=10_000, n_probe=1).collect()
    self_rows = [r for r in got if r["neighbor_id"] == 50]
    assert self_rows, "planted vector missing from its own cell"
    assert self_rows[0]["adist"] == min(r["adist"] for r in got)


def test_train_n_replays_the_md5_sample(emb):
    # Bounded-sample training (the FAISS recipe pq_train defaults to):
    # codebooks trained with train_n=n must equal the numpy spec run on
    # the bottom-n rows by md5('s42:sample:' || id) — the same portable
    # device the DuckDB oracles replay — and a train_n >= corpus must
    # be a no-op versus unbounded training.
    rows = emb.collect()
    ids = [r["vec_id"] for r in rows]
    vecs = [np.array(r["embedding"], dtype=float) for r in rows]
    n = 32
    order = sorted(
        range(len(ids)),
        key=lambda i: (
            hashlib.md5(f"s42:sample:{ids[i]}".encode()).hexdigest(),
            ids[i],
        ),
    )
    keep = sorted(order[:n])
    got = PQ.pq_train(emb, dim=8, m=4, k=4, iters=1, train_n=n)
    ref = _np_pq(
        [ids[i] for i in keep], [vecs[i] for i in keep],
        dim=8, m=4, k=4, iters=1,
    )
    for s, cid, cv in got:
        np.testing.assert_allclose(cv, ref[s][0][cid], rtol=1e-12)

    full = PQ.pq_train(emb, dim=8, m=4, k=4, iters=1, train_n=None)
    capped = PQ.pq_train(emb, dim=8, m=4, k=4, iters=1, train_n=10_000)
    assert [(s, c, [round(x, 12) for x in v]) for s, c, v in full] == [
        (s, c, [round(x, 12) for x in v]) for s, c, v in capped
    ]


def test_ivfpq_write_read_round_trip(emb, spark, tmp_path):
    # Persistence contract: a written-then-read index must search
    # identically to the in-memory one (the build is the corpus-scale
    # cost; ivfpq_write is what lets later sessions skip it), and a
    # day's-batch ivfpq_add on the LOADED index must equal add on the
    # original.
    base = emb.where(F.col("vec_id") < 60)
    batch = emb.where(F.col("vec_id") >= 60)
    q = emb.where(F.col("vec_id") < 3)
    idx = PQ.ivfpq_build(
        base, dim=8, n_cells=4, coarse_iters=1, m=4, k_codes=8,
        pq_iters=1, train_n=32, residual=True,
    )
    path = str(tmp_path / "ivfpq_idx")
    PQ.ivfpq_write(idx, path)
    loaded = PQ.ivfpq_read(spark, path)
    assert (loaded.dim, loaded.m, loaded.residual) == (8, 4, True)
    assert loaded.cents == idx.cents
    assert loaded.books == idx.books

    def res(ix):
        return sorted(
            (r["query_id"], r["neighbor_id"], r["adist"], r["rank"])
            for r in PQ.ivfpq_search(ix, q, k=3, n_probe=3).collect()
        )

    assert res(loaded) == res(idx)
    assert res(PQ.ivfpq_add(loaded, batch)) == res(PQ.ivfpq_add(idx, batch))

    with pytest.raises(Exception):
        PQ.ivfpq_write(idx, path)  # mode="error" must not clobber
    PQ.ivfpq_write(idx, path, mode="overwrite")
    assert res(PQ.ivfpq_read(spark, path)) == res(idx)

    bad = str(tmp_path / "bad_idx")
    PQ.ivfpq_write(idx, bad)
    spark.createDataFrame(
        [(99, 8, 4, True)], "version int, dim int, m int, residual boolean"
    ).write.mode("overwrite").parquet(f"{bad}/meta")
    with pytest.raises(ValueError):
        PQ.ivfpq_read(spark, bad)


def test_local_train_matches_distributed_loop(emb, monkeypatch):
    # The driver fast path (bounded train_n -> collect + numpy Lloyd's)
    # must reproduce the distributed loop's codebooks to well inside
    # the oracle's round(9) normalization: identical (sub, cid) keys
    # and centroids equal to 1e-9 (the paths differ only in the ORDER
    # partial sums combine, a last-bit effect).
    got_local = PQ.pq_train(emb, dim=8, m=4, k=4, iters=2, train_n=40)
    monkeypatch.setenv("NET_SPIDER_LOCAL_TRAIN", "0")
    got_dist = PQ.pq_train(emb, dim=8, m=4, k=4, iters=2, train_n=40)
    assert [(s, c) for s, c, _ in got_local] == [
        (s, c) for s, c, _ in got_dist
    ]
    for (_, _, v1), (_, _, v2) in zip(got_local, got_dist):
        np.testing.assert_allclose(v1, v2, rtol=0, atol=1e-9)


@pytest.mark.parametrize("residual", [False, True])
def test_fused_cells_codes_match_two_pass(emb, residual):
    # The fused single-pass build (_arrow_cells_codes) must emit the
    # exact cells and codes the two-pass chain (cluster._assign +
    # residual subtract + pq_encode) produces for the same frozen
    # centroids/codebooks — bitwise, adist included downstream.
    from net_spider_spark.pipeline import cluster as CL

    idx = PQ.ivfpq_build(
        emb, dim=8, n_cells=4, coarse_iters=1, m=2, k_codes=4,
        pq_iters=1, residual=residual, train_n=16,
    )
    assert idx.table is not None  # fast path taken for bigint ids
    vecs = emb.select(
        F.col("vec_id").alias("_id"),
        F.col("embedding").cast("array<double>").alias("_v"),
    )
    assigned = CL._assign(vecs, idx.cents)
    cells2 = sorted(
        (r["_id"], r["cluster_id"]) for r in assigned.collect()
    )
    assert sorted(map(tuple, idx.cells.collect())) == cells2
    if residual:
        cdf = CL._centroid_df(emb, idx.cents)
        src = assigned.join(
            F.broadcast(cdf), F.col("cluster_id") == F.col("cid")
        ).select(
            "_id", F.zip_with("_v", "cv", lambda x, y: x - y).alias("_rv")
        )
        codes2 = PQ.pq_encode(src, idx.books, id_col="_id", vec_col="_rv")
    else:
        codes2 = PQ.pq_encode(emb, idx.books)
    assert sorted(
        (r[0], tuple(r["codes"])) for r in idx.codes.collect()
    ) == sorted((r[0], tuple(r["codes"])) for r in codes2.collect())


def test_fused_search_skips_corpus_join(emb, monkeypatch):
    # With the fused index the candidate side must not plan a
    # corpus-sized codes-cells join. On the ADC-scan fast path there is
    # no join AT ALL; on the forced-relational path the only joins left
    # are broadcast (probes, LUT). SortMergeJoin in either plan would
    # mean the fusion regressed.
    idx = PQ.ivfpq_build(
        emb, dim=8, n_cells=4, coarse_iters=1, m=2, k_codes=4,
        pq_iters=1, train_n=16,
    )
    plan = (
        PQ.ivfpq_search(idx, emb.where(F.col("vec_id") < 3), k=2, n_probe=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
    assert "MapInPandas" in plan

    monkeypatch.setenv("NET_SPIDER_LOCAL_ADC", "0")
    plan = (
        PQ.ivfpq_search(idx, emb.where(F.col("vec_id") < 3), k=2, n_probe=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


@pytest.mark.parametrize("residual", [False, True])
def test_adc_scan_matches_relational_path(emb, residual, monkeypatch):
    # The driver-LUT ADC scan (one mapInPandas over the code table,
    # per-batch partial top-k) must reproduce the relational
    # posexplode + broadcast-LUT-join + aggregate path EXACTLY — rows,
    # ranks, and adist bitwise: the scan replays the same float64 left
    # folds in the same order (LUT term order, subspace sum order),
    # and partial top-k is a pure selection.
    qs = emb.where(F.col("vec_id") < 4)

    def run():
        books = PQ.pq_train(emb, dim=8, m=2, k=4, iters=1, train_n=32)
        codes = PQ.pq_encode(emb, books)
        flat = sorted(map(tuple, PQ.pq_topk(qs, codes, books, k=2).collect()))
        ivf = sorted(
            map(
                tuple,
                PQ.ivfpq_topk(
                    qs, emb, dim=8, k=2, n_cells=4, n_probe=2,
                    coarse_iters=1, m=2, k_codes=4, pq_iters=1,
                    residual=residual, train_n=32,
                ).collect(),
            )
        )
        return flat, ivf

    fast = run()
    monkeypatch.setenv("NET_SPIDER_LOCAL_ADC", "0")
    rel = run()
    assert fast == rel


def test_adc_scan_guard_falls_back(emb, monkeypatch):
    # Over-budget query batches (and duplicate query ids, which the
    # relational LUT join keys tolerate but a per-row LUT index would
    # conflate) must take the relational path — same results either way.
    from net_spider_spark.pipeline.pq import _adc_query_rows

    monkeypatch.setenv("NET_SPIDER_ADC_MAX_QUERIES", "3")
    assert (
        _adc_query_rows(
            emb.where(F.col("vec_id") < 5), "vec_id", "embedding", 8, "t"
        )
        is None
    )
    books = PQ.pq_train(emb, dim=8, m=2, k=4, iters=1, train_n=32)
    codes = PQ.pq_encode(emb, books)
    over = sorted(
        map(
            tuple,
            PQ.pq_topk(
                emb.where(F.col("vec_id") < 5), codes, books, k=2
            ).collect(),
        )
    )
    monkeypatch.setenv("NET_SPIDER_ADC_MAX_QUERIES", "1024")
    under = sorted(
        map(
            tuple,
            PQ.pq_topk(
                emb.where(F.col("vec_id") < 5), codes, books, k=2
            ).collect(),
        )
    )
    assert over == under


def test_adc_scan_byte_budget_falls_back(emb, monkeypatch):
    # Row count alone mis-sizes wide rows: the BYTE estimate must also
    # gate the fast path (a handful of very-high-dim query vectors is
    # still an unbounded driver collect + broadcast otherwise), with
    # identical results on the relational path it falls back to.
    from net_spider_spark.pipeline.pq import _adc_query_rows

    monkeypatch.setenv("NET_SPIDER_ADC_MAX_BYTES", "16")  # < one vector
    assert (
        _adc_query_rows(
            emb.where(F.col("vec_id") < 5), "vec_id", "embedding", 8, "t"
        )
        is None
    )
    books = PQ.pq_train(emb, dim=8, m=2, k=4, iters=1, train_n=32)
    codes = PQ.pq_encode(emb, books)
    capped = sorted(
        map(
            tuple,
            PQ.pq_topk(
                emb.where(F.col("vec_id") < 5), codes, books, k=2
            ).collect(),
        )
    )
    monkeypatch.delenv("NET_SPIDER_ADC_MAX_BYTES")
    fast = sorted(
        map(
            tuple,
            PQ.pq_topk(
                emb.where(F.col("vec_id") < 5), codes, books, k=2
            ).collect(),
        )
    )
    assert capped == fast
    # duplicate ids -> fallback
    dup = emb.where(F.col("vec_id") < 2).unionAll(
        emb.where(F.col("vec_id") < 1)
    )
    assert _adc_query_rows(dup, "vec_id", "embedding", 8, "t") is None
