"""Physical-plan regression tests: pin the plan *shapes* that make the
operators survive a 100x scale-up, so a refactor that silently
introduces a cartesian product, an unnecessary shuffle, or an unpruned
scan fails CI — not the cluster.

These assert on `explain` output, not timings, so they are stable on a
loaded box.
"""

import pytest
from pyspark.sql import functions as F

from net_spider_spark import ingest
from net_spider_spark.interval import Interval
from net_spider_spark.pipeline import curate as CU
from net_spider_spark.pipeline import dedup as D


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"some document body {i} " + ("dup phrase " * (i % 4)), f"src{i % 3}")
        for i in range(60)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_partitioned_history_scan_prunes(spark, tmp_path):
    findings = spark.createDataFrame(
        [(i, f"n{i % 5}", 86_400_000 * (i % 4) + i, None, None, None, {}, [])
         for i in range(40)],
        "finding_id long, subject_node string, found_at long, "
        "tz_offset_min int, tz_summer_only boolean, tz_name string, "
        "node_attrs map<string,string>, "
        "neighbor_links array<struct<target_node:string,link_state:string,"
        "link_attrs:map<string,string>>>",
    )
    path = str(tmp_path / "hist")
    ingest.write_findings(findings, path)
    iv = Interval.since(86_400_000 * 2)
    pruned = ingest.read_findings(spark, path, interval=iv)
    plan = plan_of(pruned)
    # Day partitions outside the interval must not be scanned: the
    # partition filter reaches the FileSourceScan.
    assert "found_day" in plan and "PartitionFilters: [" in plan
    assert pruned.count() == 20  # days 2 and 3 only


def test_codegen_only_ops_have_no_exchange(docs):
    # PII scrub, chunking, hash sampling, sharding: pure narrow
    # expressions — any Exchange in the plan is a regression.
    for df in (
        CU.pii_scrub(docs),
        CU.chunk_documents(docs),
        CU.hash_sample(docs, 0.5),
        CU.shuffle_shards(docs),
    ):
        plan = plan_of(df)
        assert "Exchange" not in plan, plan
        # executedPlan toString marks whole-stage-codegen spans "*(n)"
        assert "*(" in plan, plan


def test_no_cartesian_products_on_scale_paths(docs, spark):
    # Decontamination must meet on the gram-hash equi-join, and the
    # default embedding near-dup path on LSH buckets — never all-pairs.
    train = docs.where(F.col("doc_id") % 5 != 0)
    ev = docs.where(F.col("doc_id") % 5 == 0)
    deconta = CU.decontaminate(train, ev, n=4)
    emb = spark.createDataFrame(
        [(i, [float((i * j) % 7) - 3.0 for j in range(8)]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    near = D.embedding_near_dup_groups(emb, threshold=0.9)
    for df in (deconta, near):
        plan = plan_of(df)
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan


def test_repetition_stats_shuffles_on_doc_key_only(docs):
    # Two explode->groupBy aggregations: every HashAggregate keys on
    # doc_id — a global or per-token-only aggregation would be wrong
    # and a window-sort plan would not scale.
    plan = plan_of(CU.repetition_stats(docs))
    assert "HashAggregate" in plan
    assert "Window" not in plan


def test_tpch_q18_broadcasts_qualifying_orders(spark, tmp_path):
    # Q18: the HAVING-filtered order set is tiny relative to lineitem;
    # it must reach orders via a broadcast join, never a sort-merge
    # shuffle of the fact table against it.
    import os

    import __spark_entry__ as em

    sf_dir = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
    if not os.path.exists(f"{sf_dir}/lineitem.parquet"):
        pytest.skip("no testdata")
    plan = plan_of(em.q_tpch_q18(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_topk_per_source_single_window_exchange(spark, tmp_path):
    # Per-source top-k: exactly one hashpartitioning exchange (for the
    # window), no global sort over the corpus.
    import os

    import __spark_entry__ as em

    sf_dir = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
    if not os.path.exists(f"{sf_dir}/documents.parquet"):
        pytest.skip("no testdata")
    plan = plan_of(em.q_curate_topk_per_source(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange rangepartitioning" not in plan  # no global sort


def test_funnel_stage_filters_reach_scan(spark):
    # The per-stage event_type filter must push into the parquet scan:
    # a funnel that reads the whole event log per level is wrong.
    import os

    import __spark_entry__ as em

    sf_dir = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
    if not os.path.exists(f"{sf_dir}/events.parquet"):
        pytest.skip("no testdata")
    plan = plan_of(em.q_events_funnel(spark, sf_dir))
    assert "PushedFilters: [" in plan and "event_type" in plan


def test_funnel_level_joins_broadcast(spark):
    # Funnel shape census: the per-level (user, t) set shrinks
    # monotonically, so every level join must be a broadcast —
    # sort-merge or cartesian there means the whole event log is
    # being shuffled per stage.
    import os

    import __spark_entry__ as em

    sf_dir = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
    if not os.path.exists(f"{sf_dir}/events.parquet"):
        pytest.skip("no testdata")
    plan = plan_of(em.q_events_funnel(spark, sf_dir))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Exchange rangepartitioning" not in plan  # no global sort
    # one user-keyed aggregate exchange per funnel level + the base
    # stage; per-stage counts collapse to SinglePartition rollups
    assert plan.count("BroadcastHashJoin") == 3
    assert plan.count("Exchange hashpartitioning") == 5


def test_retention_hash_agg_only_shape(spark):
    # Retention census: distinct-activity + min-bucket + cell counts
    # are all hash aggregates on user/cohort keys; cohort-size join is
    # broadcast. No window, no sort, no cartesian anywhere.
    import os

    import __spark_entry__ as em

    sf_dir = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
    if not os.path.exists(f"{sf_dir}/events.parquet"):
        pytest.skip("no testdata")
    plan = plan_of(em.q_events_retention(spark, sf_dir))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Exchange rangepartitioning" not in plan
    assert "Window" not in plan
    assert plan.count("BroadcastHashJoin") == 2
    assert plan.count("Exchange hashpartitioning") == 6


def test_embed_truncate_no_exchange(spark):
    # Pure projection over the embeddings scan — any Exchange is a
    # regression.
    import os

    import __spark_entry__ as em

    sf_dir = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
    if not os.path.exists(f"{sf_dir}/embeddings.parquet"):
        pytest.skip("no testdata")
    plan = plan_of(em.q_embed_truncate(spark, sf_dir))
    assert "Exchange" not in plan


def test_incremental_links_single_aggregate(spark):
    # The two-batch fold must stay one aggregate tree over the union —
    # no join of state against batch (the fold IS the aggregate).
    import os

    import __spark_entry__ as em

    sf_dir = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
    if not os.path.exists(f"{sf_dir}/events.parquet"):
        pytest.skip("no testdata")
    plan = plan_of(em.q_snapshot_incremental_links(spark, sf_dir))
    assert "Join" not in plan  # union + aggregates only


def test_set_based_dedup_never_explodes_shingles(docs):
    # The batch near-dup path must stay on the narrow per-doc-set
    # pipeline: the ONLY generator allowed is the signature unpivot
    # (stack); an `explode` in the candidate or verify plan means the
    # exploded (doc, shingle) inverted index crept back in, multiplying
    # the dominant shuffle at corpus scale.
    sets = D.doc_shingle_sets(docs)
    cand = D.minhash_candidates(D.minhash_signatures_sets(sets))
    plan = plan_of(cand)
    assert "explode" not in plan
    verify = D.jaccard_verify_sets(cand, sets, threshold=0.2)
    assert "explode" not in plan_of(verify)


def test_span_removal_no_range_join(docs):
    # Coverage marking must be equi-joins (gram set, then doc-keyed
    # interval attach), never a range/cartesian join of positions
    # against spans — and no per-position explosion at all since the
    # merged-interval rewrite (positions are tested inside codegen).
    df = D.remove_duplicate_spans(docs, n=3, min_docs=2)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the only explode left is the gram posexplode (one per token); the
    # explode(sequence(start..start+n-1)) position explode must stay
    # gone (the gram builder's transform(sequence(...)) is not an
    # explode and is fine)
    assert "explode(sequence" not in plan.lower().replace(" ", "")
    # the doc-keyed join streams the wide token arrays un-sorted: a
    # sort-merge join here sorts every doc's token array (the wide-row
    # sort hazard); the spans build side hashes instead
    exec_plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in exec_plan or "BroadcastHashJoin" in exec_plan
    assert "SortMergeJoin [doc_id" not in exec_plan


def test_star_join_broadcasts_all_dims(spark):
    # tpch_q9_nation_profit: every dimension joins as a broadcast hash
    # join — the lineitem fact must never shuffle on a dimension key
    import __spark_entry__ as entry_mod

    df = entry_mod.q_tpch_q9_nation_profit(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan


def test_mixture_sample_rank_never_spans_a_source(docs):
    # The quota-rank window must partition by (source, key-prefix
    # bucket), never by source alone: a whole-source window partition
    # is a single-task multi-TB external sort at 100 TB (the quota is
    # a non-literal column, so WindowGroupLimit cannot rescue it).
    for df in (
        CU.mixture_sample(docs, {"src0": 2.0, "src1": 1.0}),
        CU.temperature_mixture_sample(docs, alpha=0.5),
    ):
        plan = plan_of(df)
        specs = [
            seg for seg in plan.split("windowspecdefinition(")[1:]
        ]
        assert specs, "expected a window in the quota-rank plan"
        for spec in specs:
            assert "_bkt" in spec.split(")")[0] + spec[:200], (
                "window partition spec must include the _bkt bucket"
            )
        # the shuffle feeding the window hashes on both keys
        assert "hashpartitioning(source" in plan
        assert "_bkt" in plan.split("hashpartitioning(source", 1)[1][:80]


def test_boilerplate_removal_plan(docs):
    # Marking must be an equi-join on the trimmed line (hash or
    # broadcast), never cartesian/nested-loop, and the only explode is
    # the one line posexplode.
    df = D.remove_boilerplate_lines(docs, min_docs=2)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Generate explode") <= plan.count("explode")
    exec_plan = df._jdf.queryExecution().executedPlan().toString()
    assert "HashJoin" in exec_plan  # broadcast or shuffled-hash, either


def test_bpe_encode_plan_stays_in_codegen(docs):
    # Learned-BPE encoding is a chain of literal replaces per pretoken:
    # one projection, zero Python evaluators, zero Exchange.
    from net_spider_spark.pipeline import text as TX

    merges = [(1, "d", "u", "du", 9), (2, "du", "p", "dup", 9)]
    df = TX.bpe_encode_stats(docs, merges)
    plan = plan_of(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan


def test_quality_model_scoring_plan_stays_in_codegen(docs):
    # Scoring under fixed weights is one narrow projection.
    from net_spider_spark.pipeline import text as TX

    df = TX.quality_model_scores(docs, weights=[0.1, 0.2, 0.3, 0.4, 0.5])
    plan = plan_of(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan


def test_phash_candidates_plan_no_cartesian(spark):
    # Banded candidate join must be an equi-join on (band, sig) with
    # the hot-bucket anti-join — never cartesian/nested-loop.
    from net_spider_spark.pipeline import dedup as DD

    hashes = spark.createDataFrame(
        [(i, (i * 2654435761) % (1 << 63)) for i in range(50)],
        "media_id long, phash long",
    )
    df = DD.image_phash_dedup(hashes, max_hamming=2)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_decontaminate_fuzzy_plan_no_cartesian(spark, docs):
    # Banded probe + verify must stay equi-joins end to end: a
    # cartesian (train x eval) regression is exactly what this
    # operator exists to avoid.
    from net_spider_spark.pipeline import curate as CU

    train = docs.where(F.col("doc_id") % 5 != 0)
    eval_df = docs.where(F.col("doc_id") % 5 == 0)
    df = CU.decontaminate_fuzzy(train, eval_df)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_rule_filters_pure_projection(docs):
    # Gopher and C4 rule filters are scan-shaped: no shuffle, no
    # Python eval — the whole document scan is one narrow stage.
    from net_spider_spark.pipeline import text as TX

    for df in (TX.gopher_rules(docs), TX.c4_clean(docs)):
        plan = plan_of(df)
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


def test_robots_filter_no_window_no_cartesian(spark):
    # The longest-match resolution is a max-struct AGGREGATE, never a
    # window over the frontier, and the rules join is an equi-join on
    # host — no cartesian, no per-URL sort.
    from net_spider_spark.pipeline import url as U

    urls = spark.createDataFrame(
        [(i, f"http://h{i % 3}.test/p/{i}") for i in range(50)],
        "doc_id long, url string",
    )
    rules = spark.createDataFrame(
        [(f"h{h}.test", False, "/p/") for h in range(3)],
        "host string, allow boolean, path_prefix string",
    )
    plan = plan_of(U.robots_filter(urls, rules))
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan


def test_host_link_graph_single_aggregate_exchange(spark):
    # extract_links is a projection + generator; the only shuffle is
    # the final (src, dst) hash aggregate (plus AQE reads of it).
    from net_spider_spark.pipeline import url as U

    pages = spark.createDataFrame(
        [(i, f'<a href="http://h{(i + 1) % 3}.test/x">a</a>',
          f"http://h{i % 3}.test/p") for i in range(50)],
        "doc_id long, html string, url string",
    )
    plan = plan_of(U.host_link_graph(U.extract_links(pages)))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") <= 1


def test_wordpiece_encode_single_arrow_stage(docs):
    # The greedy encoder is ONE mapInPandas over a projection: no
    # shuffle before the Arrow stage, exactly one Python boundary.
    from net_spider_spark.pipeline import text as TX

    df = TX.wordpiece_encode_stats(docs, ["a", "b", "so", "me"])
    plan = plan_of(df)
    assert plan.count("MapInPandas") == 1
    assert "Exchange" not in plan


def test_crawl_frontier_rules_broadcast(spark):
    # In the composed frontier pipeline the per-URL side never carries
    # a cartesian; robots rules reach the frontier as a broadcast (the
    # rule table is tiny by construction).
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["pipeline_crawl_frontier"](
        spark, "/root/testdata/sf0.001"
    )
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_bench_scale_guard_paths_pinned(spark):
    # Pin which side of the driver-local guard each guarded HEADLINE
    # query takes at the BENCH scale factor (sf0.1). A silent flip
    # between rounds makes bench walls incomparable (round-9 lesson:
    # j5_reachability's counters changed with no operator edit). Any
    # change to sizing.estimated_bytes / thresholds that moves one of
    # these decisions must consciously update this pin.
    import os

    import __spark_entry__ as em
    from net_spider_spark import sizing

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if not os.path.exists(f"{sf_dir}/events.parquet"):
        pytest.skip("no sf0.1 testdata")
    expected = {
        "j5_reachability": [("bfs", True)],
        "graph_components": [("components", True)],
        "graph_pagerank": [("pagerank", True)],
        "graph_kcore": [("kcore", True)],
        "graph_sssp": [("sssp", True)],
        # forced-distributed twins: the fused count+width guard logs
        # their row-threshold refusal (local=False) — the two-step form
        # short-circuited before the byte probe and logged nothing, so
        # a threshold refusal was invisible in bench.py's paths record.
        "j5_reachability_dist": [("bfs", False)],
        "graph_components_dist": [("components", False)],
    }
    qs = em.queries()
    for name, want in expected.items():
        sizing.DECISION_LOG.clear()
        qs[name](spark, sf_dir)  # guard fires at build time
        got = [(d["tag"], d["local"]) for d in sizing.DECISION_LOG]
        assert got == want, f"{name}: guard path flipped: {got} != {want}"


def test_synth_decode_spread_across_cores(spark):
    # The sf tables are single parquet files (one scan split at every
    # sf), so the heavy payload synth+decode queries must round-robin
    # their parameter rows across the session before the mapInPandas
    # stage — otherwise the whole render+decode runs in ONE task
    # regardless of core count (measured 8.5 s -> 3.6 s on
    # dedup_image_phash at sf0.1). Pin the exchange and that it only
    # carries the parameter projection, not payload bytes.
    import __spark_entry__ as entry_mod

    # With enough rows for the width cap not to bind, the round-robin
    # exchange appears below the Python stage (no payload column
    # exists yet when rows are spread).
    from net_spider_spark import sizing

    wide_n = sizing.SPREAD_ROWS_PER_TASK * 1000
    ev = (
        entry_mod._events_typed(spark, "/root/testdata/sf0.001")
        .where(F.col("event_id") % 25 == 21)
        .select("event_id")
    )
    plan = plan_of(entry_mod._synth_class_media(ev, n_rows=wide_n))
    assert "RoundRobinPartitioning" in plan, "class-media spread lost"
    assert plan.index("RoundRobinPartitioning") > plan.index(
        "MapInPandas"
    ), "exchange above the synth stage"


def test_replay_state_partitions_scale_adaptive():
    # Stateful-replay shuffle width follows the SOURCE size, floored
    # for compute parallelism and capped by the session parallelism —
    # never a constant tuned to one core count (a 32-wide state layout
    # for kilobytes of state measured ~2x the whole replay wall).
    import __spark_entry__ as entry_mod

    class _SC:
        defaultParallelism = 32

    class _Spark:
        sparkContext = _SC()

    f = entry_mod._replay_state_partitions
    assert f(_Spark(), 2 << 20) == 8          # 2 MB file -> floor
    assert f(_Spark(), 100 << 30) == 32       # 100 GB -> capped at dp
    assert f(_Spark(), None) == 32            # unknown -> prior cap
    _SC.defaultParallelism = 4
    assert f(_Spark(), 2 << 20) == 4          # floor respects small dp
    _SC.defaultParallelism = 32

    import os

    os.environ["SPARK_GRAFT_STREAM_STATE_PARTS"] = "12"
    try:
        assert f(_Spark(), 2 << 20) == 12     # deployment override
    finally:
        del os.environ["SPARK_GRAFT_STREAM_STATE_PARTS"]


def test_spread_width_row_count_aware():
    # Compute-spread width is capped at ceil(n / rows_per_task) when
    # the caller knows the row count: 32 tasks under a few thousand
    # rows is pure scheduling overhead (several spread queries ran
    # FASTER at 8 cores than 32 — round-11 verdict item 3). At corpus
    # scale the cap never binds, so a real cluster keeps full width.
    from net_spider_spark import sizing

    class _SC:
        defaultParallelism = 32

    class _Spark:
        sparkContext = _SC()

    rpt = sizing.SPREAD_ROWS_PER_TASK
    assert sizing.spread_width(_Spark(), None) == 32       # no hint
    assert sizing.spread_width(_Spark(), 0) == 1           # empty input
    assert sizing.spread_width(_Spark(), rpt * 4) == 4     # capped
    assert sizing.spread_width(_Spark(), rpt * 1000) == 32  # corpus scale
    _SC.defaultParallelism = 8
    assert sizing.spread_width(_Spark(), rpt * 1000) == 8  # dp bound
    _SC.defaultParallelism = 32


def test_spread_width_reaches_media_plans(spark):
    # The media queries' spread exchanges carry the footer-derived
    # width hint: at sf0.001 the %25 filters keep ~40 event rows, so
    # the spread collapses to ONE task (Catalyst elides the 1-wide
    # round-robin exchange entirely) instead of defaultParallelism
    # tasks of scheduling overhead.
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    plan = plan_of(qs["multimodal_png_decode"](spark, "/root/testdata/sf0.001"))
    assert "RoundRobinPartitioning" not in plan, "tiny input over-spread"
    # an explicit mid-size hint produces exactly the capped width
    from net_spider_spark import sizing

    ev = (
        entry_mod._events_typed(spark, "/root/testdata/sf0.001")
        .select("event_id")
    )
    plan = plan_of(
        entry_mod._spread_ids(ev, n_rows=sizing.SPREAD_ROWS_PER_TASK * 2)
    )
    assert "RoundRobinPartitioning(2)" in plan, "width hint not applied"
