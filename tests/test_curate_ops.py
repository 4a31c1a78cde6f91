"""Curation-operator behavior tests: planted repetition/PII must be
detected, packing must respect the window invariants, sampling must be
deterministic and correctly sized, chunks must reassemble to the
document."""

import hashlib

import pytest
from pyspark.sql import functions as F

from net_spider_spark.pipeline import curate as CU


@pytest.fixture(scope="module")
def docs(spark):
    spammy = "buy now\nbuy now\nbuy now\nlimited offer\nbuy now"
    clean = "first line of prose\nsecond line entirely different\nthird one too"
    repeated_tok = "spam spam spam spam spam spam spam spam spam wonderful"
    rows = [(1, spammy), (2, clean), (3, repeated_tok), (4, "")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_stats_planted(docs):
    got = {r["doc_id"]: r for r in CU.repetition_stats(docs).collect()}
    # spammy: 5 lines, "buy now" x4 -> 3 duplicate occurrences beyond
    # the distinct set of 2.
    assert got[1]["n_lines"] == 5
    assert got[1]["dup_line_frac"] == pytest.approx(3 / 5)
    assert got[1]["dup_line_char_frac"] == pytest.approx(
        (4 * 7) / (4 * 7 + 13)
    )
    assert got[2]["dup_line_frac"] == 0.0
    assert got[3]["top_token_frac"] == pytest.approx(9 / 10)
    # empty doc: all-zero signals, still present in the output
    assert got[4]["n_lines"] == 0 and got[4]["dup_line_frac"] == 0.0


def test_pack_documents_window_invariants(spark):
    # 100 docs of 10 tokens each, one group -> packs of exactly 5 docs.
    rows = [(i, " ".join(["tok"] * 10)) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    packed = CU.pack_documents(df, window_tokens=50, n_groups=1).collect()
    by_pack = {}
    for r in packed:
        by_pack.setdefault(r["pack_id"], []).append(r)
    assert len(by_pack) == 20
    for members in by_pack.values():
        assert len(members) == 5
        assert sorted(m["pack_pos"] for m in members) == [0, 10, 20, 30, 40]
    # determinism: same input -> same assignment
    again = CU.pack_documents(df, window_tokens=50, n_groups=1).collect()
    assert {(r["doc_id"], r["pack_id"]) for r in again} == {
        (r["doc_id"], r["pack_id"]) for r in packed
    }


def test_pack_documents_groups_are_independent(spark):
    rows = [(i, "a b c") for i in range(64)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    packed = CU.pack_documents(df, window_tokens=6, n_groups=4).collect()
    # doc_id % 4 determines the group; pack_ids never collide across groups
    for r in packed:
        assert r["pack_id"] >> 40 == r["doc_id"] % 4


def test_hash_sample_deterministic_and_sized(spark):
    df = spark.createDataFrame(
        [(i, "x") for i in range(2000)], "doc_id long, text string"
    )
    got = sorted(r["doc_id"] for r in CU.hash_sample(df, 0.25).collect())
    # binomial(2000, 0.25): allow 5 sigma ~ +-97
    assert 400 < len(got) < 600
    assert got == sorted(r["doc_id"] for r in CU.hash_sample(df, 0.25).collect())
    # membership matches the md5 definition exactly
    expect = [
        i
        for i in range(2000)
        if hashlib.md5(f"s42:{i}".encode()).hexdigest()[:4] < "4000"
    ]
    assert got == expect


def test_stratified_sample_k_per_stratum(spark):
    rows = [(i, "en" if i % 3 else "de", "t") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = CU.stratified_sample(df, "lang", k=10).collect()
    by_lang = {}
    for r in got:
        by_lang.setdefault(r["lang"], []).append(r["sample_rank"])
    assert sorted(by_lang["en"]) == list(range(1, 11))
    assert sorted(by_lang["de"]) == list(range(1, 11))


def test_pii_scrub_planted(spark):
    text = (
        "contact alice@example.com or bob.smith@corp.co.uk, "
        "server at 10.0.0.1, call 555-123-4567 now"
    )
    df = spark.createDataFrame([(1, text), (2, "no pii here")],
                               "doc_id long, text string")
    got = {r["doc_id"]: r for r in CU.pii_scrub(df).collect()}
    assert got[1]["n_emails"] == 2
    assert got[1]["n_ips"] == 1
    assert got[1]["n_phones"] == 1
    s = got[1]["scrubbed_text"]
    assert "<EMAIL>" in s and "<IP>" in s and "<PHONE>" in s
    assert "alice" not in s and "10.0.0.1" not in s and "555-123" not in s
    assert got[2]["scrubbed_text"] == "no pii here"
    assert got[2]["n_emails"] == 0


def test_shuffle_shards_uniform_and_stable(spark):
    df = spark.createDataFrame(
        [(i, "x") for i in range(4096)], "doc_id long, text string"
    )
    got = CU.shuffle_shards(df, n_shards=16).collect()
    counts = {}
    for r in got:
        assert 0 <= r["shard"] < 16
        counts[r["shard"]] = counts.get(r["shard"], 0) + 1
    # 4096/16 = 256 expected; 5 sigma ~ +-78
    assert all(170 < c < 340 for c in counts.values())
    # shard derives from the md5 key exactly
    for r in got[:50]:
        key = hashlib.md5(f"s42:{r['doc_id']}".encode()).hexdigest()
        assert r["sort_key"] == key
        assert r["shard"] == int(key[:2], 16) % 16


def test_chunks_reassemble(spark):
    text = "".join(chr(ord("a") + (i % 26)) for i in range(730))
    df = spark.createDataFrame([(1, text), (2, "short"), (3, "")],
                               "doc_id long, text string")
    rows = CU.chunk_documents(df, chunk_chars=200, overlap=50).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    # stride 150: starts 0,150,...,600 -> 5 chunks
    assert [r["chunk_idx"] for r in c1] == [0, 1, 2, 3, 4]
    assert all(r["chunk_len"] == 200 for r in c1[:-1])
    assert c1[-1]["chunk_len"] == 730 - 600
    # overlap consistency: chunk i's last 50 chars == chunk i+1's first 50
    for a, b in zip(c1, c1[1:]):
        assert a["chunk_text"][150:] == b["chunk_text"][:50]
    # stripping the 50-char overlap reassembles the document
    assert c1[0]["chunk_text"] + "".join(r["chunk_text"][50:] for r in c1[1:]) == text
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_text"] == "short"
    assert len(by_doc[3]) == 1 and by_doc[3][0]["chunk_len"] == 0


def test_chunk_overlap_validation(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        CU.chunk_documents(df, chunk_chars=100, overlap=100)


def test_decontaminate_planted(spark):
    bench = "the quick brown fox jumps over the lazy dog tonight"
    train = spark.createDataFrame(
        [
            (1, f"intro text then {bench} and a conclusion"),  # embeds benchmark
            (2, "completely unrelated prose about spark plans and shuffles ok"),
            (3, "the quick brown fox jumps over something else entirely here"),
            (4, "tiny"),  # < n tokens -> zero grams, clean
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame([(100, bench)], "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in CU.decontaminate(train, eval_df, n=8).collect()
    }
    assert got[1]["contaminated"] and got[1]["n_hit_grams"] >= 1
    assert not got[2]["contaminated"] and got[2]["n_hit_grams"] == 0
    # shares a 7-token prefix but no full 8-gram
    assert not got[3]["contaminated"]
    assert got[4]["n_grams"] == 0 and not got[4]["contaminated"]
    # threshold above doc 1's hit ratio suppresses the flag
    ratio = got[1]["hit_ratio"]
    again = {
        r["doc_id"]: r
        for r in CU.decontaminate(train, eval_df, n=8, threshold=ratio).collect()
    }
    assert not again[1]["contaminated"]


def test_mixture_sample_quotas_and_determinism(spark):
    rows = [(i, "web" if i < 600 else ("code" if i < 900 else "books"), "t")
            for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    # weights 1:1 with 600 web / 300 code available -> scale limited by
    # code: 300/0.5=600 -> 300 each; books dropped (not in weights).
    got = CU.mixture_sample(df, {"web": 1.0, "code": 1.0}).collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    assert len(by_src["web"]) == 300 and len(by_src["code"]) == 300
    assert "books" not in by_src
    again = CU.mixture_sample(df, {"web": 1.0, "code": 1.0}).collect()
    assert {r["doc_id"] for r in again} == {r["doc_id"] for r in got}
    # skewed weights: web:code = 3:1 -> code-limited scale 300/0.25=1200
    # -> 900 web? no: 1200*0.75=900 > 600 available... scale is
    # min(600/0.75, 300/0.25) = 800 -> 600 web, 200 code.
    skew = CU.mixture_sample(df, {"web": 3.0, "code": 1.0}).collect()
    n_web = sum(1 for r in skew if r["source"] == "web")
    n_code = sum(1 for r in skew if r["source"] == "code")
    assert (n_web, n_code) == (600, 200)
    with pytest.raises(ValueError):
        CU.mixture_sample(df, {})


def test_write_training_shards_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(500)], "doc_id long, text string"
    )
    path = str(tmp_path / "shards")
    CU.write_training_shards(df, path, n_shards=8)
    back = spark.read.parquet(path)
    # lossless: every doc in exactly one shard
    assert back.count() == 500
    assert back.select("doc_id").distinct().count() == 500
    assert back.select("shard").distinct().count() == 8
    # within each shard file, rows are stored in sort_key order
    import glob

    for shard_dir in glob.glob(f"{path}/shard=*"):
        pdf = spark.read.parquet(shard_dir).toPandas()
        keys = list(pdf["sort_key"])
        assert keys == sorted(keys)
    # deterministic: rewriting yields the identical assignment
    path2 = str(tmp_path / "shards2")
    CU.write_training_shards(df, path2, n_shards=8)
    a = {(r["doc_id"], r["shard"]) for r in back.collect()}
    b = {(r["doc_id"], r["shard"])
         for r in spark.read.parquet(path2).collect()}
    assert a == b


def test_mixture_with_repetition_quotas_and_evenness(spark):
    rows = [(i, "web" if i < 600 else ("code" if i < 900 else "books"), "t")
            for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    # 2:1 over (web, code) at target 1200 -> quotas 800/400. web has
    # 600 docs -> 200 repeat once; code has 300 -> 100 repeat once.
    got = CU.mixture_sample_with_repetition(
        df, {"web": 2.0, "code": 1.0}, target_total=1200
    ).collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r["source"], []).append(r)
    assert len(by_src["web"]) == 800 and len(by_src["code"]) == 400
    assert "books" not in by_src
    # copies spread maximally evenly: every doc 1 or 2 copies
    from collections import Counter

    for src, rows_ in by_src.items():
        copies = Counter(r["doc_id"] for r in rows_)
        assert set(copies.values()) <= {1, 2}, src
        # epoch indices are 0..n-1 per doc
        for d, n in copies.items():
            eps = sorted(r["epoch"] for r in rows_ if r["doc_id"] == d)
            assert eps == list(range(n))
    # heavily upsampled source: 10x the corpus
    big = CU.mixture_sample_with_repetition(
        df.where("source = 'code'"), {"code": 1.0}, target_total=3100
    ).collect()
    copies = Counter(r["doc_id"] for r in big)
    assert len(big) == 3100
    assert set(copies.values()) <= {10, 11}
    # downsample degenerates to mixture_sample membership
    down = CU.mixture_sample_with_repetition(
        df, {"web": 1.0, "code": 1.0}, target_total=400
    ).collect()
    assert all(r["epoch"] == 0 for r in down)
    base = CU.mixture_sample(df, {"web": 1.0, "code": 1.0})
    down_ids = {r["doc_id"] for r in down}
    # mixture_sample keeps 300+300 (scale-limited); repetition mode
    # targets 200+200 -- its picks must be the md5-smallest PREFIX of
    # the scale-limited sample per source
    base_ranked = {(r["source"], r["mix_rank"]): r["doc_id"]
                   for r in base.collect()}
    want = {v for (s, rk), v in base_ranked.items() if rk <= 200}
    assert down_ids == want
    with pytest.raises(ValueError):
        CU.mixture_sample_with_repetition(df, {"web": 1.0}, target_total=0)


def test_pack_documents_partial_token_counts_keeps_all_docs(spark):
    """Regression (r8 advice): a counts table missing some ids must
    not silently drop those documents — they pack with n_tokens = 0,
    matching the oracle's LEFT JOIN + coalesce shape."""
    from net_spider_spark.pipeline import curate as CU

    docs = spark.createDataFrame(
        [(i, "ignored") for i in range(4)], "doc_id long, text string"
    )
    counts = spark.createDataFrame(
        [(0, 100), (2, 100)], "doc_id long, n_tokens long"
    )
    out = {
        r["doc_id"]: r
        for r in CU.pack_documents(
            docs, window_tokens=256, n_groups=1, token_counts=counts
        ).collect()
    }
    assert sorted(out) == [0, 1, 2, 3]
    assert out[1]["n_tokens"] == 0 and out[3]["n_tokens"] == 0
    assert out[0]["n_tokens"] == 100 and out[2]["n_tokens"] == 100


def test_pack_documents_with_external_token_counts(spark):
    from net_spider_spark.pipeline import curate as CU

    docs = spark.createDataFrame(
        [(i, "ignored text") for i in range(6)], "doc_id long, text string"
    )
    counts = spark.createDataFrame(
        [(i, 100) for i in range(6)], "doc_id long, n_tokens long"
    )
    out = {
        r["doc_id"]: r
        for r in CU.pack_documents(
            docs, window_tokens=256, n_groups=1, token_counts=counts
        ).collect()
    }
    # 100-token docs into 256-token windows, one group: docs 0,1 in
    # pack 0 (pos 0,100), doc 2 spills into pack 0 at pos 200 (spill
    # convention), docs 3,4 in pack 1... cumulative layout:
    assert [out[i]["pack_id"] % (1 << 40) for i in range(6)] == [
        0, 0, 0, 1, 1, 1
    ]
    assert [out[i]["pack_pos"] for i in range(6)] == [
        0, 100, 200, 44, 144, 244
    ]
    assert all(out[i]["n_tokens"] == 100 for i in range(6))


def test_decontaminate_fuzzy_catches_paraphrased_leakage(spark):
    """An eval doc lightly reworded in the train set shares most
    3-gram shingles (high Jaccard) while its 8-gram exact hits shrink
    — fuzzy decontamination must flag it; unrelated docs stay clean."""
    from net_spider_spark.pipeline import curate as CU

    eval_text = (
        "the quick brown fox jumps over the lazy dog while the "
        "cat watches from the tall garden fence nearby"
    )
    # light edit: one word changed mid-sentence
    leaked = eval_text.replace("lazy dog", "lazy hound")
    clean = (
        "completely different material about distributed query "
        "engines and shuffle partitioning strategies at scale"
    )
    train = spark.createDataFrame(
        [(1, leaked), (2, clean)], "doc_id long, text string"
    )
    eval_df = spark.createDataFrame(
        [(100, eval_text)], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in CU.decontaminate_fuzzy(
            train, eval_df, n=3, threshold=0.5
        ).collect()
    }
    assert out[1]["contaminated"] and out[1]["max_eval_jaccard"] > 0.5
    assert not out[2]["contaminated"] and out[2]["max_eval_jaccard"] == 0.0


def test_decontaminate_fuzzy_per_content_dedup_equivalence(spark):
    """The per-distinct-content fast path (dedup on md5(text) before
    tokenizing) must give every COPY of a duplicated train doc the
    same verdict a singleton would get, and handle null/short texts
    (no shingles -> never a candidate -> 0.0)."""
    from net_spider_spark.pipeline import curate as CU

    eval_text = (
        "the quick brown fox jumps over the lazy dog while the "
        "cat watches from the tall garden fence nearby"
    )
    leaked = eval_text.replace("lazy dog", "lazy hound")
    clean = (
        "completely different material about distributed query "
        "engines and shuffle partitioning strategies at scale"
    )
    # doc 1 and its byte-identical copies 3/5 must agree; 4 is null
    # text, 6 is too short to shingle at n=3.
    train = spark.createDataFrame(
        [(1, leaked), (2, clean), (3, leaked), (4, None), (5, leaked),
         (6, "too short")],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(100, eval_text)], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in CU.decontaminate_fuzzy(
            train, eval_df, n=3, threshold=0.5
        ).collect()
    }
    assert sorted(out) == [1, 2, 3, 4, 5, 6]
    assert out[1]["contaminated"]
    assert out[3]["max_eval_jaccard"] == out[1]["max_eval_jaccard"]
    assert out[5]["max_eval_jaccard"] == out[1]["max_eval_jaccard"]
    for clean_id in (2, 4, 6):
        assert not out[clean_id]["contaminated"]
        assert out[clean_id]["max_eval_jaccard"] == 0.0
