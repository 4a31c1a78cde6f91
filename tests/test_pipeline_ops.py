"""LLM-pipeline operator behavior tests: planted duplicates must be
found; the approximate path must agree with the exact path."""

import pytest
from pyspark.sql import functions as F

from net_spider_spark.pipeline import dedup as D
from net_spider_spark.pipeline import similarity as S


@pytest.fixture(scope="module")
def docs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill near the garden gate"
    )
    near = base.replace("lazy", "sleepy")  # near-duplicate
    other = (
        "completely different text about spark query engines and "
        "distributed shuffle partitioning strategies at large scale"
    )
    rows = [(1, base), (2, base), (3, near), (4, other)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_finds_planted_dup(docs):
    groups = {r["keeper_id"]: r["n_dups"] for r in D.exact_duplicates(docs).collect()}
    assert groups[1] == 2  # docs 1 and 2 identical
    assert groups[3] == 1 and groups[4] == 1


def test_minhash_candidates_find_near_dup(docs):
    sh = D.doc_shingles(docs)
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in D.minhash_candidates(D.minhash_signatures(sh)).collect()
    }
    assert (1, 2) in pairs           # identical pair always collides
    assert (1, 3) in pairs or (2, 3) in pairs  # near-dup shares most shingles
    assert (1, 4) not in pairs and (3, 4) not in pairs


def test_minhash_hot_bucket_cap_bounds_degenerate_corpus(spark, docs):
    """A planted degenerate corpus — many docs sharing one (band, sig)
    bucket — must complete with a BOUNDED candidate count instead of
    |bucket|² pairs, while normal-data recall is unchanged (the
    find_near_dup test above runs with the default cap)."""
    # 200 byte-identical texts -> identical signatures in every band.
    degen = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate line repeated across the corpus x").alias(
            "text"
        ),
    )
    sigs = D.minhash_signatures(D.doc_shingles(degen))
    capped = D.minhash_candidates(sigs, max_bucket_size=50)
    assert capped.count() == 0  # every bucket > cap -> dropped
    hot = D.minhash_hot_buckets(sigs, max_bucket_size=50).collect()
    assert hot and all(r["n_docs"] == 200 for r in hot)
    # uncapped is the quadratic shape the cap exists to prevent
    assert D.minhash_candidates(sigs, max_bucket_size=None).count() == (
        200 * 199 // 2
    )


def test_minhash_cap_preserves_small_bucket_pairs(docs):
    sh = D.doc_shingles(docs)
    sigs = D.minhash_signatures(sh)
    with_cap = {
        (r["doc_a"], r["doc_b"])
        for r in D.minhash_candidates(sigs, max_bucket_size=1000).collect()
    }
    no_cap = {
        (r["doc_a"], r["doc_b"])
        for r in D.minhash_candidates(sigs, max_bucket_size=None).collect()
    }
    assert with_cap == no_cap  # 4-doc corpus: no bucket near the cap


def test_jaccard_scores(docs):
    sh = D.doc_shingles(docs)
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(sh, threshold=0.1).collect()
    }
    assert got[(1, 2)] == 1.0
    assert 0.5 < got[(1, 3)] < 1.0
    assert (1, 4) not in got


def test_simhash_near_dup_hamming(docs):
    sig = {r["doc_id"]: r["simhash"] for r in D.simhash16(docs).collect()}
    assert sig[1] == sig[2]
    ham_near = bin(sig[1] ^ sig[3]).count("1")
    ham_far = bin(sig[1] ^ sig[4]).count("1")
    assert ham_near < ham_far


def test_lsh_topk_recall_vs_bruteforce(spark):
    import random

    rng = random.Random(7)
    dim = 16
    rows = [
        (i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(60)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = emb.where(F.col("vec_id") < 5)
    corpus = emb.where(F.col("vec_id") >= 5)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in S.brute_force_topk(queries, corpus, k=3).collect()
    }
    # 1 plane => 2 buckets => high recall (scale path trades this off)
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in S.lsh_bucket_topk(
            queries, corpus, dim=dim, k=3, n_planes=1
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5
    # with 0 planes the bucket join degenerates to brute force exactly
    all_bucket = {
        (r["query_id"], r["neighbor_id"])
        for r in S.lsh_bucket_topk(
            queries, corpus, dim=dim, k=3, n_planes=0
        ).collect()
    }
    assert all_bucket == exact


def test_jaccard_verify_candidates_matches_full_on_candidates(docs):
    # The scale path (candidates -> verify) must score candidate pairs
    # identically to the exhaustive inverted-index join, and must never
    # emit a pair outside the candidate set.
    sh = D.doc_shingles(docs)
    cand = D.minhash_candidates(D.minhash_signatures(sh))
    cand_set = {(r["doc_a"], r["doc_b"]) for r in cand.collect()}
    full = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(sh, threshold=0.1).collect()
    }
    verified = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in D.jaccard_verify_candidates(cand, sh, threshold=0.1).collect()
    }
    assert set(verified) <= cand_set
    for pair, j in verified.items():
        assert full[pair] == j
    # Planted dups are candidates, so the scale path keeps them.
    assert verified[(1, 2)] == 1.0
    assert 0.5 < verified[(1, 3)] < 1.0


def test_set_based_path_matches_exploded_path(docs):
    # The narrow per-doc-set pipeline (doc_shingle_sets ->
    # minhash_signatures_sets -> jaccard_verify_sets) must produce
    # bit-identical signatures and jaccard values to the exploded
    # inverted-index pipeline it replaces on the batch path.
    sh = D.doc_shingles(docs)
    sets = D.doc_shingle_sets(docs)
    sig_old = {
        (r["doc_id"], r["band"]): r["sig"]
        for r in D.minhash_signatures(sh).collect()
    }
    sig_new = {
        (r["doc_id"], r["band"]): r["sig"]
        for r in D.minhash_signatures_sets(sets).collect()
    }
    assert sig_new == sig_old and len(sig_new) > 0
    cand = D.minhash_candidates(D.minhash_signatures_sets(sets))
    old = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in D.jaccard_verify_candidates(cand, sh, threshold=0.1).collect()
    }
    new = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in D.jaccard_verify_sets(cand, sets, threshold=0.1).collect()
    }
    assert new == old and new[(1, 2)] == 1.0


def test_embedding_lsh_default_matches_exact_groups(spark):
    # Banded sign-LSH candidates + exact verify (the default) must
    # produce the same near-dup groups as the all-pairs verifier on a
    # corpus with clearly-separated clusters.
    import random

    rng = random.Random(7)
    rows = []
    for cluster in range(5):
        center = [rng.gauss(0, 1) for _ in range(16)]
        for j in range(4):
            vec = [c + rng.gauss(0, 0.001) for c in center]
            rows.append((cluster * 10 + j, vec))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    lsh = {
        (r["vec_id"], r["group_id"], r["is_keeper"])
        for r in D.embedding_near_dup_groups(emb, threshold=0.999).collect()
    }
    exact = {
        (r["vec_id"], r["group_id"], r["is_keeper"])
        for r in D.embedding_near_dup_groups(
            emb, threshold=0.999, exact=True
        ).collect()
    }
    assert lsh == exact
    # and the groups are the planted clusters
    keepers = {g for (_, g, k) in exact if k}
    assert len(keepers) == 5


def test_dedup_representatives_keeps_min_id_per_cluster(docs):
    # Docs 1,2 identical and 3 near-dup: one cluster {1,2,3} -> keep 1
    # with cluster_size 3; doc 4 unclustered -> kept with size 1.
    got = {
        r["doc_id"]: r["cluster_size"]
        for r in D.dedup_representatives(docs, threshold=0.5).collect()
    }
    assert got == {1: 3, 4: 1}


def test_dedup_representatives_no_dups_is_identity(spark):
    rows = [(i, f"unique document number {i} talking about topic {i*7}")
            for i in range(1, 6)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["cluster_size"]
        for r in D.dedup_representatives(docs, threshold=0.9).collect()
    }
    assert got == {i: 1 for i in range(1, 6)}


def test_incremental_dedup_against_corpus(spark):
    from net_spider_spark.pipeline.dedup import (
        doc_shingles,
        exact_duplicates_against,
        jaccard_verify_candidates,
        minhash_candidates_against,
        minhash_signatures,
    )

    corpus = spark.createDataFrame(
        [
            (1, "the cat sat on the mat today and yesterday"),
            (2, "a completely different corpus document about engines"),
            (3, "third corpus doc with its own unique words here"),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (100, "the cat sat on the mat today and yesterday"),  # exact dup of 1
            (101, "the cat sat on the mat today and tomorrow"),   # near dup of 1
            (102, "entirely novel content never seen before anywhere"),
        ],
        "doc_id long, text string",
    )
    ex = {r["doc_id"]: r["is_duplicate"]
          for r in exact_duplicates_against(new, corpus).collect()}
    assert ex == {100: True, 101: False, 102: False}

    cand = minhash_candidates_against(
        minhash_signatures(doc_shingles(new)),
        minhash_signatures(doc_shingles(corpus)),
    )
    pairs = {(r["new_id"], r["corpus_id"]) for r in cand.collect()}
    assert (100, 1) in pairs and (101, 1) in pairs
    assert not any(n == 102 for n, _ in pairs)
    # exact verify of the candidates: near-dup scores below the exact dup
    both = doc_shingles(new.unionByName(corpus))
    verified = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_verify_candidates(
            cand.select(F.col("new_id").alias("doc_a"),
                        F.col("corpus_id").alias("doc_b")),
            both,
            threshold=0.0,
        ).collect()
    }
    assert verified[(100, 1)] == 1.0
    assert 0.0 < verified[(101, 1)] < 1.0


def test_remove_duplicate_spans(spark):
    # Two docs share an 8-token run; a third is disjoint. The shared
    # span must vanish from BOTH carriers, everything else survives.
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, f"intro one two {shared} outro one"),
        (2, f"other opening {shared} closing words here"),
        (3, "totally different text with no repeated run at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in D.remove_duplicate_spans(docs, n=8, min_docs=2).collect()
    }
    assert got[1]["clean_text"] == "intro one two outro one"
    assert got[1]["n_removed"] == 8
    assert got[2]["clean_text"] == "other opening closing words here"
    assert got[2]["n_removed"] == 8
    assert got[3]["n_removed"] == 0
    assert got[3]["clean_text"] == rows[2][1]
    # overlapping duplicated spans: a 9-token shared run covers 9
    # tokens via two overlapping 8-gram hits, counted once each
    nine = shared + " iota"
    docs2 = spark.createDataFrame(
        [(1, f"x {nine} y"), (2, f"p {nine} q")], "doc_id long, text string"
    )
    got2 = {
        r["doc_id"]: r.asDict()
        for r in D.remove_duplicate_spans(docs2, n=8, min_docs=2).collect()
    }
    assert got2[1]["clean_text"] == "x y" and got2[1]["n_removed"] == 9
    # a doc shorter than n yields no grams and survives untouched
    docs3 = spark.createDataFrame(
        [(1, "tiny doc"), (2, "tiny doc")], "doc_id long, text string"
    )
    got3 = {r["doc_id"]: r.asDict()
            for r in D.remove_duplicate_spans(docs3, n=8, min_docs=2).collect()}
    assert got3[1]["clean_text"] == "tiny doc" and got3[1]["n_removed"] == 0


def test_remove_boilerplate_lines(spark):
    docs = spark.createDataFrame(
        [
            (0, "real content zero\ncookie banner\nmore zero"),
            (1, "cookie banner\nunique one"),
            (2, "unique two\n  cookie banner  \n"),
            (3, "no banner here\n\ntrailing keeps\n"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_removed"])
        for r in D.remove_boilerplate_lines(docs, min_docs=3).collect()
    }
    # the banner appears in 3 distinct docs -> removed everywhere,
    # matched on TRIMMED content; unique lines and whitespace survive
    assert out[0] == ("real content zero\nmore zero", 3, 1)
    assert out[1] == ("unique one", 2, 1)
    assert out[2] == ("unique two\n", 3, 1)
    # nothing removed -> byte-exact round-trip incl. trailing newline
    assert out[3] == ("no banner here\n\ntrailing keeps\n", 4, 0)
    assert out[4] == ("", 1, 0)
    # below threshold: min_docs=4 keeps the banner (3 distinct docs)
    kept = {
        r["doc_id"]: r["n_removed"]
        for r in D.remove_boilerplate_lines(docs, min_docs=4).collect()
    }
    assert all(v == 0 for v in kept.values())


def test_remove_boilerplate_lines_counts_docs_not_occurrences(spark):
    # one doc repeating a line 10 times must NOT make it corpus
    # boilerplate — the frequency is DISTINCT documents
    docs = spark.createDataFrame(
        [(0, "\n".join(["spam line"] * 10)), (1, "other")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["n_removed"]
        for r in D.remove_boilerplate_lines(docs, min_docs=2).collect()
    }
    assert out == {0: 0, 1: 0}


def test_embedding_near_dup_against_flags_cross_batch(spark):
    """A new vector nearly identical to a corpus vector must be
    flagged via the banded probe (never a new x corpus cross join —
    plan pinned below); an orthogonal vector stays clean."""
    import numpy as np

    rng = np.random.RandomState(5)
    base = rng.rand(16).astype(float)
    near = (base + rng.rand(16) * 0.01).tolist()
    ortho = np.zeros(16)
    ortho[0] = 1.0
    far = (ortho if abs(np.dot(ortho, base)) < 0.5 else -ortho).tolist()
    corpus = spark.createDataFrame(
        [(i + 100, (rng.rand(16)).tolist()) for i in range(8)]
        + [(200, base.tolist())],
        "vec_id long, embedding array<double>",
    )
    new = spark.createDataFrame(
        [(1, near), (2, far)], "vec_id long, embedding array<double>"
    )
    out = {
        r["vec_id"]: r
        for r in D.embedding_near_dup_against(
            new, corpus, threshold=0.95, n_planes=4
        ).collect()
    }
    assert out[1]["is_near_dup"] and out[1]["n_near_corpus"] >= 1
    assert not out[2]["is_near_dup"] and out[2]["n_near_corpus"] == 0


def test_embedding_near_dup_against_empty_corpus(spark):
    """An empty (or all-NULL-vector) corpus means nothing is a
    near-dup — must return all-false, not TypeError on first()."""
    new = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: (r["n_near_corpus"], r["is_near_dup"])
        for r in D.embedding_near_dup_against(new, empty).collect()
    }
    assert out == {1: (0, False), 2: (0, False)}


def test_embedding_near_dup_against_plan_no_cartesian(spark):
    from tests.test_plan_shapes import plan_of

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0, 2.0, 3.0]) for i in range(12)],
        "vec_id long, embedding array<double>",
    )
    df = D.embedding_near_dup_against(
        emb.where(F.col("vec_id") % 2 == 0),
        emb.where(F.col("vec_id") % 2 == 1),
        n_planes=4,
    )
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
