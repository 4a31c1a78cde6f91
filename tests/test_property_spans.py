"""Property test: remove_duplicate_spans vs a pure-Python spec on
random small corpora (same executable-spec strategy as pyweaver)."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from net_spider_spark.pipeline.dedup import remove_duplicate_spans

VOCAB = ["a", "b", "c", "d"]

doc_st = st.lists(st.sampled_from(VOCAB), min_size=0, max_size=14).map(" ".join)
corpus_st = st.lists(doc_st, min_size=1, max_size=5)


def spec(texts: list[str], n: int, min_docs: int):
    toks = [t.split() if t else [] for t in texts]
    grams: dict[str, set] = {}
    for d, tk in enumerate(toks):
        for i in range(len(tk) - n + 1):
            grams.setdefault(" ".join(tk[i : i + n]), set()).add(d)
    dup = {g for g, docs in grams.items() if len(docs) >= min_docs}
    out = {}
    for d, tk in enumerate(toks):
        covered = set()
        for i in range(len(tk) - n + 1):
            if " ".join(tk[i : i + n]) in dup:
                covered.update(range(i, i + n))
        kept = [t for i, t in enumerate(tk) if i not in covered]
        out[d] = (" ".join(kept), len(tk), len(tk) - len(kept))
    return out


_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(texts=corpus_st, n=st.integers(min_value=2, max_value=4))
@_settings
def test_span_removal_matches_spec(spark, texts, n):
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed"])
        for r in remove_duplicate_spans(docs, n=n, min_docs=2).collect()
    }
    assert got == spec(texts, n, 2)


LINE_VOCAB = ["alpha", "beta beta", "  padded  ", "", " "]

line_doc_st = st.lists(
    st.sampled_from(LINE_VOCAB), min_size=0, max_size=6
).map("\n".join)
line_corpus_st = st.lists(line_doc_st, min_size=1, max_size=5)


def bp_spec(texts: list[str], min_docs: int):
    split = [t.split("\n") for t in texts]
    freq: dict[str, set] = {}
    for d, lines in enumerate(split):
        for ln in lines:
            if ln.strip():
                freq.setdefault(ln.strip(), set()).add(d)
    bp = {k for k, docs in freq.items() if len(docs) >= min_docs}
    out = {}
    for d, lines in enumerate(split):
        kept = [ln for ln in lines if ln.strip() not in bp or not ln.strip()]
        out[d] = ("\n".join(kept), len(lines), len(lines) - len(kept))
    return out


@given(texts=line_corpus_st, min_docs=st.integers(min_value=1, max_value=3))
@_settings
def test_boilerplate_removal_matches_spec(spark, texts, min_docs):
    from net_spider_spark.pipeline.dedup import remove_boilerplate_lines

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_removed"])
        for r in remove_boilerplate_lines(docs, min_docs=min_docs).collect()
    }
    assert got == bp_spec(texts, min_docs)
