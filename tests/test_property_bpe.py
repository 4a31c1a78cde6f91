"""Property test: bpe_learn vs the pure-Python Sennrich spec on random
small corpora — the distributed grouped-aggregate learner must match
the sequential reference algorithm merge-for-merge, counts included,
on arbitrary text (unicode, punctuation runs, contractions, digits)."""

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from net_spider_spark.pipeline import text as TX

# words drawn from a tiny alphabet so pair ties happen often (the
# tie-break rule is the most fragile part of cross-engine parity),
# plus punctuation/digit/contraction shapes for the pretokenizer.
word_st = st.text(alphabet="abAB", min_size=1, max_size=5)
token_st = st.one_of(
    word_st,
    st.sampled_from(["'s", "'ll", "42", "3.14", "!!", ", ", "  "]),
)
doc_st = st.lists(token_st, min_size=0, max_size=12).map(" ".join)
corpus_st = st.lists(doc_st, min_size=1, max_size=4)


def _py_pretok(text):
    import re

    # \p{L}/\p{N} limited to the strategy's alphabet: ASCII letters
    # and digits (matches Spark/java regex on this input space)
    return re.findall(
        r"'(?:s|d|m|t|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+",
        text,
    )


def _py_bpe(texts, n_merges):
    wc = Counter(w for t in texts for w in _py_pretok(t))
    vocab = [(list(w), f) for w, f in wc.items()]
    merges = []
    for r in range(1, n_merges + 1):
        stats = Counter()
        for syms, f in vocab:
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += f
        if not stats:
            break
        (a, b), c = min(
            stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((r, a, b, a + b, c))

        def merge_word(syms):
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == (a, b):
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            return out

        vocab = [(merge_word(s), f) for s, f in vocab]
    return merges


_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(texts=corpus_st, n_merges=st.integers(min_value=1, max_value=6))
@_settings
def test_bpe_learn_matches_spec_on_random_corpora(spark, texts, n_merges):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    want = _py_bpe(texts, n_merges)
    # driver fast path (default guard) AND the distributed batched
    # round loop (guard forced off) must BOTH match the sequential
    # spec merge-for-merge.
    assert TX.bpe_learn(df, n_merges=n_merges) == want
    assert (
        TX.bpe_learn(df, n_merges=n_merges, driver_max_words=0) == want
    )


@given(texts=corpus_st, n_merges=st.integers(min_value=1, max_value=6))
@_settings
def test_bpe_encode_arrow_matches_expr_chain(spark, texts, n_merges):
    # The Arrow encoder (rank-based greedy, vocabulary-size-independent
    # plan) must agree row-for-row with the literal replace chain —
    # the two paths share only the Spark-side pretokenizer, so this
    # pins the merge-application semantics themselves.
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    merges = _py_bpe(texts, n_merges)
    expr = sorted(
        map(tuple, TX.bpe_encode_stats(df, merges, method="expr").collect())
    )
    arrow = sorted(
        map(tuple, TX.bpe_encode_stats(df, merges, method="arrow").collect())
    )
    assert expr == arrow
