"""WordPiece-style vocabulary selection + greedy longest-match
encoding: vocab determinism, longest-match preference, char fallback."""

from net_spider_spark.pipeline import text as TX
from net_spider_spark.pipeline.text import _wp_encode_word


def test_wp_encode_word_prefers_longest_match():
    vocab = frozenset(["a", "b", "c", "ab", "abc"])
    # greedy takes 'abc' in one piece, not 'ab'+'c' or 'a'+'b'+'c'
    assert _wp_encode_word("abc", vocab, 3) == 1
    assert _wp_encode_word("abcabc", vocab, 3) == 2
    # after consuming 'abc', 'b' alone remains a single piece
    assert _wp_encode_word("abcb", vocab, 3) == 2


def test_wp_encode_word_greedy_is_not_optimal():
    # greedy takes 'ab' then letters; optimal would be 'a' + 'bbb'.
    vocab = frozenset(["a", "b", "ab", "bbb"])
    assert _wp_encode_word("abbb", vocab, 3) == 3  # ab + b + b


def test_wp_encode_word_unseen_char_fallback():
    vocab = frozenset(["a"])
    # 'z' is not in the vocab (cross-corpus encode): one piece per char
    assert _wp_encode_word("aza", vocab, 1) == 3


def test_wordpiece_vocab_selection_and_ranks(spark):
    # 'ab' appears 6x (3 docs x 2 words); the count-3 tie ('bx', 'by',
    # 'cd', 'dz') resolves to the lexicographically smallest 'bx'.
    # Weighting is by word FREQUENCY, not distinct words.
    docs = spark.createDataFrame(
        [(i, "abx aby cdz") for i in range(3)], "doc_id long, text string"
    )
    out = TX.wordpiece_vocab(docs, vocab_size=2, max_piece_len=2)
    rows = {(r["piece"]): (r["n_occurrences"], r["is_char"]) for r in out.collect()}
    chars = {p for p, (_, c) in rows.items() if c}
    assert chars == set("abxycdz")
    multis = {p: n for p, (n, c) in rows.items() if not c}
    assert multis == {"ab": 6, "bx": 3}
    # char occurrences are word-frequency weighted too
    assert rows["a"] == (6, True)


def test_wordpiece_encode_stats_counts(spark):
    docs = spark.createDataFrame(
        [(1, "abab ab"), (2, "zq")], "doc_id long, text string"
    )
    vocab = ["a", "b", "ab", "abab", "z", "q"]
    got = {
        r["doc_id"]: (r["n_words"], r["n_pieces"])
        for r in TX.wordpiece_encode_stats(docs, vocab).collect()
    }
    # 'abab' one piece, 'ab' one piece; 'zq' falls to two chars
    assert got == {1: (2, 2), 2: (1, 2)}


def test_wordpiece_vocab_tie_break_deterministic(spark):
    # four substrings with EQUAL counts at the limit boundary: the
    # (count desc, piece asc) order must keep the lexicographically
    # smallest ones.
    docs = spark.createDataFrame(
        [(1, "xy"), (2, "ab"), (3, "cd"), (4, "ef")],
        "doc_id long, text string",
    )
    out = TX.wordpiece_vocab(docs, vocab_size=2, max_piece_len=2)
    multis = sorted(r["piece"] for r in out.collect() if not r["is_char"])
    assert multis == ["ab", "cd"]
