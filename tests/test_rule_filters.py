"""Gopher rule-based filtering and C4 line-level cleaning: every rule
exercised with a crafted document that fails it alone."""

import pytest

from net_spider_spark.pipeline import text as TX

# A body that passes every Gopher rule at the test thresholds: 12 words
# of healthy length, 'the ... to ... of' gives 3 required hits, no
# symbols, no bullets/ellipses.
GOOD = "the quick brown fox jumps to the top of every wooden fence."


def _gopher(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    defaults = dict(
        min_words=5, max_words=50, min_mean_word_len=3.0,
        max_mean_word_len=8.0, max_symbol_word_ratio=0.1,
        max_bullet_line_frac=0.5, max_ellipsis_line_frac=0.3,
        min_alpha_word_frac=0.8, min_required_hits=2,
    )
    defaults.update(kw)
    out = TX.gopher_rules(df, **defaults).collect()
    return {r["doc_id"]: r for r in out}


def test_gopher_each_rule_fails_exactly_its_doc(spark):
    rows = [
        (0, GOOD),
        (1, "too few"),                                    # min_words
        (2, " ".join(["word"] * 60) + " the to"),          # max_words
        (3, "a I to of be it at an do we my up the on"),   # mean len < 3
        (4, "extraordinarily incomprehensible " * 4 + "the to"),  # mean len > 8
        (5, "the quick fox went to ### market ### today ##"),     # symbols
        (6, "- the list\n- to buy\nonly one plain line here"),    # bullets
        (7, "the start...\nmore waiting...\nto be sure\nplain\nplain x\nplain y\nplain z\nplain w\nplain v\nplain u"),  # ellipsis 2/10 < 0.3 passes; see doc 8
        (8, "the start...\nto be soon...\nwaiting more...\nplain line here now"),  # ellipsis 3/4
        (9, "the 12 34 56 78 90 11 22 33 44 to"),          # alpha frac
        (10, "quick brown fox jumps over wooden fences yearly"),  # required hits
    ]
    got = _gopher(spark, rows)
    assert got[0]["keep"] is True
    assert got[7]["keep"] is True
    for d in (1, 2, 3, 4, 5, 6, 8, 9, 10):
        assert got[d]["keep"] is False, d
    # and each failing doc fails for the INTENDED signal
    assert got[1]["n_words"] < 5
    assert got[2]["n_words"] > 50
    assert got[3]["mean_word_len"] < 3.0
    assert got[4]["mean_word_len"] > 8.0
    assert got[5]["symbol_word_ratio"] > 0.1
    assert got[6]["frac_bullet_lines"] > 0.5
    assert got[8]["frac_ellipsis_lines"] > 0.3
    assert got[9]["frac_alpha_words"] < 0.8
    assert got[10]["n_required_hits"] < 2


def test_gopher_ellipsis_counts_in_symbol_ratio(spark):
    got = _gopher(
        spark,
        [(0, "the road goes on... to the very end... of all things...")],
        max_symbol_word_ratio=0.5,
    )
    # 3 '...' over 11 words
    assert got[0]["symbol_word_ratio"] == pytest.approx(3 / 11)


def test_gopher_required_hits_are_distinct_words(spark):
    # 'the' five times is ONE hit; thresholds need distinct words.
    got = _gopher(spark, [(0, "the the the the the quick brown foxes")])
    assert got[0]["n_required_hits"] == 1


def test_c4_line_rules(spark):
    rows = [
        (0, "This line stays right here.\nno terminal punctuation line\n"
            "Too short.\nPlease enable javascript to continue.\n"
            "We use cookie banners everywhere.\nAnother good line stays!"),
        (1, "Only fragment"),
        (2, "Fine sentence here.\nBut lorem ipsum dolor sit amet."),
        (3, "Good line over here.\nif (x) { return; }"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in TX.c4_clean(df, min_line_words=3).collect()}
    assert out[0]["clean_text"] == (
        "This line stays right here.\nAnother good line stays!"
    )
    assert out[0]["n_kept_lines"] == 2 and out[0]["keep"] is True
    # no line qualifies -> dropped
    assert out[1]["n_kept_lines"] == 0 and out[1]["keep"] is False
    # lorem ipsum poisons the whole doc even with a kept line
    assert out[2]["n_kept_lines"] == 2 and out[2]["keep"] is False
    # a brace poisons the doc AND the brace line itself is dropped
    assert out[3]["clean_text"] == "Good line over here."
    assert out[3]["keep"] is False


def test_c4_question_exclamation_and_quote_endings_kept(spark):
    df = spark.createDataFrame(
        [(0, 'Is this a question?\nWhat an exclamation!\nShe said "stop".\n'
             'He said "go home"')],
        "doc_id long, text string",
    )
    out = TX.c4_clean(df, min_line_words=3).collect()[0]
    assert out["n_kept_lines"] == 4
