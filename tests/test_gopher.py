"""Gopher repetition/quality filter tests (functions/gopher.py) —
hand-computed metrics on crafted docs, gate semantics, and the
degenerate-input guards."""

import math

import pytest
from pyspark.sql import functions as F

from medcat_spark.functions.gopher import (DEFAULT_GATES, gopher_gate,
                                           gopher_ngram_metrics,
                                           gopher_quality)


def _one(df, doc_id="d1"):
    return {r["doc_id"]: r.asDict() for r in df.collect()}[doc_id]


@pytest.fixture(scope="module")
def crafted(spark):
    rows = [
        # 3 lines, one duplicated pair ("a b"); 2 paragraphs, distinct
        ("d1", "a b\na b\nc dd\n\ne f"),
        # bullets + ellipsis lines
        ("d2", "- first item\n- second item\nplain tail..."),
        # symbol-heavy: 2 '#' + 1 '...' over 4 words
        ("d3", "ab# cd# then more..."),
        # heavy 2-gram repetition for the top-2gram metric
        ("d4", "x y x y x y"),
        # shorter than 5 words -> no 5-grams at all
        ("d5", "tiny doc"),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_dup_line_and_para_fracs(crafted):
    m = _one(gopher_quality(crafted), "d1")
    # lines: ["a b","a b","c dd","","e f"] -> 5 lines, 4 distinct
    assert math.isclose(m["dup_line_frac"], 1 / 5, abs_tol=1e-9)
    # line chars total 3+3+4+0+3=13, distinct 3+4+0+3=10 -> 3/13
    assert math.isclose(m["dup_line_char_frac"], round(3 / 13, 6),
                        abs_tol=1e-9)
    # paragraphs: ["a b\na b\nc dd", "e f"] distinct -> 0
    assert m["dup_para_frac"] == 0.0 and m["dup_para_char_frac"] == 0.0


def test_bullet_and_ellipsis_line_fracs(crafted):
    m = _one(gopher_quality(crafted), "d2")
    assert math.isclose(m["frac_bullet_lines"], round(2 / 3, 6), abs_tol=1e-9)
    assert math.isclose(m["frac_ellipsis_lines"], round(1 / 3, 6),
                        abs_tol=1e-9)


def test_symbol_word_ratio(crafted):
    m = _one(gopher_quality(crafted), "d3")
    # 2 '#' + 1 '...' over 4 words
    assert math.isclose(m["symbol_word_ratio"], 3 / 4, abs_tol=1e-9)
    # every word has an alphabetic char
    assert m["frac_alpha_words"] == 1.0


def test_top_2gram_char_frac(crafted):
    m = _one(gopher_quality(crafted), "d4")
    # grams: "x y"×3, "y x"×2 -> top covers 3*3=9 chars of 11
    assert math.isclose(m["top_2gram_char_frac"], round(9 / 11, 6),
                        abs_tol=1e-9)
    # every 5-gram ("x y x y x", "y x y x y") is unique -> dup frac 0
    assert m["dup_5gram_char_frac"] == 0.0


def test_short_doc_has_no_ngram_crash(crafted):
    m = _one(gopher_quality(crafted), "d5")
    assert m["dup_5gram_char_frac"] == 0.0
    # one bigram "tiny doc": covers the whole 8-char text
    assert math.isclose(m["top_2gram_char_frac"], 1.0, abs_tol=1e-9)


def test_ngram_single_shuffle_plan(crafted):
    """The two gram families must aggregate in one exploded pass — the
    plan has no join between them (union before the groupBy)."""
    plan = gopher_ngram_metrics(crafted)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Join" not in plan


def test_gate_thresholds_and_overrides(spark):
    good = ("the cat sat on the mat and then the dog came by with a bone "
            "to chew while birds sang songs of spring above that garden "
            "wall for hours on end every day")
    rows = [("ok", good), ("short", "the of and")]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r["doc_id"]: r["gopher_pass"]
           for r in gopher_gate(docs, min_words=20).collect()}
    assert out["ok"] is True
    assert out["short"] is False          # n_words < 20
    # loosening the word gate flips 'short' only if other gates pass:
    # "the of and" has mean_word_len 7/3 < 3.0 -> still fails
    out2 = {r["doc_id"]: r["gopher_pass"]
            for r in gopher_gate(docs, min_words=1).collect()}
    assert out2["short"] is False


def test_gate_rejects_unknown_override(spark):
    docs = spark.createDataFrame([("x", "a b")], "doc_id string, text string")
    with pytest.raises(ValueError):
        gopher_gate(docs, not_a_gate=1)


def test_default_gates_are_the_paper_values():
    assert DEFAULT_GATES["min_words"] == 50
    assert DEFAULT_GATES["max_symbol_word_ratio"] == 0.1
    assert DEFAULT_GATES["min_stopwords"] == 2
    assert DEFAULT_GATES["max_top_ngram_char_frac"] == 0.2
