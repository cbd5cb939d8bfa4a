"""C4 cleaning rules (text.c4_clean) and cross-doc paragraph dedup
(dedup.paragraph_dedup) — hand-computed expectations."""

import pytest

from medcat_spark.functions.dedup import paragraph_dedup
from medcat_spark.functions.text import c4_clean


def test_c4_clean_rules(spark):
    rows = [
        # doc 0: two good lines + one unpunctuated + one short + one js
        (0, "alpha beta gamma delta epsilon.\n"
            "zeta eta theta iota kappa!\n"
            "lambda mu nu xi omicron\n"
            "pi rho.\n"
            "sigma tau upsilon phi uses javascript."),
        # doc 1: passes lines but mentions lorem ipsum -> page fail
        (1, "one two three four five.\nsix seven eight nine ten?\n"
            "lorem ipsum dolor sit amet."),
        # doc 2: curly brace -> page fail
        (2, "good line with five words.\nanother good line right here.\n"
            "third good line is here.\nsee {config} for details."),
        # doc 3: only 2 sentences survive -> fail min_sentences=3
        (3, "first proper line goes here.\nsecond proper line goes here."),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in c4_clean(docs).collect()}
    assert out[0]["n_lines"] == 5
    assert out[0]["n_lines_kept"] == 2
    assert out[0]["c4_text"] == ("alpha beta gamma delta epsilon.\n"
                                 "zeta eta theta iota kappa!")
    assert out[0]["n_sentences"] == 2 and out[0]["c4_pass"] == 0
    assert out[1]["c4_pass"] == 0          # lorem ipsum
    assert out[1]["n_lines_kept"] == 3     # lines themselves are fine
    assert out[2]["c4_pass"] == 0          # braces
    assert out[3]["n_sentences"] == 2 and out[3]["c4_pass"] == 0
    # make one that passes everything
    ok = spark.createDataFrame(
        [(9, "first proper line goes here.\nsecond proper line goes here.\n"
             "third proper line goes here.")],
        "doc_id long, text string")
    r = c4_clean(ok).collect()[0]
    assert r["c4_pass"] == 1 and r["n_sentences"] == 3


def test_paragraph_dedup_first_occurrence_wins(spark):
    rows = [
        (0, "unique alpha\nshared paragraph\nunique beta"),
        (1, "shared paragraph\nunique gamma"),
        (2, "unique delta\nshared paragraph\nshared paragraph"),
        (3, "all original here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in paragraph_dedup(docs).collect()}
    # doc 0 is the first occurrence (doc_id 0, pos 1) -> keeps all
    assert out[0]["clean_text"] == "unique alpha\nshared paragraph\nunique beta"
    assert out[0]["n_dropped"] == 0
    # later occurrences dropped, order of survivors preserved
    assert out[1]["clean_text"] == "unique gamma"
    assert out[1]["n_dropped"] == 1
    assert out[2]["clean_text"] == "unique delta"
    assert out[2]["n_dropped"] == 2
    assert out[3]["clean_text"] == "all original here"
    # row counts: n_paras counts pre-dedup paragraphs
    assert out[2]["n_paras"] == 3
    # partition invariance
    out2 = {r["doc_id"]: r
            for r in paragraph_dedup(docs.repartition(7)).collect()}
    for k in out:
        assert out2[k]["clean_text"] == out[k]["clean_text"]


def test_paragraph_dedup_plan_no_python(spark):
    docs = spark.createDataFrame([(0, "a\nb")], "doc_id long, text string")
    plan = paragraph_dedup(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Python" not in plan
    plan2 = c4_clean(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan2
