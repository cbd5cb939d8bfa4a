"""TransformersNER-analogue token tagger + DeID composition
(reference medcat/ner/transformers_ner.py task shape;
utils/ner/helpers.py:8-17 replace_entities_in_text semantics)."""

from medcat_spark.functions.deid import deid_text
from medcat_spark.functions.ner_model import (ner_fixture_model, score_table,
                                              tag_spans)


def test_tagger_spans_and_island_breaks(spark):
    m = ner_fixture_model()
    sc = score_table(spark, m)
    docs = spark.createDataFrame(
        [("d1", "the spark stream runs a merge join fast"),
         ("d2", "merge the merge"),            # O token breaks the span
         ("d3", "customer data row value")],   # no entities
        "doc_id string, text string")
    rows = sorted(tag_spans(docs, m, sc).collect(),
                  key=lambda r: (r["doc_id"], r["start"]))
    got = [(r["doc_id"], r["start"], r["end"], r["label"], r["n_tokens"])
           for r in rows]
    assert got == [
        ("d1", 4, 16, "SYS", 2),    # 'spark stream' merged
        ("d1", 24, 34, "OP", 2),    # 'merge join' merged
        ("d2", 0, 5, "OP", 1),      # two separate 'merge' spans —
        ("d2", 10, 15, "OP", 1),    # 'the' must break the island
    ]


def test_deid_replacement_and_redaction(spark):
    docs = spark.createDataFrame(
        [("d1", "john smith saw mary on monday"), ("d2", "nothing here")],
        "doc_id string, text string")
    ann = spark.createDataFrame(
        [("d1", 0, 10, "NAME"), ("d1", 15, 19, "NAME"), ("d1", 23, 29, "DATE")],
        "doc_id string, start int, end int, cui string")
    nm = spark.createDataFrame([("NAME", "PATIENT"), ("DATE", "DATE")],
                               "cui string, label string")
    out = {r["doc_id"]: r["deid_text"]
           for r in deid_text(docs, ann, nm).collect()}
    assert out["d1"] == "[PATIENT] saw [PATIENT] on [DATE]"
    assert out["d2"] == "nothing here"  # docs without spans pass through
    red = {r["doc_id"]: r["deid_text"]
           for r in deid_text(docs, ann, redact=True).collect()}
    # star run length == original span length (helpers.py:13-14)
    assert red["d1"] == "[**********] saw [****] on [******]"


def test_deid_composes_with_tagger(spark):
    m = ner_fixture_model()
    sc = score_table(spark, m)
    docs = spark.createDataFrame(
        [("d1", "the spark stream runs a merge join fast")],
        "doc_id string, text string")
    from pyspark.sql import functions as F
    spans = tag_spans(docs, m, sc).select(
        "doc_id", "start", "end", F.col("label").alias("cui"))
    out = deid_text(docs, spans).first()["deid_text"]
    assert out == "the [SYS] runs a [OP] fast"


def test_match_rules_and_merge_precedence(spark):
    """Reference utils/ner/deid.py match_rules/merge_preds: finditer
    positions + overlap precedence in both directions."""
    from medcat_spark.functions.deid import match_rules, merge_rule_preds
    docs = spark.createDataFrame(
        [("d1", "call 123-4567 or 999-0000 now")],
        "doc_id string, text string")
    rules = match_rules(docs, [(r"\d{3}-\d{4}", "PHONE")])
    got = {(r["start"], r["end"], r["cui"], r["source_value"])
           for r in rules.collect()}
    assert got == {(5, 13, "PHONE", "123-4567"),
                   (17, 25, "PHONE", "999-0000")}

    model = spark.createDataFrame([("d1", 5, 13, "CM")],
                                  "doc_id string, start int, end int, "
                                  "cui string")
    # model wins on the overlapping first phone; second rule survives
    m1 = {(r["start"], r["cui"])
          for r in merge_rule_preds(model, rules).collect()}
    assert m1 == {(5, "CM"), (17, "PHONE")}
    # rules win when accept_preds=False
    m2 = {(r["start"], r["cui"])
          for r in merge_rule_preds(model, rules,
                                    accept_preds=False).collect()}
    assert m2 == {(5, "PHONE"), (17, "PHONE")}
