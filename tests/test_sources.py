"""Source connectors: CDB CSV (S2), vocab TSV (S3), MCT export JSON (S7),
plus the A4 P/R harness over an MCT-shaped gold set."""

import json

import numpy as np
import pytest

from medcat_spark.cdb_build import (build_cdb, collect_vocab_model,
                                    read_vocab_tsv)
from medcat_spark.config import EngineConfig
from medcat_spark.core.annotate import annotate_document
from medcat_spark.fixtures import (CONCEPT_ROWS, build_fixture_cdb,
                                   concepts_csv_text, trained_fixture_models)
from medcat_spark.sources.mct_export import (documents_from_mct,
                                             gold_annotations,
                                             read_mct_export)
from medcat_spark.stats import overall_stats, per_cui_stats


def test_cdb_csv_source(spark, tmp_path):
    p = tmp_path / "cdb.csv"
    p.write_text(concepts_csv_text())
    df = (spark.read.option("header", "true").csv(str(p))
          .withColumn("row_id", __import__("pyspark").sql.functions
                      .monotonically_increasing_id()))
    cdb = build_cdb(spark, df, EngineConfig())
    exact = build_fixture_cdb(EngineConfig())
    assert cdb.name2cuis == exact.name2cuis
    assert cdb.cui2preferred_name == exact.cui2preferred_name


def test_vocab_tsv_source(spark, tmp_path):
    p = tmp_path / "vocab.dat"
    lines = ["house\t34444\t0.3232 0.123213 1.231231",
             "dog\t14444\t0.76762 0.76767 0.45454",
             "catty\t7"]
    p.write_text("\n".join(lines) + "\n")
    vm = collect_vocab_model(read_vocab_tsv(spark, str(p)))
    assert vm.word2cnt == {"house": 34444, "dog": 14444, "catty": 7}
    assert np.allclose(vm.vec("house"), [0.3232, 0.123213, 1.231231], atol=1e-6)
    assert vm.vec("catty") is None
    assert "catty" in vm


def test_vocab_arrow_collect_matches_row_collect(spark, tmp_path):
    """collect_vocab_model_arrow (the build_model.py path) produces the
    same model as the Row loop — float32 TSV vectors upcast identically."""
    from medcat_spark.cdb_build import collect_vocab_model_arrow
    p = tmp_path / "vocab.dat"
    lines = ["house\t34444\t0.3232 0.123213 1.231231",
             "dog\t14444\t0.76762 0.76767 0.45454",
             "catty\t7"]
    p.write_text("\n".join(lines) + "\n")
    df = read_vocab_tsv(spark, str(p))
    a, b = collect_vocab_model(df), collect_vocab_model_arrow(df)
    assert a.word2cnt == b.word2cnt
    for w in a.word2cnt:
        va, vb = a.vec(w), b.vec(w)
        assert (va is None) == (vb is None)
        if va is not None:
            np.testing.assert_array_equal(np.asarray(va, dtype=np.float64),
                                          vb)


@pytest.fixture(scope="module")
def mct_path(tmp_path_factory, fixture_models):
    """MCT export whose gold = the exact kernel's own output on two docs,
    plus one fabricated miss (fn) and one doc annotation we suppress (fp)."""
    cdb, vocab = fixture_models
    cfg = EngineConfig()
    texts = {"d1": "patient admitted with heart attack and high temperature",
             "d2": "history of diabetes mellitus and chronic kidney failure"}
    docs = []
    for did, text in texts.items():
        ents, _ = annotate_document(text, cdb, vocab, cfg)
        anns = [{"start": e.start, "end": e.end, "cui": e.cui,
                 "value": e.source_value, "validated": True,
                 "killed": False, "deleted": False} for e in ents]
        docs.append({"id": did, "name": did, "text": text,
                     "annotations": anns})
    # a gold annotation the pipeline will never produce -> one FN
    docs[0]["annotations"].append(
        {"start": 999, "end": 1005, "cui": "C0999", "value": "ghost",
         "validated": True, "killed": False, "deleted": False})
    # killed/deleted/unvalidated rows must be excluded from gold
    docs[1]["annotations"].append(
        {"start": 0, "end": 7, "cui": "C0666", "value": "history",
         "validated": True, "killed": True, "deleted": False})
    export = {"projects": [{"name": "proj", "id": "p1", "cuis": "",
                            "documents": docs}]}
    p = tmp_path_factory.mktemp("mct") / "export.json"
    p.write_text(json.dumps(export))
    return str(p)


def test_mct_source_and_pr_harness(spark, fixture_models, mct_path):
    from medcat_spark.pipeline import annotate, broadcast_model
    cdb, vocab = fixture_models
    mct = read_mct_export(spark, mct_path)
    gold = gold_annotations(mct)
    assert gold.where("cui = 'C0666'").count() == 0  # killed excluded

    docs = documents_from_mct(mct)
    bc = broadcast_model(spark, cdb, vocab, EngineConfig())
    pred = annotate(docs, bc)
    stats = overall_stats(pred, gold)
    assert stats["fn"] == 1          # the ghost annotation
    assert stats["fp"] == 0
    assert stats["precision"] == 1.0
    assert 0.7 <= stats["recall"] < 1.0

    pc = {r["cui"]: r for r in per_cui_stats(pred, gold).collect()}
    assert pc["C0999"]["fn"] == 1 and pc["C0999"]["tp"] == 0


def test_annotation_agreement(spark, tmp_path):
    import json

    from medcat_spark.sources.mct_export import (agreement_stats,
                                                 annotation_agreement,
                                                 read_mct_export)
    export = {"projects": [
        {"id": 1, "name": "a", "cuis": "", "documents": [
            {"id": 10, "name": "d", "text": "x y z",
             "annotations": [
                 {"start": 0, "end": 1, "cui": "C1", "value": "x"},
                 {"start": 2, "end": 3, "cui": "C2", "value": "y"},
                 {"start": 4, "end": 5, "cui": "C3", "value": "z"}]}]},
        {"id": 2, "name": "b", "cuis": "", "documents": [
            {"id": 10, "name": "d", "text": "x y z",
             "annotations": [
                 {"start": 0, "end": 1, "cui": "C1", "value": "x"},   # agree
                 {"start": 2, "end": 3, "cui": "C9", "value": "y"},   # conflict
                 {"start": 6, "end": 7, "cui": "C4", "value": "w"}]}]},  # only_b
    ]}
    p = tmp_path / "dbl.json"
    p.write_text(json.dumps(export))
    mct = read_mct_export(spark, str(p))
    agr = annotation_agreement(mct, "1", "2")
    st = agreement_stats(agr)
    assert st == {"agree": 1, "conflict": 1, "only_a": 1, "only_b": 1,
                  "total": 4, "pct_agreement": 0.25}


def test_consolidate_double_annotations(spark):
    """Reference consolidate_double_annotations semantics
    (utils/data_utils.py:413-501): agreement keeps, disagreement drops,
    one-sided spans drop unless require_double_inner=False, unpaired
    projects pass through only with require_double=False."""
    from medcat_spark.sources.mct_export import consolidate_annotations
    cols = ("project_id string, project_name string, doc_id string, "
            "text string, start int, end int, cui string, value string, "
            "validated boolean, killed boolean, deleted boolean")
    t = "the patient has diabetes and fever today"
    rows = [
        # project pair 'dbl' (ids 1, 2) over doc d1
        ("1", "dbl", "d1", t, 16, 24, "C1", "diabetes", True, False, False),
        ("2", "dbl", "d1", t, 16, 24, "C1", "diabetes", True, False, False),
        # same span, different cui -> disagreement, dropped
        ("1", "dbl", "d1", t, 29, 34, "C2", "fever", True, False, False),
        ("2", "dbl", "d1", t, 29, 34, "C9", "fever", True, False, False),
        # annotator-1 only span
        ("1", "dbl", "d1", t, 35, 40, "C3", "today", True, False, False),
        # annotator-2 only span
        ("2", "dbl", "d1", t, 4, 11, "C4", "patient", True, False, False),
        # same span+cui but flag mismatch (deleted) -> dropped
        ("1", "dbl", "d1", t, 0, 3, "C5", "the", True, False, False),
        ("2", "dbl", "d1", t, 0, 3, "C5", "the", True, False, True),
        # unvalidated agreement -> not kept (validated gate)
        ("1", "dbl", "d1", t, 12, 15, "C6", "has", False, False, False),
        ("2", "dbl", "d1", t, 12, 15, "C6", "has", False, False, False),
        # single project without a partner
        ("7", "solo", "d9", t, 16, 24, "C1", "diabetes", True, False, False),
    ]
    mct = spark.createDataFrame(rows, cols)

    strict = consolidate_annotations(mct).collect()
    assert {(r["start"], r["cui"]) for r in strict} == {(16, "C1")}

    loose = consolidate_annotations(mct, require_double_inner=False)
    got = {(r["start"], r["cui"]) for r in loose.collect()}
    # agreement + both one-sided validated spans; disagreement and the
    # flag-mismatch span stay dropped (both annotators DID annotate it)
    assert got == {(16, "C1"), (35, "C3"), (4, "C4")}

    passthru = consolidate_annotations(mct, require_double=False)
    got2 = {(r["project_id"], r["start"]) for r in passthru.collect()}
    assert ("7", 16) in got2           # solo project carried as-is
    assert ("1", 16) in got2 and ("1", 29) not in got2


def test_mc_train_test_split_invariants(spark):
    """Reference make_mc_train_test invariants (utils/data_utils.py:
    817-955): test share ~ test_size of annotations, admitting CUIs stay
    under max_test_fraction, rare CUIs alone can't put a doc in test."""
    from pyspark.sql import functions as F
    from medcat_spark.stats import mc_train_test_split
    rows = []
    for i in range(200):
        rows.append((f"d{i}", f"C{i % 8}"))          # common cuis (25 each)
        if i % 40 == 0:
            rows.append((f"d{i}", "RARE"))           # 5 examples only
    ann = spark.createDataFrame(rows, "doc_id string, cui string")
    split = mc_train_test_split(ann, test_size=0.2, min_test_count=10,
                                max_test_fraction=0.3)
    j = ann.join(split, "doc_id")
    total = j.count()
    test = j.where("split = 'test'")
    n_test = test.count()
    assert 0 < n_test <= 0.3 * total          # filled, but bounded
    # the admitting-cui cap: no common cui exceeds 30% in test
    per = {r["cui"]: r["n"] for r in
           test.groupBy("cui").agg(F.count("*").alias("n")).collect()}
    for c, n in per.items():
        if c != "RARE":
            assert n / 25 <= 0.3 + 1e-9, (c, n)
    # determinism across partitionings
    again = mc_train_test_split(ann.repartition(7), test_size=0.2,
                                min_test_count=10, max_test_fraction=0.3)
    assert sorted(map(tuple, split.collect())) == \
        sorted(map(tuple, again.collect()))


def test_project_cui_filters(spark):
    """Reference get_project_filters/check_filters: a project's cuis
    string restricts its annotations; empty filter = allow all."""
    from medcat_spark.sources.mct_export import (filter_by_project,
                                                 project_cui_filters)
    mct = spark.createDataFrame(
        [("1", "C1, C3", "d1", "C1"), ("1", "C1, C3", "d1", "C2"),
         ("1", "C1, C3", "d2", "C3"),
         ("2", "", "d3", "C9"), ("2", "", "d3", "C1")],
        "project_id string, project_cuis string, doc_id string, cui string")
    filt = project_cui_filters(mct)
    got = {(r["project_id"], r["cui"]) for r in filt.collect()}
    assert got == {("1", "C1"), ("1", "C3")}
    kept = {(r["project_id"], r["doc_id"], r["cui"])
            for r in filter_by_project(mct, filt).collect()}
    # C2 dropped from the filtered project; project 2 (no filter) intact
    assert kept == {("1", "d1", "C1"), ("1", "d2", "C3"),
                    ("2", "d3", "C9"), ("2", "d3", "C1")}
