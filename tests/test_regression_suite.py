"""Regression-suite analogue (SURVEY §5.5): template phrases filled from
the fixture ontology, graded IDENTICAL/SMALLER_SPAN/FOUND_ANY/FAIL."""

from medcat_spark.config import EngineConfig
from medcat_spark.fixtures import trained_fixture_models
from medcat_spark.regression import RegressionCase, grade, run_suite


def test_regression_suite_passes_on_fixture_model():
    cdb, vocab = trained_fixture_models()
    cfg = EngineConfig()
    cases = [
        RegressionCase("mi", "patient presented with [CONCEPT] last night",
                       "C0003"),
        RegressionCase("renal", "history of [CONCEPT] and fever", "C0005"),
        RegressionCase("dm", "suffering from [CONCEPT] for years", "C0006"),
    ]
    res = run_suite(cases, cdb, vocab, cfg)
    assert res["n"] >= 6  # >= 2 name variants per case
    assert res["pass_pct"] >= 95.0, res["rows"]


def test_regression_grades_fail_for_unknown_cui():
    cdb, vocab = trained_fixture_models()
    cfg = EngineConfig()
    # a CUI with no names -> no variants; grade empty
    rows = grade(RegressionCase("none", "x [CONCEPT] y", "NOPE"),
                 cdb, vocab, cfg)
    assert rows == []


import os

import pytest

_DEFAULT_YML = "/root/reference/configs/default_regression_tests.yml"


@pytest.mark.skipif(not os.path.exists(_DEFAULT_YML),
                    reason="reference default suite not present")
def test_default_regression_yaml_runs_end_to_end():
    """Execute the reference's OWN default regression suite file
    (configs/default_regression_tests.yml — real SNOMED CUIs, multi-
    placeholder phrases, NEGFINDING slots) through the YAML runner with
    a placeholder CDB: every CUI the suite names gets a unique synthetic
    two-token name, so the pipeline must tokenize the filled phrases,
    greedy-match the names, direct-link (single candidate, status P) and
    land every target span IDENTICAL."""
    from medcat_spark.fixtures import build_fixture_cdb
    from medcat_spark.core.model import VocabModel
    from medcat_spark.regression import (read_regression_yaml,
                                         run_yaml_suite, yaml_subcases)

    cfg = EngineConfig()
    cases = read_regression_yaml(_DEFAULT_YML)
    assert cases, "default suite parsed empty"
    cuis = sorted({c for case in cases
                   for ph in case.placeholders for c in ph.cuis})
    rows = [(cui, f"sign{i:03d} mark{i:03d}", "", "P", "T047", "")
            for i, cui in enumerate(cuis)]
    cdb = build_fixture_cdb(cfg, rows=rows)

    n_sub = sum(1 for case in cases
                for _ in yaml_subcases(case, cdb, cfg))
    res = run_yaml_suite(_DEFAULT_YML, cdb, VocabModel(), cfg)
    assert res["n"] == n_sub and res["n"] >= 20, res["n"]
    assert res["pass_pct"] == 100.0, \
        [r for r in res["rows"] if not r["pass"]][:5]
