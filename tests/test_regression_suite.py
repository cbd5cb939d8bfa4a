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
