"""Hierarchy-aware regression grading (VERDICT r01 item 9): Finding
determiner vs reference results.py:117-280 over a 2-level fixture
ontology, strictness matrix, and YAML suite ingestion."""

import textwrap

from medcat_spark.config import EngineConfig
from medcat_spark.fixtures import trained_fixture_models
from medcat_spark.regression import (Finding, STRICTNESS_MATRIX, Strictness,
                                     determine_finding, read_regression_yaml,
                                     run_yaml_suite)

PT2CH = {"P": ["C1"], "C1": ["C2"]}  # P -> C1 -> C2


def _e(start, end, cui):
    return {"start": start, "end": end, "cui": cui}


def test_raw_span_findings():
    f = lambda s, e: determine_finding("P", 10, 20, [_e(s, e, "P")], PT2CH)[0]
    assert f(10, 20) is Finding.IDENTICAL
    assert f(10, 15) is Finding.SMALLER_SPAN
    assert f(12, 20) is Finding.SMALLER_SPAN
    assert f(5, 20) is Finding.BIGGER_SPAN_LEFT
    assert f(10, 25) is Finding.BIGGER_SPAN_RIGHT
    assert f(5, 25) is Finding.BIGGER_SPAN_BOTH
    assert f(5, 15) is Finding.PARTIAL_OVERLAP
    assert f(21, 30) is Finding.FAIL  # no overlap -> not correct-cui path


def test_found_any_child_direct_and_transitive():
    finding, alt = determine_finding("P", 0, 4, [_e(0, 4, "C1")], PT2CH)
    assert finding is Finding.FOUND_ANY_CHILD and alt == "C1"
    # grandchild found -> still FOUND_ANY_CHILD (transitive walk)
    finding, alt = determine_finding("P", 0, 4, [_e(0, 4, "C2")], PT2CH)
    assert finding is Finding.FOUND_ANY_CHILD and alt == "C2"


def test_found_child_partial():
    finding, alt = determine_finding("P", 0, 10, [_e(0, 5, "C1")], PT2CH)
    assert finding is Finding.FOUND_CHILD_PARTIAL and alt == "C1"


def test_found_parent_and_grandparent():
    finding, alt = determine_finding("C1", 0, 4, [_e(0, 4, "P")], PT2CH)
    assert finding is Finding.FOUND_DIR_PARENT and alt == "P"
    finding, alt = determine_finding("C2", 0, 4, [_e(0, 4, "P")], PT2CH)
    assert finding is Finding.FOUND_DIR_GRANDPARENT and alt == "P"


def test_found_other_and_fail():
    finding, alt = determine_finding("P", 0, 4, [_e(0, 4, "ZZZ")], PT2CH)
    assert finding is Finding.FOUND_OTHER and alt == "ZZZ"
    assert determine_finding("P", 0, 4, [], PT2CH)[0] is Finding.FAIL
    assert determine_finding("P", 0, 4, [_e(9, 12, "ZZZ")], PT2CH)[0] \
        is Finding.FAIL


def test_strict_only_mode():
    finding, _ = determine_finding("P", 0, 4, [_e(0, 4, "C1")], PT2CH,
                                   strict_only=True)
    assert finding is Finding.FAIL


def test_strictness_matrix():
    assert STRICTNESS_MATRIX[Strictness.STRICTEST] == {Finding.IDENTICAL}
    assert Finding.FOUND_ANY_CHILD in STRICTNESS_MATRIX[Strictness.STRICT]
    assert Finding.SMALLER_SPAN not in STRICTNESS_MATRIX[Strictness.STRICT]
    assert Finding.SMALLER_SPAN in STRICTNESS_MATRIX[Strictness.NORMAL]
    assert Finding.FOUND_DIR_PARENT not in STRICTNESS_MATRIX[Strictness.NORMAL]
    assert Finding.FOUND_DIR_PARENT in STRICTNESS_MATRIX[Strictness.LENIENT]


YAML_SUITE = textwrap.dedent("""\
    case-mi:
      targeting:
        placeholders:
          - placeholder: '[DISORDER]'
            cuis: ['C0003', 'C0005']
          - placeholder: '[FINDING]'
            cuis: ['C0010', 'C0010']
        any-combination: false
      phrases:
        - 'patient presented with [DISORDER] and [FINDING] last night'
    """)


def test_yaml_parse_and_run(tmp_path):
    p = tmp_path / "suite.yml"
    p.write_text(YAML_SUITE)
    cases = read_regression_yaml(str(p))
    assert len(cases) == 1
    assert cases[0].placeholders[0].cuis == ["C0003", "C0005"]
    assert not cases[0].any_combination

    cdb, vocab = trained_fixture_models()
    cdb.addl_info["pt2ch"] = {}
    res = run_yaml_suite(str(p), cdb, vocab, EngineConfig())
    # 2 slots x (target placeholder x its names + other placeholder names)
    assert res["n"] >= 6
    assert res["pass_pct"] == 100.0, res["rows"]


def test_yaml_suite_found_any_child_via_hierarchy(tmp_path):
    # model knows only 'heart attack' (C0003); suite asks for a synthetic
    # parent CUI whose child is C0003 -> FOUND_ANY_CHILD under STRICT
    p = tmp_path / "suite.yml"
    p.write_text(textwrap.dedent("""\
        case-parent:
          targeting:
            placeholders:
              - placeholder: '[DISORDER]'
                cuis: ['CPARENT']
          phrases:
            - 'patient presented with [DISORDER] yesterday'
        """))
    cdb, vocab = trained_fixture_models()
    cdb.addl_info["pt2ch"] = {"CPARENT": ["C0003"]}
    # CPARENT itself has one name in the model: the child's surface form
    cdb.cui2names["CPARENT"] = {"heart~attack"}
    res = run_yaml_suite(str(p), cdb, vocab, EngineConfig(),
                         strictness=Strictness.STRICT)
    assert res["n"] == 1
    assert res["rows"][0]["finding"] == "FOUND_ANY_CHILD"
    assert res["rows"][0]["alt_cui"] == "C0003"
    assert res["pass_pct"] == 100.0
