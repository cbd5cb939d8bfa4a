"""End-to-end entity-linking scenarios ported from the reference's own
suite (reference tests/test_entity_linking.py:44-141): lemmatization on
non-fixture text, diacritics, uppercase-acronym gating, multi-candidate
disambiguation — the axes synthetic fixtures can't cover (the round-1
fixtures were fixed points of the lemmatizer; these are not).
"""

import pytest

from medcat_spark.core.annotate import annotate_document
from medcat_spark.core.normalizer import lemmatize, tag_lite
from medcat_spark.fixtures_scenario import (SCENARIO_CASES, scenario_models)
from medcat_spark.pipeline import annotate, broadcast_model
from medcat_spark.stats import overall_stats

EMPTY = frozenset()
DEFAULT_DNN = frozenset({"VBD", "VBG", "VBN", "VBP", "JJS", "JJR"})


@pytest.fixture(scope="module")
def scenario():
    return scenario_models()


# ---------------------------------------------------------------------------
# lemmatizer / POS-lite unit semantics
# ---------------------------------------------------------------------------

def test_lemmatize_pos_gated():
    # default config: verb-ish tags are NOT normalized (reference
    # config.py:407-415 do_not_normalize)
    assert lemmatize("falling", DEFAULT_DNN) == "falling"
    assert lemmatize("treated", DEFAULT_DNN) == "treated"
    # scenario config (do_not_normalize={}): verbs ARE lemmatized
    assert lemmatize("falling", EMPTY) == "fall"
    assert lemmatize("running", EMPTY) == "run"
    assert lemmatize("treated", EMPTY) == "treat"
    assert lemmatize("admitted", EMPTY) == "admit"
    assert lemmatize("carried", EMPTY) == "carry"
    assert lemmatize("making", EMPTY) == "make"
    assert lemmatize("diagnosed", EMPTY) == "diagnose"
    # nominal -ing/-ed words never get stripped
    assert lemmatize("during", EMPTY) == "during"
    assert lemmatize("morning", EMPTY) == "morning"
    assert lemmatize("hundred", EMPTY) == "hundred"
    # noun plural rules are unaffected by the gate
    assert lemmatize("viruses", EMPTY) == "virus"
    assert lemmatize("cancers", DEFAULT_DNN) == "cancer"
    # -er nouns are never treated as comparatives
    assert lemmatize("fever", EMPTY) == "fever"
    assert lemmatize("cancer", EMPTY) == "cancer"
    assert lemmatize("bigger", EMPTY) == "big"
    assert lemmatize("bigger", DEFAULT_DNN) == "bigger"


def test_tag_lite():
    assert tag_lite("falling") == "VBG"
    assert tag_lite("treated") == "VBD"
    assert tag_lite("bigger") == "JJR"
    assert tag_lite("biggest") == "JJS"
    assert tag_lite("during") is None
    assert tag_lite("cancer") is None
    assert tag_lite("chest") is None


# ---------------------------------------------------------------------------
# the reference's scenario assertions, through the kernel
# ---------------------------------------------------------------------------

def test_diacritics_in_cdb(scenario):
    # reference test_entity_linking.py:96-97
    cdb, _, _ = scenario
    assert "ménière" in cdb.cui2snames["C0025281"]


@pytest.mark.parametrize("case_id,text,expected,forbidden",
                         SCENARIO_CASES,
                         ids=[c[0] for c in SCENARIO_CASES])
def test_scenario_case(scenario, case_id, text, expected, forbidden):
    cdb, vocab, cfg = scenario
    ents, _ = annotate_document(text, cdb, vocab, cfg)
    linked = [e.cui for e in ents]
    for cui in expected:
        assert cui in linked, f"{case_id}: expected {cui} in {linked}"
    for cui in forbidden:
        assert cui not in linked, f"{case_id}: forbidden {cui} in {linked}"


def test_non_abbrev_cases_link_nothing(scenario):
    # reference test_entity_linking.py:118-127: lowercase 'map'/'Map'
    # sentences must produce ZERO entities
    cdb, vocab, cfg = scenario
    for case_id in ("lower_non_abbrev", "title_non_abbrev"):
        text = next(c[1] for c in SCENARIO_CASES if c[0] == case_id)
        ents, _ = annotate_document(text, cdb, vocab, cfg)
        assert ents == []


def test_surgery_disambiguates_by_context(scenario):
    # 'surgery' maps to two P-status CUIs (C0543467 procedure /
    # C1274039 discipline); the linker must pick per-context via trained
    # context vectors, above threshold (reference leaves the winner
    # unasserted; determinism here comes from the seeded fixture train)
    cdb, vocab, cfg = scenario
    text = next(c[1] for c in SCENARIO_CASES if c[0] == "entity_linking")
    ents, _ = annotate_document(text, cdb, vocab, cfg)
    surg = [e for e in ents if e.detected_name == "surgery"]
    assert len(surg) == 2
    for e in surg:
        assert e.cui in {"C0543467", "C1274039"}
        assert e.context_similarity >= cfg.similarity_threshold


# ---------------------------------------------------------------------------
# Spark end-to-end + the P/R >= 0.95 gate on scenario (non-fixture) text
# ---------------------------------------------------------------------------

def _gold_rows(scenario_cdb_ann):
    """Hand-derived gold (doc_id, start, cui) from the reference's
    expected entities; spans located by surface form in each text."""
    gold = []

    def find_all(text, needle):
        out, i = [], text.find(needle)
        while i >= 0:
            out.append(i)
            i = text.find(needle, i + 1)
        return out

    cases = {c[0]: c[1] for c in SCENARIO_CASES}
    t = cases["entity_linking"]
    for n, cui in [("chemotherapy", "C3665472"), ("radiotherapy", "C1522449")]:
        for s in find_all(t, n):
            gold.append(("entity_linking", s, cui))
    gold.append(("entity_linking", t.find("NSCLC"), "C0007131"))
    gold.append(("entity_linking", t.find("SCLC", t.find("whereas")), "C0149925"))
    gold.append(("entity_linking", t.find("lung cancer"), "C0242379"))
    # surgery winners per deterministic seeded training (not asserted by
    # the reference; both CUIs are acceptable senses of the shared name)
    surg = find_all(t, "surgery")
    gold.append(("entity_linking", surg[0], "C0543467"))
    gold.append(("entity_linking", surg[1], "C1274039"))

    gold.append(("lemma_not_required",
                 cases["lemma_not_required"].find("fall"), "C0085639"))
    gold.append(("lemma_required",
                 cases["lemma_required"].find("falling"), "C0085639"))
    gold.append(("diacritics", 0, "C0025281"))
    gold.append(("upper_mid_sentence",
                 cases["upper_mid_sentence"].find("MAP"), "C0026045"))
    gold.append(("upper_start_sentence", 0, "C0026045"))
    gold.append(("upper_non_abbrev", 0, "C0699967"))
    gold.append(("upper_non_abbrev",
                 cases["upper_non_abbrev"].find("cancer"), "C0006826"))
    return gold


def test_spark_pipeline_pr_gate(spark, scenario):
    cdb, vocab, cfg = scenario
    bc = broadcast_model(spark, cdb, vocab, cfg)
    docs = spark.createDataFrame(
        [(c[0], c[1]) for c in SCENARIO_CASES], "doc_id string, text string")
    pred = annotate(docs, bc).select("doc_id", "start", "cui")
    gold = spark.createDataFrame(_gold_rows(cdb),
                                 "doc_id string, start int, cui string")
    stats = overall_stats(pred, gold)
    # north-rule gate: P/R >= 0.95 vs the reference-derived gold
    assert stats["precision"] >= 0.95, stats
    assert stats["recall"] >= 0.95, stats


def test_unigram34_negative_sampling_distribution():
    """VERDICT item 6: sampling frequencies follow cnt^(3/4)
    (reference vocab.py:179-242)."""
    import random

    from medcat_spark.core.model import VocabModel
    import numpy as np

    v = VocabModel()
    counts = {"alpha": 810000, "beta": 160000, "gamma": 10000}
    for w, c in counts.items():
        v.add(w, c, np.ones(4))
    v.add("novec", 999999, None)  # words without vectors are excluded

    rng = random.Random(7)
    n = 30000
    sampled = v.get_negative_samples(n, rng)
    assert "novec" not in sampled
    freqs = {w: sampled.count(w) / n for w in counts}
    p = {w: counts[w] ** 0.75 for w in counts}
    z = sum(p.values())
    for w in counts:
        assert abs(freqs[w] - p[w] / z) < 0.02, (w, freqs[w], p[w] / z)


def test_negative_sampling_punct_filter():
    import random

    import numpy as np

    from medcat_spark.core.model import VocabModel
    v = VocabModel()
    v.add("word", 100, np.ones(4))
    v.add("123", 100000, np.ones(4))   # no letters -> filtered
    rng = random.Random(3)
    sampled = v.get_negative_samples(200, rng, ignore_punct_and_num=True)
    assert sampled and all(w == "word" for w in sampled)
