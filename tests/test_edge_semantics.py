"""Edge-config semantics: dynamic thresholds, reverse word order,
uppercase-name checking, diacritics, doc trimming, Word2Vec vocab —
plus hypothesis property tests for the tokenizer."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from medcat_spark.config import EngineConfig
from medcat_spark.core.annotate import annotate_document
from medcat_spark.core.model import CdbModel, prepare_name
from medcat_spark.core.ner import detect_entities
from medcat_spark.core.annotate import preprocess
from medcat_spark.core.tokenizer import tokenize
from medcat_spark.fixtures import trained_fixture_models


# --- tokenizer properties ---------------------------------------------------

@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(codec="ascii",
                                      exclude_characters="\x00"),
               max_size=120))
def test_tokenizer_offsets_are_exact_slices(text):
    cfg = EngineConfig()
    toks = tokenize(text, cfg)
    for t in toks:
        assert text[t.start:t.end] == t.text
    # tokens are ordered and non-overlapping
    for a, b in zip(toks, toks[1:]):
        assert a.end <= b.start


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="ab @.-\n", max_size=80))
def test_tokenizer_covers_every_non_separator_char(text):
    """Every char except single-separator spaces appears in exactly one
    token (the spaCy custom-tokenizer semantics)."""
    cfg = EngineConfig()
    toks = tokenize(text, cfg)
    covered = set()
    for t in toks:
        for i in range(t.start, t.end):
            assert i not in covered
            covered.add(i)
    for i, ch in enumerate(text):
        if ch != " ":
            assert i in covered, (text, i, ch)


# --- config-gated behaviors -------------------------------------------------

def test_dynamic_similarity_threshold():
    cdb, vocab = trained_fixture_models()
    cfg = EngineConfig(similarity_threshold_type="dynamic",
                       similarity_threshold=1.0)
    text = "the virus k strain recovered from blood"
    # dynamic: accept iff sim >= avg_confidence[cui] * th
    # with no average recorded, every sim >= 0 passes; with a recorded
    # high average, weak links are rejected
    main, _ = annotate_document(text, cdb, vocab, cfg)
    linked = [e for e in main if e.detected_name == "virus"]
    if linked:
        cui = linked[0].cui
        cdb.cui2average_confidence[cui] = 2.0  # impossible bar
        main2, _ = annotate_document(text, cdb, vocab, cfg)
        assert not [e for e in main2 if e.detected_name == "virus"]


def test_try_reverse_word_order():
    """Reference semantics (vocab_based_ner.py:82-93): the reverse check
    fires only while EXTENDING a matched forward prefix — the reversed
    concatenation ``version + '~' + name`` is probed against snames."""
    cfg = EngineConfig(try_reverse_word_order=True)
    cdb = CdbModel()
    cdb.add_concept("R1", prepare_name("kidney", cfg), set(), "P", set(), "")
    cdb.add_concept("R2", prepare_name("failure kidney", cfg), set(), "P",
                    set(), "")
    text = "kidney failure noted"  # dict has the reversed name
    toks = preprocess(text, cdb, cfg)
    ents = detect_entities(toks, text, cdb, cfg)
    assert any(e.detected_name == "failure~kidney" for e in ents)
    # without the flag only the unigram matches
    cfg2 = EngineConfig()
    ents2 = detect_entities(preprocess(text, cdb, cfg2), text, cdb, cfg2)
    assert [e.detected_name for e in ents2] == ["kidney"]


def test_check_upper_case_names_rejects_lowercase_acronym():
    cfg = EngineConfig(check_upper_case_names=True, upper_case_limit_len=3)
    cdb = CdbModel()
    cdb.add_concept("U1", prepare_name("CDB", cfg), set(), "P", set(), "")
    assert cdb.name_isupper["cdb"] is True
    text = "the cdb was loaded"
    ents = detect_entities(preprocess(text, cdb, cfg), text, cdb, cfg)
    assert not ents  # lowercase occurrence of an uppercase-only name
    text2 = "the CDB was loaded"
    ents2 = detect_entities(preprocess(text2, cdb, cfg), text2, cdb, cfg)
    assert len(ents2) == 1


def test_diacritics_tokenization():
    cfg = EngineConfig(diacritics=True)
    toks = tokenize("café naïve", cfg)
    assert [t.text for t in toks] == ["café", "naïve"]
    cfg2 = EngineConfig(diacritics=False)
    toks2 = tokenize("café", cfg2)
    assert [t.text for t in toks2] == ["caf", "é"]


def test_max_document_length_trim():
    cdb, vocab = trained_fixture_models()
    cfg = EngineConfig(max_document_length=30)
    text = "x" * 25 + " heart attack and fever later"
    main, _ = annotate_document(text, cdb, vocab, cfg)
    assert not [e for e in main if e.start > 30]


def test_word2vec_vocab_build(spark):
    from medcat_spark.model_ops import build_vocab_word2vec
    rows = [("d%d" % i,
             "alpha beta gamma delta " * 5) for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    vecs = build_vocab_word2vec(docs, dim=8, min_count=2).collect()
    words = {r["word"] for r in vecs}
    assert {"alpha", "beta", "gamma", "delta"} <= words
    assert all(len(r["vec"]) == 8 for r in vecs)


@settings(max_examples=100, deadline=None)
@given(st.lists(
    st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=3, max_size=8),
    min_size=1, max_size=3))
def test_cdb_ner_roundtrip_property(words):
    """Round-trip invariant: any name ingested through prepare_name +
    add_concept is detected by NER in text containing it verbatim
    (provided the acceptance rules pass: length >= upper_case_limit_len,
    first token not a stopword)."""
    from medcat_spark.config import DEFAULT_STOPWORDS
    cfg = EngineConfig()
    if words[0] in DEFAULT_STOPWORDS or words[0] in cfg.words_to_skip:
        return
    raw = " ".join(words)
    names = prepare_name(raw, cfg)
    if not names:
        return
    cdb = CdbModel()
    cdb.add_concept("P1", names, set(), "P", set(), "")
    text = f"zqzq {raw} zqzq"
    toks = preprocess(text, cdb, cfg)
    ents = detect_entities(toks, text, cdb, cfg)
    expect_hit = any(len(n) >= cfg.upper_case_limit_len for n in names)
    if expect_hit:
        assert any(e.detected_name in names for e in ents), \
            (raw, sorted(names), [e.detected_name for e in ents])


# ---------------------------------------------------------------------------
# round-2 property tests: POS-gated lemmatizer + multi-probe bucket sets
# ---------------------------------------------------------------------------

from medcat_spark.core.normalizer import (_ED_NOMINAL, _ING_NOMINAL,
                                          lemmatize, tag_lite)
from medcat_spark.functions.similarity import probe_buckets

_DNN_DEFAULT = frozenset({"VBD", "VBG", "VBN", "VBP", "JJS", "JJR"})


@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1,
               max_size=14))
@settings(max_examples=300, deadline=None)
def test_lemmatize_properties(word):
    for dnn in (_DNN_DEFAULT, frozenset()):
        out = lemmatize(word, dnn)
        assert out, (word, dnn)                       # never empty
        assert out == out.lower()                     # stays lowercase
        assert len(out) <= len(word) + 1              # -ies→y only grows by 0
    # default config: tagged verb-ish forms are never rewritten
    if tag_lite(word) in _DNN_DEFAULT:
        assert lemmatize(word, _DNN_DEFAULT) == word


@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=6,
               max_size=14))
@settings(max_examples=200, deadline=None)
def test_ing_ed_gating(word):
    if word.endswith("ing") and word not in _ING_NOMINAL:
        assert lemmatize(word, _DNN_DEFAULT) == word        # gated
        assert not lemmatize(word, frozenset()).endswith("ing")  # stripped
    if word.endswith("ed") and word not in _ED_NOMINAL:
        assert lemmatize(word, _DNN_DEFAULT) == word


@given(st.text(alphabet="01", min_size=1, max_size=8),
       st.integers(min_value=0, max_value=3))
@settings(max_examples=200, deadline=None)
def test_probe_buckets_properties(bucket, n_flips):
    probes = probe_buckets(bucket, n_flips)
    assert bucket in probes
    smaller = set(probe_buckets(bucket, max(n_flips - 1, 0)))
    assert smaller <= set(probes)                     # monotone in n_flips
    for p in probes:
        ham = sum(a != b for a, b in zip(p, bucket))
        assert len(p) == len(bucket) and ham <= n_flips
