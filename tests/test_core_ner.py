"""Core NER behavioral tests mirroring the reference's own sweep
(/root/reference/tests/test_ner.py:56-95) and tokenizer semantics."""

from medcat_spark.config import EngineConfig
from medcat_spark.core.annotate import preprocess
from medcat_spark.core.model import CdbModel, prepare_name
from medcat_spark.core.ner import detect_entities
from medcat_spark.core.tokenizer import tag_skip_and_punct, tokenize

TEXT = "CDB - I was running and then Movar    Viruses attacked and CDb"


def make_cdb(cfg):
    cdb = CdbModel()
    cdb.add_concept("S-229004", prepare_name("Movar", cfg), set(), "A", set(), "")
    cdb.add_concept("S-229004", prepare_name("Movar viruses", cfg), set(), "A", set(), "")
    cdb.add_concept("S-229005", prepare_name("CDB", cfg), set(), "A", set(), "")
    return cdb


def ner_config(**kw):
    base = dict(max_skip_tokens=1, upper_case_limit_len=4,
                disamb_length_limit=2)
    base.update(kw)
    return EngineConfig(**base)


def run_ner(cfg):
    cdb = make_cdb(cfg)
    toks = preprocess(TEXT, cdb, cfg)
    return detect_entities(toks, TEXT, cdb, cfg)


def test_tokenizer_splits_whitespace_run_per_char():
    cfg = EngineConfig()
    toks = tokenize("Movar    Viruses", cfg)
    assert [t.text for t in toks] == ["Movar", " ", " ", " ", "Viruses"]
    assert [t.start for t in toks] == [0, 6, 7, 8, 9]


def test_tokenizer_punct_and_offsets():
    cfg = EngineConfig()
    toks = tokenize("a-b.c @x 1,2", cfg)
    assert [t.text for t in toks] == ["a", "-", "b", ".", "c", "@x", "1", ",", "2"]
    text = "a-b.c @x 1,2"
    assert all(text[t.start:t.end] == t.text for t in toks)


def test_tagger_flags():
    cfg = EngineConfig()
    toks = tag_skip_and_punct(tokenize("x . : - nos the", cfg), cfg)
    flags = {t.text: (t.is_punct, t.to_skip) for t in toks}
    assert flags["."] == (False, False)   # keep_punct
    assert flags[":"] == (False, False)
    assert flags["-"] == (True, True)
    assert flags["nos"] == (False, True)  # words_to_skip
    assert flags["the"] == (False, False)  # skip_stopwords=False default


def test_cdb_names_golden():
    # reference test_ner.py:70-72 target (modulo our lemmatizer: 'virus'
    # where spaCy en_core_web_md emits the quirk 'viruse')
    cfg = ner_config()
    cdb = make_cdb(cfg)
    assert cdb.cui2names == {
        "S-229004": {"movar", "movar~viruses", "movar~virus"},
        "S-229005": {"cdb"},
    }


def test_entities_length_max_skip_1():
    # reference test_ab: 2 entities (gap of 3 ws tokens > max_skip 1)
    ents = run_ner(ner_config())
    assert len(ents) == 2
    assert ents[0].link_candidates[0] == "S-229005"  # CDB first in text
    assert ents[1].link_candidates[0] == "S-229004"


def test_entities_length_max_skip_3():
    # reference test_ad: 3 entities
    ents = run_ner(ner_config(max_skip_tokens=3))
    assert len(ents) == 3
    names = [e.detected_name for e in ents]
    assert "movar~virus" in names or "movar~viruses" in names


def test_entities_upper_case_limit_3():
    # reference test_ae: 4 entities (trailing lowercase-ish 'CDb' now passes)
    ents = run_ner(ner_config(max_skip_tokens=3, upper_case_limit_len=3))
    assert len(ents) == 4


def test_entities_min_name_len_4():
    # reference test_af: 2 entities (len('cdb') < 4)
    ents = run_ner(ner_config(max_skip_tokens=3, upper_case_limit_len=3,
                              min_name_len=4))
    assert len(ents) == 2


def test_entity_offsets_and_source_value():
    ents = run_ner(ner_config(max_skip_tokens=3))
    movar_viruses = [e for e in ents if e.detected_name.startswith("movar~")][0]
    assert TEXT[movar_viruses.start:movar_viruses.end] == "Movar    Viruses"
    assert movar_viruses.source_value == "Movar    Viruses"
