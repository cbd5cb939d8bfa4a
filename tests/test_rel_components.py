"""RelCAT component dirs (rel_*) import: WordPiece tokenizer + BERT /
LLaMA heads loaded from the reference's on-disk layout
(utils/relation_extraction/base_component.py:80-101)."""

import os

import numpy as np
import pytest

from medcat_spark.core.bbpe import WordPieceTokenizer
from medcat_spark.functions.bert_np import relcat_bert_fixture_model
from medcat_spark.sources.reference_pack import (
    _load_rel_component, write_reference_rel_component)


def _marked_batch(rs, tag_ids, vocab_hi, rows):
    """Batch of sequences shaped ..[s1] tok tok [e1].. ..[s2] tok [e2]..
    — the marked-sequence format every loaded rel component consumes."""
    s1, e1, s2, e2 = tag_ids
    ids = []
    for _ in range(rows):
        ids.append([int(rs.randint(0, vocab_hi)), s1,
                    int(rs.randint(0, vocab_hi)),
                    int(rs.randint(0, vocab_hi)), e1,
                    int(rs.randint(0, vocab_hi)), s2,
                    int(rs.randint(0, vocab_hi)), e2,
                    int(rs.randint(0, vocab_hi))])
    starts = np.array([[1, 6]] * rows)
    return np.asarray(ids, dtype=np.int64), starts


def test_wordpiece_greedy_longest_match():
    vocab = {t: i for i, t in enumerate(
        ["[PAD]", "[UNK]", "un", "##aff", "##able", "##ord",
         "heart", "attack", ",", "the"])}
    tok = WordPieceTokenizer(vocab)
    ids, spans = tok.encode_with_offsets("the unaffable heart attack,")
    toks = [tok.id2tok[i] for i in ids]
    assert toks == ["the", "un", "##aff", "##able", "heart", "attack", ","]
    # offsets address the original characters
    text = "the unaffable heart attack,"
    assert text[spans[1][0]:spans[3][1]] == "unaffable"
    assert text[spans[-1][0]:spans[-1][1]] == ","


def test_wordpiece_unk_and_save_load(tmp_path):
    vocab = {t: i for i, t in enumerate(["[PAD]", "[UNK]", "known"])}
    tok = WordPieceTokenizer(vocab)
    ids, spans = tok.encode_with_offsets("known zzz known")
    assert [tok.id2tok[i] for i in ids] == ["known", "[UNK]", "known"]
    tok.save(str(tmp_path))
    tok2 = WordPieceTokenizer.load(str(tmp_path))
    assert tok2.vocab == vocab
    assert tok2.encode("known zzz") == tok.encode("known zzz")


@pytest.fixture(scope="module")
def bert_rel(tmp_path_factory):
    m = relcat_bert_fixture_model()
    d = str(tmp_path_factory.mktemp("rel") / "rel_Task")
    write_reference_rel_component(d, m, n_heads=2)
    return m, d


def test_rel_component_round_trip_bert(bert_rel):
    m, d = bert_rel
    assert os.path.exists(os.path.join(d, "model.dat"))
    assert os.path.exists(os.path.join(d, "config.json"))
    m2 = _load_rel_component(d)
    assert m2.labels == m.labels
    assert m2.tag_ids == m.tag_ids
    # window/context fields survive the round trip (r4 review finding)
    assert m2.cntx_left == m.cntx_left
    assert m2.cntx_right == m.cntx_right
    assert m2.window_size_chars == m.window_size_chars
    assert m2.max_seq_length == m.max_seq_length
    rs = np.random.RandomState(3)
    # marked sequences (the tag-pooling path requires every row to
    # contain all four [s1]/[e1]/[s2]/[e2] markers, like the reference)
    ids, starts = _marked_batch(rs, m.tag_ids, vocab_hi=50, rows=3)
    # float32 round trip: predictions equal, logits close
    assert np.abs(m.logits(ids, starts)
                  - m2.logits(ids, starts)).max() < 1e-5
    assert m.predict(ids, starts) == m2.predict(ids, starts)


def test_rel_component_round_trip_llama(tmp_path):
    from medcat_spark.functions.llama_np import (RelCatLlamaModel,
                                                 llama_fixture_state_dict)
    base = RelCatLlamaModel.from_state_dict(
        llama_fixture_state_dict(), ["A", "B", "C"], 2, 1)
    base.tag_ids = [60, 61, 62, 63]
    base.tokenizer = WordPieceTokenizer(
        {t: i for i, t in enumerate(
            ["[PAD]", "[UNK]", "spark", "merge", "[s1]", "[e1]",
             "[s2]", "[e2]"])})
    d = str(tmp_path / "rel_L")
    write_reference_rel_component(d, base, n_heads=2)
    m2 = _load_rel_component(d)
    assert type(m2).__name__ == "RelCatLlamaModel"
    assert m2.use_pooled_output == base.use_pooled_output
    rs = np.random.RandomState(5)
    ids, starts = _marked_batch(rs, base.tag_ids, vocab_hi=60, rows=2)
    assert base.predict(ids, starts) == m2.predict(ids, starts)


def test_rel_component_discovered_in_pack(tmp_path, bert_rel):
    import shutil
    from medcat_spark.config import EngineConfig
    from medcat_spark.fixtures import trained_fixture_models
    from medcat_spark.sources.reference_pack import (
        load_reference_pack, write_reference_layout_pack)
    m, d = bert_rel
    cdb, vocab = trained_fixture_models()
    pack = str(tmp_path / "pack")
    write_reference_layout_pack(pack, cdb, vocab, EngineConfig())
    shutil.copytree(d, os.path.join(pack, "rel_Task"))
    _c, _v, _cfg, comps = load_reference_pack(pack)
    assert "rel_Task" in comps
    assert comps["_skipped"] == []
    assert comps["rel_Task"].labels == m.labels


def test_rel_bert_golden_oracle_independent_recompute():
    """The kg_relations_bert oracle (rel_bert_oracle.py) recomputes the
    expected relation table with an independent brute-force forward and
    dispatches VALUES literals on a documents-table fingerprint."""
    from medcat_spark.functions.rel_bert_oracle import (
        _brute_logits, _doc_fingerprint, golden_rows, rel_bert_oracle_sql)

    model = relcat_bert_fixture_model()
    # brute per-head forward agrees with the engine's batched path
    rs = np.random.RandomState(11)
    ids, starts = _marked_batch(rs, model.tag_ids, vocab_hi=40, rows=2)
    eng = model.logits(ids, starts)
    for r, seq in enumerate(ids):
        assert np.abs(_brute_logits(model, list(seq)) - eng[r]).max() < 1e-4

    sf = "/root/testdata/sf0.001"
    if not os.path.exists(os.path.join(sf, "documents.parquet")):
        pytest.skip("testdata absent")
    rows = golden_rows(sf, model)
    assert rows and all(n > 0 and 0.0 < avg <= 1.0 for _, n, avg in rows)
    sql = rel_bert_oracle_sql()
    # the single SQL string carries this sf's fingerprint so the same
    # oracle is correct at every checked scale factor
    assert _doc_fingerprint(sf) in sql
