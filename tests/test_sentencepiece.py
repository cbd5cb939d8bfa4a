"""Pure-Python sentencepiece ``tokenizer.model`` reader/writer
(core/sentencepiece.py) + its wiring into the rel_* component importer.

Real LLaMA rel_* components often ship ONLY the sentencepiece protobuf
(reference loads it via HF LlamaTokenizer —
utils/relation_extraction/tokenizer.py TokenizerWrapperLlama); these
tests certify the wire-format round trip, both public segmentation
algorithms (unigram Viterbi / merge-by-score BPE), offset alignment,
byte fallback, and end-to-end component load from a dir that has no
other tokenizer artifact.
"""
import os

import numpy as np
import pytest

from medcat_spark.core.sentencepiece import (
    BYTE, CONTROL, NORMAL, UNKNOWN, SentencePieceTokenizer,
    parse_model_bytes, serialize_model)


def _bpe_pieces():
    # merge-by-score BPE: higher score merges first
    return [
        ("<unk>", 0.0, UNKNOWN),
        ("<s>", 0.0, CONTROL),
        ("</s>", 0.0, CONTROL),
        ("▁", -2.0, NORMAL),
        ("he", -1.0, NORMAL),
        ("ll", -1.5, NORMAL),
        ("hell", -2.5, NORMAL),
        ("hello", -3.0, NORMAL),
        ("o", -4.0, NORMAL),
        ("▁hello", -1.2, NORMAL),
        ("h", -5.0, NORMAL),
        ("e", -5.0, NORMAL),
        ("l", -5.0, NORMAL),
    ]


def _unigram_pieces():
    return [
        ("<unk>", 0.0, UNKNOWN),
        ("▁", -3.0, NORMAL),
        ("▁spark", -1.0, NORMAL),
        ("▁sp", -2.0, NORMAL),
        ("ark", -2.5, NORMAL),
        ("s", -6.0, NORMAL),
        ("p", -6.0, NORMAL),
        ("a", -6.0, NORMAL),
        ("r", -6.0, NORMAL),
        ("k", -6.0, NORMAL),
    ]


def test_wire_format_round_trip():
    pieces = _bpe_pieces()
    buf = serialize_model(pieces, model_type=2, byte_fallback=True,
                          unk_id=0, add_dummy_prefix=True,
                          remove_extra_whitespaces=False)
    d = parse_model_bytes(buf)
    assert [(p, t) for p, _s, t in d["pieces"]] == \
        [(p, t) for p, _s, t in pieces]
    assert np.allclose([s for _p, s, _t in d["pieces"]],
                       [s for _p, s, _t in pieces])
    assert d["model_type"] == 2
    assert d["byte_fallback"] is True
    assert d["unk_id"] == 0
    assert d["add_dummy_prefix"] is True
    assert d["remove_extra_whitespaces"] is False


def test_save_load_dir_round_trip(tmp_path):
    tok = SentencePieceTokenizer(_unigram_pieces(), model_type=1)
    tok.save(str(tmp_path))
    tok2 = SentencePieceTokenizer.load(str(tmp_path))
    assert tok2.vocab == tok.vocab
    assert tok2.model_type == 1
    assert tok2.encode("spark") == tok.encode("spark")


def test_bpe_merge_by_score():
    tok = SentencePieceTokenizer(_bpe_pieces(), model_type=2)
    # "hello" → ▁hello via merges: he+ll first (higher scores), then the
    # ▁hello piece (score -1.2) beats hell+o / hello alone
    ids, spans = tok.encode_with_offsets("hello")
    assert [tok.id2tok[i] for i in ids] == ["▁hello"]
    assert spans == [(0, 5)]


def test_unigram_viterbi_max_score():
    tok = SentencePieceTokenizer(_unigram_pieces(), model_type=1)
    # ▁spark (-1.0) beats ▁sp+ark (-4.5) and char splits
    ids, spans = tok.encode_with_offsets("spark")
    assert [tok.id2tok[i] for i in ids] == ["▁spark"]
    assert spans == [(0, 5)]
    # force the split path: "spark spark" second word re-uses ▁spark
    ids2, spans2 = tok.encode_with_offsets("spark spark")
    assert [tok.id2tok[i] for i in ids2] == ["▁spark", "▁spark"]
    assert spans2 == [(0, 5), (5, 11)]


def test_offsets_align_with_original_text():
    tok = SentencePieceTokenizer(_unigram_pieces(), model_type=1)
    text = "  spark   spark "
    ids, spans = tok.encode_with_offsets(text)
    for i, (s, e) in zip(ids, spans):
        piece = tok.id2tok[i].replace("▁", "")
        if piece:
            assert text[s:e].strip() == piece


def test_byte_fallback_and_unk():
    pieces = _unigram_pieces() + [("<0x%02X>" % b, -10.0, BYTE)
                                  for b in range(256)]
    tok = SentencePieceTokenizer(pieces, model_type=1, byte_fallback=True)
    ids, spans = tok.encode_with_offsets("sparké")
    # é (U+00E9) → two UTF-8 byte pieces, span pinned to the char
    toks = [tok.id2tok[i] for i in ids]
    assert toks[-2:] == ["<0xC3>", "<0xA9>"]
    assert spans[-1] == (5, 6) and spans[-2] == (5, 6)
    # without byte_fallback the same char maps to unk_id
    tok_nb = SentencePieceTokenizer(_unigram_pieces(), model_type=1,
                                    byte_fallback=False, unk_id=0)
    ids_nb, _ = tok_nb.encode_with_offsets("é")
    # dummy prefix ▁ then unk for the out-of-vocab char
    assert [tok_nb.id2tok.get(i, "<unk>") for i in ids_nb] == ["▁", "<unk>"]
    assert ids_nb[-1] == tok_nb.unk_id


def test_decode_inverts_encode():
    pieces = _unigram_pieces() + [("<0x%02X>" % b, -10.0, BYTE)
                                  for b in range(256)]
    tok = SentencePieceTokenizer(pieces, model_type=1, byte_fallback=True)
    for text in ("spark", "spark spark", "sparké"):
        assert tok.decode(tok.encode(text)) == text


def test_control_pieces_never_match_text():
    tok = SentencePieceTokenizer(_bpe_pieces(), model_type=2)
    ids, _ = tok.encode_with_offsets("<s>hello")
    # the control piece <s> must not absorb the literal chars
    assert tok.vocab["<s>"] not in ids


def test_rel_component_loads_from_tokenizer_model_only(tmp_path):
    """A rel_* dir with ONLY tokenizer.model (no vocab.txt /
    tokenizer.json / bbpe-*) loads through _load_rel_component and
    scores identically after the round trip."""
    from medcat_spark.functions.llama_np import (RelCatLlamaModel,
                                                 llama_fixture_state_dict)
    from medcat_spark.sources.reference_pack import (
        _load_rel_component, write_reference_rel_component)

    base = RelCatLlamaModel.from_state_dict(
        llama_fixture_state_dict(), ["A", "B", "C"], 2, 1)
    base.tag_ids = [60, 61, 62, 63]
    vocab_pieces = [("<unk>", 0.0, UNKNOWN), ("▁", -2.0, NORMAL)]
    vocab_pieces += [("▁tok%d" % i, -1.0 - i * 0.01, NORMAL)
                     for i in range(56)]
    vocab_pieces += [("[s1]", 0.0, NORMAL), ("[e1]", 0.0, NORMAL),
                     ("[s2]", 0.0, NORMAL), ("[e2]", 0.0, NORMAL)]
    base.tokenizer = SentencePieceTokenizer(vocab_pieces, model_type=2)
    d = str(tmp_path / "rel_SP")
    write_reference_rel_component(d, base, n_heads=2)
    assert os.path.exists(os.path.join(d, "tokenizer.model"))
    for other in ("vocab.txt", "tokenizer.json", "bbpe-vocab.json",
                  "tokenizer.dat"):
        assert not os.path.exists(os.path.join(d, other))

    m2 = _load_rel_component(d)
    assert type(m2).__name__ == "RelCatLlamaModel"
    assert type(m2.tokenizer).__name__ == "SentencePieceTokenizer"
    assert m2.tokenizer.vocab == base.tokenizer.vocab
    rs = np.random.RandomState(7)
    rows = 2
    L = 24
    ids = rs.randint(2, 58, size=(rows, L))
    for r in range(rows):
        ids[r, 3], ids[r, 6] = 60, 61
        ids[r, 10], ids[r, 14] = 62, 63
    starts = [(3, 10)] * rows
    assert base.predict(ids, starts) == m2.predict(ids, starts)
    assert np.abs(base.logits(ids, starts)
                  - m2.logits(ids, starts)).max() < 1e-5


def test_pack_skips_rel_dir_without_any_tokenizer(tmp_path):
    """Still lands in _skipped when no artifact at all is present —
    the load-time-fail policy is preserved with the new branch."""
    import shutil

    from medcat_spark.functions.bert_np import relcat_bert_fixture_model
    from medcat_spark.sources.reference_pack import (
        _load_rel_component, write_reference_rel_component)
    m = relcat_bert_fixture_model()
    d = str(tmp_path / "rel_X")
    write_reference_rel_component(d, m, n_heads=2)
    for f in os.listdir(d):
        if f.startswith(("vocab", "tokenizer", "bbpe")):
            os.remove(os.path.join(d, f))
    with pytest.raises(ValueError, match="tokenizer"):
        _load_rel_component(d)
