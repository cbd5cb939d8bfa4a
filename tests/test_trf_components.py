"""TransformersNER (trf_*) component import: safetensors reader +
BertForTokenClassification into the numpy token classifier."""

import json
import os

import numpy as np

from medcat_spark.functions.bert_np import bert_fixture_state_dict
from medcat_spark.sources.reference_pack import _load_trf_component
from medcat_spark.sources.torch_pickle import (read_safetensors,
                                               write_safetensors,
                                               write_state_dict)


def test_safetensors_round_trip(tmp_path):
    rs = np.random.RandomState(0)
    sd = {"a.weight": rs.randn(4, 3).astype(np.float32),
          "b.bias": rs.randn(5).astype(np.float64),
          "c.ids": np.arange(6, dtype=np.int64).reshape(2, 3),
          "d.scalar": np.array(1.5, dtype=np.float32)}
    p = str(tmp_path / "m.safetensors")
    write_safetensors(p, sd)
    out = read_safetensors(p)
    assert set(out) == set(sd)
    for k, v in sd.items():
        v = np.asarray(v)
        assert out[k].dtype == v.dtype and out[k].shape == v.shape
        np.testing.assert_array_equal(out[k], v)


def test_safetensors_bf16(tmp_path):
    import struct
    vals = np.array([1.5, -2.0, 0.25], dtype=np.float32)
    bf = (vals.view(np.uint32) >> 16).astype("<u2")
    header = {"w": {"dtype": "BF16", "shape": [3],
                    "data_offsets": [0, 6]}}
    hj = json.dumps(header).encode()
    p = tmp_path / "bf.safetensors"
    p.write_bytes(struct.pack("<Q", len(hj)) + hj + bf.tobytes())
    out = read_safetensors(str(p))
    np.testing.assert_array_equal(out["w"], vals)


def _write_trf_dir(d, use_safetensors: bool):
    os.makedirs(d, exist_ok=True)
    sd = bert_fixture_state_dict(relcat=False, nclasses=3)
    nested = {("bert." + k if not k.startswith("classifier") else k): v
              for k, v in sd.items()}
    if use_safetensors:
        write_safetensors(os.path.join(d, "model.safetensors"), nested)
    else:
        write_state_dict(os.path.join(d, "pytorch_model.bin"), nested)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump({"num_attention_heads": 2,
                   "id2label": {"0": "O", "1": "NAME", "2": "DATE"},
                   "do_lower_case": True}, f)
    with open(os.path.join(d, "vocab.txt"), "w") as f:
        f.write("\n".join(["[PAD]", "[UNK]", "patient", "heart",
                           "attack", "the"]) + "\n")
    return nested


def test_trf_component_loads_safetensors(tmp_path):
    d = str(tmp_path / "trf_deid")
    _write_trf_dir(d, use_safetensors=True)
    m = _load_trf_component(d)
    assert m.labels == ["O", "NAME", "DATE"]
    assert m.tokenizer is not None
    ids = np.array([[2, 3, 4, 5]])
    best, conf = m.predict_tokens(ids)
    assert best.shape == (1, 4)


def test_trf_component_bin_equals_safetensors(tmp_path):
    d1 = str(tmp_path / "trf_a")
    d2 = str(tmp_path / "trf_b")
    _write_trf_dir(d1, use_safetensors=True)
    _write_trf_dir(d2, use_safetensors=False)
    m1, m2 = _load_trf_component(d1), _load_trf_component(d2)
    ids = np.array([[2, 3, 4], [5, 2, 0]])
    b1, c1 = m1.predict_tokens(ids)
    b2, c2 = m2.predict_tokens(ids)
    np.testing.assert_array_equal(b1, b2)
    np.testing.assert_array_equal(c1, c2)


def test_trf_tokenizer_recovered_from_tokenizer_dat(tmp_path):
    """Real packs ship tokenizer.dat (a dill of the wrapper holding the
    HF tokenizer) and NO vocab.txt — the vocab must be recovered from
    the pickled tokenizer STATE (r4 review finding)."""
    import pickle
    import sys
    import types
    d = str(tmp_path / "trf_real")
    os.makedirs(d)
    sd = bert_fixture_state_dict(relcat=False, nclasses=2)
    nested = {("bert." + k if not k.startswith("classifier") else k): v
              for k, v in sd.items()}
    write_safetensors(os.path.join(d, "model.safetensors"), nested)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump({"num_attention_heads": 2,
                   "id2label": {"0": "O", "1": "NAME"}}, f)

    # a class that pickles like transformers.BertTokenizer: instance
    # state carries vocab + do_lower_case
    cls = type("BertTokenizer", (), {"__module__":
                                     "transformers.models.bert"})
    fake_root = types.ModuleType("transformers")
    fake_mod = types.ModuleType("transformers.models.bert")
    fake_mod.BertTokenizer = cls
    sys.modules["transformers"] = fake_root
    sys.modules["transformers.models"] = types.ModuleType(
        "transformers.models")
    sys.modules["transformers.models.bert"] = fake_mod
    try:
        hf = cls()
        hf.__dict__ = {"vocab": {"[PAD]": 0, "[UNK]": 1, "heart": 2,
                                 "attack": 3, "##s": 4},
                       "do_lower_case": True}
        with open(os.path.join(d, "tokenizer.dat"), "wb") as f:
            pickle.dump({"hf_tokenizer": hf, "max_len": 512}, f)
    finally:
        for mname in ("transformers", "transformers.models",
                      "transformers.models.bert"):
            del sys.modules[mname]

    m = _load_trf_component(d)
    assert m.tokenizer is not None, m.tokenizer_note
    ids, spans = m.tokenizer.encode_with_offsets("heart attacks zzz")
    toks = [m.tokenizer.id2tok[i] for i in ids]
    assert toks == ["heart", "attack", "##s", "[UNK]"]


def test_trf_tokenizer_recovered_from_tokenizer_json(tmp_path):
    """Fast tokenizers serialize as tokenizer.json (model.type +
    vocab); recovery must parse it."""
    d = str(tmp_path / "trf_fast")
    os.makedirs(d)
    sd = bert_fixture_state_dict(relcat=False, nclasses=2)
    nested = {("bert." + k if not k.startswith("classifier") else k): v
              for k, v in sd.items()}
    write_safetensors(os.path.join(d, "model.safetensors"), nested)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump({"num_attention_heads": 2,
                   "id2label": {"0": "O", "1": "X"}}, f)
    with open(os.path.join(d, "tokenizer.json"), "w") as f:
        json.dump({"version": "1.0",
                   "model": {"type": "WordPiece",
                             "vocab": {"[PAD]": 0, "[UNK]": 1,
                                       "fever": 2, "##ish": 3},
                             "unk_token": "[UNK]"}}, f)
    m = _load_trf_component(d)
    assert m.tokenizer is not None
    ids = m.tokenizer.encode("feverish")
    assert [m.tokenizer.id2tok[i] for i in ids] == ["fever", "##ish"]


def test_trf_discovered_in_pack(tmp_path):
    from medcat_spark.config import EngineConfig
    from medcat_spark.fixtures import trained_fixture_models
    from medcat_spark.sources.reference_pack import (
        load_reference_pack, write_reference_layout_pack)
    cdb, vocab = trained_fixture_models()
    pack = str(tmp_path / "pack")
    write_reference_layout_pack(pack, cdb, vocab, EngineConfig())
    _write_trf_dir(os.path.join(pack, "trf_deid"), use_safetensors=True)
    _c, _v, _cfg, comps = load_reference_pack(pack)
    assert "trf_deid" in comps and comps["_skipped"] == []
    assert comps["trf_deid"].labels == ["O", "NAME", "DATE"]
