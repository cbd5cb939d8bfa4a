"""Numpy BERT encoder vs an independently-written per-example
implementation (different code path: explicit per-head loops, scalar
erf), plus HF-layout state-dict ingestion through the torch zip reader.
"""

import math

import numpy as np
import pytest

from medcat_spark.functions.bert_np import (
    BertEncoder, BertTokenClassifier, RelCatBertModel,
    bert_fixture_state_dict)
from medcat_spark.sources.torch_pickle import read_state_dict, \
    write_state_dict

H, HEADS, LAYERS = 8, 2, 2


@pytest.fixture(scope="module")
def relcat_sd(tmp_path_factory):
    """Fixture checkpoint written in the torch zip layout and read back
    through the pure-numpy reader (the exact ingestion path)."""
    p = str(tmp_path_factory.mktemp("bert") / "model.dat")
    write_state_dict(p, bert_fixture_state_dict())
    return read_state_dict(p)


def _ln(x, w, b):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + 1e-12) * w + b


def _brute_bert(sd, ids, mask, prefix="hf_model."):
    """Per-example, per-head loop implementation (independent of the
    vectorized encoder's einsum/transpose path)."""
    g = {k[len(prefix):]: np.asarray(v, np.float64)
         for k, v in sd.items() if k.startswith(prefix)}
    L = len(ids)
    x = np.array([g["embeddings.word_embeddings.weight"][t]
                  + g["embeddings.position_embeddings.weight"][i]
                  + g["embeddings.token_type_embeddings.weight"][0]
                  for i, t in enumerate(ids)])
    x = _ln(x, g["embeddings.LayerNorm.weight"],
            g["embeddings.LayerNorm.bias"])
    li = 0
    while f"encoder.layer.{li}.attention.self.query.weight" in g:
        p = {k[len(f"encoder.layer.{li}."):]: v for k, v in g.items()
             if k.startswith(f"encoder.layer.{li}.")}
        dh = H // HEADS
        ctx = np.zeros((L, H))
        for h in range(HEADS):
            sl = slice(h * dh, (h + 1) * dh)
            q = x @ p["attention.self.query.weight"].T[:, sl] \
                + p["attention.self.query.bias"][sl]
            k = x @ p["attention.self.key.weight"].T[:, sl] \
                + p["attention.self.key.bias"][sl]
            v = x @ p["attention.self.value.weight"].T[:, sl] \
                + p["attention.self.value.bias"][sl]
            for i in range(L):
                scores = np.array([
                    q[i] @ k[j] / math.sqrt(dh)
                    + (0.0 if mask[j] else -10000.0) for j in range(L)])
                w = np.exp(scores - scores.max())
                w /= w.sum()
                ctx[i, sl] = sum(w[j] * v[j] for j in range(L))
        attn = _ln(ctx @ p["attention.output.dense.weight"].T
                   + p["attention.output.dense.bias"] + x,
                   p["attention.output.LayerNorm.weight"],
                   p["attention.output.LayerNorm.bias"])
        inter = attn @ p["intermediate.dense.weight"].T \
            + p["intermediate.dense.bias"]
        inter = np.array([[0.5 * t * (1 + math.erf(t / math.sqrt(2)))
                           for t in row] for row in inter])
        x = _ln(inter @ p["output.dense.weight"].T
                + p["output.dense.bias"] + attn,
                p["output.LayerNorm.weight"],
                p["output.LayerNorm.bias"])
        li += 1
    pooled = np.tanh(x[0] @ g["pooler.dense.weight"].T
                     + g["pooler.dense.bias"])
    return x, pooled


def test_encoder_matches_brute_force(relcat_sd):
    enc = BertEncoder.from_state_dict(relcat_sd, HEADS, prefix="hf_model.")
    rs = np.random.RandomState(5)
    for _ in range(4):
        L = rs.randint(3, 12)
        ids = rs.randint(0, 64, size=L)
        seq, pooled = enc.forward(ids[None, :])
        bseq, bpooled = _brute_bert(relcat_sd, ids, np.ones(L))
        assert np.abs(seq[0] - bseq).max() < 1e-10
        assert np.abs(pooled[0] - bpooled).max() < 1e-10


def test_attention_mask_matches_brute_force(relcat_sd):
    enc = BertEncoder.from_state_dict(relcat_sd, HEADS, prefix="hf_model.")
    rs = np.random.RandomState(7)
    L, real = 10, 6
    ids = rs.randint(0, 64, size=L)
    mask = np.array([1.0] * real + [0.0] * (L - real))
    seq, _ = enc.forward(ids[None, :], mask[None, :])
    bseq, _ = _brute_bert(relcat_sd, ids, mask)
    assert np.abs(seq[0, :real] - bseq[:real]).max() < 1e-10


def test_padded_batch_equals_individual(relcat_sd):
    """Right padding + mask must not change real-token outputs."""
    enc = BertEncoder.from_state_dict(relcat_sd, HEADS, prefix="hf_model.")
    rs = np.random.RandomState(9)
    seqs = [rs.randint(0, 64, size=rs.randint(3, 10)) for _ in range(5)]
    L = max(len(s) for s in seqs)
    ids = np.zeros((len(seqs), L), dtype=np.int64)
    mask = np.zeros((len(seqs), L))
    for i, s in enumerate(seqs):
        ids[i, :len(s)] = s
        mask[i, :len(s)] = 1.0
    seq_b, _ = enc.forward(ids, mask)
    for i, s in enumerate(seqs):
        seq_1, _ = enc.forward(s[None, :])
        assert np.abs(seq_b[i, :len(s)] - seq_1[0]).max() < 1e-8


def test_relcat_head_shapes_and_determinism(relcat_sd):
    m = RelCatBertModel.from_state_dict(
        relcat_sd, ["Spatial", "Causal", "None"], HEADS)
    rs = np.random.RandomState(11)
    ids = rs.randint(0, 64, size=(4, 9))
    starts = np.array([[1, 5], [2, 7], [0, 3], [4, 8]])
    lg = m.logits(ids, starts)
    assert lg.shape == (4, 3)
    preds = m.predict(ids, starts)
    assert preds == m.predict(ids, starts)
    assert all(p[0] in m.labels and 0 < p[1] <= 1 for p in preds)
    # e1/e2 hidden states actually drive the output: moving the marker
    # positions must change logits
    lg2 = m.logits(ids, np.array([[2, 6], [1, 4], [1, 2], [3, 7]]))
    assert np.abs(lg - lg2).max() > 1e-6


def test_token_classifier(tmp_path):
    sd = bert_fixture_state_dict(relcat=False, nclasses=4)
    p = str(tmp_path / "model.dat")
    write_state_dict(p, sd)
    m = BertTokenClassifier.from_state_dict(
        read_state_dict(p), ["O", "NAME", "DATE", "ID"], HEADS)
    rs = np.random.RandomState(13)
    ids = rs.randint(0, 64, size=(2, 7))
    best, conf = m.predict_tokens(ids)
    assert best.shape == (2, 7) and conf.shape == (2, 7)
    assert (conf > 0).all() and (conf <= 1).all()


def test_bert_nesting_tolerated():
    """BertForTokenClassification saves the encoder under 'bert.'."""
    sd = bert_fixture_state_dict(relcat=False, nclasses=2)
    nested = {("bert." + k if not k.startswith("classifier") else k): v
              for k, v in sd.items()}
    m = BertTokenClassifier.from_state_dict(nested, ["O", "X"], HEADS)
    ids = np.arange(5)[None, :]
    m2 = BertTokenClassifier.from_state_dict(sd, ["O", "X"], HEADS)
    b1, c1 = m.predict_tokens(ids)
    b2, c2 = m2.predict_tokens(ids)
    np.testing.assert_array_equal(b1, b2)
    np.testing.assert_array_equal(c1, c2)


def test_relations_bert_spark_and_partition_invariance(spark):
    from medcat_spark.functions.bert_np import (relcat_bert_fixture_model,
                                                relations_bert)
    m = relcat_bert_fixture_model()
    bc = spark.sparkContext.broadcast(m)
    docs = spark.createDataFrame(
        [("d1", "the spark merge ran with window and vector close by"),
         ("d2", "hash join beats sort join on the table scan"),
         ("d3", "no entities here at all")],
        "doc_id string, text string")
    rows = []
    for did, text in [("d1", "the spark merge ran with window and vector "
                             "close by"),
                      ("d2", "hash join beats sort join on the table scan")]:
        for w in ("spark", "merge", "window", "vector", "hash", "table"):
            p = text.find(w)
            if p >= 0:
                rows.append((did, p, p + len(w), f"CUI_{w}"))
    ann = spark.createDataFrame(
        rows, "doc_id string, start int, end int, cui string")
    out1 = sorted(map(tuple, relations_bert(ann, docs, bc).collect()))
    assert len(out1) > 0
    assert all(r[5] in m.labels for r in out1)
    # pair order & batch composition must not change predictions
    out2 = sorted(map(tuple, relations_bert(
        ann.repartition(7), docs.repartition(3), bc).collect()))
    assert out1 == out2


def test_bert_meta_model_round_trip(tmp_path):
    """BertForMetaAnnotation variant (meta_cat/models.py:87-215): bert.*
    nesting + fc1-4 head with center-max + pooled concat, loaded from a
    meta_* dir and scored in token space."""
    import json
    import os
    from medcat_spark.core.bbpe import train_bbpe
    from medcat_spark.functions.bert_np import BertMetaModel
    from medcat_spark.sources.reference_pack import _load_meta_component
    tok = train_bbpe(["the patient presented with heart attack"] * 3,
                     vocab_size=300)
    sd = {("bert." + k if not k.startswith("classifier") else k): v
          for k, v in bert_fixture_state_dict(
              vocab_size=tok.get_size(), relcat=False).items()
          if not k.startswith("classifier")}
    rs = np.random.RandomState(21)
    hs, hs2, C = 10, 5, 2

    def r(*shape):
        return rs.uniform(-0.5, 0.5, size=shape).astype(np.float32)

    sd["fc1.weight"] = r(hs, 2 * H)
    sd["fc1.bias"] = r(hs)
    sd["fc2.weight"] = r(hs2, hs)
    sd["fc2.bias"] = r(hs2)
    sd["fc3.weight"] = r(hs2, hs2)
    sd["fc3.bias"] = r(hs2)
    sd["fc4.weight"] = r(C, hs2)
    sd["fc4.bias"] = r(C)
    d = tmp_path / "meta_Status"
    os.makedirs(d)
    write_state_dict(str(d / "model.dat"), sd)
    (d / "config.json").write_text(json.dumps({
        "general": {"category_name": "Status",
                    "category_value2id": {"Other": 0, "Confirmed": 1},
                    "cntx_left": 4, "cntx_right": 3},
        "model": {"model_name": "bert", "padding_idx": 0,
                  "nclasses": C,
                  "model_architecture_config": {"fc2": True,
                                                "fc3": True}}}))
    (d / "model_config.json").write_text(
        json.dumps({"num_attention_heads": HEADS}))
    tok.save(str(d))
    m = _load_meta_component(str(d))
    assert isinstance(m, BertMetaModel)
    assert m.labels == ["Other", "Confirmed"]
    assert m.tokenizer is not None
    ids, _sp = m.tokenizer.encode_with_offsets(
        "the patient presented with heart attack")
    preds = m.predict_batch_ids([ids[:6], ids[2:8]], [(1, 2), (0, 0)])
    assert preds == m.predict_batch_ids([ids[:6], ids[2:8]],
                                        [(1, 2), (0, 0)])
    assert all(p[0] in m.labels and 0 < p[1] <= 1 for p in preds)
    # fc2/fc3 flags change the forward (head actually honours config)
    m2 = BertMetaModel.from_state_dict(
        sd, m.labels, HEADS, use_fc2=False, use_fc3=False)
    # fc4 shapes differ when fc2 is off in the reference; here we just
    # assert the flagged path raises on the mismatched head shape
    with pytest.raises(ValueError):
        m2.forward_id_windows([ids[:6]], [(1, 2)])


def test_missing_layers_rejected():
    with pytest.raises(ValueError, match="encoder.layer.0"):
        BertEncoder.from_state_dict(
            {"embeddings.word_embeddings.weight": np.zeros((4, 4)),
             "embeddings.position_embeddings.weight": np.zeros((4, 4)),
             "embeddings.token_type_embeddings.weight": np.zeros((2, 4)),
             "embeddings.LayerNorm.weight": np.ones(4),
             "embeddings.LayerNorm.bias": np.zeros(4)}, 2)


def test_bert_meta_without_tokenizer_skipped_at_load(tmp_path):
    """A meta_* BERT component whose dir has only bbpe-vocab.json (no
    merges) cannot segment unseen text; it must fail AT LOAD TIME into
    ``_skipped`` — not ValueError later inside mapInPandas at executor
    time (same policy as the rel_* tokenizer/tag-id validation)."""
    import json
    import os
    from medcat_spark.core.bbpe import train_bbpe
    from medcat_spark.sources.reference_pack import load_component_dirs
    tok = train_bbpe(["the patient presented with heart attack"] * 3,
                     vocab_size=300)
    sd = {"bert." + k: v
          for k, v in bert_fixture_state_dict(
              vocab_size=tok.get_size(), relcat=False).items()
          if not k.startswith("classifier")}
    rs = np.random.RandomState(22)
    sd["fc1.weight"] = rs.uniform(-0.5, 0.5, (10, 2 * H)).astype(np.float32)
    sd["fc1.bias"] = np.zeros(10, dtype=np.float32)
    sd["fc4.weight"] = rs.uniform(-0.5, 0.5, (2, 10)).astype(np.float32)
    sd["fc4.bias"] = np.zeros(2, dtype=np.float32)
    d = tmp_path / "meta_Status"
    os.makedirs(d)
    write_state_dict(str(d / "model.dat"), sd)
    (d / "config.json").write_text(json.dumps({
        "general": {"category_name": "Status",
                    "category_value2id": {"Other": 0, "Confirmed": 1}},
        "model": {"model_name": "bert", "nclasses": 2,
                  "model_architecture_config": {"fc2": False,
                                                "fc3": False}}}))
    (d / "model_config.json").write_text(
        json.dumps({"num_attention_heads": HEADS}))
    tok.save(str(d))
    os.remove(d / "bbpe-merges.txt")   # vocab survives, merges lost
    comps = load_component_dirs(str(tmp_path))
    assert "Status" not in comps
    assert len(comps["_skipped"]) == 1
    entry, reason = comps["_skipped"][0]
    assert entry == "meta_Status" and "tokenizer" in reason
