"""Numpy LLaMA encoder vs an independent per-example implementation
(reference RelCAT llama variant, llama/model.py:14-205)."""

import math

import numpy as np
import pytest

from medcat_spark.functions.llama_np import (
    LlamaEncoder, RelCatLlamaModel, llama_fixture_state_dict, rope_tables)
from medcat_spark.sources.torch_pickle import (read_state_dict,
                                               write_state_dict)

HEADS, KV_HEADS, H = 2, 1, 8


@pytest.fixture(scope="module")
def sd(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("llama") / "model.dat")
    write_state_dict(p, llama_fixture_state_dict())
    return read_state_dict(p)


def _brute_llama(sd, ids):
    """Per-example loops; separate rotary/GQA/RMSNorm code path."""
    g = {k[len("hf_model.model."):]: np.asarray(v, np.float64)
         for k, v in sd.items() if k.startswith("hf_model.model.")}
    L = len(ids)
    dh = H // HEADS
    x = np.array([g["embed_tokens.weight"][t] for t in ids])

    def rms(v, w):
        return v / math.sqrt((v * v).mean() + 1e-6) * 1.0 * w

    def rope(vec, pos):
        out = np.empty_like(vec)
        half = dh // 2
        for j in range(half):
            theta = pos / (10000.0 ** (2 * j / dh))
            c, s = math.cos(theta), math.sin(theta)
            a, b = vec[j], vec[j + half]
            out[j] = a * c - b * s
            out[j + half] = b * c + a * s
        return out

    li = 0
    while f"layers.{li}.self_attn.q_proj.weight" in g:
        p = {k[len(f"layers.{li}."):]: v for k, v in g.items()
             if k.startswith(f"layers.{li}.")}
        h = np.array([rms(x[i], p["input_layernorm.weight"])
                      for i in range(L)])
        ctx = np.zeros((L, H))
        for head in range(HEADS):
            kvh = head * KV_HEADS // HEADS
            qsl = slice(head * dh, (head + 1) * dh)
            ksl = slice(kvh * dh, (kvh + 1) * dh)
            q = [rope((h[i] @ p["self_attn.q_proj.weight"].T)[qsl], i)
                 for i in range(L)]
            k = [rope((h[i] @ p["self_attn.k_proj.weight"].T)[ksl], i)
                 for i in range(L)]
            v = [(h[i] @ p["self_attn.v_proj.weight"].T)[ksl]
                 for i in range(L)]
            for i in range(L):
                scores = np.array(
                    [q[i] @ k[j] / math.sqrt(dh) if j <= i else -1e9
                     for j in range(L)])
                w = np.exp(scores - scores.max())
                w /= w.sum()
                ctx[i, qsl] = sum(w[j] * v[j] for j in range(L))
        x = x + ctx @ p["self_attn.o_proj.weight"].T
        h2 = np.array([rms(x[i], p["post_attention_layernorm.weight"])
                       for i in range(L)])
        gate = h2 @ p["mlp.gate_proj.weight"].T
        up = h2 @ p["mlp.up_proj.weight"].T
        act = gate / (1.0 + np.exp(-gate)) * up
        x = x + act @ p["mlp.down_proj.weight"].T
        li += 1
    return np.array([rms(x[i], g["norm.weight"]) for i in range(L)])


def test_encoder_matches_brute_force(sd):
    enc = LlamaEncoder.from_state_dict(sd, HEADS, KV_HEADS,
                                       prefix="hf_model.")
    rs = np.random.RandomState(3)
    for _ in range(4):
        L = rs.randint(3, 12)
        ids = rs.randint(0, 64, size=L)
        seq = enc.forward(ids[None, :])
        ref = _brute_llama(sd, ids)
        assert np.abs(seq[0] - ref).max() < 1e-9


def test_rope_rotation_identity():
    """Position 0 must be the identity rotation."""
    cos, sin = rope_tables(4, 8)
    assert np.allclose(cos[0], 1.0) and np.allclose(sin[0], 0.0)


def test_gqa_head_inference(sd):
    """n_kv_heads inferred from projection shapes when not given."""
    enc = LlamaEncoder.from_state_dict(sd, HEADS, None, prefix="hf_model.")
    assert enc.layers[0].n_kv_heads == KV_HEADS


def test_causal_mask(sd):
    """Token i's hidden state must not depend on tokens after i."""
    enc = LlamaEncoder.from_state_dict(sd, HEADS, KV_HEADS,
                                       prefix="hf_model.")
    ids = np.array([5, 9, 17, 23, 41])
    seq_full = enc.forward(ids[None, :])
    seq_cut = enc.forward(ids[None, :3])
    assert np.abs(seq_full[0, :2] - seq_cut[0, :2]).max() < 1e-10
    # (position 2 differs only through the final norm? no — causal:
    # position 2 sees only 0..2 in both, so it matches too)
    assert np.abs(seq_full[0, 2] - seq_cut[0, 2]).max() < 1e-10


def test_padded_batch_equals_individual(sd):
    enc = LlamaEncoder.from_state_dict(sd, HEADS, KV_HEADS,
                                       prefix="hf_model.")
    rs = np.random.RandomState(7)
    seqs = [rs.randint(0, 64, size=rs.randint(3, 9)) for _ in range(4)]
    L = max(len(s) for s in seqs)
    ids = np.zeros((len(seqs), L), dtype=np.int64)
    mask = np.zeros((len(seqs), L))
    for i, s in enumerate(seqs):
        ids[i, :len(s)] = s
        mask[i, :len(s)] = 1.0
    out = enc.forward(ids, mask)
    for i, s in enumerate(seqs):
        one = enc.forward(s[None, :])
        assert np.abs(out[i, :len(s)] - one[0]).max() < 1e-8


def test_relcat_llama_head(sd):
    m = RelCatLlamaModel.from_state_dict(
        sd, ["Spatial", "Causal", "None"], HEADS, KV_HEADS)
    rs = np.random.RandomState(11)
    ids = rs.randint(0, 64, size=(3, 9))
    starts = np.array([[1, 5], [2, 7], [0, 3]])
    preds = m.predict(ids, starts)
    assert preds == m.predict(ids, starts)
    assert all(p[0] in m.labels for p in preds)
    lg1 = m.logits(ids, starts)
    lg2 = m.logits(ids, np.array([[2, 6], [1, 4], [1, 2]]))
    assert np.abs(lg1 - lg2).max() > 1e-6
