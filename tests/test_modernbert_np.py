"""Numpy ModernBERT encoder vs an independent per-example
implementation (third RelCAT backbone,
utils/relation_extraction/modernbert/model.py)."""

import math

import numpy as np
import pytest

from medcat_spark.functions.modernbert_np import (
    ModernBertEncoder, RelCatModernBertModel, modernbert_fixture_state_dict)
from medcat_spark.sources.torch_pickle import (read_state_dict,
                                               write_state_dict)

HEADS, H, WINDOW = 2, 8, 4


@pytest.fixture(scope="module")
def sd(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("mb") / "model.dat")
    write_state_dict(p, modernbert_fixture_state_dict())
    return read_state_dict(p)


def _brute(sd, ids):
    g = {k[len("hf_model.model."):]: np.asarray(v, np.float64)
         for k, v in sd.items() if k.startswith("hf_model.model.")}
    L = len(ids)
    dh = H // HEADS

    def ln(v, w):
        return (v - v.mean()) / math.sqrt(v.var() + 1e-5) * 1.0 * w

    def rope(vec, pos, theta):
        out = np.empty_like(vec)
        half = dh // 2
        for j in range(half):
            ang = pos / (theta ** (2 * j / dh))
            c, s = math.cos(ang), math.sin(ang)
            a, b = vec[j], vec[j + half]
            out[j] = a * c - b * s
            out[j + half] = b * c + a * s
        return out

    x = np.array([ln(g["embeddings.tok_embeddings.weight"][t],
                     g["embeddings.norm.weight"]) for t in ids])
    li = 0
    while f"layers.{li}.attn.Wqkv.weight" in g:
        p = {k[len(f"layers.{li}."):]: v for k, v in g.items()
             if k.startswith(f"layers.{li}.")}
        is_global = (li % 3) == 0
        theta = 160000.0 if is_global else 10000.0
        h = x.copy() if li == 0 else np.array(
            [ln(x[i], p["attn_norm.weight"]) for i in range(L)])
        qkv = h @ p["attn.Wqkv.weight"].T
        q_all, k_all, v_all = qkv[:, :H], qkv[:, H:2 * H], qkv[:, 2 * H:]
        ctx = np.zeros((L, H))
        for head in range(HEADS):
            sl = slice(head * dh, (head + 1) * dh)
            q = [rope(q_all[i][sl], i, theta) for i in range(L)]
            k = [rope(k_all[i][sl], i, theta) for i in range(L)]
            v = [v_all[i][sl] for i in range(L)]
            for i in range(L):
                scores = []
                for j in range(L):
                    if not is_global and abs(i - j) > WINDOW // 2:
                        scores.append(-1e9)
                    else:
                        scores.append(q[i] @ k[j] / math.sqrt(dh))
                scores = np.array(scores)
                w = np.exp(scores - scores.max())
                w /= w.sum()
                ctx[i, sl] = sum(w[j] * v[j] for j in range(L))
        x = x + ctx @ p["attn.Wo.weight"].T
        h2 = np.array([ln(x[i], p["mlp_norm.weight"]) for i in range(L)])
        wi = h2 @ p["mlp.Wi.weight"].T
        inter = wi.shape[1] // 2
        inp, gate = wi[:, :inter], wi[:, inter:]
        act = np.array([[0.5 * t * (1 + math.erf(t / math.sqrt(2)))
                         for t in row] for row in inp]) * gate
        x = x + act @ p["mlp.Wo.weight"].T
        li += 1
    return np.array([ln(x[i], g["final_norm.weight"]) for i in range(L)])


def _enc(sd):
    return ModernBertEncoder.from_state_dict(
        sd, HEADS, prefix="hf_model.", local_window=WINDOW)


def test_encoder_matches_brute_force(sd):
    enc = _enc(sd)
    rs = np.random.RandomState(3)
    for _ in range(3):
        L = rs.randint(3, 12)
        ids = rs.randint(0, 64, size=L)
        seq = enc.forward(ids[None, :])
        ref = _brute(sd, ids)
        assert np.abs(seq[0] - ref).max() < 1e-9


def test_layer_pattern_global_local(sd):
    enc = _enc(sd)
    assert [lay.is_global for lay in enc.layers] == [True, False, False,
                                                     True]
    assert enc.layers[0].attn_norm is None          # nn.Identity
    assert enc.layers[1].attn_norm is not None
    assert enc.layers[0].theta == 160000.0
    assert enc.layers[1].theta == 10000.0


def test_sliding_window_locality(sd):
    """In a local layer, token 0 must be unaffected by tokens beyond the
    window."""
    enc = _enc(sd)
    # single local layer in isolation
    lay = enc.layers[1]
    rs = np.random.RandomState(7)
    x = rs.randn(1, 10, H)
    pad = np.ones((1, 10))
    out1 = lay.forward(x, pad)
    x2 = x.copy()
    # non-constant perturbation (a constant shift is LayerNorm-invariant)
    x2[0, 9, 0] += 5.0        # outside token 0's window (|0-9| > 2)
    out2 = lay.forward(x2, pad)
    assert np.abs(out1[0, 0] - out2[0, 0]).max() < 1e-12
    assert np.abs(out1[0, 8] - out2[0, 8]).max() > 1e-9  # inside window


def test_padded_batch_equals_individual(sd):
    enc = _enc(sd)
    rs = np.random.RandomState(9)
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


def test_relcat_head_and_pack_round_trip(sd, tmp_path):
    m = RelCatModernBertModel.from_state_dict(
        sd, ["A", "B", "C"], HEADS, local_window=WINDOW)
    rs = np.random.RandomState(11)
    ids = rs.randint(0, 64, size=(3, 9))
    starts = np.array([[1, 5], [2, 7], [0, 3]])
    preds = m.predict(ids, starts)
    assert preds == m.predict(ids, starts)
    assert all(p[0] in m.labels for p in preds)
