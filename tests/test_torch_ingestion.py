"""Torch checkpoint ingestion (pure numpy) + faithful LSTM forward.

Covers VERDICT r3 task #2: a ``torch.save``-format state dict loads
without torch and drives a real LSTM forward pass (torch gate order,
packed-sequence masking, center max-pool — reference
medcat/utils/meta_cat/models.py:11-84, meta_cat.py:380-428).
"""

import io
import pickle
import zipfile
from collections import OrderedDict

import numpy as np
import pytest

from medcat_spark.functions.lstm_meta import (
    CNTX_LEFT, CNTX_RIGHT, LstmCell, LstmMetaModel, _FIXTURE_VOCAB,
    _sigmoid, lstm_fixture_model, lstm_fixture_state_dict)
from medcat_spark.sources.torch_pickle import (
    read_state_dict, tolerant_pickle_load, write_state_dict, is_inert)


# ---------------------------------------------------------------------------
# checkpoint zip format


def test_state_dict_roundtrip_dtypes(tmp_path):
    rs = np.random.RandomState(0)
    sd = {
        "w.f32": rs.randn(5, 3).astype(np.float32),
        "w.f64": rs.randn(4).astype(np.float64),
        "w.f16": rs.randn(2, 2).astype(np.float16),
        "w.i64": np.arange(6, dtype=np.int64).reshape(2, 3),
        "w.u8": np.arange(4, dtype=np.uint8),
        "w.scalar": np.array(2.5, dtype=np.float32),
        "w.bool": np.array(True),
    }
    p = str(tmp_path / "model.dat")
    write_state_dict(p, sd)
    out = read_state_dict(p)
    assert list(out) == list(sd)
    for k, v in sd.items():
        v = np.asarray(v)
        assert out[k].dtype == v.dtype, k
        assert out[k].shape == v.shape, k
        np.testing.assert_array_equal(out[k], v)


def test_zip_layout_matches_torch_convention(tmp_path):
    p = str(tmp_path / "model.dat")
    write_state_dict(p, {"a": np.zeros(2, dtype=np.float32)})
    names = zipfile.ZipFile(p).namelist()
    assert "archive/data.pkl" in names
    assert "archive/version" in names
    assert "archive/data/0" in names
    # storage bytes are raw little-endian
    raw = zipfile.ZipFile(p).read("archive/data/0")
    assert raw == np.zeros(2, dtype="<f4").tobytes()


def test_reader_finds_nested_root(tmp_path):
    """torch roots the zip at the checkpoint name, not always 'archive'."""
    p = str(tmp_path / "model.dat")
    write_state_dict(p, {"a": np.arange(3, dtype=np.float32)}, root="model")
    out = read_state_dict(p)
    np.testing.assert_array_equal(out["a"], np.arange(3, dtype=np.float32))


def test_reader_bfloat16_storage(tmp_path):
    """bf16 storages (ModernBERT-era checkpoints) decode via the
    high-16-bits-of-float32 rule."""
    from medcat_spark.sources import torch_pickle as tp
    vals = np.array([1.5, -2.0, 0.25, 3.0], dtype=np.float32)
    bf16 = (vals.view(np.uint32) >> 16).astype("<u2")  # exact in bf16

    class _BF16Tensor:
        def __reduce__(self):
            import sys
            mod = sys.modules["torch._utils"]
            return (mod._rebuild_tensor_v2,
                    (_Ref(), 0, (4,), (1,), False, OrderedDict()))

    class _Ref:
        pass

    class _P(pickle.Pickler):
        def persistent_id(self, obj):
            if isinstance(obj, _Ref):
                import sys
                return ("storage", getattr(sys.modules["torch"],
                                           "BFloat16Storage"), "0", "cpu", 4)
            return None

    buf = io.BytesIO()
    with tp._fake_torch_modules():
        import sys
        cls = type("BFloat16Storage", (), {"__module__": "torch"})
        sys.modules["torch"].BFloat16Storage = cls
        _P(buf, protocol=2).dump(OrderedDict(w=_BF16Tensor()))
    p = str(tmp_path / "bf16.dat")
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("archive/data.pkl", buf.getvalue())
        zf.writestr("archive/data/0", bf16.tobytes())
    out = read_state_dict(p)
    np.testing.assert_array_equal(out["w"], vals)


def test_reader_rejects_non_checkpoint(tmp_path):
    p = str(tmp_path / "x.zip")
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("whatever.txt", "hi")
    with pytest.raises(ValueError, match="data.pkl"):
        read_state_dict(p)


def test_tolerant_pickle_never_resolves_dangerous_builtins(tmp_path):
    """Security regression (r4 review finding): a crafted cdb.dat must
    NOT reach eval/exec/__import__ — only inert data constructors."""
    target = str(tmp_path / "pwned_by_pickle").encode()
    evil = (b"cbuiltins\neval\n(S'open(\"" + target + b"\",\"w\")'\n"
            b"tR.")
    p = tmp_path / "cdb.dat"
    p.write_bytes(evil)
    out = tolerant_pickle_load(str(p))
    assert is_inert(out)
    import os
    assert not os.path.exists(target.decode())
    # numpy gadget (PoC from the r4 review): runstring must not resolve
    evil2 = (b"cnumpy.testing._private.utils\nrunstring\n(S'open(\""
             + target + b"\",\"w\")'\n(dtR.")
    p.write_bytes(evil2)
    out2 = tolerant_pickle_load(str(p))
    assert is_inert(out2)
    assert not os.path.exists(target.decode())
    # safe constructors still resolve
    import pickle as pkl
    good = tmp_path / "ok.dat"
    good.write_bytes(pkl.dumps({"s": {1, 2}, "d": {"a": 1}}))
    out2 = tolerant_pickle_load(str(good))
    assert out2 == {"s": {1, 2}, "d": {"a": 1}}


def test_tolerant_pickle_load_stubs_foreign_globals(tmp_path):
    """A dict containing an unimportable global (the shape of a dill-pickled
    weighted_average_function inside cdb.dat) loads with the bad entry
    degraded to an inert stub, everything else intact."""
    payload = {"counts": {"a": 1, "b": 2}, "vec": np.arange(3.0)}
    buf = io.BytesIO()

    class _Evil:
        pass
    _Evil.__module__ = "dill._dill"
    _Evil.__qualname__ = _Evil.__name__ = "_create_function"
    import sys
    import types
    fake = types.ModuleType("dill._dill")
    fake._create_function = _Evil
    sys.modules["dill"] = types.ModuleType("dill")
    sys.modules["dill._dill"] = fake
    try:
        pickle.dump({**payload, "waf": _Evil}, buf)
    finally:
        del sys.modules["dill"], sys.modules["dill._dill"]
    p = tmp_path / "cdb.dat"
    p.write_bytes(buf.getvalue())
    out = tolerant_pickle_load(str(p))
    assert out["counts"] == {"a": 1, "b": 2}
    np.testing.assert_array_equal(out["vec"], np.arange(3.0))
    assert is_inert(out["waf"]) or isinstance(out["waf"], type)


# ---------------------------------------------------------------------------
# LSTM forward semantics


def _brute_forward(m: LstmMetaModel, window, center):
    """Unbatched per-example reference: run each direction over exactly
    the real tokens (what packed sequences give torch)."""
    ids = [m.token2id.get(t, m.unk_id) for t in window]
    X = m.E[ids]

    def run(cell, xs):
        h = np.zeros(cell.H)
        c = np.zeros(cell.H)
        outs = []
        for x in xs:
            pre = cell.W_ih @ x + cell.W_hh @ h + cell.b
            H = cell.H
            i = _sigmoid(pre[:H])
            f = _sigmoid(pre[H:2 * H])
            g = np.tanh(pre[2 * H:3 * H])
            o = _sigmoid(pre[3 * H:])
            c = f * c + i * g
            h = o * np.tanh(c)
            outs.append(h)
        return outs

    out = None
    for fwd, bwd in m.layers:
        hf = run(fwd, X)
        seq = [np.asarray(v) for v in hf]
        if bwd is not None:
            hb = run(bwd, X[::-1])[::-1]
            seq = [np.concatenate([hf[t], hb[t]]) for t in range(len(X))]
        X = np.array(seq)
        out = X
    pooled = out[center[0]:center[1] + 1].max(axis=0)
    return pooled @ m.fc_W.T + m.fc_b


def _random_windows(rs, n=60, max_len=7):
    wins, cents = [], []
    for _ in range(n):
        L = rs.randint(1, max_len)
        w = [_FIXTURE_VOCAB[1 + rs.randint(len(_FIXTURE_VOCAB) - 1)]
             if rs.rand() < 0.7 else f"oov{rs.randint(3)}"
             for _ in range(L)]
        cf = rs.randint(0, L)
        cl = min(L - 1, cf + rs.randint(0, 2))
        wins.append(w)
        cents.append((cf, cl))
    return wins, cents


def test_batched_forward_matches_per_example():
    m = lstm_fixture_model()
    wins, cents = _random_windows(np.random.RandomState(3))
    lg = m.forward_windows(wins, cents)
    ref = np.array([_brute_forward(m, w, c) for w, c in zip(wins, cents)])
    assert np.abs(lg - ref).max() < 1e-12


def test_ragged_batch_equals_individual_calls():
    """Suffix padding + mask gating == packed sequences: batch scoring is
    invariant to what else is in the batch."""
    m = lstm_fixture_model()
    wins, cents = _random_windows(np.random.RandomState(5), n=20)
    batched = m.predict_batch(wins, cents)
    single = [m.predict_batch([w], [c])[0] for w, c in zip(wins, cents)]
    assert batched == single


def test_two_layer_bidirectional_matches_per_example():
    rs = np.random.RandomState(11)
    D, H, C, V = 4, 3, 2, len(_FIXTURE_VOCAB)

    def r(*shape):
        return rs.uniform(-0.7, 0.7, size=shape).astype(np.float32)

    sd = {"embeddings.weight": r(V, D), "fc1.weight": r(C, 2 * H),
          "fc1.bias": r(C)}
    for k, din in ((0, D), (1, 2 * H)):
        for suf in ("", "_reverse"):
            sd[f"rnn.weight_ih_l{k}{suf}"] = r(4 * H, din)
            sd[f"rnn.weight_hh_l{k}{suf}"] = r(4 * H, H)
            sd[f"rnn.bias_ih_l{k}{suf}"] = r(4 * H)
            sd[f"rnn.bias_hh_l{k}{suf}"] = r(4 * H)
    m = LstmMetaModel.from_state_dict(
        sd, ["A", "B"], {t: i for i, t in enumerate(_FIXTURE_VOCAB)})
    assert len(m.layers) == 2
    wins, cents = _random_windows(np.random.RandomState(13), n=30)
    lg = m.forward_windows(wins, cents)
    ref = np.array([_brute_forward(m, w, c) for w, c in zip(wins, cents)])
    assert np.abs(lg - ref).max() < 1e-10


def test_export_reimport_identical_predictions(tmp_path):
    m = lstm_fixture_model()
    p = str(tmp_path / "model.dat")
    write_state_dict(p, m.export_state_dict())
    m2 = LstmMetaModel.from_state_dict(
        read_state_dict(p), m.labels, m.token2id,
        pad_id=m.pad_id, unk_id=m.unk_id,
        cntx_left=m.cntx_left, cntx_right=m.cntx_right)
    wins, cents = _random_windows(np.random.RandomState(17), n=25)
    assert m.predict_batch(wins, cents) == m2.predict_batch(wins, cents)


def test_fixture_state_dict_has_reference_keys():
    sd = lstm_fixture_state_dict()
    # exactly the parameter names nn.Embedding/nn.LSTM/nn.Linear produce
    # (meta_cat/models.py:21-33)
    assert set(sd) == {
        "embeddings.weight", "fc1.weight", "fc1.bias",
        "rnn.weight_ih_l0", "rnn.weight_hh_l0",
        "rnn.bias_ih_l0", "rnn.bias_hh_l0",
        "rnn.weight_ih_l0_reverse", "rnn.weight_hh_l0_reverse",
        "rnn.bias_ih_l0_reverse", "rnn.bias_hh_l0_reverse"}
    assert sd["embeddings.weight"][0].sum() == 0.0  # padding row zero


def test_missing_rnn_weights_rejected():
    with pytest.raises(ValueError, match="rnn.weight_ih_l0"):
        LstmMetaModel.from_state_dict(
            {"embeddings.weight": np.zeros((3, 2))}, ["A"], {})


def test_fc_width_mismatch_rejected():
    sd = lstm_fixture_state_dict()
    sd["fc1.weight"] = np.zeros((2, 5), dtype=np.float32)  # 2H = 6
    with pytest.raises(ValueError, match="fc1.weight"):
        LstmMetaModel.from_state_dict(
            sd, ["A", "B"], {}, cntx_left=CNTX_LEFT, cntx_right=CNTX_RIGHT)


# -- untrusted size/stride/offset bounds (the as_strided hardening) ----------

def test_rebuild_tensor_bounds_checks():
    """A crafted checkpoint controls size/stride/storage_offset; without
    bounds validation as_strided().copy() reads outside the storage
    buffer (process-memory disclosure / segfault).  Every hostile header
    must raise BEFORE the view is built."""
    from medcat_spark.sources.torch_pickle import (_rebuild_tensor_v2,
                                                   _Storage)
    st = _Storage(np.arange(12, dtype=np.float32))
    # legitimate strided view works and copies the right values
    t = _rebuild_tensor_v2(st, 0, (3, 4), (4, 1))
    assert t.shape == (3, 4) and t[2, 3] == 11.0
    # offset + reach beyond the end
    with pytest.raises(ValueError, match="reaches element"):
        _rebuild_tensor_v2(st, 4, (3, 4), (4, 1))
    # huge stride: max reachable index far outside the 12-element buffer
    with pytest.raises(ValueError, match="reaches element"):
        _rebuild_tensor_v2(st, 0, (2, 2), (1 << 40, 1))
    # negative stride walks backwards out of the slice
    with pytest.raises(ValueError, match="negative"):
        _rebuild_tensor_v2(st, 11, (12,), (-1,))
    # negative offset
    with pytest.raises(ValueError, match="outside storage"):
        _rebuild_tensor_v2(st, -1, (2,), (1,))
    # rank mismatch
    with pytest.raises(ValueError, match="rank"):
        _rebuild_tensor_v2(st, 0, (2, 2), (1,))
    # scalar past the end
    with pytest.raises(ValueError, match="scalar"):
        _rebuild_tensor_v2(st, 12, (), ())
    # zero-size dimension is inert regardless of stride
    z = _rebuild_tensor_v2(st, 0, (0, 5), (1 << 40, 1))
    assert z.shape == (0, 5)
