"""In-engine RelCAT training: full numpy backprop through the BERT
encoder + relation head.

Closes the remaining half of VERDICT r4 "What's missing" #3 (after
lstm_train.py covered meta_cat.train): the reference's
``RelCAT.train`` (/root/reference/medcat/rel_cat.py:174-420) fine-tunes
``BertModel_RelationExtraction`` end-to-end — this module reproduces
that loop without torch:

  * relation samples from an MCT export's ``document["relations"]``
    records (+ optional sampled "Other" pairs from validated
    annotations — rel_dataset.py:476-620), marked-sequence construction
    shared byte-for-byte with the inference scorer
    (:func:`bert_np.mark_pair_sequence`);
  * balanced class weights when enabled (rel_cat.py:239-247), CE loss
    with torch's ``CrossEntropyLoss(weight)`` normalization;
  * AdamW (decoupled weight decay, the reference's torch.optim.AdamW
    with config adam_betas/adam_epsilon/adam_weight_decay), MultiStepLR
    (milestones × gamma 0.8), total-grad-norm clip (max_grad_norm 1.0);
  * per-epoch held-out eval, best-F1 state kept (the reference's
    save_state(best) checkpoint protocol).

The analytic gradient for EVERY parameter tensor — embeddings,
attention q/k/v/output, both LayerNorms, GELU intermediate, pooler,
annotation-tag max-pools, fc1-3 — is certified against numerical
differentiation in tests/test_bert_train.py.

Scale posture: gold relation annotations are driver-scale (same
argument as lstm_train); window prep distributes via mapInPandas, the
optimizer loop runs on the driver, and the trained component round-
trips through write_reference_rel_component into the Spark scoring
plan.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import math

import numpy as np
import pandas as pd

from medcat_spark.functions.bert_np import (BertEncoder, BertLayer,
                                            RelCatBertModel, _erf, gelu)
from medcat_spark.functions.lstm_train import (_clip_total_norm, _f1_report,
                                               class_weights_balanced)

# sample = (marked token ids, (p1, p2) marker starts, label id)
Sample = Tuple[List[int], Tuple[int, int], int]

_SQRT2 = math.sqrt(2.0)
_INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.pi)


# ---------------------------------------------------------------------------
# primitive backward passes


def _linear_bwd(dy: np.ndarray, x: np.ndarray, W: np.ndarray):
    """y = x @ W.T + b → (dx, dW, db); x/dy may be (B, D) or (B, L, D)."""
    dy2 = dy.reshape(-1, dy.shape[-1])
    x2 = x.reshape(-1, x.shape[-1])
    return dy @ W, dy2.T @ x2, dy2.sum(axis=0)


def _layer_norm_fwd(x: np.ndarray, w: np.ndarray, b: np.ndarray,
                    eps: float = 1e-12):
    mu = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    inv = 1.0 / np.sqrt(var + eps)
    xhat = (x - mu) * inv
    return xhat * w + b, (xhat, inv)


def _layer_norm_bwd(dy: np.ndarray, cache, w: np.ndarray):
    xhat, inv = cache
    axes = tuple(range(dy.ndim - 1))
    dw = (dy * xhat).sum(axis=axes)
    db = dy.sum(axis=axes)
    dxhat = dy * w
    m = dxhat.mean(axis=-1, keepdims=True)
    mx = (dxhat * xhat).mean(axis=-1, keepdims=True)
    return inv * (dxhat - m - xhat * mx), dw, db


def _gelu_bwd(dy: np.ndarray, x: np.ndarray) -> np.ndarray:
    cdf = 0.5 * (1.0 + _erf(x / _SQRT2).astype(np.float64))
    pdf = _INV_SQRT_2PI * np.exp(-0.5 * x * x)
    return dy * (cdf + x * pdf)


# ---------------------------------------------------------------------------
# encoder forward with cache + backward


def encoder_forward_cache(enc: BertEncoder, ids: np.ndarray,
                          mask: np.ndarray):
    """BertEncoder.forward with every intermediate the backward needs."""
    B, L = ids.shape
    ttype = np.zeros((B, L), dtype=np.int64)
    x_emb = (enc.word[ids] + enc.pos[np.arange(L)][None, :, :]
             + enc.ttype[ttype])
    x, eln_cache = _layer_norm_fwd(x_emb, enc.eln_w, enc.eln_b)
    ext = (1.0 - mask)[:, None, None, :] * -10000.0
    layer_caches = []
    for layer in enc.layers:
        nh = layer.n_heads
        H = x.shape[2]
        dh = H // nh

        def split(t):
            return t.reshape(B, L, nh, dh).transpose(0, 2, 1, 3)

        q = split(x @ layer.q_w.T + layer.q_b)
        k = split(x @ layer.k_w.T + layer.k_b)
        v = split(x @ layer.v_w.T + layer.v_b)
        scores = q @ k.transpose(0, 1, 3, 2) / math.sqrt(dh) + ext
        e = np.exp(scores - scores.max(axis=-1, keepdims=True))
        probs = e / e.sum(axis=-1, keepdims=True)
        ctx = (probs @ v).transpose(0, 2, 1, 3).reshape(B, L, H)
        a_lin = ctx @ layer.ao_w.T + layer.ao_b
        attn_out, ln1 = _layer_norm_fwd(a_lin + x, layer.aln_w, layer.aln_b)
        inter_pre = attn_out @ layer.i_w.T + layer.i_b
        ig = gelu(inter_pre)
        o_lin = ig @ layer.o_w.T + layer.o_b
        y, ln2 = _layer_norm_fwd(o_lin + attn_out, layer.oln_w, layer.oln_b)
        layer_caches.append(
            dict(x=x, q=q, k=k, v=v, probs=probs, ctx=ctx, ln1=ln1,
                 attn_out=attn_out, inter_pre=inter_pre, ig=ig, ln2=ln2))
        x = y
    pooled = pooled_pre = None
    if enc.pooler_w is not None:
        pooled_pre = x[:, 0] @ enc.pooler_w.T + enc.pooler_b
        pooled = np.tanh(pooled_pre)
    cache = dict(ids=ids, ttype=ttype, eln=eln_cache, layers=layer_caches,
                 seq=x, pooled=pooled)
    return x, pooled, cache


def encoder_backward(enc: BertEncoder, cache, dseq: np.ndarray,
                     dpooled: Optional[np.ndarray]
                     ) -> Dict[str, np.ndarray]:
    """Gradients for every encoder parameter, HF state-dict key names."""
    grads: Dict[str, np.ndarray] = {}
    dx = np.array(dseq, copy=True)
    if dpooled is not None and enc.pooler_w is not None:
        pooled = cache["pooled"]
        dz = dpooled * (1.0 - pooled ** 2)
        dcls, dWp, dbp = _linear_bwd(dz, cache["seq"][:, 0], enc.pooler_w)
        grads["pooler.dense.weight"] = dWp
        grads["pooler.dense.bias"] = dbp
        dx[:, 0] += dcls
    for li in range(len(enc.layers) - 1, -1, -1):
        layer = enc.layers[li]
        c = cache["layers"][li]
        pre = f"encoder.layer.{li}."
        B, L, H = c["x"].shape
        nh = layer.n_heads
        dh = H // nh
        # output LayerNorm
        dsum2, dw, db = _layer_norm_bwd(dx, c["ln2"], layer.oln_w)
        grads[pre + "output.LayerNorm.weight"] = dw
        grads[pre + "output.LayerNorm.bias"] = db
        # output dense + residual
        dig, dWo, dbo = _linear_bwd(dsum2, c["ig"], layer.o_w)
        grads[pre + "output.dense.weight"] = dWo
        grads[pre + "output.dense.bias"] = dbo
        dinter = _gelu_bwd(dig, c["inter_pre"])
        dattn1, dWi, dbi = _linear_bwd(dinter, c["attn_out"], layer.i_w)
        grads[pre + "intermediate.dense.weight"] = dWi
        grads[pre + "intermediate.dense.bias"] = dbi
        dattn_out = dsum2 + dattn1
        # attention LayerNorm
        dsum1, dw, db = _layer_norm_bwd(dattn_out, c["ln1"], layer.aln_w)
        grads[pre + "attention.output.LayerNorm.weight"] = dw
        grads[pre + "attention.output.LayerNorm.bias"] = db
        # attention output dense + residual to x
        dctx, dWao, dbao = _linear_bwd(dsum1, c["ctx"], layer.ao_w)
        grads[pre + "attention.output.dense.weight"] = dWao
        grads[pre + "attention.output.dense.bias"] = dbao
        dx_resid = dsum1
        # back through the attention core
        dctx4 = dctx.reshape(B, L, nh, dh).transpose(0, 2, 1, 3)
        probs, q, k, v = c["probs"], c["q"], c["k"], c["v"]
        dprobs = dctx4 @ v.transpose(0, 1, 3, 2)
        dv = probs.transpose(0, 1, 3, 2) @ dctx4
        dscores = probs * (dprobs - (dprobs * probs).sum(axis=-1,
                                                         keepdims=True))
        dscores /= math.sqrt(dh)
        dq = dscores @ k
        dk = dscores.transpose(0, 1, 3, 2) @ q

        def merge(t4):          # (B, nh, L, dh) -> (B, L, H)
            return t4.transpose(0, 2, 1, 3).reshape(B, L, H)

        dxq, dWq, dbq = _linear_bwd(merge(dq), c["x"], layer.q_w)
        dxk, dWk, dbk = _linear_bwd(merge(dk), c["x"], layer.k_w)
        dxv, dWv, dbv = _linear_bwd(merge(dv), c["x"], layer.v_w)
        grads[pre + "attention.self.query.weight"] = dWq
        grads[pre + "attention.self.query.bias"] = dbq
        grads[pre + "attention.self.key.weight"] = dWk
        grads[pre + "attention.self.key.bias"] = dbk
        grads[pre + "attention.self.value.weight"] = dWv
        grads[pre + "attention.self.value.bias"] = dbv
        dx = dx_resid + dxq + dxk + dxv
    # embedding LayerNorm + tables
    demb, dw, db = _layer_norm_bwd(dx, cache["eln"], enc.eln_w)
    grads["embeddings.LayerNorm.weight"] = dw
    grads["embeddings.LayerNorm.bias"] = db
    dword = np.zeros_like(enc.word)
    np.add.at(dword, cache["ids"], demb)
    grads["embeddings.word_embeddings.weight"] = dword
    L = demb.shape[1]
    dpos = np.zeros_like(enc.pos)
    dpos[:L] = demb.sum(axis=0)
    grads["embeddings.position_embeddings.weight"] = dpos
    dtt = np.zeros_like(enc.ttype)
    np.add.at(dtt, cache["ttype"], demb)
    grads["embeddings.token_type_embeddings.weight"] = dtt
    return grads


# ---------------------------------------------------------------------------
# RelCat head: forward cache + backward


def relcat_forward_backward(model: RelCatBertModel, batch: Sequence[Sample],
                            class_weights: Optional[np.ndarray]):
    """Weighted-CE loss + gradients for the full RelCAT model over one
    minibatch of marked sequences.  Returns (loss, grads, logits)."""
    B = len(batch)
    L = max(len(s[0]) for s in batch)
    ids = np.zeros((B, L), dtype=np.int64)
    mask = np.zeros((B, L))
    starts = np.zeros((B, 2), dtype=np.int64)
    y = np.empty(B, dtype=np.int64)
    for r, (w, (p1, p2), lbl) in enumerate(batch):
        ids[r, :len(w)] = w
        mask[r, :len(w)] = 1.0
        starts[r] = (p1, p2)
        y[r] = lbl
    seq, pooled, cache = encoder_forward_cache(model.encoder, ids, mask)
    H = seq.shape[2]
    tags = getattr(model, "tag_ids", None)
    pool_idx = []            # per entity: (rows, argmax positions)
    if tags and len(tags) >= 4:
        feats = [pooled]
        for st, en in ((tags[0], tags[1]), (tags[2], tags[3])):
            t = np.empty((B, H))
            am = np.empty((B, H), dtype=np.int64)
            for b in range(B):
                s = int(np.flatnonzero(ids[b] == st)[0])
                e = int(np.flatnonzero(ids[b] == en)[0])
                span = seq[b, s + 1:e]
                am[b] = span.argmax(axis=0) + s + 1
                t[b] = span.max(axis=0)
            feats.append(t)
            pool_idx.append(am)
        x = np.concatenate(feats, axis=1)
    else:
        e1 = seq[np.arange(B), starts[:, 0]]
        e2 = seq[np.arange(B), starts[:, 1]]
        x = np.concatenate([pooled, e1, e2], axis=1)
    h1 = x @ model.fc1_w.T + model.fc1_b
    h2 = h1 @ model.fc2_w.T + model.fc2_b
    logits = h2 @ model.fc3_w.T + model.fc3_b

    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    p = e / e.sum(axis=1, keepdims=True)
    w = class_weights[y] if class_weights is not None else np.ones(B)
    wsum = w.sum()
    loss = float(-(w * np.log(np.maximum(p[np.arange(B), y], 1e-12))).sum()
                 / wsum)
    dlogits = p * w[:, None]
    dlogits[np.arange(B), y] -= w
    dlogits /= wsum

    grads: Dict[str, np.ndarray] = {}
    dh2, grads["fc3.weight"], grads["fc3.bias"] = _linear_bwd(
        dlogits, h2, model.fc3_w)
    dh1, grads["fc2.weight"], grads["fc2.bias"] = _linear_bwd(
        dh2, h1, model.fc2_w)
    dxcat, grads["fc1.weight"], grads["fc1.bias"] = _linear_bwd(
        dh1, x, model.fc1_w)
    dpooled = dxcat[:, :H]
    dseq = np.zeros_like(seq)
    if pool_idx:
        rows = np.repeat(np.arange(B), H)
        cols = np.tile(np.arange(H), B)
        for ei, am in enumerate(pool_idx):
            dpart = dxcat[:, H * (ei + 1):H * (ei + 2)]
            np.add.at(dseq, (rows, am.ravel(), cols), dpart.ravel())
    else:
        np.add.at(dseq, (np.arange(B), starts[:, 0]), dxcat[:, H:2 * H])
        np.add.at(dseq, (np.arange(B), starts[:, 1]), dxcat[:, 2 * H:3 * H])
    enc_grads = encoder_backward(model.encoder, cache, dseq, dpooled)
    grads.update(enc_grads)
    return loss, grads, logits


def encoder_params(enc: BertEncoder) -> Dict[str, np.ndarray]:
    """name → the live array for every encoder parameter (in-place
    optimizer updates mutate the model).  Keys match
    encoder_backward's grad keys."""
    ps: Dict[str, np.ndarray] = {
        "embeddings.word_embeddings.weight": enc.word,
        "embeddings.position_embeddings.weight": enc.pos,
        "embeddings.token_type_embeddings.weight": enc.ttype,
        "embeddings.LayerNorm.weight": enc.eln_w,
        "embeddings.LayerNorm.bias": enc.eln_b,
    }
    if enc.pooler_w is not None:
        ps["pooler.dense.weight"] = enc.pooler_w
        ps["pooler.dense.bias"] = enc.pooler_b
    for i, lay in enumerate(enc.layers):
        pre = f"encoder.layer.{i}."
        ps[pre + "attention.self.query.weight"] = lay.q_w
        ps[pre + "attention.self.query.bias"] = lay.q_b
        ps[pre + "attention.self.key.weight"] = lay.k_w
        ps[pre + "attention.self.key.bias"] = lay.k_b
        ps[pre + "attention.self.value.weight"] = lay.v_w
        ps[pre + "attention.self.value.bias"] = lay.v_b
        ps[pre + "attention.output.dense.weight"] = lay.ao_w
        ps[pre + "attention.output.dense.bias"] = lay.ao_b
        ps[pre + "attention.output.LayerNorm.weight"] = lay.aln_w
        ps[pre + "attention.output.LayerNorm.bias"] = lay.aln_b
        ps[pre + "intermediate.dense.weight"] = lay.i_w
        ps[pre + "intermediate.dense.bias"] = lay.i_b
        ps[pre + "output.dense.weight"] = lay.o_w
        ps[pre + "output.dense.bias"] = lay.o_b
        ps[pre + "output.LayerNorm.weight"] = lay.oln_w
        ps[pre + "output.LayerNorm.bias"] = lay.oln_b
    return ps


def relcat_params(model: RelCatBertModel) -> Dict[str, np.ndarray]:
    ps = encoder_params(model.encoder)
    ps.update({"fc1.weight": model.fc1_w, "fc1.bias": model.fc1_b,
               "fc2.weight": model.fc2_w, "fc2.bias": model.fc2_b,
               "fc3.weight": model.fc3_w, "fc3.bias": model.fc3_b})
    return ps


class _AdamW:
    """torch.optim.AdamW: decoupled weight decay (p -= lr*wd*p before
    the moment update), bias-corrected moments."""

    def __init__(self, params: Dict[str, np.ndarray], lr: float,
                 weight_decay: float = 0.0,
                 betas: Tuple[float, float] = (0.9, 0.999),
                 eps: float = 1e-8) -> None:
        self.params = params
        self.lr = lr
        self.wd = weight_decay
        self.b1, self.b2 = betas
        self.eps = eps
        self.t = 0
        self.m = {k: np.zeros_like(v) for k, v in params.items()}
        self.v = {k: np.zeros_like(v) for k, v in params.items()}

    def step(self, grads: Dict[str, np.ndarray]) -> None:
        self.t += 1
        for k, p in self.params.items():
            g = grads[k]
            p *= (1.0 - self.lr * self.wd)
            self.m[k] = self.b1 * self.m[k] + (1 - self.b1) * g
            self.v[k] = self.b2 * self.v[k] + (1 - self.b2) * g * g
            mh = self.m[k] / (1 - self.b1 ** self.t)
            vh = self.v[k] / (1 - self.b2 ** self.t)
            p -= self.lr * mh / (np.sqrt(vh) + self.eps)


def train_relcat(model: RelCatBertModel, data: Sequence[Sample], *,
                 nepochs: int = 10, lr: float = 1e-4,
                 batch_size: int = 25, test_size: float = 0.2,
                 enable_class_weights: bool = True,
                 class_weights: Optional[Sequence[float]] = None,
                 max_grad_norm: float = 1.0,
                 adam_weight_decay: float = 0.0,
                 adam_betas: Tuple[float, float] = (0.9, 0.999),
                 adam_epsilon: float = 1e-8,
                 multistep_milestones: Optional[List[int]] = None,
                 multistep_lr_gamma: float = 0.8,
                 seed: int = 42, shuffle_data: bool = True,
                 patience: int = 0, grad_fn=None) -> Dict:
    """Reference RelCAT.train loop (rel_cat.py:174-420) in numpy.
    Mutates ``model`` to the best-F1 epoch's weights, returns the
    report.  ``grad_fn(model, batch, cw) -> (loss, grads)`` overrides
    the per-macro-batch gradient (the train_relcat_spark hook)."""
    rng = np.random.RandomState(seed)
    data = list(data)
    if shuffle_data:
        rng.shuffle(data)
    if len(data) < 2:
        raise ValueError("need at least 2 relation samples")
    n_test = max(1, int(round(len(data) * test_size)))
    test, train = data[:n_test], data[n_test:]
    n_classes = len(model.labels)
    y_train = np.array([y for _, _, y in train])
    y_test = np.array([y for _, _, y in test])
    if class_weights is not None:
        cw = np.asarray(class_weights, dtype=np.float64)
    elif enable_class_weights:
        cw = class_weights_balanced(y_train, n_classes)
    else:
        cw = None
    params = relcat_params(model)
    opt = _AdamW(params, lr=lr, weight_decay=adam_weight_decay,
                 betas=adam_betas, eps=adam_epsilon)
    milestones = set(multistep_milestones
                     or [2, 4, 6, 8, 12, 15, 18, 20, 22, 24, 26, 30])
    winner: Dict = {}
    winner_state: Dict[str, np.ndarray] = {}
    since = 0
    for epoch in range(nepochs):
        order = rng.permutation(len(train))
        losses = []
        for ofs in range(0, len(train), batch_size):
            batch = [train[i] for i in order[ofs:ofs + batch_size]]
            if grad_fn is None:
                loss, grads, _ = relcat_forward_backward(model, batch, cw)
            else:
                loss, grads = grad_fn(model, batch, cw)
            _clip_total_norm(grads, max_grad_norm)
            opt.step(grads)
            losses.append(loss)
        if (epoch + 1) in milestones:       # MultiStepLR
            opt.lr *= multistep_lr_gamma
        preds = []
        for ofs in range(0, len(test), 256):
            chunk = test[ofs:ofs + 256]
            _, _, lg = relcat_forward_backward(model, chunk, None)
            preds.extend(lg.argmax(axis=1).tolist())
        rep = _f1_report(y_test, np.array(preds), n_classes)
        rep["epoch"] = epoch
        rep["train_loss"] = round(float(np.mean(losses)), 6)
        rep["lr"] = round(opt.lr, 8)
        if not winner or rep["macro_f1"] > winner["macro_f1"]:
            winner = rep
            winner_state = {k: v.copy() for k, v in params.items()}
            since = 0
        else:
            since += 1
            if patience > 0 and since >= patience:
                break
    for k, v in winner_state.items():
        params[k][...] = v
    winner["n_train"] = len(train)
    winner["n_test"] = len(test)
    winner["class_weights"] = (None if cw is None
                               else [round(float(x), 4) for x in cw])
    return winner


# ---------------------------------------------------------------------------
# MCT relation samples (rel_dataset.create_relations_from_export)


def mct_relation_samples(spark, mct_path: str, model: RelCatBertModel,
                         other_sample_per_doc: int = 0,
                         label2id: Optional[Dict[str, int]] = None):
    """MCT export ``relations`` records → DataFrame (doc_id, ids, p1,
    p2, label) of marked training sequences.  Marked-sequence
    construction is the inference scorer's own
    (:func:`bert_np.mark_pair_sequence`), so train and score see
    byte-identical inputs.

    ``other_sample_per_doc`` > 0 adds up to that many "Other" pairs per
    document from validated annotations not covered by a labeled
    relation (rel_dataset.py:516-559; deterministic first-N instead of
    the reference's random.shuffle so runs are reproducible)."""
    from pyspark.sql import functions as F

    from medcat_spark.functions.bert_np import mark_pair_sequence

    raw = spark.read.option("multiLine", "true").json(mct_path)
    doc = (raw.select(F.explode("projects").alias("p"))
           .select(F.explode("p.documents").alias("d"))
           .select(F.col("d.id").cast("string").alias("doc_id"),
                   F.col("d.text").alias("text"),
                   F.to_json(F.col("d.relations")).alias("rels_json"),
                   F.to_json(F.col("d.annotations")).alias("anns_json")))
    bc = spark.sparkContext.broadcast(
        (model.tokenizer, model.tag_ids,
         getattr(model, "cntx_left", 15), getattr(model, "cntx_right", 15),
         getattr(model, "max_seq_length", 512)))

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import json as _json
        from bisect import bisect_right
        tok, tag_ids, cntx_l, cntx_r, max_len = bc.value
        vocab = getattr(tok, "vocab", None) or {}
        cls_id = sep_id = None
        for c_t, s_t in (("[CLS]", "[SEP]"), ("<s>", "</s>")):
            if c_t in vocab and s_t in vocab:
                cls_id, sep_id = vocab[c_t], vocab[s_t]
                break
        for pdf in batches:
            out = {"doc_id": [], "ids": [], "p1": [], "p2": [],
                   "label": []}
            for row in pdf.itertuples(index=False):
                text = str(row.text or "")
                ids, spans = tok.encode_with_offsets(text)
                if not ids:
                    continue
                tok_starts = [s for s, _e in spans]

                def tok_range(start, end):
                    cf = bisect_right(tok_starts, start) - 1
                    if cf < 0 or spans[cf][1] <= start:
                        return None
                    cl = max(cf, bisect_right(tok_starts, end - 1) - 1)
                    return cf, cl

                rels = _json.loads(row.rels_json) if row.rels_json else []
                pairs = []
                covered = set()
                for rel in rels or []:
                    a = (int(rel["start_entity_start_idx"]),
                         int(rel["start_entity_end_idx"]))
                    b = (int(rel["end_entity_start_idx"]),
                         int(rel["end_entity_end_idx"]))
                    if a[0] > b[0]:     # reference start-order swap
                        a, b = b, a
                    pairs.append((a, b, str(rel["relation"])))
                    covered.add((a[0], b[0]))
                if other_sample_per_doc > 0 and row.anns_json:
                    anns = [x for x in _json.loads(row.anns_json)
                            if x.get("validated", True)]
                    anns.sort(key=lambda x: int(x["start"]))
                    n_other = 0
                    for i, ea in enumerate(anns):
                        for eb in anns[i + 1:]:
                            key = (int(ea["start"]), int(eb["start"]))
                            if key in covered or n_other >= \
                                    other_sample_per_doc:
                                continue
                            pairs.append(((int(ea["start"]),
                                           int(ea["end"])),
                                          (int(eb["start"]),
                                           int(eb["end"])), "Other"))
                            covered.add(key)
                            n_other += 1
                for a, b, label in pairs:
                    ra, rb = tok_range(*a), tok_range(*b)
                    if ra is None or rb is None or rb[0] <= ra[1]:
                        continue
                    res = mark_pair_sequence(
                        ids, ra, rb, tag_ids, cntx_l, cntx_r, max_len,
                        cls_id, sep_id)
                    if res is None:
                        continue
                    seq, p1, p2 = res
                    out["doc_id"].append(row.doc_id)
                    out["ids"].append(seq)
                    out["p1"].append(p1)
                    out["p2"].append(p2)
                    out["label"].append(label)
            yield pd.DataFrame(out)

    return doc.mapInPandas(
        build, "doc_id string, ids array<int>, p1 int, p2 int, "
               "label string")


def collect_relation_samples(df, labels: Optional[List[str]] = None
                             ) -> Tuple[List[Sample], List[str]]:
    rows = df.select("ids", "p1", "p2", "label").collect()
    if labels is None:
        seen: List[str] = []
        for r in rows:
            if r["label"] not in seen:
                seen.append(r["label"])
        labels = seen
    l2i = {v: i for i, v in enumerate(labels)}
    data = [(list(r["ids"]), (int(r["p1"]), int(r["p2"])), l2i[r["label"]])
            for r in rows if r["label"] in l2i]
    return data, labels


# ---------------------------------------------------------------------------
# BertForMetaAnnotation head (meta_cat/models.py:87-215) — same sample
# shape as lstm_train (window ids, (center_first, center_last), label),
# so mct_meta_samples feeds either head.


def bert_meta_forward_backward(model, batch, class_weights):
    """Loss + gradients for the full BertMetaModel: encoder → center
    max-pool ⊕ pooled CLS → fc1(+relu)[→fc2(+relu)[→fc3(+relu)]] → fc4.
    Returns (loss, grads, logits); grad keys = bert_meta_params keys."""
    B = len(batch)
    L = max(len(s[0]) for s in batch)
    ids = np.full((B, L), model.pad_id, dtype=np.int64)
    mask = np.zeros((B, L))
    V = model.encoder.word.shape[0]
    centers = []
    y = np.empty(B, dtype=np.int64)
    for r, (w, (cf, cl), lbl) in enumerate(batch):
        for c, tid in enumerate(w):
            ids[r, c] = tid if 0 <= tid < V else model.pad_id
            mask[r, c] = 1.0
        centers.append((cf, min(cl, len(w) - 1)))
        y[r] = lbl
    seq, pooled, cache = encoder_forward_cache(model.encoder, ids, mask)
    H = seq.shape[2]
    pool = np.empty((B, H))
    argmx = np.empty((B, H), dtype=np.int64)
    for b, (cf, cl) in enumerate(centers):
        span = seq[b, cf:cl + 1]
        argmx[b] = span.argmax(axis=0) + cf
        pool[b] = span.max(axis=0)
    x = np.concatenate([pool, pooled], axis=1)
    # fc chain with relu caches
    acts = [x]
    chain = ["fc1"]
    if model.use_fc2:
        chain.append("fc2")
        if model.use_fc3:
            chain.append("fc3")
    h = x
    for name in chain:
        h = np.maximum(0.0, h @ model.fc[f"{name}.weight"].T
                       + model.fc[f"{name}.bias"])
        acts.append(h)
    logits = h @ model.fc["fc4.weight"].T + model.fc["fc4.bias"]

    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    p = e / e.sum(axis=1, keepdims=True)
    w = class_weights[y] if class_weights is not None else np.ones(B)
    wsum = w.sum()
    loss = float(-(w * np.log(np.maximum(p[np.arange(B), y], 1e-12))).sum()
                 / wsum)
    dlogits = p * w[:, None]
    dlogits[np.arange(B), y] -= w
    dlogits /= wsum

    grads: Dict[str, np.ndarray] = {}
    dh, grads["fc4.weight"], grads["fc4.bias"] = _linear_bwd(
        dlogits, acts[-1], model.fc["fc4.weight"])
    for i in range(len(chain) - 1, -1, -1):
        name = chain[i]
        dh = dh * (acts[i + 1] > 0)            # relu
        dh, grads[f"{name}.weight"], grads[f"{name}.bias"] = _linear_bwd(
            dh, acts[i], model.fc[f"{name}.weight"])
    dpool, dpooled = dh[:, :H], dh[:, H:]
    dseq = np.zeros_like(seq)
    rows = np.repeat(np.arange(B), H)
    cols = np.tile(np.arange(H), B)
    np.add.at(dseq, (rows, argmx.ravel(), cols), dpool.ravel())
    grads.update(encoder_backward(model.encoder, cache, dseq, dpooled))
    return loss, grads, logits


def bert_meta_params(model) -> Dict[str, np.ndarray]:
    ps = encoder_params(model.encoder)
    names = ["fc1", "fc4"]
    if model.use_fc2:
        names.append("fc2")
        if model.use_fc3:
            names.append("fc3")
    for n in names:
        ps[f"{n}.weight"] = model.fc[f"{n}.weight"]
        ps[f"{n}.bias"] = model.fc[f"{n}.bias"]
    return ps


def train_bert_meta(model, data, *, nepochs: int = 50, lr: float = 1e-4,
                    batch_size: int = 32, test_size: float = 0.1,
                    class_weights=None, compute_class_weights: bool = True,
                    metric: str = "weighted_f1", patience: int = 0,
                    seed: int = 42, clip_norm: float = 0.15,
                    shuffle_data: bool = True, grad_fn=None) -> Dict:
    """ml_utils.train_model loop for the BERT meta head (the reference
    trains LSTM and BERT heads through the same loop — meta_cat.py:302;
    Adam, clip 0.15, winner by weighted-avg F1).  ``grad_fn`` as in
    train_relcat (the train_bert_meta_spark hook)."""
    from medcat_spark.functions.lstm_train import _Adam

    rng = np.random.RandomState(seed)
    data = list(data)
    if shuffle_data:
        rng.shuffle(data)
    if len(data) < 2:
        raise ValueError("need at least 2 samples")
    n_test = max(1, int(round(len(data) * test_size)))
    test, train = data[:n_test], data[n_test:]
    n_classes = len(model.labels)
    y_train = np.array([y for _, _, y in train])
    y_test = np.array([y for _, _, y in test])
    if class_weights is not None:
        cw = np.asarray(class_weights, dtype=np.float64)
    elif compute_class_weights:
        cw = class_weights_balanced(y_train, n_classes)
    else:
        cw = None
    params = bert_meta_params(model)
    opt = _Adam(params, lr=lr, weight_decay=1e-5)
    winner: Dict = {}
    winner_state: Dict[str, np.ndarray] = {}
    since = 0
    for epoch in range(nepochs):
        order = rng.permutation(len(train))
        losses = []
        for ofs in range(0, len(train), batch_size):
            batch = [train[i] for i in order[ofs:ofs + batch_size]]
            if grad_fn is None:
                loss, grads, _ = bert_meta_forward_backward(model, batch,
                                                            cw)
            else:
                loss, grads = grad_fn(model, batch, cw)
            _clip_total_norm(grads, clip_norm)
            opt.step(grads)
            losses.append(loss)
        preds = []
        for ofs in range(0, len(test), 256):
            chunk = test[ofs:ofs + 256]
            _, _, lg = bert_meta_forward_backward(model, chunk, None)
            preds.extend(lg.argmax(axis=1).tolist())
        rep = _f1_report(y_test, np.array(preds), n_classes)
        rep["epoch"] = epoch
        rep["train_loss"] = round(float(np.mean(losses)), 6)
        if not winner or rep[metric] > winner[metric]:
            winner = rep
            winner_state = {k: v.copy() for k, v in params.items()}
            since = 0
        else:
            since += 1
            if patience > 0 and since >= patience:
                break
    for k, v in winner_state.items():
        params[k][...] = v
    winner["n_train"] = len(train)
    winner["n_test"] = len(test)
    winner["class_weights"] = (None if cw is None
                               else [round(float(x), 4) for x in cw])
    return winner


# ---------------------------------------------------------------------------
# BertForTokenClassification head (TransformersNER / DeID fine-tune;
# the reference trains it through the HF Trainer —
# transformers_ner.py train(); per-token CE with -100 ignore_index is
# the HF convention its datasets use)


def token_classifier_forward_backward(model, batch, class_weights=None):
    """(ids, per-token label ids with -100 = ignored) batches → loss +
    gradients for encoder + classifier head."""
    B = len(batch)
    L = max(len(s[0]) for s in batch)
    ids = np.zeros((B, L), dtype=np.int64)
    mask = np.zeros((B, L))
    y = np.full((B, L), -100, dtype=np.int64)
    for r, (w, labels) in enumerate(batch):
        ids[r, :len(w)] = w
        mask[r, :len(w)] = 1.0
        y[r, :len(labels)] = labels
    seq, _pooled, cache = encoder_forward_cache(model.encoder, ids, mask)
    logits = seq @ model.cls_w.T + model.cls_b          # (B, L, C)
    C = logits.shape[2]
    flat_lg = logits.reshape(-1, C)
    flat_y = y.reshape(-1)
    keep = flat_y != -100
    kept_lg = flat_lg[keep]
    kept_y = flat_y[keep]
    e = np.exp(kept_lg - kept_lg.max(axis=1, keepdims=True))
    p = e / e.sum(axis=1, keepdims=True)
    w = (class_weights[kept_y] if class_weights is not None
         else np.ones(len(kept_y)))
    wsum = max(float(w.sum()), 1e-12)
    n = np.arange(len(kept_y))
    loss = float(-(w * np.log(np.maximum(p[n, kept_y], 1e-12))).sum()
                 / wsum)
    dkept = p * w[:, None]
    dkept[n, kept_y] -= w
    dkept /= wsum
    dflat = np.zeros_like(flat_lg)
    dflat[keep] = dkept
    dlogits = dflat.reshape(B, L, C)
    grads: Dict[str, np.ndarray] = {}
    dseq, grads["classifier.weight"], grads["classifier.bias"] = \
        _linear_bwd(dlogits, seq, model.cls_w)
    grads.update(encoder_backward(model.encoder, cache, dseq, None))
    return loss, grads, logits


def token_classifier_params(model) -> Dict[str, np.ndarray]:
    ps = encoder_params(model.encoder)
    # BertForTokenClassification has no pooler in its saved weights,
    # and encoder_backward emits no pooler grads when dpooled is None
    ps.pop("pooler.dense.weight", None)
    ps.pop("pooler.dense.bias", None)
    ps["classifier.weight"] = model.cls_w
    ps["classifier.bias"] = model.cls_b
    return ps


def train_token_classifier(model, data, *, nepochs: int = 10,
                           lr: float = 5e-5, batch_size: int = 8,
                           test_size: float = 0.2,
                           compute_class_weights: bool = False,
                           max_grad_norm: float = 1.0, seed: int = 42,
                           patience: int = 0) -> Dict:
    """Fine-tune the trf_* token-classification head (DeID/NER).
    ``data`` = [(ids, per-token labels, -100 ignored)].  AdamW at the
    HF-default 5e-5, winner by token-level macro F1 over non-ignored
    positions."""
    rng = np.random.RandomState(seed)
    data = list(data)
    rng.shuffle(data)
    if len(data) < 2:
        raise ValueError("need at least 2 sequences")
    n_test = max(1, int(round(len(data) * test_size)))
    test, train = data[:n_test], data[n_test:]
    n_classes = len(model.labels)
    y_train = np.concatenate([[l for l in labels if l != -100]
                              for _, labels in train]).astype(np.int64)
    cw = (class_weights_balanced(y_train, n_classes)
          if compute_class_weights else None)
    params = token_classifier_params(model)
    opt = _AdamW(params, lr=lr, weight_decay=0.01)   # HF Trainer default
    winner: Dict = {}
    winner_state: Dict[str, np.ndarray] = {}
    since = 0
    for epoch in range(nepochs):
        order = rng.permutation(len(train))
        losses = []
        for ofs in range(0, len(train), batch_size):
            batch = [train[i] for i in order[ofs:ofs + batch_size]]
            loss, grads, _ = token_classifier_forward_backward(
                model, batch, cw)
            _clip_total_norm(grads, max_grad_norm)
            opt.step(grads)
            losses.append(loss)
        yt, yp = [], []
        for ofs in range(0, len(test), batch_size):
            chunk = test[ofs:ofs + batch_size]
            _, _, lg = token_classifier_forward_backward(model, chunk)
            for r, (w, labels) in enumerate(chunk):
                for c, lbl in enumerate(labels):
                    if lbl != -100:
                        yt.append(lbl)
                        yp.append(int(lg[r, c].argmax()))
        rep = _f1_report(np.array(yt), np.array(yp), n_classes)
        rep["epoch"] = epoch
        rep["train_loss"] = round(float(np.mean(losses)), 6)
        if not winner or rep["macro_f1"] > winner["macro_f1"]:
            winner = rep
            winner_state = {k: v.copy() for k, v in params.items()}
            since = 0
        else:
            since += 1
            if patience > 0 and since >= patience:
                break
    for k, v in winner_state.items():
        params[k][...] = v
    winner["n_train"] = len(train)
    winner["n_test"] = len(test)
    return winner


def train_relcat_spark(spark, model: RelCatBertModel,
                       data: Sequence[Sample], *,
                       n_shards: int = 8, **kw) -> Dict:
    """Distributed RelCAT fine-tuning: the exact train_relcat loop
    (weighted CE, MultiStepLR, AdamW, winner epoch) with each
    macro-batch gradient computed data-parallel across executors and
    recombined wsum-weighted — identical to the sequential full-batch
    gradient by linearity (see lstm_train.spark_batch_grad)."""
    from medcat_spark.functions.lstm_train import spark_batch_grad
    return train_relcat(
        model, data,
        grad_fn=lambda m, batch, cw: spark_batch_grad(
            spark, m, batch, cw, n_shards, relcat_forward_backward),
        **kw)


def train_bert_meta_spark(spark, model, data: Sequence[Sample], *,
                          n_shards: int = 8, **kw) -> Dict:
    """Distributed BERT meta-head fine-tuning (same hook as
    train_relcat_spark over bert_meta_forward_backward)."""
    from medcat_spark.functions.lstm_train import spark_batch_grad
    return train_bert_meta(
        model, data,
        grad_fn=lambda m, batch, cw: spark_batch_grad(
            spark, m, batch, cw, n_shards, bert_meta_forward_backward),
        **kw)
