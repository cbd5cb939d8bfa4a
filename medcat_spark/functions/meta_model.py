"""MetaCAT-analogue TRAINED token-window classifier (SURVEY §2.11).

The reference's MetaCAT runs a torch BiLSTM/BERT over a token window
around each entity — window = tokens
``[first_ent_token - cntx_left, last_ent_token + cntx_right]``
(medcat/meta_cat.py:447-517 prepare_document; defaults cntx_left=15,
cntx_right=10, config_meta_cat.py:55-57) — and classifies it into a
meta-annotation value (Status/Negation/...), batched per document set
(meta_cat.py:636-651 pipe).

Torch is unavailable in this environment, so the analogue keeps the
SAME dataflow and model *shape* but a linear architecture:

    logits = W @ mean(E[token] for token in window) + b

trained with numpy logistic-regression SGD.  Because the model is
linear, each token's contribution collapses to a per-(token, class)
scalar ``S = E @ W.T``, which (a) makes executor-side scoring one dict
lookup + running sum per token, and (b) makes the scorer exactly
expressible as SQL (join the token→scores table, AVG per window, add
bias) — so the driver's DuckDB oracle can verify the classifier
end-to-end with fixed weights.  Swapping a torch scorer in changes only
``MetaCatModel.predict`` — the Spark plumbing (broadcast model,
per-executor cache, Arrow-batched ``mapInPandas``, one tokenize per
document for all its entities) is the production shape.

OOV window tokens contribute a zero vector; the mean divides by the
FULL window length (zeros included), matching the SQL oracle's
``SUM(score)/COUNT(*)``.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (DoubleType, IntegerType, StringType,
                               StructField, StructType)

CNTX_LEFT = 15   # reference config_meta_cat.py:55
CNTX_RIGHT = 10  # reference config_meta_cat.py:57


class MetaCatModel:
    """Broadcastable trained model: per-token class-score rows + bias.

    ``token_scores[tok]`` is an array of per-class contributions
    (already E[tok]·W[c]); ``bias`` the per-class intercept; ``labels``
    index→name.  Scores/bias are rounded to 4 decimals at export so the
    Spark scorer and the SQL oracle agree bit-for-bit after rounding.
    """

    def __init__(self, labels: List[str], token_scores: Dict[str, np.ndarray],
                 bias: np.ndarray, cntx_left: int = CNTX_LEFT,
                 cntx_right: int = CNTX_RIGHT) -> None:
        self.labels = labels
        self.token_scores = token_scores
        self.bias = bias
        self.cntx_left = cntx_left
        self.cntx_right = cntx_right

    def logits(self, window: Sequence[str]) -> np.ndarray:
        acc = np.zeros_like(self.bias)
        for t in window:
            s = self.token_scores.get(t)
            if s is not None:
                acc = acc + s
        return acc / max(len(window), 1) + self.bias

    def predict(self, window: Sequence[str]) -> Tuple[str, float]:
        lg = self.logits(window)
        i = int(np.argmax(lg))
        # softmax confidence (2-class: sigmoid of margin)
        e = np.exp(lg - lg.max())
        return self.labels[i], float(e[i] / e.sum())


def train_meta_model(windows: List[Tuple[List[str], str]], labels: List[str],
                     dim: int = 8, epochs: int = 300, lr: float = 0.5,
                     seed: int = 13, cntx_left: int = CNTX_LEFT,
                     cntx_right: int = CNTX_RIGHT) -> MetaCatModel:
    """Train embedding+linear classifier with deterministic numpy SGD.

    ``windows`` = [(window tokens, label)].  Embeddings are fixed
    deterministic per-token vectors (the reference trains/loads its own
    embeddings; determinism matters more here), the linear head is
    trained by full-batch gradient descent on softmax cross-entropy.
    """
    from medcat_spark.fixtures import det_vec

    vocab = sorted({t for w, _ in windows for t in w})
    E = np.stack([det_vec(t, dim) for t in vocab])
    tok2i = {t: i for i, t in enumerate(vocab)}
    lab2i = {l: i for i, l in enumerate(labels)}

    X = np.zeros((len(windows), dim))
    y = np.zeros(len(windows), dtype=int)
    for r, (w, lab) in enumerate(windows):
        vecs = [E[tok2i[t]] for t in w if t in tok2i]
        if vecs:
            X[r] = np.sum(vecs, axis=0) / len(w)
        y[r] = lab2i[lab]

    rng = np.random.RandomState(seed)
    W = rng.normal(0, 0.01, (len(labels), dim))
    b = np.zeros(len(labels))
    onehot = np.eye(len(labels))[y]
    for _ in range(epochs):
        lg = X @ W.T + b
        lg -= lg.max(axis=1, keepdims=True)
        p = np.exp(lg)
        p /= p.sum(axis=1, keepdims=True)
        g = (p - onehot) / len(windows)
        W -= lr * (g.T @ X)
        b -= lr * g.sum(axis=0)

    S = np.round(E @ W.T, 4)   # (V, C) per-token class contributions
    return MetaCatModel(labels, {t: S[i] for t, i in tok2i.items()},
                        np.round(b, 4), cntx_left, cntx_right)


# vocabulary of the driver testdata documents (TESTDATA.md) — the corpus
# the fixture classifier trains over
_TESTDATA_WORDS = ("spark merge window vector stream filter the fast key "
                   "order sort table scan part small hash join batch dup "
                   "group query row data slow customer line value agg "
                   "column big a").split()
_NEGATION_CUES = ("slow", "small")

_FIXTURE_CACHE: Optional[MetaCatModel] = None


def negation_fixture_model() -> MetaCatModel:
    """Deterministic fixture-trained Negation classifier: windows drawn
    from the testdata vocabulary, labeled negated iff a cue word is
    present, trained once per process (seeded; same weights every call,
    so queries() and oracle_sql() agree)."""
    global _FIXTURE_CACHE
    if _FIXTURE_CACHE is not None:
        return _FIXTURE_CACHE
    import random
    rng = random.Random(20260816)
    windows: List[Tuple[List[str], str]] = []
    non_cue = [w for w in _TESTDATA_WORDS if w not in _NEGATION_CUES]
    # window lengths span the deployment range (up to cntx_left + 1 +
    # cntx_right) so the mean-pool margin survives dilution
    for _ in range(300):
        ln = rng.randrange(6, CNTX_LEFT + CNTX_RIGHT + 2)
        w = [rng.choice(non_cue) for _ in range(ln)]
        windows.append((w, "present"))
        w2 = [rng.choice(non_cue) for _ in range(ln - 1)]
        w2.insert(rng.randrange(len(w2) + 1), rng.choice(_NEGATION_CUES))
        windows.append((w2, "negated"))
    _FIXTURE_CACHE = train_meta_model(
        windows, ["present", "negated"], dim=64, epochs=1500, lr=4.0, seed=13)
    return _FIXTURE_CACHE


_SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("start", IntegerType()),
    StructField("cui", StringType()),
    StructField("meta_name", StringType()),
    StructField("value", StringType()),
    StructField("confidence", DoubleType()),
])

# per-executor model cache (same device as pipeline._MODEL_CACHE)
_META_CACHE: dict = {}


def _arrow_doc_rows(rb):
    """(doc_id, ents, text) tuples from one Arrow batch — the scorer
    input rows without a pandas DataFrame in between (struct fields
    arrive as plain dicts, null end as None)."""
    return zip(rb.column("doc_id").to_pylist(),
               rb.column("ents").to_pylist(),
               rb.column("text").to_pylist())


def _arrow_out_schema():
    from medcat_spark.pipeline import to_arrow_schema
    return to_arrow_schema(_SCHEMA)


def _score_batches(bc, meta_name: str):
    def fn(batches) -> Iterator:
        import pyarrow as pa
        arrow_schema = _arrow_out_schema()
        key = getattr(bc, "_path", None) or id(bc)
        model: MetaCatModel = _META_CACHE.get(key)
        if model is None:
            model = bc.value
            _META_CACHE.clear()
            _META_CACHE[key] = model
        scores = model.token_scores
        bias = model.bias
        labels = model.labels
        n_cls = len(labels)
        from bisect import bisect_right
        for rb in batches:
            out = {f.name: [] for f in _SCHEMA.fields}
            for doc_id, ents, text in _arrow_doc_rows(rb):
                toks = (text or "").split(" ")
                starts, tok_starts, pos = {}, [], 0
                for i, t in enumerate(toks):
                    starts[pos] = i
                    tok_starts.append(pos)
                    pos += len(t) + 1
                # prefix sums over per-token class scores: each entity's
                # window mean is one slice difference — O(T + E) per doc
                # instead of O(E * window).  Exact-0.0 rows for OOV
                # tokens keep float sums identical to the direct loop.
                P = np.zeros((len(toks) + 1, n_cls))
                for i, t in enumerate(toks):
                    s = scores.get(t)
                    if s is not None:
                        P[i + 1] = s
                np.cumsum(P, axis=0, out=P)
                for ent in ents:
                    center = starts.get(ent["start"])
                    if center is None:
                        continue
                    # window = [first_ent_token - cntx_left,
                    #           last_ent_token + cntx_right] (reference
                    # meta_cat.py prepare_document) — multi-token entities
                    # keep their full right context.  Last entity token =
                    # the token containing end-1 (unigram when end absent).
                    end = ent.get("end")
                    if end is None or end != end:   # null / NaN → unigram
                        last = center
                    else:
                        last = max(center,
                                   bisect_right(tok_starts, int(end) - 1) - 1)
                    lo = max(0, center - model.cntx_left)
                    hi = min(len(toks), last + 1 + model.cntx_right)
                    lg = (P[hi] - P[lo]) / (hi - lo) + bias
                    i_best = int(np.argmax(lg))
                    e = np.exp(lg - lg.max())
                    out["doc_id"].append(str(doc_id))
                    out["start"].append(int(ent["start"]))
                    out["cui"].append(ent["cui"])
                    out["meta_name"].append(meta_name)
                    out["value"].append(labels[i_best])
                    out["confidence"].append(
                        round(float(e[i_best] / e.sum()), 4))
            if out["doc_id"]:
                yield pa.RecordBatch.from_pydict(out, schema=arrow_schema)
    return fn


def meta_annotations_model(ann: DataFrame, docs: DataFrame, bc,
                           meta_name: str = "Negation",
                           text_col: str = "text") -> DataFrame:
    """Classify each annotation's token window with the broadcast
    MetaCatModel → (doc_id, start, cui, meta_name, value, confidence).

    Plan shape: annotations grouped per doc (ONE shuffle bounded by
    annotation count), broadcast-style text join, one Arrow batch pass
    tokenizing each doc once for all its entities — the same
    GPU-stage-separation the reference uses for MetaCAT batching
    (cat.py:1249-1257).
    """
    joined = docs_with_ents(ann, docs, text_col)
    return joined.mapInArrow(_score_batches(bc, meta_name), schema=_SCHEMA)


def docs_with_ents(ann, docs, text_col: str = "text",
                   num_partitions: Optional[int] = None):
    """(doc_id, ents, text) scoring input shared by every neural scorer
    (meta linear/MLP/LSTM/BERT, RelCAT linear/RNN/BERT).

    The explicit repartition is load-bearing: the join output is tiny
    in BYTES (KBs per doc) but heavy in downstream COMPUTE (a model
    forward per entity/pair), and AQE coalesces post-shuffle partitions
    by byte size — at bench scale it folded the whole relation-scoring
    stage into ONE task (measured: the 4-layer BERT pair bench ran 31
    minutes single-core before this fix).  Spark cannot see Python-UDF
    cost, so the stage is partitioned explicitly by doc_id; AQE does
    not re-coalesce a user-specified partition count.  At 100 TB the
    same holds: partition count must track document count, not the few
    bytes of (doc_id, spans) metadata."""
    end_col = (F.col("end").cast("int") if "end" in ann.columns
               else F.lit(None).cast("int")).alias("end")
    ents = (ann.select(F.col("doc_id").cast("string").alias("doc_id"),
                       F.col("start"), end_col, F.col("cui"))
            .groupBy("doc_id")
            .agg(F.collect_list(F.struct("start", "end", "cui"))
                 .alias("ents")))
    src = docs.select(F.col("doc_id").cast("string").alias("doc_id"),
                      F.col(text_col).alias("text"))
    joined = ents.join(src, "doc_id")
    if num_partitions is None:
        num_partitions = int(ann.sparkSession.conf.get(
            "spark.sql.shuffle.partitions"))
    # Repartition on xxhash64(doc_id), NOT doc_id: the join output is
    # already hash-partitioned by doc_id (the groupBy exchange), so a
    # repartition(n, doc_id) is planned as a no-op (EnsureRequirements
    # removes the redundant exchange) and AQE then coalesces the
    # groupBy's own exchange by BYTE size — measured at bench scale the
    # whole model-forward stage collapsed to ONE task (1.9-2.0 s
    # single-core out of each scorer's 2.4 s).  Hashing the key makes
    # the exchange semantically distinct (so it survives planning) and
    # user-specified (so AQE leaves its partition count alone), which
    # is the documented intent: partition count must track document
    # count, not the few bytes of (doc_id, spans) metadata.
    return joined.repartition(num_partitions, F.xxhash64("doc_id"))


def meta_annotations_multi(ann: DataFrame, docs: DataFrame,
                           models: list, text_col: str = "text") -> DataFrame:
    """Run SEVERAL meta-annotation models (the reference pipelines a
    list of MetaCATs — Status, Negation, Experiencer ... — cat.py:
    meta_cats loop) → unioned (doc_id, start, cui, meta_name, value,
    confidence) rows, groupable into the meta_anns map by
    pipeline.project_output(meta=...).

    ``models`` = [(meta_name, broadcast(MetaCatModel))].
    """
    out = None
    for meta_name, bc in models:
        cur = meta_annotations_model(ann, docs, bc, meta_name=meta_name,
                                     text_col=text_col)
        out = cur if out is None else out.unionByName(cur)
    return out


# ---------------------------------------------------------------------------
# Nonlinear (MLP) scorer — torch-readiness proof for the neural plumbing.
#
# The linear analogue collapses to per-token scalars, so it never exercises
# what a torch MetaCAT actually needs from the Spark side: weight TENSORS
# broadcast to executors, per-batch padding to a rectangular (B, L_max)
# shape, masked mean-pooling, and a real forward pass over the batch.  This
# model is a 1-hidden-layer MLP over mean-pooled token embeddings:
#
#     x = mean(E[tok] for tok in window)      (OOV -> 0, divide by len)
#     h = relu(W1 @ x + b1);  logits = W2 @ h + b2
#
# trained with numpy SGD on a cue-XOR task a linear head cannot fit
# (negated iff EXACTLY ONE of the cue words is present).  Swapping in a
# torch module changes only the forward() call — batch assembly, padding,
# masking, broadcast and Arrow batching are identical (reference batch
# shapes: meta_cat.py:636-651 pipe / prepare_document padding).
#
# Because the net is tiny and piecewise-linear, the forward pass is ALSO
# exactly expressible in SQL (sum/relu/sum joins over weight tables), so
# the driver's DuckDB oracle hash-verifies the whole nonlinear path.
# ---------------------------------------------------------------------------


class MlpMetaModel:
    """Broadcastable nonlinear model: embedding matrix + MLP weights."""

    def __init__(self, labels: List[str], vocab: List[str], E: np.ndarray,
                 W1: np.ndarray, b1: np.ndarray, W2: np.ndarray,
                 b2: np.ndarray, cntx_left: int = CNTX_LEFT,
                 cntx_right: int = CNTX_RIGHT) -> None:
        self.labels = labels
        self.vocab = vocab
        self.tok2i = {t: i for i, t in enumerate(vocab)}
        self.E = E          # (V, D)
        self.W1 = W1        # (H, D)
        self.b1 = b1        # (H,)
        self.W2 = W2        # (C, H)
        self.b2 = b2        # (C,)
        self.cntx_left = cntx_left
        self.cntx_right = cntx_right

    def forward(self, X: np.ndarray) -> np.ndarray:
        """(B, D) mean-pooled inputs → (B, C) logits."""
        H = np.maximum(0.0, X @ self.W1.T + self.b1)
        return H @ self.W2.T + self.b2

    def pool(self, windows: Sequence[Sequence[str]]) -> np.ndarray:
        """Pad a ragged batch of token windows to (B, L_max), gather
        embeddings with a mask, and masked-mean-pool to (B, D) — the
        exact tensor dance a torch scorer needs.  OOV tokens contribute
        a zero vector but still count toward the mean divisor (same
        convention as the linear model / SQL oracle)."""
        B = len(windows)
        L = max((len(w) for w in windows), default=1) or 1
        idx = np.zeros((B, L), dtype=np.int64)          # 0 = pad slot
        emb_mask = np.zeros((B, L, 1))                  # in-vocab tokens
        lens = np.ones(B)
        for r, w in enumerate(windows):
            lens[r] = max(len(w), 1)
            for c, t in enumerate(w):
                i = self.tok2i.get(t)
                if i is not None:
                    idx[r, c] = i
                    emb_mask[r, c, 0] = 1.0
        G = self.E[idx] * emb_mask                      # (B, L, D)
        return G.sum(axis=1) / lens[:, None]

    # Bound on windows per forward pass.  The (B, L, D) gather is the
    # peak allocation; chunking keeps it ~50 MB so executor arenas are
    # reused instead of freshly page-faulted (first-touch faults on
    # large fresh mmaps cost ~100x on some virtualized kernels), and it
    # is exactly the batch_size_eval knob a torch scorer needs
    # (reference meta_cat.py config general.batch_size_eval).
    MAX_FORWARD_BATCH = 8192

    def predict_batch(self, windows: Sequence[Sequence[str]]):
        out: List[Tuple[str, float]] = []
        for ofs in range(0, len(windows), self.MAX_FORWARD_BATCH):
            chunk = windows[ofs:ofs + self.MAX_FORWARD_BATCH]
            lg = self.forward(self.pool(chunk))
            best = lg.argmax(axis=1)
            e = np.exp(lg - lg.max(axis=1, keepdims=True))
            conf = e[np.arange(len(lg)), best] / e.sum(axis=1)
            out.extend((self.labels[i], round(float(c), 4))
                       for i, c in zip(best, conf))
        return out

    def predict(self, window: Sequence[str]) -> Tuple[str, float]:
        return self.predict_batch([window])[0]


def train_mlp_meta_model(windows: List[Tuple[List[str], str]],
                         labels: List[str], dim: int = 16, hidden: int = 8,
                         epochs: int = 2000, lr: float = 1.0,
                         seed: int = 17, cntx_left: int = CNTX_LEFT,
                         cntx_right: int = CNTX_RIGHT) -> MlpMetaModel:
    """Full-batch numpy SGD on softmax cross-entropy through the ReLU
    hidden layer.  Weights are rounded to 4 decimals at export so the
    Spark scorer and the SQL oracle share bit-identical constants."""
    from medcat_spark.fixtures import det_vec

    vocab = sorted({t for w, _ in windows for t in w})
    E = np.stack([det_vec(t, dim) for t in vocab])
    tok2i = {t: i for i, t in enumerate(vocab)}
    lab2i = {l: i for i, l in enumerate(labels)}

    X = np.zeros((len(windows), dim))
    y = np.zeros(len(windows), dtype=int)
    for r, (w, lab) in enumerate(windows):
        vecs = [E[tok2i[t]] for t in w if t in tok2i]
        if vecs:
            X[r] = np.sum(vecs, axis=0) / len(w)
        y[r] = lab2i[lab]

    rng = np.random.RandomState(seed)
    W1 = rng.normal(0, 0.5, (hidden, dim))
    b1 = np.zeros(hidden)
    W2 = rng.normal(0, 0.5, (len(labels), hidden))
    b2 = np.zeros(len(labels))
    onehot = np.eye(len(labels))[y]
    for _ in range(epochs):
        Z = X @ W1.T + b1
        H = np.maximum(0.0, Z)
        lg = H @ W2.T + b2
        lg -= lg.max(axis=1, keepdims=True)
        p = np.exp(lg)
        p /= p.sum(axis=1, keepdims=True)
        g = (p - onehot) / len(windows)            # (B, C)
        gH = g @ W2                                 # (B, H)
        gZ = gH * (Z > 0)
        W2 -= lr * (g.T @ H)
        b2 -= lr * g.sum(axis=0)
        W1 -= lr * (gZ.T @ X)
        b1 -= lr * gZ.sum(axis=0)

    return MlpMetaModel(labels, vocab, np.round(E, 4), np.round(W1, 4),
                        np.round(b1, 4), np.round(W2, 4), np.round(b2, 4),
                        cntx_left, cntx_right)


_MLP_FIXTURE_CACHE: Optional[MlpMetaModel] = None


def negation_mlp_fixture_model() -> MlpMetaModel:
    """Deterministic fixture-trained NONLINEAR Negation classifier over
    the testdata vocabulary: negated iff EXACTLY ONE cue word ('slow'
    xor 'small') is in the window — not linearly separable in the
    mean-pooled bag-of-words space, so solving it proves the hidden
    layer is live (tests assert the accuracy)."""
    global _MLP_FIXTURE_CACHE
    if _MLP_FIXTURE_CACHE is not None:
        return _MLP_FIXTURE_CACHE
    import random
    rng = random.Random(20260817)
    non_cue = [w for w in _TESTDATA_WORDS if w not in _NEGATION_CUES]
    windows: List[Tuple[List[str], str]] = []
    for _ in range(400):
        ln = rng.randrange(4, 12)
        base = [rng.choice(non_cue) for _ in range(ln)]
        windows.append((list(base), "present"))            # zero cues
        w1 = list(base)
        w1[rng.randrange(ln)] = rng.choice(_NEGATION_CUES)
        windows.append((w1, "negated"))                    # exactly one
        w2 = list(base)
        pos = rng.sample(range(ln), 2) if ln >= 2 else [0, 0]
        w2[pos[0]] = "slow"
        w2[pos[1]] = "small"
        windows.append((w2, "present"))                    # both cues
    _MLP_FIXTURE_CACHE = train_mlp_meta_model(
        windows, ["present", "negated"], dim=32, hidden=16,
        epochs=2500, lr=2.0, seed=17)
    return _MLP_FIXTURE_CACHE


_MLP_CACHE: dict = {}


def _score_batches_mlp(bc, meta_name: str):
    def fn(batches) -> Iterator:
        import pyarrow as pa
        arrow_schema = _arrow_out_schema()
        from bisect import bisect_right
        key = getattr(bc, "_path", None) or id(bc)
        model: MlpMetaModel = _MLP_CACHE.get(key)
        if model is None:
            model = bc.value
            _MLP_CACHE.clear()
            _MLP_CACHE[key] = model
        for rb in batches:
            out = {f.name: [] for f in _SCHEMA.fields}
            windows: List[List[str]] = []
            for doc_id, ents, text in _arrow_doc_rows(rb):
                toks = (text or "").split(" ")
                starts, tok_starts, pos = {}, [], 0
                for i, t in enumerate(toks):
                    starts[pos] = i
                    tok_starts.append(pos)
                    pos += len(t) + 1
                for ent in ents:
                    center = starts.get(ent["start"])
                    if center is None:
                        continue
                    end = ent.get("end")
                    if end is None or end != end:
                        last = center
                    else:
                        last = max(center,
                                   bisect_right(tok_starts, int(end) - 1) - 1)
                    lo = max(0, center - model.cntx_left)
                    hi = min(len(toks), last + 1 + model.cntx_right)
                    windows.append(toks[lo:hi])
                    out["doc_id"].append(str(doc_id))
                    out["start"].append(int(ent["start"]))
                    out["cui"].append(ent["cui"])
                    out["meta_name"].append(meta_name)
            if out["doc_id"]:
                # ONE padded forward pass for the whole Arrow batch —
                # the shape a torch scorer consumes unchanged
                preds = model.predict_batch(windows)
                out["value"] = [v for v, _ in preds]
                out["confidence"] = [c for _, c in preds]
                yield pa.RecordBatch.from_pydict(out, schema=arrow_schema)
    return fn


def meta_annotations_mlp(ann: DataFrame, docs: DataFrame, bc,
                         meta_name: str = "Negation",
                         text_col: str = "text") -> DataFrame:
    """meta_annotations_model with the nonlinear scorer — identical plan
    shape (one groupBy + text join + one mapInPandas), different model."""
    joined = docs_with_ents(ann, docs, text_col)
    return joined.mapInArrow(_score_batches_mlp(bc, meta_name),
                             schema=_SCHEMA)


def oracle_sql_for_model(model: MetaCatModel, toks_cte: str, dict_sql: str,
                         meta_name: str = "Negation",
                         bi_dict_sql: Optional[str] = None) -> str:
    """Generate the DuckDB oracle reproducing the scorer exactly:
    same window ([first_ent_token - cntx_left, last_ent_token +
    cntx_right]), same per-token scores, same mean+bias+argmax.
    ``bi_dict_sql`` optionally adds two-token entities (d(w1, w2, cui))
    so the multi-token right-edge semantics are oracle-exercised."""
    rows = ",".join(
        "('%s',%s)" % (t.replace("'", "''"),
                       ",".join(repr(float(x)) for x in s))
        for t, s in sorted(model.token_scores.items()))
    cols = ",".join(f"s{i}" for i in range(len(model.labels)))
    avg = ",".join(
        f"SUM(COALESCE(s.s{i}, 0.0))/COUNT(*) + ({float(model.bias[i])!r}) "
        f"AS l{i}" for i in range(len(model.labels)))
    # argmax with first-wins tie-break = numpy argmax: class i wins iff
    # it strictly beats all earlier classes' "wins" — i.e. no earlier
    # class has l_earlier >= l_i and no later class has l_later > l_i
    n = len(model.labels)

    def _win_cond(i: int) -> str:
        conds = [f"l{i} > l{j}" for j in range(i)] + \
                [f"l{i} >= l{j}" for j in range(i + 1, n)]
        return " AND ".join(conds) if conds else "TRUE"

    best = "CASE " + " ".join(
        f"WHEN {_win_cond(i)} THEN '{model.labels[i]}'"
        for i in range(n)) + " END"
    best_logit = "CASE " + " ".join(
        f"WHEN {_win_cond(i)} THEN l{i}" for i in range(n)) + " END"
    # softmax confidence of the argmax class
    exps = "+".join(f"exp(l{j} - m)" for j in range(n))
    bi_union = "" if bi_dict_sql is None else f"""
      UNION ALL
      SELECT p.doc_id, p.start, p.pos, p.pos + 1, d.cui
      FROM pos p JOIN {bi_dict_sql} ON p.tok = d.w1 AND p.nxt = d.w2"""
    return f"""
WITH {toks_cte},
pos AS (
  SELECT doc_id, tok, nxt, pos,
         COALESCE(SUM(length(tok) + 1) OVER (
             PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
  FROM tokn),
m AS (SELECT p.doc_id, p.start, p.pos AS ent_pos, p.pos AS ent_last, d.cui
      FROM pos p JOIN {dict_sql} ON p.tok = d.name{bi_union}),
sc(tok, {cols}) AS (VALUES {rows}),
w AS (SELECT m.doc_id, m.start, m.cui, p.tok
      FROM m JOIN pos p ON p.doc_id = m.doc_id
        AND p.pos >= m.ent_pos - {model.cntx_left}
        AND p.pos <= m.ent_last + {model.cntx_right}),
agg AS (SELECT doc_id, start, cui, {avg}
        FROM w LEFT JOIN sc s USING (tok) GROUP BY 1, 2, 3),
lg AS (SELECT *, GREATEST({", ".join(f"l{i}" for i in range(len(model.labels)))}) AS m
       FROM agg)
SELECT doc_id, CAST(start AS INT) AS start, cui,
       '{meta_name}' AS meta_name,
       {best} AS value,
       ROUND(exp(({best_logit}) - m) / ({exps}), 4) AS confidence
FROM lg
"""


def oracle_sql_for_mlp(model: MlpMetaModel, toks_cte: str, dict_sql: str,
                       meta_name: str = "Negation",
                       bi_dict_sql: Optional[str] = None) -> str:
    """DuckDB oracle for the NONLINEAR scorer: the same windows, then the
    MLP forward pass in SQL — mean-pool join over the embedding table,
    relu'd hidden sums over W1/b1, output sums over W2/b2, argmax +
    softmax.  Hash-verifies the full nonlinear path end-to-end."""
    n = len(model.labels)
    emb_rows = ",".join(
        f"('{t}',{d + 1},{float(v)!r})"
        for t, i in sorted(model.tok2i.items())
        for d, v in enumerate(model.E[i]))
    w1_rows = ",".join(
        f"({j + 1},{d + 1},{float(model.W1[j, d])!r})"
        for j in range(model.W1.shape[0]) for d in range(model.W1.shape[1]))
    b1_rows = ",".join(f"({j + 1},{float(model.b1[j])!r})"
                       for j in range(len(model.b1)))
    w2_rows = ",".join(
        f"({c + 1},{j + 1},{float(model.W2[c, j])!r})"
        for c in range(n) for j in range(model.W2.shape[1]))
    b2_rows = ",".join(f"({c + 1},{float(model.b2[c])!r})"
                       for c in range(n))
    dims = ",".join(f"({d + 1})" for d in range(model.E.shape[1]))

    def _win_cond(i: int) -> str:
        conds = [f"l{i} > l{j}" for j in range(i)] + \
                [f"l{i} >= l{j}" for j in range(i + 1, n)]
        return " AND ".join(conds) if conds else "TRUE"

    best = "CASE " + " ".join(
        f"WHEN {_win_cond(i)} THEN '{model.labels[i]}'"
        for i in range(n)) + " END"
    best_logit = "CASE " + " ".join(
        f"WHEN {_win_cond(i)} THEN l{i}" for i in range(n)) + " END"
    exps = "+".join(f"exp(l{j} - mx)" for j in range(n))
    lcols = ",".join(
        f"MAX(CASE WHEN c = {i + 1} THEN l END) AS l{i}" for i in range(n))
    bi_union = "" if bi_dict_sql is None else f"""
      UNION ALL
      SELECT p.doc_id, p.start, p.pos, p.pos + 1, d.cui
      FROM pos p JOIN {bi_dict_sql} ON p.tok = d.w1 AND p.nxt = d.w2"""
    return f"""
WITH {toks_cte},
pos AS (
  SELECT doc_id, tok, nxt, pos,
         COALESCE(SUM(length(tok) + 1) OVER (
             PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
  FROM tokn),
m AS (SELECT p.doc_id, p.start, p.pos AS ent_pos, p.pos AS ent_last, d.cui
      FROM pos p JOIN {dict_sql} ON p.tok = d.name{bi_union}),
w AS (SELECT m.doc_id, m.start, m.cui, p.tok
      FROM m JOIN pos p ON p.doc_id = m.doc_id
        AND p.pos >= m.ent_pos - {model.cntx_left}
        AND p.pos <= m.ent_last + {model.cntx_right}),
emb AS (SELECT tok, dim, CAST(val AS DOUBLE) AS val
        FROM (VALUES {emb_rows}) t(tok, dim, val)),
w1 AS (SELECT j, dim, CAST(val AS DOUBLE) AS val
       FROM (VALUES {w1_rows}) t(j, dim, val)),
b1 AS (SELECT j, CAST(val AS DOUBLE) AS val
       FROM (VALUES {b1_rows}) t(j, val)),
w2 AS (SELECT c, j, CAST(val AS DOUBLE) AS val
       FROM (VALUES {w2_rows}) t(c, j, val)),
b2 AS (SELECT c, CAST(val AS DOUBLE) AS val
       FROM (VALUES {b2_rows}) t(c, val)),
dims(dim) AS (VALUES {dims}),
nw AS (SELECT doc_id, start, cui, COUNT(*) AS ntok
       FROM w GROUP BY 1, 2, 3),
xs AS (SELECT wi.doc_id, wi.start, wi.cui, e.dim, SUM(e.val) AS s
       FROM w wi JOIN emb e ON e.tok = wi.tok GROUP BY 1, 2, 3, 4),
x AS (SELECT n.doc_id, n.start, n.cui, d.dim,
             COALESCE(xs.s, 0.0) / n.ntok AS x
      FROM nw n CROSS JOIN dims d
      LEFT JOIN xs ON xs.doc_id = n.doc_id AND xs.start = n.start
                  AND xs.cui = n.cui AND xs.dim = d.dim),
h AS (SELECT x.doc_id, x.start, x.cui, w1.j,
             GREATEST(0.0, SUM(w1.val * x.x) + ANY_VALUE(b1.val)) AS h
      FROM x JOIN w1 ON w1.dim = x.dim JOIN b1 ON b1.j = w1.j
      GROUP BY 1, 2, 3, 4),
lgc AS (SELECT h.doc_id, h.start, h.cui, w2.c,
               SUM(w2.val * h.h) + ANY_VALUE(b2.val) AS l
        FROM h JOIN w2 ON w2.j = h.j JOIN b2 ON b2.c = w2.c
        GROUP BY 1, 2, 3, 4),
piv AS (SELECT doc_id, start, cui, {lcols} FROM lgc GROUP BY 1, 2, 3),
lg AS (SELECT *, GREATEST({", ".join(f"l{i}" for i in range(n))}) AS mx
       FROM piv)
SELECT doc_id, CAST(start AS INT) AS start, cui,
       '{meta_name}' AS meta_name,
       {best} AS value,
       ROUND(exp(({best_logit}) - mx) / ({exps}), 4) AS confidence
FROM lg
"""


# ---------------------------------------------------------------------------
# STATEFUL sequence scorer — the BiLSTM-shape proof the MLP cannot give.
#
# A bidirectional Elman RNN in pure numpy behind the same broadcast +
# mapInPandas plumbing: per-timestep tanh recurrence, forward+backward
# final states -> linear head.  Padded positions CARRY state (the
# packed-sequence semantics a torch BiLSTM uses), so ragged batches
# score identically to per-window calls — asserted in tests.
#
# Trained with full-batch BPTT on an ORDER task (label = does the
# negation cue precede the entity marker) built from order-swapped
# pairs with IDENTICAL token multisets — any order-blind pooled model
# (the linear scorer, the MLP) is provably at chance on it, so the
# accuracy gap demonstrates true sequence statefulness end to end.
# ---------------------------------------------------------------------------


class RnnMetaModel:
    """Broadcastable stateful model: embeddings + 2 RNN cells + head."""

    MAX_FORWARD_BATCH = 8192

    def __init__(self, labels: List[str], vocab: List[str], E: np.ndarray,
                 fwd: Tuple[np.ndarray, np.ndarray, np.ndarray],
                 bwd: Tuple[np.ndarray, np.ndarray, np.ndarray],
                 Wo: np.ndarray, bo: np.ndarray,
                 cntx_left: int = CNTX_LEFT,
                 cntx_right: int = CNTX_RIGHT) -> None:
        self.labels = labels
        self.vocab = vocab
        self.tok2i = {t: i for i, t in enumerate(vocab)}
        self.E = E                      # (V, D); row 0 reserved (pad/OOV)
        self.fwd = fwd                  # (Wx (H,D), Wh (H,H), bh (H,))
        self.bwd = bwd
        self.Wo = Wo                    # (C, 2H)
        self.bo = bo                    # (C,)
        self.cntx_left = cntx_left
        self.cntx_right = cntx_right

    def embed(self, windows: Sequence[Sequence[str]]):
        B = len(windows)
        L = max((len(w) for w in windows), default=1) or 1
        idx = np.zeros((B, L), dtype=np.int64)
        mask = np.zeros((B, L))
        for r, w in enumerate(windows):
            for c, t in enumerate(w):
                idx[r, c] = self.tok2i.get(t, 0)
                mask[r, c] = 1.0        # in-window position (OOV -> E[0])
        return self.E[idx], mask        # (B, L, D), (B, L)

    @staticmethod
    def _run_cell(cell, X, mask, reverse: bool):
        Wx, Wh, bh = cell
        B, L, _ = X.shape
        h = np.zeros((B, Wh.shape[0]))
        steps = range(L - 1, -1, -1) if reverse else range(L)
        for t in steps:
            m = mask[:, t:t + 1]
            h_new = np.tanh(X[:, t] @ Wx.T + h @ Wh.T + bh)
            h = m * h_new + (1.0 - m) * h   # pad carries state through
        return h                            # (B, H) final state

    def forward_windows(self, windows: Sequence[Sequence[str]]):
        X, mask = self.embed(windows)
        hf = self._run_cell(self.fwd, X, mask, reverse=False)
        hb = self._run_cell(self.bwd, X, mask, reverse=True)
        return np.concatenate([hf, hb], axis=1) @ self.Wo.T + self.bo

    def predict_batch(self, windows: Sequence[Sequence[str]]):
        out: List[Tuple[str, float]] = []
        for ofs in range(0, len(windows), self.MAX_FORWARD_BATCH):
            lg = self.forward_windows(windows[ofs:ofs + self.MAX_FORWARD_BATCH])
            best = lg.argmax(axis=1)
            e = np.exp(lg - lg.max(axis=1, keepdims=True))
            conf = e[np.arange(len(lg)), best] / e.sum(axis=1)
            out.extend((self.labels[i], round(float(c), 4))
                       for i, c in zip(best, conf))
        return out

    def predict(self, window: Sequence[str]) -> Tuple[str, float]:
        return self.predict_batch([window])[0]


def train_rnn_meta_model(seqs: List[Tuple[List[str], str]],
                         labels: List[str], dim: int = 12, hidden: int = 12,
                         epochs: int = 400, lr: float = 0.5,
                         seed: int = 23, cntx_left: int = CNTX_LEFT,
                         cntx_right: int = CNTX_RIGHT) -> RnnMetaModel:
    """Full-batch BPTT (fixed-length training sequences, softmax CE,
    gradient clip) through both directions; embeddings stay a fixed
    random codebook — the recurrence does the work.  Weights rounded to
    4 decimals at export like the other fixture models."""
    rng = np.random.RandomState(seed)
    vocab = ["<pad>"] + sorted({t for s, _ in seqs for t in s})
    tok2i = {t: i for i, t in enumerate(vocab)}
    V, C = len(vocab), len(labels)
    L = len(seqs[0][0])
    assert all(len(s) == L for s, _ in seqs), "training seqs fixed-length"
    E = rng.randn(V, dim) * 0.5
    E[0] = 0.0
    idx = np.array([[tok2i[t] for t in s] for s, _ in seqs])
    y = np.array([labels.index(lbl) for _, lbl in seqs])
    X = E[idx]                                           # (B, L, D)
    B = len(seqs)

    def init_cell():
        return [rng.randn(hidden, dim) * 0.3,
                np.eye(hidden) * 0.5 + rng.randn(hidden, hidden) * 0.1,
                np.zeros(hidden)]

    fwd, bwd = init_cell(), init_cell()
    Wo = rng.randn(C, 2 * hidden) * 0.3
    bo = np.zeros(C)

    def run(cell, reverse):
        Wx, Wh, bh = cell
        hs = [np.zeros((B, hidden))]
        steps = range(L - 1, -1, -1) if reverse else range(L)
        for t in steps:
            hs.append(np.tanh(X[:, t] @ Wx.T + hs[-1] @ Wh.T + bh))
        return hs, list(steps)

    for _ in range(epochs):
        hs_f, order_f = run(fwd, False)
        hs_b, order_b = run(bwd, True)
        hcat = np.concatenate([hs_f[-1], hs_b[-1]], axis=1)
        logits = hcat @ Wo.T + bo
        e = np.exp(logits - logits.max(axis=1, keepdims=True))
        p = e / e.sum(axis=1, keepdims=True)
        dlogits = p.copy()
        dlogits[np.arange(B), y] -= 1.0
        dlogits /= B
        dWo = dlogits.T @ hcat
        dbo = dlogits.sum(axis=0)
        dh_f = dlogits @ Wo[:, :hidden]
        dh_b = dlogits @ Wo[:, hidden:]

        def bptt(cell, hs, order, dh_last):
            Wx, Wh, bh = cell
            dWx = np.zeros_like(Wx)
            dWh = np.zeros_like(Wh)
            dbh = np.zeros_like(bh)
            dh = dh_last
            for i in range(len(order) - 1, -1, -1):
                t = order[i]
                h_t, h_prev = hs[i + 1], hs[i]
                da = dh * (1.0 - h_t ** 2)
                dWx += da.T @ X[:, t]
                dWh += da.T @ h_prev
                dbh += da.sum(axis=0)
                dh = da @ Wh
            return dWx, dWh, dbh

        grads_f = bptt(fwd, hs_f, order_f, dh_f)
        grads_b = bptt(bwd, hs_b, order_b, dh_b)
        for cell, grads in ((fwd, grads_f), (bwd, grads_b)):
            for j in range(3):
                g = np.clip(grads[j], -5.0, 5.0)
                cell[j] = cell[j] - lr * g
        Wo -= lr * np.clip(dWo, -5.0, 5.0)
        bo -= lr * np.clip(dbo, -5.0, 5.0)

    r4 = lambda a: np.round(a, 4)
    return RnnMetaModel(labels, vocab, r4(E),
                        tuple(r4(w) for w in fwd),
                        tuple(r4(w) for w in bwd), r4(Wo), r4(bo),
                        cntx_left, cntx_right)


_RNN_FIXTURE_CACHE: Optional[RnnMetaModel] = None


def order_task_sequences(n_pairs: int = 120, length: int = 8,
                         seed: int = 5):
    """Order-swapped pairs with IDENTICAL token multisets: 'neg' before
    'ent' -> negated, after -> present.  Any pooled (order-blind) model
    scores exactly 50% on this set; a stateful model can solve it."""
    import random
    rng = random.Random(seed)
    filler = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    pairs = []
    for _ in range(n_pairs):
        toks = [rng.choice(filler) for _ in range(length - 2)]
        i, j = sorted(rng.sample(range(length), 2))
        a = list(toks)
        a.insert(i, "neg")
        a.insert(j + 1, "ent") if j + 1 <= len(a) else a.append("ent")
        a = a[:length]
        if "ent" not in a or "neg" not in a:
            continue
        b = list(a)
        # swap the two marker positions -> same multiset, opposite order
        ia, ja = a.index("neg"), a.index("ent")
        b[ia], b[ja] = b[ja], b[ia]
        pairs.append((a, "negated" if ia < ja else "present"))
        pairs.append((b, "present" if ia < ja else "negated"))
    return pairs


def negation_rnn_fixture_model() -> RnnMetaModel:
    global _RNN_FIXTURE_CACHE
    if _RNN_FIXTURE_CACHE is None:
        _RNN_FIXTURE_CACHE = train_rnn_meta_model(
            order_task_sequences(), ["present", "negated"])
    return _RNN_FIXTURE_CACHE


def meta_annotations_rnn(ann: DataFrame, docs: DataFrame, bc,
                         meta_name: str = "Negation",
                         text_col: str = "text") -> DataFrame:
    """meta_annotations_mlp with the STATEFUL scorer — byte-identical
    plan shape; only the broadcast model differs (the torch-swap
    contract: plumbing fixed, forward pass swapped)."""
    return meta_annotations_mlp(ann, docs, bc, meta_name, text_col)
