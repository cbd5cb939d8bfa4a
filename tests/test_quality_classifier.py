"""GPT-3-style quality classifier (selection.quality_classifier_*) —
independent hand-rolled LR recompute."""

import hashlib
import math

import pytest


TEXTS = [(i, f"doc {i} body word{i % 5} word{(i + 1) % 5} filler text")
         for i in range(40)]


def _bucket(g, B=256):
    return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B


def _py_train_and_score(texts, B=256, iters=3, lr=0.5, pos=lambda i: i % 17 == 0):
    feats = {}   # doc -> {bucket: cnt}
    y = {}
    for did, t in texts:
        ws = t.split(" ")
        grams = ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        f = {}
        for g in grams:
            b = _bucket(g, B)
            f[b] = f.get(b, 0) + 1
        feats[did] = f
        y[did] = 1.0 if pos(did) else 0.0
    n = len(texts)
    w = {}
    for _ in range(iters):
        resid = {}
        for did, f in feats.items():
            logit = sum(c * w.get(b, 0.0) for b, c in f.items())
            resid[did] = y[did] - 1.0 / (1.0 + math.exp(-logit))
        g = {}
        for did, f in feats.items():
            for b, c in f.items():
                g[b] = g.get(b, 0.0) + c * resid[did]
        for b, gv in g.items():
            w[b] = w.get(b, 0.0) + lr * gv / n
    return {did: round(sum(c * w.get(b, 0.0) for b, c in f.items()), 6)
            for did, f in feats.items()}


def test_classifier_matches_reference_lr(spark):
    from pyspark.sql import functions as F
    from medcat_spark.functions.selection import quality_classifier_scores
    docs = spark.createDataFrame(TEXTS, "doc_id long, text string")
    out = {r["doc_id"]: r for r in quality_classifier_scores(
        docs, docs.where(F.col("doc_id") % 17 == 0)).collect()}
    want = _py_train_and_score(TEXTS)
    assert out.keys() == want.keys()
    for k in want:
        assert out[k]["clf_score"] == pytest.approx(want[k], abs=2e-6)
        assert out[k]["clf_pass"] == (1 if want[k] > 0 else 0)
    # the classifier separates: positives score above the corpus median
    scores = sorted(want.values())
    med = scores[len(scores) // 2]
    for did in (0, 17, 34):
        assert want[did] > med
