"""LM perplexity filter, decontamination, and sequence packing
(functions/lm.py) — independently recomputed in plain Python."""

import math

import pytest
from pyspark.sql import functions as F

from medcat_spark.functions import lm


TEXTS = [
    (0, "the cat sat on the mat"),
    (1, "the cat ran"),
    (2, "dogs bark loudly at night"),
    (3, "the mat sat"),
    (4, "zebra quux xylophone"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(TEXTS, "doc_id long, text string")


def _py_scores(texts, backoff=0.4):
    """Reference stupid-backoff implementation, independent shape
    (dict counters, per-token loop)."""
    uni, big = {}, {}
    n_total = 0
    for _, t in texts:
        ws = t.split(" ")
        n_total += len(ws)
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    out = {}
    for did, t in texts:
        ws = t.split(" ")
        logs = []
        for i, w in enumerate(ws):
            if i == 0:
                s = uni[w] / n_total
            elif (ws[i - 1], w) in big:
                s = big[(ws[i - 1], w)] / uni[ws[i - 1]]
            else:
                s = backoff * uni[w] / n_total
            logs.append(math.log(s))
        out[did] = (len(ws), round(sum(logs) / len(logs), 6))
    return out


def test_lm_doc_scores_match_reference(spark, corpus):
    got = {r["doc_id"]: (r["n_scored"], r["avg_logprob"])
           for r in lm.lm_doc_scores(corpus).collect()}
    want = _py_scores(TEXTS)
    assert got.keys() == want.keys()
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(want[k][1], abs=1e-6)


def test_lm_gate_threshold(spark, corpus):
    rows = {r["doc_id"]: r["lm_pass"]
            for r in lm.lm_gate(corpus, threshold=-3.0).collect()}
    want = _py_scores(TEXTS)
    for k, (_, lp) in want.items():
        assert rows[k] == (1 if lp > -3.0 else 0)
    # docs 1 and 4 tie exactly at the corpus minimum:
    # log(4/20) + 2*log(1/2) == log(1/20) + 2*log(1) == log(0.05)
    scores = {k: lp for k, (_, lp) in want.items()}
    lo = min(scores.values())
    assert scores[1] == lo and scores[4] == lo


def test_lm_backoff_and_oov_on_held_out_doc(spark, corpus):
    # score a held-out doc under the LM trained on `corpus`:
    # "night the"  -> unseen bigram -> backoff branch
    # "gronk"      -> OOV word      -> oov_score
    held = spark.createDataFrame([(9, "night the gronk")],
                                 "doc_id long, text string")
    model = lm.lm_train(corpus)
    row = lm.lm_doc_scores(held, lm=model).collect()[0]
    uni, n = {}, 0
    for _, t in TEXTS:
        for w in t.split(" "):
            uni[w] = uni.get(w, 0) + 1
            n += 1
    want = (math.log(uni["night"] / n)           # first token: unigram
            + math.log(0.4 * uni["the"] / n)     # unseen bigram: backoff
            + math.log(1e-9)) / 3                # OOV
    assert row["n_scored"] == 3
    assert row["avg_logprob"] == pytest.approx(round(want, 6), abs=1e-6)


def test_decontaminate(spark, corpus):
    bench = spark.createDataFrame(
        [(100, "the cat sat down"), (101, "dogs bark loudly sometimes")],
        "doc_id long, text string")
    out = {r["doc_id"]: (r["n_hits"], r["contaminated"])
           for r in lm.decontaminate(corpus, bench, n=3).collect()}
    # doc 0 shares "the cat sat"; doc 2 shares "dogs bark loudly"
    assert out[0] == (1, 1)
    assert out[2] == (1, 1)
    for clean in (1, 3, 4):
        assert out[clean] == (0, 0)


def test_pack_sequences_partition_invariance(spark, corpus):
    # token counts: 6,3,5,3,3  -> starts 0,6,9,14,17 ; ctx=4
    out = lm.pack_sequences(corpus, ctx_len=4).collect()
    rows = sorted((r["chunk_id"], r["doc_id"], r["tok_start"], r["n_tokens"])
                  for r in out)
    # independently derived layout
    want = []
    start = 0
    for did, t in TEXTS:
        n = len(t.split(" "))
        for c in range(start // 4, (start + n - 1) // 4 + 1):
            s = max(start, c * 4)
            e = min(start + n, (c + 1) * 4)
            want.append((c, did, s - c * 4, e - s))
        start += n
    assert rows == sorted(want)
    # every chunk except the last is exactly full
    per_chunk = {}
    for c, _, _, n in rows:
        per_chunk[c] = per_chunk.get(c, 0) + n
    last = max(per_chunk)
    assert all(v == 4 for c, v in per_chunk.items() if c != last)
    # bucket width smaller than the table -> same answer (prefix-sum
    # two-pass correctness across bucket boundaries)
    out2 = lm.pack_sequences(corpus.repartition(5), ctx_len=4,
                             bucket_width=2).collect()
    rows2 = sorted((r["chunk_id"], r["doc_id"], r["tok_start"],
                    r["n_tokens"]) for r in out2)
    assert rows2 == rows


def test_lm_plan_has_no_python(spark, corpus):
    plan = lm.lm_doc_scores(corpus)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEvalPython" not in plan
    plan2 = lm.pack_sequences(corpus, 4)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan2


def test_temperature_mix(spark):
    import hashlib
    from medcat_spark.functions.selection import temperature_mix
    rows = [(i, "big" if i < 80 else "small") for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = {r["doc_id"]: r for r in
           temperature_mix(docs, alpha=0.5, target_frac=0.5).collect()}
    # independent math: p=(0.8,0.2) -> q = sqrt(p)/Z; r_s = 50*q_s/n_s
    import math
    wb, ws = math.sqrt(0.8), math.sqrt(0.2)
    qb, qs = wb / (wb + ws), ws / (wb + ws)
    rb, rs = min(1.0, 50 * qb / 80), min(1.0, 50 * qs / 20)
    assert out[0]["rate"] == pytest.approx(round(rb, 6), abs=1e-6)
    assert out[99]["rate"] == pytest.approx(round(rs, 6), abs=1e-6)
    # temperature flattens: the small domain is upsampled relative to
    # the big one
    assert rs > rb
    # keep decision is the deterministic hash gate
    for i, r in out.items():
        u = (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
             % 1_000_000) / 1_000_000.0
        rate = rb if i < 80 else rs
        assert r["kept"] == (1 if u < rate else 0)
