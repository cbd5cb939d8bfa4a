"""In-engine SGNS Word2Vec (word2vec.py): objective sanity (topic
structure emerges), loss decrease, determinism, single-partition golden
equality vs the sequential kernel, and vocab plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from medcat_spark.word2vec import (build_w2v_vocab, make_neg_table,
                                   seeded_init, sgns_train_partition,
                                   train_word2vec_sgns)


@pytest.fixture(scope="module")
def topic_docs(spark):
    # two disjoint topics; within-topic words always co-occur
    med = "heart attack cardiac arrest stroke clot"
    cook = "flour sugar butter oven bake dough"
    rows = ([(f"m{i}", med) for i in range(30)]
            + [(f"c{i}", cook) for i in range(30)])
    return spark.createDataFrame(rows, "doc_id string, text string")


def _cos(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_vocab_build_orders_and_filters(spark):
    docs = spark.createDataFrame(
        [("1", "a a a b b rare"), ("2", "b a")],
        "doc_id string, text string")
    words, counts = build_w2v_vocab(docs, min_count=2)
    assert words == ["a", "b"] and list(counts) == [4, 3]


def test_seeded_init_is_partition_independent():
    W1 = seeded_init(["x", "y"], 16)
    W2 = seeded_init(["y", "x"], 16)
    assert np.allclose(W1[0], W2[1]) and np.allclose(W1[1], W2[0])
    assert np.abs(W1).max() <= 0.5 / 16 + 1e-12


def test_neg_table_is_three_quarter_power():
    cum = make_neg_table(np.array([8.0, 1.0]))
    p0 = 8 ** 0.75 / (8 ** 0.75 + 1.0)
    assert np.isclose(cum[0], p0) and np.isclose(cum[1], 1.0)


def test_topic_structure_emerges(topic_docs, spark):
    out = {r["word"]: r["vec"] for r in train_word2vec_sgns(
        spark, topic_docs, dim=24, window=5, min_count=5, epochs=3,
        num_partitions=4).collect()}
    within = _cos(out["heart"], out["cardiac"])
    across = _cos(out["heart"], out["butter"])
    assert within > across
    assert within > 0.5


def test_loss_decreases_on_trained_pairs(topic_docs, spark):
    """Average within-topic positive-pair sigmoid score must rise vs
    the 0.5 init baseline (negatives come mostly from the other topic,
    as in a real vocabulary)."""
    words, counts = build_w2v_vocab(topic_docs, min_count=5)
    w2i = {w: i for i, w in enumerate(words)}
    W0 = seeded_init(words, 24)
    cum = make_neg_table(counts)
    med = [w2i[w] for w in "heart attack cardiac arrest stroke clot"
           .split()]
    cook = [w2i[w] for w in "flour sugar butter oven bake dough".split()]
    ids = [med, cook] * 30
    Wf, Cf, _ = sgns_train_partition(ids, W0, np.zeros_like(W0), cum,
                                     window=5, negative=5, lr=0.025,
                                     min_lr=1e-4, epochs=3, seed=7)

    def avg_pos_score(W, C):
        s, n = 0.0, 0
        for doc in (med, cook):
            for i, c in enumerate(doc):
                for j, o in enumerate(doc):
                    if i != j:
                        s += 1 / (1 + np.exp(-W[c] @ C[o]))
                        n += 1
        return s / n

    # SGNS equilibrium is sigma = p/(p + k*q) (Levy & Goldberg's shifted
    # PMI view): with k=5 and a 12-word vocab the true-pair score caps
    # well below 0.5, so the meaningful invariant is SEPARATION, not an
    # absolute level.
    within = avg_pos_score(Wf, Cf)
    cross = np.mean([1 / (1 + np.exp(-Wf[c] @ Cf[o]))
                     for c in med for o in cook])
    assert within > 1.5 * cross
    assert within > cross + 0.1
    # cross-topic (never-positive) pairs end below the 0.5 init baseline
    assert cross < avg_pos_score(W0, np.zeros_like(W0))


def test_deterministic_given_partitioning(topic_docs, spark):
    a = {r["word"]: r["vec"] for r in train_word2vec_sgns(
        spark, topic_docs, dim=8, epochs=1, num_partitions=4).collect()}
    b = {r["word"]: r["vec"] for r in train_word2vec_sgns(
        spark, topic_docs, dim=8, epochs=1, num_partitions=4).collect()}
    assert a.keys() == b.keys()
    for w in a:
        assert np.allclose(a[w], b[w])


def test_single_partition_equals_sequential_kernel(spark):
    """With one partition the distributed trainer IS the sequential
    kernel (golden equality — the mean-combine is exact at P=1)."""
    rows = [("0", "aa bb cc aa bb"), ("1", "bb cc aa cc bb")]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r["word"]: (r["vec"], r["cnt"]) for r in train_word2vec_sgns(
        spark, docs, dim=6, window=2, negative=2, min_count=2, epochs=2,
        num_partitions=1).collect()}

    words, counts = build_w2v_vocab(docs, min_count=2)
    w2i = {w: i for i, w in enumerate(words)}
    W0 = seeded_init(words, 6)
    cum = make_neg_table(counts)
    import hashlib
    pseed = int.from_bytes(
        hashlib.md5(b"0\x0013").digest()[:4], "little")
    toks = [[w2i[w] for w in t.split(" ") if w in w2i] for _, t in rows]
    Wf, _, _ = sgns_train_partition(toks, W0, np.zeros_like(W0), cum,
                                    window=2, negative=2, lr=0.025,
                                    min_lr=1e-4, epochs=2, seed=pseed)
    for w, i in w2i.items():
        assert np.allclose(got[w][0], Wf[i]), w
    assert got["bb"][1] == 4  # corpus count plumbed through


def test_unseen_word_keeps_init_and_counts(spark):
    # a word above min_count that never gains a training pair (doc of
    # length 1 after filtering) falls back to its init vector
    docs = spark.createDataFrame(
        [("0", "solo"), ("1", "solo"), ("2", "pair pair")],
        "doc_id string, text string")
    out = {r["word"]: r for r in train_word2vec_sgns(
        spark, docs, dim=4, min_count=2, num_partitions=1).collect()}
    W0 = seeded_init(["pair", "solo"], 4)
    # vocabulary order is (-count, word): pair(2)... solo(2) -> tie ->
    # alphabetical: pair first
    assert np.allclose(out["solo"]["vec"], W0[1])
    assert out["solo"]["cnt"] == 2
