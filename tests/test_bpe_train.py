"""Distributed BPE training == local trainer, and round-trip through
the saved bbpe-vocab.json/bbpe-merges.txt layout."""

import json
import os

from medcat_spark.core.bbpe import BbpeTokenizer, train_bbpe
from medcat_spark.functions.bpe_train import (corpus_word_counts,
                                              train_bbpe_distributed)

TEXTS = [
    "the patient presented with severe chest pain and shortness of breath",
    "chest pain resolved after treatment, the patient was discharged",
    "severe headache and chest pain; patient's history includes diabetes",
    "no pain reported. the patient walked 3 km without shortness of breath",
    "unicode check: naïve café — ångström über 100µm",
]


def _docs(spark):
    return spark.createDataFrame(list(enumerate(TEXTS)),
                                 "doc_id long, text string")


def test_word_counts_match_python_pretok(spark):
    from medcat_spark.core.bbpe import _PRETOK
    from collections import Counter
    want = Counter()
    for t in TEXTS:
        for m in _PRETOK.finditer(t.lower()):
            want[m.group(0)] += 1
    got = {r["w"]: r["cnt"]
           for r in corpus_word_counts(_docs(spark)).collect()}
    assert got == dict(want)


def test_distributed_trainer_equals_local(spark):
    dist = train_bbpe_distributed(_docs(spark), vocab_size=300)
    local = train_bbpe(TEXTS, vocab_size=300)
    assert dist.ranks == local.ranks
    assert dist.vocab == local.vocab
    for t in TEXTS:
        assert dist.encode(t) == local.encode(t)


def test_trained_tokenizer_round_trips_saved_layout(spark, tmp_path):
    tok = train_bbpe_distributed(_docs(spark), vocab_size=280)
    tok.save(str(tmp_path))
    assert os.path.exists(tmp_path / "bbpe-vocab.json")
    assert os.path.exists(tmp_path / "bbpe-merges.txt")
    vocab = json.load(open(tmp_path / "bbpe-vocab.json"))
    merges = []
    with open(tmp_path / "bbpe-merges.txt") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            a, b = line.split(" ")
            merges.append((a, b))
    reloaded = BbpeTokenizer(vocab, merges, lowercase=True)
    assert reloaded.ranks == tok.ranks
    for t in TEXTS:
        assert reloaded.encode(t) == tok.encode(t)
    # and through the class's own loader
    assert BbpeTokenizer.load(str(tmp_path)).encode(TEXTS[0]) \
        == tok.encode(TEXTS[0])


def test_max_word_types_cap(spark):
    capped = corpus_word_counts(_docs(spark), max_word_types=5).collect()
    assert len(capped) == 5
    # highest-frequency types, deterministic ordering
    full = corpus_word_counts(_docs(spark)).collect()
    assert [r["w"] for r in capped] == [r["w"] for r in full[:5]]


def test_bpe_token_counts_kernel(spark):
    from medcat_spark.functions.bpe_train import bpe_token_counts
    tok = train_bbpe(TEXTS, vocab_size=300)
    out = {r["doc_id"]: (r["n_bpe_tokens"], r["ids_sum"])
           for r in bpe_token_counts(_docs(spark), tok).collect()}
    for i, t in enumerate(TEXTS):
        ids = tok.encode(t)
        assert out[i] == (len(ids), sum(ids))
