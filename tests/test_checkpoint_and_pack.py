"""Checkpoint/resume protocol + model-pack round-trip (S4/S5/S6)."""

import json
import os

import numpy as np

from medcat_spark.checkpoint import (committed_doc_ids, read_annotations,
                                     read_lineage, resumable_annotate)
from medcat_spark.config import EngineConfig
from medcat_spark.pipeline import annotate, broadcast_model
from medcat_spark.sources.model_pack import load_model_pack, save_model_pack


def test_resume_processes_each_doc_once(spark, docs_df, fixture_models, tmp_path):
    cdb, vocab = fixture_models
    bc = broadcast_model(spark, cdb, vocab, EngineConfig())
    out = str(tmp_path / "kg")

    m1 = resumable_annotate(spark, docs_df, bc, out, max_docs=25)
    assert m1["n_docs"] == 25
    m2 = resumable_annotate(spark, docs_df, bc, out, max_docs=25)
    assert m2["n_docs"] == 25
    m3 = resumable_annotate(spark, docs_df, bc, out)   # the rest
    assert m3["n_docs"] == 10
    m4 = resumable_annotate(spark, docs_df, bc, out)   # idempotent
    assert m4["n_docs"] == 0

    done = committed_doc_ids(spark, out)
    assert done.count() == 60

    # committed annotations == single-shot annotate
    resumed = read_annotations(spark, out)
    direct = annotate(docs_df, bc)
    key = ["doc_id", "start", "cui"]
    assert resumed.select(*key).distinct().count() == \
        direct.select(*key).distinct().count()
    assert resumed.select(*key).exceptAll(direct.select(*key)).count() == 0

    # lineage rows exist and carry metrics
    lin = read_lineage(spark, out).collect()
    assert sum(r["n_annotations"] for r in lin) == resumed.count()

    # manifests carry model/config hashes for snapshot validity
    snaps = sorted(os.listdir(os.path.join(out, "snapshots")))
    man = json.load(open(os.path.join(out, "snapshots", snaps[0],
                                      "manifest.json")))
    assert man["cdb_hash"] == cdb.content_hash()
    assert man["config_hash"] == EngineConfig().content_hash()


def test_uncommitted_tmp_snapshot_is_ignored(spark, docs_df, fixture_models,
                                             tmp_path):
    cdb, vocab = fixture_models
    bc = broadcast_model(spark, cdb, vocab, EngineConfig())
    out = str(tmp_path / "kg2")
    resumable_annotate(spark, docs_df, bc, out, max_docs=10)
    # simulate a crashed commit: tmp dir without manifest
    os.makedirs(os.path.join(out, "snapshots", "_tmp_9999"), exist_ok=True)
    assert committed_doc_ids(spark, out).count() == 10
    m = resumable_annotate(spark, docs_df, bc, out)
    assert m["n_docs"] == 50


def test_model_pack_roundtrip(fixture_models, tmp_path):
    cdb, vocab = fixture_models
    cfg = EngineConfig()
    path = str(tmp_path / "pack")
    man = save_model_pack(path, cdb, vocab, cfg)
    cdb2, vocab2, cfg2 = load_model_pack(path)

    assert cfg2 == cfg
    assert cdb2.name2cuis == cdb.name2cuis
    assert cdb2.name2cuis2status == cdb.name2cuis2status
    assert cdb2.snames == cdb.snames
    assert cdb2.cui2names == cdb.cui2names
    assert cdb2.cui2preferred_name == cdb.cui2preferred_name
    assert cdb2.cui2count_train == cdb.cui2count_train
    assert cdb2.vocab == cdb.vocab
    for c in cdb.cui2context_vectors:
        for ct in cdb.cui2context_vectors[c]:
            assert np.allclose(cdb2.cui2context_vectors[c][ct],
                               cdb.cui2context_vectors[c][ct])
    assert cdb2.content_hash() == cdb.content_hash() == man["cdb_hash"]
    for w in vocab.word2cnt:
        assert vocab2.word2cnt[w] == vocab.word2cnt[w]
        if vocab.vec(w) is not None:
            assert np.allclose(vocab2.vec(w), vocab.vec(w))
