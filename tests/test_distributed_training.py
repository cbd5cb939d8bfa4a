"""Distributed model-pack write (VERDICT r01 item 5): the trained
context vectors flow from the trainer DataFrame into the pack tables via
Spark writes, and the loaded pack equals the driver-side
apply_training merge exactly."""

import copy

import numpy as np

from medcat_spark.config import EngineConfig
from medcat_spark.model_ops import (apply_training, save_trained_pack,
                                    train_supervised_spark)
from medcat_spark.pipeline import broadcast_model
from medcat_spark.sources.model_pack import load_model_pack


def test_distributed_pack_equals_driver_merge(spark, fixture_models, tmp_path):
    cdb, vocab = fixture_models
    cfg = EngineConfig()
    bc = broadcast_model(spark, cdb, vocab, cfg)

    docs = spark.createDataFrame(
        [("d1", "patient with heart attack admitted"),
         ("d2", "chronic kidney failure and fever noted"),
         ("d3", "heart attack and high temperature")],
        "doc_id string, text string")
    gold = spark.createDataFrame(
        [("d1", 13, 25, "C0003"), ("d2", 8, 22, "C0005"),
         ("d3", 0, 12, "C0003"), ("d3", 17, 33, "C0010")],
        "doc_id string, start int, end int, cui string")

    trained = train_supervised_spark(spark, gold, docs, bc, cfg)

    # driver-side reference merge
    cdb_ref = copy.deepcopy(cdb)
    apply_training(cdb_ref, trained.collect())

    # distributed pack write, then load back
    path = str(tmp_path / "pack_dist")
    manifest = save_trained_pack(spark, path, cdb, vocab, trained, cfg)
    cdb2, _vocab2, _cfg2 = load_model_pack(path)

    assert manifest["trained_cuis"] == 3
    assert set(cdb2.cui2context_vectors) == set(cdb_ref.cui2context_vectors)
    for cui, cts in cdb_ref.cui2context_vectors.items():
        for ct, v in cts.items():
            assert np.allclose(cdb2.cui2context_vectors[cui][ct], v), (cui, ct)
    assert cdb2.cui2count_train == cdb_ref.cui2count_train
    # untouched model surface is identical
    assert cdb2.name2cuis == cdb.name2cuis
    assert cdb2.snames == cdb.snames
