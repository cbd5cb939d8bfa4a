"""O3 most_similar, O4 subset, A2 vocab counts, A6 avg-confidence, and
the distributed supervised trainer (mean-combine correctness vs a
driver-side numpy computation)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from medcat_spark.cdb_build import build_cdb_tables
from medcat_spark.config import EngineConfig
from medcat_spark.core.annotate import annotate_document
from medcat_spark.core.linker import ContextModel
from medcat_spark.core.model import unitvec
from medcat_spark.core.ner import Entity
from medcat_spark.model_ops import (apply_training, avg_confidence_update,
                                    build_vocab_counts, combine_avg_confidence,
                                    context_vectors_df, most_similar,
                                    subset_by_cui, train_supervised_spark)


def test_most_similar(spark, fixture_models):
    cdb, _ = fixture_models
    cv = context_vectors_df(spark, cdb)
    trained = [c for c in cdb.cui2context_vectors
               if "short" in cdb.cui2context_vectors[c]]
    target = trained[0]
    res = most_similar(cv, target, "short", topn=5).collect()
    assert res[0]["cui"] == target and abs(res[0]["sim"] - 1.0) < 1e-9
    # golden check vs numpy brute force
    qv = unitvec(cdb.cui2context_vectors[target]["short"])
    sims = sorted(((float(np.dot(qv, unitvec(cdb.cui2context_vectors[c]["short"]))), c)
                   for c in trained), key=lambda t: (-t[0], t[1]))
    assert [r["cui"] for r in res] == [c for _s, c in sims[:5]]


def test_subset_by_cui(spark, concepts_df):
    tables = build_cdb_tables(concepts_df, EngineConfig())
    keep = spark.createDataFrame([("C0008",)], "cui string")
    sub = subset_by_cui(tables, keep)
    cuis = {r["cui"] for r in sub["concepts"].collect()}
    # 'virus' is shared with C0009 -> 2-hop closure pulls C0009 in
    assert cuis == {"C0008", "C0009"}
    names = {r["name"] for r in sub["names"].collect()}
    assert "virus" in names and "virus~k" in names
    assert not any(n.startswith("heart") for n in names)


def test_build_vocab_counts(spark, docs_df):
    from medcat_spark.core.docs import reconstruct_text
    docs = spark.createDataFrame(
        [(r["doc_id"], reconstruct_text([s.asDict() for s in r["spans"]]))
         for r in docs_df.collect()], "doc_id string, text string")
    vc = {r["word"]: r["cnt"] for r in build_vocab_counts(docs).collect()}
    assert vc["patient"] > 0 and vc["the"] > 0


def test_avg_confidence(spark, fixture_models):
    cdb, vocab = fixture_models
    ann = spark.createDataFrame(
        [("d1", "C0001", 0.5), ("d2", "C0001", 0.7), ("d3", "C0002", -1.0)],
        "doc_id string, cui string, context_similarity double")
    rows = avg_confidence_update(ann).collect()
    d = {r["cui"]: r for r in rows}
    assert d["C0001"]["n"] == 2 and abs(d["C0001"]["sim_sum"] - 1.2) < 1e-9
    assert "C0002" not in d  # -1 similarities excluded
    import copy
    cdb2 = copy.deepcopy(cdb)
    n0 = cdb2.cui2count_train.get("C0001", 0)
    combine_avg_confidence(cdb2, rows)
    expect = (cdb.cui2average_confidence.get("C0001", 0.0) * n0 + 1.2) / (n0 + 2)
    assert abs(cdb2.cui2average_confidence["C0001"] - expect) < 1e-12


def test_train_supervised_spark_mean_combine(spark, fixture_models):
    """The distributed trainer's (cui, ctx_type) means must equal the
    driver-side numpy mean of per-example context vectors."""
    import copy
    cdb, vocab = fixture_models
    cfg = EngineConfig()
    texts = {
        "t1": "patient admitted with heart attack and high temperature",
        "t2": "sudden heart attack reported at the clinic",
        "t3": "history of heart attack and fever",
    }
    # gold = the 'heart attack' mention in each doc
    gold_rows, expect_vecs = [], []
    cm = ContextModel(cdb, vocab, cfg)
    from medcat_spark.core.annotate import preprocess
    for did, text in texts.items():
        toks = preprocess(text, cdb, cfg)
        ents, _ = annotate_document(text, cdb, vocab, cfg)
        ha = [e for e in ents if e.cui == "C0003"][0]
        gold_rows.append((did, ha.start, ha.end, "C0003"))
        ent = Entity(tok_start=ha.tok_start, tok_end=ha.tok_end,
                     start=ha.start, end=ha.end, source_value="",
                     detected_name="", link_candidates=[], ent_id=0)
        expect_vecs.append(cm.get_context_vectors(ent, toks))

    gold = spark.createDataFrame(gold_rows,
                                 "doc_id string, start int, end int, cui string")
    docs = spark.createDataFrame(list(texts.items()), "doc_id string, text string")
    from medcat_spark.pipeline import broadcast_model
    bc = broadcast_model(spark, cdb, vocab, cfg)
    res = train_supervised_spark(spark, gold, docs, bc).collect()
    got = {(r["cui"], r["ctx_type"]): (np.array(r["mean_vec"]), r["n"])
           for r in res}
    for ct in cfg.context_vector_sizes:
        want = np.mean([v[ct] for v in expect_vecs], axis=0)
        vec, n = got[("C0003", ct)]
        assert n == 3
        assert np.allclose(vec, want, atol=1e-12)

    cdb2 = copy.deepcopy(cdb)
    apply_training(cdb2, res)
    assert cdb2.cui2count_train["C0003"] == cdb.cui2count_train.get("C0003", 0) + 3


def test_train_unsupervised_spark_end_to_end(spark, fixture_models):
    """Distributed unsupervised training populates context vectors that
    make shared-name disambiguation work on a fresh (untrained) CDB."""
    from medcat_spark.config import EngineConfig
    from medcat_spark.core.annotate import annotate_document
    from medcat_spark.core.docs import reconstruct_text
    from medcat_spark.fixtures import (build_fixture_cdb,
                                       build_fixture_vocab,
                                       fixture_documents)
    from medcat_spark.model_ops import apply_training, train_unsupervised_spark
    from medcat_spark.pipeline import broadcast_model

    cfg = EngineConfig()
    cdb = build_fixture_cdb(cfg)          # no context vectors yet
    vocab = build_fixture_vocab()
    docs = spark.createDataFrame(
        [(d["doc_id"], reconstruct_text(d["spans"]))
         for d in fixture_documents(60)], "doc_id string, text string")
    bc = broadcast_model(spark, cdb, vocab, cfg)
    rows = train_unsupervised_spark(spark, docs, bc).collect()
    assert rows
    apply_training(cdb, rows)
    # trained CUIs carry vectors for every context type that had tokens
    assert cdb.cui2count_train
    # the shared name 'virus' (C0008 vs C0009) now disambiguates
    text = "the virus k strain recovered from blood"
    main, _ = annotate_document(text, cdb, vocab, cfg)
    assert any(e.cui in {"C0008", "C0009"} for e in main)


def test_concept_similarity_edges(spark, fixture_models):
    from medcat_spark.model_ops import (concept_similarity_edges,
                                        context_vectors_df)
    cdb, _ = fixture_models
    cv = context_vectors_df(spark, cdb)
    exact = concept_similarity_edges(cv, "short", k=3).collect()
    # one row per (cui, rank<=3), ranks contiguous from 1, sims ordered
    per = {}
    for r in exact:
        per.setdefault(r["subj"], []).append((r["rank"], r["sim"], r["obj"]))
    n_cuis = cv.where("ctx_type = 'short'").count()
    for subj, rows in per.items():
        rows.sort()
        assert [x[0] for x in rows] == list(range(1, len(rows) + 1))
        sims = [x[1] for x in rows]
        assert sims == sorted(sims, reverse=True)
        assert len(rows) <= 3
    assert len(per) == n_cuis
    # blocked variant never invents pairs and keeps top-1 recall decent
    blocked = concept_similarity_edges(cv, "short", k=3,
                                       probe_dims=4).collect()
    exact_pairs = {(r["subj"], r["obj"]) for r in exact}
    # every blocked edge is a real pair with the same sim
    esim = {(r["subj"], r["obj"]): r["sim"] for r in exact}
    for r in blocked:
        if (r["subj"], r["obj"]) in esim:
            assert abs(esim[(r["subj"], r["obj"])] - r["sim"]) < 1e-9
