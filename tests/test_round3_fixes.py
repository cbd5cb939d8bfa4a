"""Regression tests for the round-3 ADVICE.md findings.

1. regression.determine_finding must terminate on cyclic pt2ch data
   (reference results.py:287 marks before descending).
2. pairwise_cosine_lsh n_flips=2 must recover Hamming-distance-2 pairs.
3. MetaCAT-analogue windows take their right edge from the LAST entity
   token (meta_cat.py prepare_document), not the first.
4. save_trained_pack / apply_training merge per (cui, ctx_type) like the
   reference's import_training (cdb.py:585-611) — untouched ctx types of
   a trained CUI survive.
5. snomed_concept_df emits the semantic-tag TEXT as description_type_ids
   (preprocess_snomed.py:380-388) and its hash as type_ids.
6. pt2ch_dict / refset_dict accept a CUI allowlist so regression checks
   against UMLS-scale hierarchies don't collect the whole map.
"""

import copy

import numpy as np

from medcat_spark.regression import Finding, determine_finding


def test_determine_finding_terminates_on_cyclic_pt2ch():
    pt2ch = {"A": ["B"], "B": ["C"], "C": ["A"]}   # 3-cycle
    ents = [{"cui": "Z", "start": 9, "end": 12}]
    finding, _ = determine_finding("A", 0, 5, ents, pt2ch)
    assert finding is Finding.FAIL

    # self-loop
    finding, _ = determine_finding("A", 0, 5, ents, {"A": ["A"]})
    assert finding is Finding.FAIL

    # cycle must not mask a real child hit reachable before the loop
    # (check_parent off: in a 2-cycle B is also A's parent, which the
    # parent branch would legitimately report first)
    ents2 = [{"cui": "B", "start": 0, "end": 5}]
    finding, wcui = determine_finding("A", 0, 5, ents2,
                                      {"A": ["B"], "B": ["A"]},
                                      check_parent=False)
    assert finding is Finding.FOUND_ANY_CHILD and wcui == "B"


def test_pairwise_cosine_lsh_recovers_hamming2_pairs(spark):
    from medcat_spark.functions.similarity import pairwise_cosine_lsh

    df = spark.createDataFrame(
        [("a", [1.0, 1.0, 1.0, 1.0, 0.5]),
         ("b", [-1.0, -1.0, 1.0, 1.0, 0.5])],   # 2 sign bits differ
        "vec_id string, embedding array<double>")
    one = pairwise_cosine_lsh(df, probe_dims=4, n_flips=1,
                              min_sim=-1.0).collect()
    two = pairwise_cosine_lsh(df, probe_dims=4, n_flips=2,
                              min_sim=-1.0).collect()
    assert len(one) == 0          # single-bit probes cannot reach it
    assert len(two) == 1          # docstring contract: 'up to n_flips bits'
    assert {two[0]["id_a"], two[0]["id_b"]} == {"a", "b"}


def test_meta_window_right_edge_from_last_entity_token(spark):
    from medcat_spark.functions.meta_model import (meta_annotations_model,
                                                   negation_fixture_model)

    model = negation_fixture_model()
    bc = spark.sparkContext.broadcast(model)
    # bigram entity 'table scan' at tokens 0-1; cue at token index 11 =
    # last_ent_token(1) + cntx_right(10) — INSIDE the reference window,
    # OUTSIDE a window anchored on the first token only.
    text = "table scan " + " ".join(["key"] * 9) + " slow"
    docs = spark.createDataFrame([("d1", text)], "doc_id string, text string")
    ann = spark.createDataFrame([("d1", 0, 10, "D104")],
                                "doc_id string, start int, end int, cui string")
    row = meta_annotations_model(ann, docs, bc).first()
    assert row["value"] == "negated"
    # exact parity with a local predict over the reference window
    toks = text.split(" ")
    v, c = model.predict(toks[0:1 + 1 + model.cntx_right])
    assert row["value"] == v
    assert abs(row["confidence"] - round(c, 4)) < 1e-9

    # annotations without an `end` column still work (unigram window)
    ann2 = spark.createDataFrame([("d1", 0, "D104")],
                                 "doc_id string, start int, cui string")
    row2 = meta_annotations_model(ann2, docs, bc).first()
    v2, _ = model.predict(toks[0:1 + model.cntx_right])
    assert row2["value"] == v2


def test_trained_pack_keeps_untouched_ctx_types(spark, fixture_models,
                                                tmp_path):
    from medcat_spark.config import EngineConfig
    from medcat_spark.model_ops import apply_training, save_trained_pack
    from medcat_spark.sources.model_pack import load_model_pack

    cdb, vocab = fixture_models
    cui = next(c for c, cts in cdb.cui2context_vectors.items()
               if len(cts) >= 2)
    ctx_types = sorted(cdb.cui2context_vectors[cui])
    retrained, untouched = ctx_types[0], ctx_types[1]
    dim = len(cdb.cui2context_vectors[cui][retrained])
    new_vec = [float(i) for i in range(dim)]

    trained = spark.createDataFrame(
        [(cui, retrained, new_vec, 2)],
        "cui string, ctx_type string, mean_vec array<double>, n long")

    path = str(tmp_path / "pack_subset")
    save_trained_pack(spark, path, cdb, vocab, trained, EngineConfig())
    cdb2, _v, _c = load_model_pack(path)
    assert np.allclose(cdb2.cui2context_vectors[cui][retrained], new_vec)
    assert untouched in cdb2.cui2context_vectors[cui]          # survived
    assert np.allclose(cdb2.cui2context_vectors[cui][untouched],
                       cdb.cui2context_vectors[cui][untouched])

    # driver-side merge follows the same per-(cui, ctx_type) rule
    ref = copy.deepcopy(cdb)
    apply_training(ref, [{"cui": cui, "ctx_type": retrained,
                          "mean_vec": new_vec, "n": 2}])
    assert untouched in ref.cui2context_vectors[cui]
    assert np.allclose(ref.cui2context_vectors[cui][untouched],
                       cdb.cui2context_vectors[cui][untouched])
    assert np.allclose(ref.cui2context_vectors[cui][retrained], new_vec)


def test_snomed_description_type_ids_is_tag_text(spark):
    from medcat_spark.sources.ontologies import _tag_hash, snomed_concept_df

    con = spark.createDataFrame([("1", "1"), ("2", "1")],
                                "id string, active string")
    des = spark.createDataFrame(
        [("1", "1", "900000000000003001", "Heart attack (disorder)"),
         ("1", "1", "900000000000013009", "MI"),
         ("2", "1", "900000000000003001", "No tag here")],
        "conceptId string, active string, typeId string, term string")
    rows = {(r["cui"], r["name"]): r
            for r in snomed_concept_df(con, des).collect()}
    r = rows[("1", "Heart attack (disorder)")]
    assert r["description_type_ids"] == "disorder"        # the TEXT
    assert r["type_ids"] == str(_tag_hash("disorder"))    # its hash
    assert rows[("1", "MI")]["description_type_ids"] == "disorder"
    # FSN without a trailing (...) tag -> hash of 'nan', text is null
    r2 = rows[("2", "No tag here")]
    assert r2["description_type_ids"] is None
    assert r2["type_ids"] == str(_tag_hash(None))


def test_pt2ch_and_refset_dict_allowlist(spark):
    from medcat_spark.sources.ontologies import pt2ch_dict, refset_dict

    pt2ch = spark.createDataFrame(
        [("A", ["B"]), ("B", ["C"]), ("C", ["D"]), ("X", ["Y"])],
        "parent string, children array<string>")
    full = pt2ch_dict(pt2ch)
    sub = pt2ch_dict(pt2ch, cuis=["B"])
    assert "X" not in sub                       # unrelated branch pruned
    assert sub["B"] == ["C"]                    # the target's own row
    assert sub["A"] == ["B"]                    # parent edge kept
    assert sub["C"] == ["D"]                    # child subtree kept
    assert all(full[k] == v for k, v in sub.items())

    rs = spark.createDataFrame([("A", ["I21"]), ("X", ["J10"])],
                               "cui string, codes array<string>")
    assert refset_dict(rs, cuis=["A"]) == {"A": ["I21"]}
    assert refset_dict(rs) == {"A": ["I21"], "X": ["J10"]}


def test_kfold_per_docs_hash_folds_no_driver_collect(spark, fixture_models):
    """split_type='per_docs' now assigns folds via pmod(xxhash64(doc_id))
    — no driver collect of doc ids — and still yields perfect P/R on a
    self-annotated export (every fold's eval docs were seen in the CDB
    dictionary; linking math is train-set independent here)."""
    import json
    import tempfile

    from medcat_spark.config import EngineConfig
    from medcat_spark.core.annotate import annotate_document
    from medcat_spark.fixtures import fixture_documents
    from medcat_spark.sources.mct_export import read_mct_export
    from medcat_spark.stats import kfold_stats

    cdb, vocab = fixture_models
    cfg = EngineConfig()
    export = {"projects": [{"id": 1, "name": "p", "cuis": "",
                            "documents": []}]}
    for d in fixture_documents(9):
        text = " ".join(s["text"] for s in d["spans"] if s["kind"] == "text")
        ents, _ = annotate_document(text, cdb, vocab, cfg)
        export["projects"][0]["documents"].append(
            {"id": d["doc_id"], "name": d["doc_id"], "text": text,
             "annotations": [{"start": e.start, "end": e.end, "cui": e.cui,
                              "value": e.source_value} for e in ents]})
    with tempfile.NamedTemporaryFile("w", suffix=".json",
                                     delete=False) as fh:
        json.dump(export, fh)
        path = fh.name
    mct = read_mct_export(spark, path)
    res = kfold_stats(spark, mct, cdb, vocab, cfg, k=3,
                      split_type="per_docs")
    assert len(res["folds"]) == 3
    assert res["tp"] > 0 and res["precision"] == 1.0 and res["recall"] == 1.0


def test_kfold_per_anns_split(spark, fixture_models):
    """Reference PerAnnsFoldCreator (kfold.py:198-237): folds at
    ANNOTATION granularity — a doc's annotations can span folds, and a
    perfect model still scores P=R=1 because predictions on eval docs
    are judged against that fold's own annotations."""
    import json
    import tempfile

    from medcat_spark.config import EngineConfig
    from medcat_spark.core.annotate import annotate_document
    from medcat_spark.fixtures import fixture_documents
    from medcat_spark.sources.mct_export import read_mct_export
    from medcat_spark.stats import kfold_stats

    cdb, vocab = fixture_models
    cfg = EngineConfig()
    docs = fixture_documents(9)
    export = {"projects": [{"id": 1, "name": "p", "cuis": "",
                            "documents": []}]}
    for d in docs:
        text = " ".join(s["text"] for s in d["spans"]
                        if s["kind"] == "text")
        ents, _ = annotate_document(text, cdb, vocab, cfg)
        export["projects"][0]["documents"].append(
            {"id": d["doc_id"], "name": d["doc_id"], "text": text,
             "annotations": [{"start": e.start, "end": e.end, "cui": e.cui,
                              "value": e.source_value} for e in ents]})
    with tempfile.NamedTemporaryFile("w", suffix=".json",
                                     delete=False) as fh:
        json.dump(export, fh)
        path = fh.name
    mct = read_mct_export(spark, path)
    res = kfold_stats(spark, mct, cdb, vocab, cfg, k=3,
                      split_type="per_anns")
    assert len(res["folds"]) == 3 and res["tp"] > 0
    # per-anns quirk: train-fold predictions on eval docs count as FP,
    # so with a perfect model recall is 1.0 and precision reflects the
    # annotation-granularity split, not model error
    assert res["recall"] == 1.0
