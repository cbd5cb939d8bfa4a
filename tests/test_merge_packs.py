"""Golden tests for model_ops.merge_packs, the distributed analogue of
the reference's merge_cdb (utils/cdb_utils.py:10-140): pack-1 priority,
count-weighted context-vector averaging over the union of ctx types,
overwrite_training short-circuits, full_build-gated addl_info merge."""

import numpy as np
import pytest

from medcat_spark.config import EngineConfig
from medcat_spark.core.model import CdbModel
from medcat_spark.fixtures import build_fixture_cdb, build_fixture_vocab
from medcat_spark.model_ops import merge_packs
from medcat_spark.sources.model_pack import load_model_pack, save_model_pack


def _mk_cdb(rows, trained):
    cdb = build_fixture_cdb(EngineConfig(), rows=rows)
    for cui, (n, vecs) in trained.items():
        cdb.cui2count_train[cui] = n
        cdb.cui2context_vectors[cui] = {
            ct: np.asarray(v, dtype=np.float64) for ct, v in vecs.items()}
    return cdb


@pytest.fixture(scope="module")
def packs(tmp_path_factory):
    base = tmp_path_factory.mktemp("merge")
    cfg = EngineConfig()
    vocab = build_fixture_vocab()
    # SHARED cui C1 (trained in both), C2 only in pack1, C3 only in pack2
    cdb1 = _mk_cdb(
        [("C1", "fever", "ONT1", "P", "T1", "desc one"),
         ("C2", "chills", "", "A", "T1", "")],
        {"C1": (3, {"short": [1.0, 0.0], "long": [2.0, 2.0]}),
         "C2": (5, {"short": [9.0, 9.0]})})
    cdb2 = _mk_cdb(
        [("C1", "pyrexia", "ONT2", "A", "T2", "desc two"),
         ("C3", "cough", "", "A", "T3", "")],
        {"C1": (1, {"short": [5.0, 4.0], "medium": [8.0, 0.0]}),
         "C3": (2, {"short": [7.0, 7.0]})})
    p1, p2 = str(base / "p1"), str(base / "p2")
    save_model_pack(p1, cdb1, vocab, cfg)
    save_model_pack(p2, cdb2, vocab, cfg)
    return p1, p2, str(base)


def test_merge_packs_reference_rules(spark, packs):
    p1, p2, base = packs
    out = base + "/merged"
    manifest = merge_packs(spark, p1, p2, out, full_build=True)
    cdb, _vocab, _cfg = load_model_pack(out)

    # names/snames union; shared cui keeps both surface forms
    assert cdb.cui2names["C1"] == {"fever", "pyrexia"}
    assert "chills" in cdb.cui2names["C2"] and "cough" in cdb.cui2names["C3"]
    # pack-1 keeps its P status for its own name; pack-2's new name added
    assert cdb.name2cuis2status["fever"]["C1"] == "P"
    assert cdb.name2cuis2status["pyrexia"]["C1"] == "A"
    # type ids union, full_build ontology union, description = pack1's
    assert cdb.cui2type_ids["C1"] == {"T1", "T2"}
    assert manifest["full_build"] is True

    # count_train sums (3 + 1)
    assert cdb.cui2count_train["C1"] == 4
    assert cdb.cui2count_train["C2"] == 5
    assert cdb.cui2count_train["C3"] == 2

    # context vectors: shared C1 -> count-weighted average over the
    # UNION of ctx types with zeros for missing (reference weights
    # [3/4, 1/4]); one-sided C2/C3 pass through untouched
    v = cdb.cui2context_vectors["C1"]
    np.testing.assert_allclose(v["short"], 0.75 * np.array([1.0, 0.0])
                               + 0.25 * np.array([5.0, 4.0]))
    np.testing.assert_allclose(v["long"], 0.75 * np.array([2.0, 2.0]))
    np.testing.assert_allclose(v["medium"], 0.25 * np.array([8.0, 0.0]))
    np.testing.assert_allclose(cdb.cui2context_vectors["C2"]["short"],
                               [9.0, 9.0])
    np.testing.assert_allclose(cdb.cui2context_vectors["C3"]["short"],
                               [7.0, 7.0])

    # token counts summed on overlap (both packs tokenized 'fever' etc.)
    lone = load_model_pack(p1)[0]
    for tok, cnt in lone.vocab.items():
        assert cdb.vocab[tok] >= cnt


def test_merge_packs_overwrite_training(spark, packs):
    p1, p2, base = packs
    for mode, exp_short, exp_count in (
            (1, [1.0, 0.0], 3),    # pack-1 pinned
            (2, [5.0, 4.0], 1)):   # pack-2 pinned
        out = f"{base}/merged_ot{mode}"
        merge_packs(spark, p1, p2, out, overwrite_training=mode)
        cdb, _v, _c = load_model_pack(out)
        np.testing.assert_allclose(
            cdb.cui2context_vectors["C1"]["short"], exp_short)
        assert cdb.cui2count_train["C1"] == exp_count
        # the pinned pack's ctx-type set wins wholesale for shared CUIs
        exp_types = {"short", "long"} if mode == 1 else {"short", "medium"}
        assert set(cdb.cui2context_vectors["C1"]) == exp_types


def test_merge_packs_no_full_build_keeps_pack1_addl(spark, packs):
    p1, p2, base = packs
    out = base + "/merged_nfb"
    merge_packs(spark, p1, p2, out, full_build=False)
    cdb, _v, _c = load_model_pack(out)
    # description/ontologies stay pack-1's; C3 (pack-2 only) gets none
    assert cdb.addl_info["cui2description"].get("C1") == "desc one"
    assert cdb.addl_info["cui2ontologies"].get("C1") == {"ONT1"}
    assert "C3" not in cdb.addl_info["cui2ontologies"]


def test_model_card_distributed_stats(spark, packs):
    """Reference get_model_card (cat.py:180-212) / cdb.make_stats
    (cdb.py:740-750): stats from the pack tables, no driver load."""
    from medcat_spark.sources.model_pack import model_card
    p1, _p2, _base = packs
    card = model_card(spark, p1, as_dict=True)
    s = card["Basic CDB Stats"]
    ref, _v, _c = load_model_pack(p1)
    assert s["Number of concepts"] == len(ref.cui2names)
    assert s["Number of names"] == len(ref.name2cuis)
    trained = [n for n in ref.cui2count_train.values() if n > 0]
    assert s["Number of concepts that received training"] == len(trained)
    assert s["Number of seen training examples in total"] == sum(trained)
    assert card["Important Parameters"]["ner.min_name_len"] == 3
    assert isinstance(model_card(spark, p1), str)


def test_convert_vocab_vector_size_pca(spark, packs, tmp_path):
    """Reference convert_vocab_vector_size (utils/vocab_utils.py:93-126):
    distributed one-pass covariance == np.cov exactly; projections are
    matrix @ vec with the float32 cast; context vectors shrink too."""
    import numpy as np
    from medcat_spark.model_ops import (_pca_matrix_distributed,
                                        convert_vocab_vector_size)
    # dedicated pack: context vectors must share the vocab's dimension
    vocab = build_fixture_vocab()
    dim = next(v for v in (vocab.vec(w) for w in vocab.word2cnt)
               if v is not None).shape[0]
    rng = np.random.RandomState(7)
    cdb = _mk_cdb(
        [("C1", "fever", "", "P", "T1", ""), ("C2", "chills", "", "A", "T1", "")],
        {"C1": (3, {"short": rng.rand(dim), "long": rng.rand(dim)}),
         "C2": (5, {"short": rng.rand(dim)})})
    p1 = str(tmp_path / "src")
    save_model_pack(p1, cdb, vocab, EngineConfig())
    vocab_df = spark.read.parquet(p1 + "/vocab.parquet")
    rows = [r["vec"] for r in vocab_df.collect() if r["vec"] is not None]
    X = np.stack(rows)
    k = 2
    M = _pca_matrix_distributed(vocab_df, k)
    # same subspace as driver-side PCA (numpy reference implementation)
    cov = np.cov(X - X.mean(axis=0), rowvar=False)
    ev, evec = np.linalg.eigh(cov)
    M_ref = evec[:, np.argsort(ev)[::-1]][:, :k].T
    np.testing.assert_allclose(np.abs(M @ M_ref.T), np.eye(k), atol=1e-8)

    out = str(tmp_path / "shrunk")
    manifest = convert_vocab_vector_size(spark, p1, out, k)
    assert manifest["vec_size"] == k
    conv = load_model_pack(out)
    v0 = load_model_pack(p1)
    for w in list(v0[1].word2cnt)[:5]:
        orig, new = v0[1].vec(w), conv[1].vec(w)
        if orig is None:
            assert new is None
            continue
        assert new.shape == (k,)
        np.testing.assert_allclose(
            new, (M @ orig).astype(np.float32), rtol=1e-6)
    for cui, cts in conv[0].cui2context_vectors.items():
        for ct, vec in cts.items():
            assert vec.shape == (k,)
            np.testing.assert_allclose(
                vec,
                (M @ v0[0].cui2context_vectors[cui][ct]).astype(np.float32),
                rtol=1e-6)
