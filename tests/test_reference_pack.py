"""Reference-format model-pack import/export (VERDICT r3 task #1).

A MedCAT user's first act is "load my existing model pack": these tests
round-trip our fixture model through the reference's own on-disk layout
(JSON-split CDB + pickled cdb.dat/vocab.dat + config.json,
cat.py:235-337 / utils/saving/serializer.py:18-23) and assert the
loaded model annotates identically to the native one.
"""

import json
import os
import pickle

import numpy as np
import pytest

from medcat_spark.config import EngineConfig
from medcat_spark.fixtures import fixture_documents, trained_fixture_models
from medcat_spark.sources.reference_pack import (
    engine_config_from_reference, load_reference_pack,
    reference_config_dict, write_reference_layout_pack,
    write_reference_meta_component, _encode_sets, _read_json)


@pytest.fixture(scope="module")
def models():
    return trained_fixture_models()


@pytest.fixture(scope="module")
def ref_pack(models, tmp_path_factory):
    cdb, vocab = models
    path = str(tmp_path_factory.mktemp("refpack") / "pack")
    write_reference_layout_pack(path, cdb, vocab, EngineConfig())
    return path


def test_layout_files(ref_pack):
    files = set(os.listdir(ref_pack))
    for expected in ("cdb.dat", "vocab.dat", "config.json",
                     "model_card.json", "cui2names.json", "cui2snames.json",
                     "cui2type_ids.json", "name2cuis.json",
                     "name2cuis2status.json", "name_isupper.json",
                     "snames.json", "addl_info.json"):
        assert expected in files, expected
    # speciality JSONs use the reference's set encoding
    raw = json.load(open(os.path.join(ref_pack, "snames.json")))
    assert "==SET==" in raw
    # cdb.dat is {'cdb_main': {...}} exactly like CDBSerializer.serialize
    with open(os.path.join(ref_pack, "cdb.dat"), "rb") as f:
        d = pickle.load(f)
    assert set(d) == {"cdb_main"}
    assert "cui2context_vectors" in d["cdb_main"]
    assert "cui2names" not in d["cdb_main"]   # speciality -> JSON, not dill


def test_round_trip_maps(models, ref_pack):
    cdb, vocab = models
    cdb2, vocab2, cfg2, comps = load_reference_pack(ref_pack)
    assert cdb2.name2cuis == cdb.name2cuis
    assert cdb2.name2cuis2status == cdb.name2cuis2status
    assert cdb2.snames == cdb.snames
    assert cdb2.cui2names == cdb.cui2names
    assert cdb2.cui2snames == cdb.cui2snames
    assert cdb2.cui2type_ids == cdb.cui2type_ids
    assert cdb2.name_isupper == cdb.name_isupper
    assert cdb2.cui2preferred_name == cdb.cui2preferred_name
    assert cdb2.cui2count_train == cdb.cui2count_train
    assert cdb2.cui2average_confidence == cdb.cui2average_confidence
    assert cdb2.vocab == cdb.vocab
    assert set(cdb2.cui2context_vectors) == set(cdb.cui2context_vectors)
    for c, per in cdb.cui2context_vectors.items():
        assert set(cdb2.cui2context_vectors[c]) == set(per)
        for ct, v in per.items():
            np.testing.assert_array_equal(cdb2.cui2context_vectors[c][ct], v)
    assert vocab2.word2cnt == vocab.word2cnt
    for w in vocab.word2cnt:
        v1, v2 = vocab.vec(w), vocab2.vec(w)
        assert (v1 is None) == (v2 is None)
        if v1 is not None:
            np.testing.assert_array_equal(v1, v2)
    assert cfg2 == EngineConfig()
    assert comps["_skipped"] == []


def test_round_trip_from_zip(models, tmp_path):
    cdb, vocab = models
    path = str(tmp_path / "pack")
    zpath = write_reference_layout_pack(path, cdb, vocab, EngineConfig(),
                                        as_zip=True)
    assert zpath.endswith(".zip")
    cdb2, _vocab2, _cfg2, _ = load_reference_pack(zpath)
    assert cdb2.name2cuis == cdb.name2cuis
    assert set(cdb2.cui2context_vectors) == set(cdb.cui2context_vectors)


def test_annotate_parity_native_vs_imported(spark, models, ref_pack):
    """The imported model must annotate EXACTLY like the native one."""
    from medcat_spark.pipeline import annotate, broadcast_model
    cdb, vocab = models
    cdb2, vocab2, cfg2, _ = load_reference_pack(ref_pack)
    docs = spark.createDataFrame(
        fixture_documents(40),
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>")
    cols = ["doc_id", "start", "end", "cui", "detected_name"]
    native = annotate(docs, broadcast_model(spark, cdb, vocab, EngineConfig()))
    imported = annotate(docs, broadcast_model(spark, cdb2, vocab2, cfg2))
    a = sorted(map(tuple, native.select(*cols).collect()))
    b = sorted(map(tuple, imported.select(*cols).collect()))
    assert a == b and len(a) > 0


def test_dill_format_pack_loads(models, tmp_path):
    """cdb_format='dill' (no JSON split): everything in one pickled dict
    under key 'cdb' — loads when the contents are plain data."""
    cdb, vocab = models
    path = str(tmp_path / "dillpack")
    write_reference_layout_pack(path, cdb, vocab, EngineConfig())
    # rewrite cdb.dat in the all-in-one layout and drop the JSONs
    with open(os.path.join(path, "cdb.dat"), "rb") as f:
        main = pickle.load(f)["cdb_main"]
    for name in ("cui2names", "cui2snames", "cui2type_ids", "name2cuis",
                 "name2cuis2status", "name_isupper", "addl_info"):
        os.remove(os.path.join(path, f"{name}.json"))
        main[name] = getattr(cdb, name) if name != "addl_info" \
            else cdb.addl_info
    os.remove(os.path.join(path, "snames.json"))
    main["snames"] = set(cdb.snames)
    with open(os.path.join(path, "cdb.dat"), "wb") as f:
        pickle.dump({"cdb": main}, f, protocol=4)
    cdb2, _v, _c, _ = load_reference_pack(path)
    assert cdb2.name2cuis == cdb.name2cuis
    assert cdb2.snames == cdb.snames
    assert set(cdb2.cui2context_vectors) == set(cdb.cui2context_vectors)


def test_unloadable_waf_entry_tolerated(models, tmp_path):
    """A dill-pickled function in cdb.dat (weighted_average_function —
    cdb.py:104-123) must not break the import."""
    import io
    import sys
    import types
    cdb, vocab = models
    path = str(tmp_path / "wafpack")
    write_reference_layout_pack(path, cdb, vocab, EngineConfig())
    with open(os.path.join(path, "cdb.dat"), "rb") as f:
        d = pickle.load(f)

    class _Fn:
        pass
    _Fn.__module__ = "medcat.utils.config_utils"
    _Fn.__qualname__ = _Fn.__name__ = "default_weighted_average"
    fake_pkg = types.ModuleType("medcat")
    fake = types.ModuleType("medcat.utils.config_utils")
    fake.default_weighted_average = _Fn
    sys.modules["medcat"] = fake_pkg
    sys.modules["medcat.utils"] = types.ModuleType("medcat.utils")
    sys.modules["medcat.utils.config_utils"] = fake
    try:
        d["cdb_main"]["weighted_average_function"] = _Fn
        buf = io.BytesIO()
        pickle.dump(d, buf, protocol=4)
    finally:
        for m in ("medcat", "medcat.utils", "medcat.utils.config_utils"):
            del sys.modules[m]
    with open(os.path.join(path, "cdb.dat"), "wb") as f:
        f.write(buf.getvalue())
    cdb2, _v, cfg2, _ = load_reference_pack(path)
    assert cdb2.name2cuis == cdb.name2cuis
    assert cfg2.weighted_average_factor == 0.0004


def test_meta_component_round_trip(tmp_path):
    from medcat_spark.functions.lstm_meta import lstm_fixture_model
    from tests.test_torch_ingestion import _random_windows
    m = lstm_fixture_model()
    pack = str(tmp_path / "pack")
    cdb, vocab = trained_fixture_models()
    write_reference_layout_pack(pack, cdb, vocab, EngineConfig())
    write_reference_meta_component(os.path.join(pack, "meta_Negation"),
                                   m, "Negation")
    _cdb, _v, _c, comps = load_reference_pack(pack)
    assert "Negation" in comps and comps["_skipped"] == []
    m2 = comps["Negation"]
    assert m2.labels == m.labels
    assert m2.cntx_left == m.cntx_left and m2.cntx_right == m.cntx_right
    wins, cents = _random_windows(np.random.RandomState(29), n=25)
    assert m.predict_batch(wins, cents) == m2.predict_batch(wins, cents)


def test_load_any_pack_dispatch(models, ref_pack, tmp_path):
    """The job surface (run_kg --model-pack) accepts BOTH layouts."""
    from medcat_spark.config import EngineConfig as EC
    from medcat_spark.sources.model_pack import (load_any_pack,
                                                 save_model_pack)
    cdb, vocab = models
    # reference layout (dir)
    c1, _v1, _ = load_any_pack(ref_pack)
    assert c1.name2cuis == cdb.name2cuis
    # native columnar layout
    native = str(tmp_path / "native")
    save_model_pack(native, cdb, vocab, EC())
    c2, _v2, _ = load_any_pack(native)
    assert c2.name2cuis == cdb.name2cuis
    # reference layout (zip)
    zpath = write_reference_layout_pack(str(tmp_path / "zp"), cdb, vocab,
                                        EC(), as_zip=True)
    c3, _v3, _ = load_any_pack(zpath)
    assert c3.name2cuis == cdb.name2cuis


def test_memory_optimised_pack_loads(models, tmp_path):
    """A memory-optimised pack (utils/memory_optimiser.py): cui2names/
    cui2snames/cui2type_ids... collapsed into cui2many, the originals
    saved as ==DELEGATING_DICT== markers, snames as a DelegatingValueSet
    marker.  The importer must reconstruct the plain dicts."""
    cdb, vocab = models
    path = str(tmp_path / "optpack")
    write_reference_layout_pack(path, cdb, vocab, EngineConfig())

    combine = ("cui2names", "cui2snames", "cui2context_vectors",
               "cui2count_train", "cui2tags", "cui2type_ids",
               "cui2preferred_name", "cui2average_confidence")
    sources = {
        "cui2names": cdb.cui2names, "cui2snames": cdb.cui2snames,
        "cui2count_train": cdb.cui2count_train, "cui2tags": {},
        "cui2type_ids": cdb.cui2type_ids,
        "cui2preferred_name": cdb.cui2preferred_name,
        "cui2average_confidence": cdb.cui2average_confidence,
        # context vectors as per-type float lists (the JSON shape)
        "cui2context_vectors": {
            c: {ct: list(map(float, v)) for ct, v in per.items()}
            for c, per in cdb.cui2context_vectors.items()}}
    cui2many = {}
    for nr, name in enumerate(combine):
        for cui, val in sources[name].items():
            cui2many.setdefault(cui, [None] * len(combine))[nr] = \
                {"==SET==": sorted(val)} if isinstance(val, set) else val
    with open(os.path.join(path, "cui2many.json"), "w") as f:
        json.dump(cui2many, f)
    marker = {"==DELEGATING_DICT==": {
        "delegate": None, "nr": 0, "nr_of_overall_items": len(combine)}}
    for nr, name in enumerate(("cui2names", "cui2snames")):
        m = dict(marker)
        m["==DELEGATING_DICT=="] = {**marker["==DELEGATING_DICT=="],
                                    "nr": combine.index(name)}
        with open(os.path.join(path, f"{name}.json"), "w") as f:
            json.dump(m, f)
    with open(os.path.join(path, "cui2type_ids.json"), "w") as f:
        json.dump({"==DELEGATING_DICT==": {
            "delegate": None, "nr": combine.index("cui2type_ids"),
            "nr_of_overall_items": len(combine)}}, f)
    with open(os.path.join(path, "snames.json"), "w") as f:
        json.dump({"==DELEGATING_SET==": {"delegate": None}}, f)
    # strip the combined attrs from cdb.dat like perform_optimisation
    with open(os.path.join(path, "cdb.dat"), "rb") as f:
        d = pickle.load(f)
    for name in ("cui2context_vectors", "cui2count_train",
                 "cui2preferred_name", "cui2average_confidence"):
        d["cdb_main"].pop(name, None)
    with open(os.path.join(path, "cdb.dat"), "wb") as f:
        pickle.dump(d, f, protocol=4)

    cdb2, _v, _c, _ = load_reference_pack(path)
    assert cdb2.cui2names == cdb.cui2names
    assert cdb2.cui2snames == cdb.cui2snames
    assert cdb2.cui2type_ids == cdb.cui2type_ids
    assert cdb2.snames == cdb.snames
    assert cdb2.cui2preferred_name == cdb.cui2preferred_name
    assert cdb2.cui2count_train == cdb.cui2count_train
    assert set(cdb2.cui2context_vectors) == set(cdb.cui2context_vectors)
    for c, per in cdb.cui2context_vectors.items():
        for ct, v in per.items():
            np.testing.assert_allclose(cdb2.cui2context_vectors[c][ct],
                                       np.asarray(v, dtype=np.float64))


def test_engine_config_mapping_round_trip():
    """reference_config_dict ∘ engine_config_from_reference == identity
    (via the reference's JSON set/pattern encoding)."""
    cfg = EngineConfig(similarity_threshold=0.4,
                       filter_cuis=frozenset({"C1", "C2"}),
                       weighted_average_factor=0.001,
                       name_versions=("LOWER",),
                       stopwords=frozenset({"the", "a"}))
    encoded = json.loads(json.dumps(_encode_sets(reference_config_dict(cfg))))
    # decode the way load_reference_pack does
    import io
    decoded = json.load(io.StringIO(json.dumps(encoded)),
                        object_hook=lambda d: (
                            set(d["==SET=="]) if "==SET==" in d else d))
    cfg2 = engine_config_from_reference(decoded)
    assert cfg2 == cfg


def test_engine_config_defaults_from_empty():
    assert engine_config_from_reference({}) == EngineConfig()


def test_real_medcat_default_config_shape():
    """Spot-parity with the reference's documented defaults: an empty
    linking section keeps ours; explicit values override."""
    cfg = engine_config_from_reference({
        "linking": {"similarity_threshold": 0.3,
                    "context_vector_sizes": {"long": 18, "short": 3},
                    "filters": {"cuis": set()}},
        "ner": {"min_name_len": 4},
        "general": {"separator": "~"}})
    assert cfg.similarity_threshold == 0.3
    assert cfg.context_vector_sizes == {"long": 18, "short": 3}
    assert cfg.min_name_len == 4
    assert cfg.filter_cuis == frozenset()
    assert cfg.prefer_primary_name == 0.35  # untouched default
