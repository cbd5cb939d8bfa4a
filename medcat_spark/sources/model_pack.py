"""S4: model pack save/load — the CDB+Vocab+Config snapshot as parquet
tables + JSON config (reference: zip of dill/pickle blobs + JSON-split
maps, cat.py:235-449, utils/saving/serializer.py:18-23).

Columnar layout (one parquet per CDB map) instead of pickled dicts, so a
model pack is scannable/joinable by any engine and diffs between model
versions are queryable.  Small enough to write driver-side with pyarrow.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from medcat_spark.config import EngineConfig
from medcat_spark.core.model import CdbModel, VocabModel


def _write(path: str, table: pa.Table) -> None:
    pq.write_table(table, path)


def save_model_pack(path: str, cdb: CdbModel, vocab: VocabModel,
                    config: Optional[EngineConfig] = None) -> dict:
    cfg = config or EngineConfig()
    os.makedirs(path, exist_ok=True)

    names = [(n, c, cdb.name2cuis2status[n][c], cdb.name_isupper.get(n, False))
             for n in sorted(cdb.name2cuis) for c in cdb.name2cuis[n]]
    _write(os.path.join(path, "names.parquet"), pa.table({
        "name": [r[0] for r in names], "cui": [r[1] for r in names],
        "status": [r[2] for r in names], "is_upper": [r[3] for r in names],
        "cand_order": [i for i, _ in enumerate(names)]}))

    _write(os.path.join(path, "snames.parquet"),
           pa.table({"sname": sorted(cdb.snames)}))

    cuis = sorted(cdb.cui2names)
    # explicit schema: an all-None column (e.g. preferred_name in a pack
    # with no 'P' names, or group) must still be STRING — pyarrow would
    # infer null/int and any later Spark-side join/coalesce against a
    # populated pack (merge_packs, save_trained_pack) would insert a
    # string->bigint cast and fail on real values
    con_schema = pa.schema([
        ("cui", pa.string()), ("preferred_name", pa.string()),
        ("type_ids", pa.list_(pa.string())), ("names", pa.list_(pa.string())),
        ("snames", pa.list_(pa.string())), ("count_train", pa.int64()),
        ("average_confidence", pa.float64()),
        ("ontologies", pa.list_(pa.string())), ("description", pa.string()),
        ("group", pa.string())])
    _write(os.path.join(path, "concepts.parquet"), pa.table({
        "cui": cuis,
        "preferred_name": [cdb.cui2preferred_name.get(c) for c in cuis],
        "type_ids": [sorted(cdb.cui2type_ids.get(c, ())) for c in cuis],
        "names": [sorted(cdb.cui2names[c]) for c in cuis],
        "snames": [sorted(cdb.cui2snames.get(c, ())) for c in cuis],
        "count_train": [cdb.cui2count_train.get(c, 0) for c in cuis],
        "average_confidence": [cdb.cui2average_confidence.get(c, 0.0) for c in cuis],
        "ontologies": [sorted(cdb.addl_info["cui2ontologies"].get(c, ())) for c in cuis],
        "description": [cdb.addl_info["cui2description"].get(c) for c in cuis],
        "group": [cdb.addl_info["cui2group"].get(c) for c in cuis],
    }, schema=con_schema))

    cv_rows = [(c, ct, v) for c in sorted(cdb.cui2context_vectors)
               for ct, v in sorted(cdb.cui2context_vectors[c].items())]
    # explicit schema: an EMPTY untrained pack must still carry
    # array<double> for vec (inference would write null/int and break
    # the distributed merge in model_ops.save_trained_pack)
    cv_schema = pa.schema([("cui", pa.string()), ("ctx_type", pa.string()),
                           ("vec", pa.list_(pa.float64()))])
    _write(os.path.join(path, "context_vectors.parquet"), pa.table({
        "cui": [r[0] for r in cv_rows], "ctx_type": [r[1] for r in cv_rows],
        "vec": [np.asarray(r[2], dtype=np.float64).tolist() for r in cv_rows]},
        schema=cv_schema))

    _write(os.path.join(path, "token_counts.parquet"), pa.table({
        "token": sorted(cdb.vocab),
        "cnt": [cdb.vocab[t] for t in sorted(cdb.vocab)]}))

    words = sorted(vocab.word2cnt)
    _write(os.path.join(path, "vocab.parquet"), pa.table({
        "word": words, "cnt": [vocab.word2cnt[w] for w in words],
        "vec": [None if vocab.vec(w) is None else vocab.vec(w).tolist()
                for w in words]},
        schema=pa.schema([("word", pa.string()), ("cnt", pa.int64()),
                          ("vec", pa.list_(pa.float64()))])))

    with open(os.path.join(path, "config.json"), "w") as f:
        f.write(cfg.to_json())
    manifest = {"cdb_hash": cdb.content_hash(),
                "config_hash": cfg.content_hash(),
                "weighted_average_factor": cdb.weighted_average_factor}
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def load_pack_config(path: str) -> EngineConfig:
    """Config-only pack read (no map materialization)."""
    with open(os.path.join(path, "config.json")) as f:
        d = json.load(f)
    # restore container types generically from the dataclass defaults so
    # new frozenset/tuple config fields round-trip without loader edits
    import dataclasses
    for fld in dataclasses.fields(EngineConfig):
        if fld.name not in d:
            continue
        default = getattr(EngineConfig(), fld.name)
        if isinstance(default, frozenset):
            d[fld.name] = frozenset(d[fld.name])
        elif isinstance(default, tuple):
            d[fld.name] = tuple(d[fld.name])
    d["stopwords"] = frozenset(d["stopwords"]) if d.get("stopwords") else None
    return EngineConfig(**d)


def is_reference_pack(path: str) -> bool:
    """True when ``path`` is a MedCAT-layout pack (zip or dir with
    cdb.dat) rather than the native columnar layout."""
    import zipfile
    if path.endswith(".zip"):
        with zipfile.ZipFile(path) as zf:
            return any(n.endswith("cdb.dat") for n in zf.namelist())
    return os.path.exists(os.path.join(path, "cdb.dat"))


def load_any_pack(path: str) -> Tuple[CdbModel, VocabModel, EngineConfig]:
    """Dispatch on pack layout: a MedCAT-format pack (zip, or a dir
    containing ``cdb.dat``) loads through sources/reference_pack.py; the
    native columnar layout loads through :func:`load_model_pack`.  This
    is the job-surface entry point (jobs/run_kg.py --model-pack) so a
    MedCAT user can point spark-submit at their existing model pack."""
    is_ref = is_reference_pack(path)
    if path.endswith(".zip") and not is_ref:
        raise ValueError(f"{path}: zip does not contain cdb.dat")
    if is_ref:
        from medcat_spark.sources.reference_pack import load_reference_pack
        cdb, vocab, cfg, _comps = load_reference_pack(
            path, load_components=False)
        return cdb, vocab, cfg
    return load_model_pack(path)


def load_model_pack(path: str) -> Tuple[CdbModel, VocabModel, EngineConfig]:
    cfg = load_pack_config(path)

    cdb = CdbModel()
    t = pq.read_table(os.path.join(path, "names.parquet")).to_pylist()
    for r in sorted(t, key=lambda r: r["cand_order"]):
        cdb.name2cuis.setdefault(r["name"], [])
        if r["cui"] not in cdb.name2cuis[r["name"]]:
            cdb.name2cuis[r["name"]].append(r["cui"])
        cdb.name2cuis2status.setdefault(r["name"], {})[r["cui"]] = r["status"]
        cdb.name_isupper[r["name"]] = r["is_upper"]
    cdb.snames = set(pq.read_table(os.path.join(path, "snames.parquet"))
                     .column("sname").to_pylist())
    for r in pq.read_table(os.path.join(path, "concepts.parquet")).to_pylist():
        c = r["cui"]
        cdb.cui2names[c] = set(r["names"])
        cdb.cui2snames[c] = set(r["snames"])
        cdb.cui2type_ids[c] = set(r["type_ids"])
        if r["preferred_name"] is not None:
            cdb.cui2preferred_name[c] = r["preferred_name"]
        if r["count_train"]:
            cdb.cui2count_train[c] = r["count_train"]
        if r["average_confidence"]:
            cdb.cui2average_confidence[c] = r["average_confidence"]
        if r["ontologies"]:
            cdb.addl_info["cui2ontologies"][c] = set(r["ontologies"])
        if r["description"] is not None:
            cdb.addl_info["cui2description"][c] = r["description"]
        if r["group"] is not None:
            cdb.addl_info["cui2group"][c] = r["group"]
    for r in pq.read_table(os.path.join(path, "context_vectors.parquet")).to_pylist():
        cdb.cui2context_vectors.setdefault(r["cui"], {})[r["ctx_type"]] = \
            np.asarray(r["vec"], dtype=np.float64)
    for r in pq.read_table(os.path.join(path, "token_counts.parquet")).to_pylist():
        cdb.vocab[r["token"]] = r["cnt"]

    with open(os.path.join(path, "manifest.json")) as f:
        cdb.weighted_average_factor = json.load(f).get(
            "weighted_average_factor", 0.0004)

    vocab = VocabModel()
    for r in pq.read_table(os.path.join(path, "vocab.parquet")).to_pylist():
        vocab.add(r["word"], r["cnt"],
                  None if r["vec"] is None else np.asarray(r["vec"]))
    return cdb, vocab, cfg


def model_card(spark, path: str, as_dict: bool = False):
    """The reference's ``get_model_card`` (cat.py:180-212) for a pack:
    CDB stats (reference ``cdb.make_stats``, cdb.py:740-750) computed
    DISTRIBUTIVELY from the pack's parquet tables — a UMLS-scale pack's
    card costs two tiny aggregations, not a full driver load — plus the
    manifest's hashes/stamps and the important config parameters
    (reference utils/helpers.py:15-43)."""
    from pyspark.sql import functions as F

    cfg = load_pack_config(path)
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)

    con = spark.read.parquet(os.path.join(path, "concepts.parquet"))
    trained = F.when(F.col("count_train") > 0, F.col("count_train"))
    cstats = con.agg(
        F.count("*").alias("n_concepts"),
        F.count(trained).alias("n_trained"),
        F.coalesce(F.sum("count_train"), F.lit(0)).alias("total_train"),
        F.coalesce(F.avg(trained), F.lit(0.0)).alias("avg_train")).first()
    n_names = (spark.read.parquet(os.path.join(path, "names.parquet"))
               .select("name").distinct().count())

    card = {
        "Model ID": manifest.get("cdb_hash"),
        "Config hash": manifest.get("config_hash"),
        "Context vectors stamp": manifest.get("context_vectors_stamp"),
        "Merged from": manifest.get("merged_from"),
        "Basic CDB Stats": {
            "Number of concepts": int(cstats["n_concepts"]),
            "Number of names": int(n_names),
            "Number of concepts that received training":
                int(cstats["n_trained"]),
            "Number of seen training examples in total":
                int(cstats["total_train"]),
            "Average training examples per concept":
                float(round(cstats["avg_train"], 6)),
        },
        "Important Parameters": {
            "ner.min_name_len": cfg.min_name_len,
            "ner.upper_case_limit_len": cfg.upper_case_limit_len,
            "linking.similarity_threshold": cfg.similarity_threshold,
            "linking.filters.cuis": len(cfg.filter_cuis),
            "general.spell_check": cfg.spell_check,
            "general.spell_check_len_limit": cfg.spell_check_len_limit,
        },
    }
    return card if as_dict else json.dumps(card, indent=2, sort_keys=False)
