"""Snapshot checkpointing + resume (S5/S6 analogues).

The reference spills ``part_N.pickle`` outputs plus an ``annotated_ids``
skip-set for resume (cat.py:1403-1421, 1439-1448).  Here the same
protocol is a table-format snapshot commit:

    out_path/snapshots/<id>/
        annotations/      parquet
        lineage/          parquet  (per-partition metrics)
        processed_docs/   parquet  (ALL doc_ids consumed, incl. zero-entity)
        manifest.json     commit marker (written into a tmp dir; the
                          atomic directory rename IS the commit)

Resume = left-anti join of the input docs against the union of committed
``processed_docs`` — exactly the annotated_ids skip-set, but expressed as
a distributed join instead of a driver-side Python set.

On a real deployment this maps 1:1 onto Iceberg snapshots (each commit =
one Iceberg snapshot; lineage rows go to a metrics table; resume reads the
committed snapshot's doc_ids).  Iceberg jars are not available in this
sandbox, so the same semantics are implemented over parquet directories
with atomic-rename commits; the protocol (commit marker last, anti-join
resume, content hashes in the manifest) is identical.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from medcat_spark.config import EngineConfig
from medcat_spark.pipeline import annotate, lineage_metrics


def _snapshot_dirs(out_path: str):
    root = os.path.join(out_path, "snapshots")
    if not os.path.isdir(root):
        return []
    out = []
    for d in sorted(os.listdir(root)):
        full = os.path.join(root, d)
        if not d.startswith("_tmp") and \
                os.path.isfile(os.path.join(full, "manifest.json")):
            out.append(full)
    return out


def committed_doc_ids(spark: SparkSession, out_path: str) -> Optional[DataFrame]:
    dirs = [os.path.join(d, "processed_docs") for d in _snapshot_dirs(out_path)]
    if not dirs:
        return None
    return spark.read.parquet(*dirs).select("doc_id").distinct()


def read_annotations(spark: SparkSession, out_path: str) -> Optional[DataFrame]:
    dirs = [os.path.join(d, "annotations") for d in _snapshot_dirs(out_path)]
    if not dirs:
        return None
    return spark.read.parquet(*dirs)


def read_lineage(spark: SparkSession, out_path: str) -> Optional[DataFrame]:
    dirs = [os.path.join(d, "lineage") for d in _snapshot_dirs(out_path)]
    if not dirs:
        return None
    return spark.read.parquet(*dirs)


def resumable_annotate(spark: SparkSession, docs: DataFrame, bc,
                       out_path: str, num_partitions: Optional[int] = None,
                       max_docs: Optional[int] = None,
                       config: Optional[EngineConfig] = None) -> dict:
    """Annotate only not-yet-committed docs; commit one snapshot.

    Returns the manifest dict (n_docs==0 means nothing left to do).
    ``max_docs`` bounds one commit's work — the checkpoint cadence knob
    (reference: checkpoint every `steps` docs, utils/checkpoint.py:94-110).
    """
    cfg = config or EngineConfig()
    cdb, _vocab, _cfg = bc.value
    committed = committed_doc_ids(spark, out_path)
    todo = docs if committed is None else docs.join(committed, "doc_id", "left_anti")
    if max_docs is not None:
        # Deterministic subset: orderBy before limit (TakeOrderedAndProject,
        # no full sort shuffle) so recomputation cannot pick a different set.
        todo = todo.orderBy("doc_id").limit(max_docs)

    snap_id = f"{int(time.time() * 1000):016d}"
    root = os.path.join(out_path, "snapshots")
    tmp = os.path.join(root, f"_tmp_{snap_id}")
    final = os.path.join(root, snap_id)
    os.makedirs(tmp, exist_ok=True)

    # Materialize the chosen doc_id list FIRST and read it back — the
    # written list (inside the uncommitted tmp dir) is the single source of
    # truth for what this snapshot covers.  Annotation then targets exactly
    # that set, so cache eviction / partition loss between the two writes
    # can never commit doc_ids that were not annotated.
    todo.select("doc_id").write.parquet(os.path.join(tmp, "processed_docs"))
    chosen = spark.read.parquet(os.path.join(tmp, "processed_docs"))
    n_todo = chosen.count()

    manifest = {"snapshot_id": snap_id, "n_docs": int(n_todo),
                "cdb_hash": cdb.content_hash(),
                "config_hash": cfg.content_hash(),
                "created_unix_ms": int(time.time() * 1000)}
    if n_todo == 0:
        import shutil
        shutil.rmtree(tmp)
        manifest["n_annotations"] = 0
        return manifest

    t0 = time.monotonic()
    subset = docs.join(chosen, "doc_id", "left_semi")
    ann = annotate(subset, bc, num_partitions=num_partitions,
                   keep_lineage_cols=True).cache()
    ann.drop("part_id", "batch_us").write.parquet(os.path.join(tmp, "annotations"))
    lineage_metrics(ann).write.parquet(os.path.join(tmp, "lineage"))
    manifest["n_annotations"] = int(ann.count())
    manifest["wall_sec"] = time.monotonic() - t0
    ann.unpersist()

    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    os.rename(tmp, final)  # the commit point
    return manifest
