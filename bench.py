"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...},
   "sf": ..., "docs_per_sec": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def run(spark) -> dict:
    from pyspark.sql import functions as F

    from medcat_spark import demo
    from medcat_spark.functions import dedup as ddp
    from medcat_spark.functions import similarity as simf
    from medcat_spark.functions import text as txt
    from medcat_spark.triples import cooccurrence_triples, mention_triples

    docs = demo.load_docs(spark, SF_DIR).cache()
    n_docs = docs.count()  # also warms the cache/JVM
    emb = demo.load_embeddings(spark, SF_DIR)
    nparts = int(CPUS) if CPUS.isdigit() else 32

    timings: dict[str, float] = {}

    def timed(name, fn, runs: int = 2):
        # best-of-N: the shared-host VM shows up to 4x episode noise
        # (see BENCH/BASELINE.md); min is the least-interfered sample
        best = None
        for _ in range(runs):
            t0 = time.monotonic()
            fn()
            dt = time.monotonic() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)

    # q1: flagship annotate (full NER pipeline, combined dict); one
    # warm-up materialization first so q1 measures the pipeline, not
    # Python-worker/JIT startup; each timed run recomputes (no cache)
    demo.flagship_annotations(spark, SF_DIR, num_partitions=nparts).count()
    timed("q1_annotate", lambda: demo.flagship_annotations(
        spark, SF_DIR, num_partitions=nparts).count())
    ann = demo.flagship_annotations(spark, SF_DIR, num_partitions=nparts).cache()
    ann.count()
    # q2: KG triples (mentions distinct + co-occurrence agg)
    timed("q2_mention_triples",
          lambda: mention_triples(ann, distinct=True).count())
    # ann is cached: skip the defensive localCheckpoint (no recompute
    # risk; measures the join+agg, not checkpoint I/O)
    timed("q3_cooccurrence",
          lambda: cooccurrence_triples(ann, materialize=False).count())
    # q4: context-vector disambiguation path
    timed("q4_disambiguation",
          lambda: demo.disamb_annotations(spark, SF_DIR,
                                          num_partitions=nparts).count())
    # q5-q7: dedup family
    timed("q5_minhash_sig", lambda: ddp.minhash_signatures(docs).count())
    timed("q6_lsh_pairs", lambda: ddp.lsh_candidate_pairs(docs).count())
    timed("q7_simhash", lambda: ddp.simhash32(docs).count())
    # q15: full fuzzy-dedup decision (LSH candidates -> bounded Jaccard
    # verify -> connected components -> per-doc keeper flag)
    timed("q15_dedup_components",
          lambda: ddp.dedup_clusters(docs, min_jaccard=0.2).count())
    # q8: text quality
    timed("q8_text_quality", lambda: txt.text_quality(docs).count())
    # q9: ANN top-k
    qv = emb.where(F.col("vec_id") == 0).first()["embedding"]
    timed("q9_ann_topk", lambda: simf.cosine_topk(emb, qv, k=20).collect())

    # q11: MetaCAT-analogue trained scorer (Arrow-batched, broadcast
    # model, one tokenize per doc for all its entities)
    from medcat_spark.functions.meta_model import (meta_annotations_model,
                                                   negation_fixture_model)
    bcm = spark.sparkContext.broadcast(negation_fixture_model())
    timed("q11_meta_model",
          lambda: meta_annotations_model(ann, docs, bcm).count())

    # q14: NONLINEAR meta classifier — padded batch MLP forward through
    # the same broadcast + mapInPandas plumbing (torch-shape proof)
    from medcat_spark.functions.meta_model import (meta_annotations_mlp,
                                                   negation_mlp_fixture_model)
    bcmlp = spark.sparkContext.broadcast(negation_mlp_fixture_model())
    timed("q14_meta_mlp",
          lambda: meta_annotations_mlp(ann, docs, bcmlp).count())

    # q16: REAL LSTM meta head ingested from a torch-format checkpoint
    # (pure-numpy reader + packed-sequence LSTM forward; round 4)
    from medcat_spark.functions.lstm_meta import (lstm_fixture_model,
                                                  meta_annotations_lstm)
    bclstm = spark.sparkContext.broadcast(lstm_fixture_model())
    timed("q16_meta_lstm",
          lambda: meta_annotations_lstm(ann, docs, bclstm).count())

    # q12: RelCAT-analogue entity-pair classifier
    from medcat_spark.functions.rel_model import (relation_fixture_model,
                                                  relations_model)
    bcr = spark.sparkContext.broadcast(relation_fixture_model())
    timed("q12_relations", lambda: relations_model(ann, docs, bcr).count())

    # q13: all-JVM trained token tagger + DeID splice composition
    from medcat_spark.functions.deid import deid_text
    from medcat_spark.functions.ner_model import (ner_fixture_model,
                                                  score_table, tag_spans)
    nm = ner_fixture_model()
    sct = score_table(spark, nm)
    timed("q13_tagger_deid", lambda: deid_text(
        docs, tag_spans(docs, nm, sct)
        .select("doc_id", "start", "end", F.col("label").alias("cui"))
    ).count())

    # q10: sustained annotate throughput over a 20x-replicated corpus
    # (the raw sf corpus is small enough to be overhead-dominated)
    from medcat_spark.config import EngineConfig
    from medcat_spark.core.model import VocabModel
    from medcat_spark.pipeline import annotate, broadcast_model
    big = (spark.range(20).crossJoin(docs)
           .select(F.concat(F.col("doc_id").cast("string"), F.lit("_"),
                            F.col("id")).alias("doc_id"), "text")
           .repartition(nparts * 4, "doc_id").cache())
    n_big = big.count()
    bc = broadcast_model(spark, demo.flagship_cdb(), VocabModel(),
                         EngineConfig())
    annotate(big, bc, num_partitions=nparts * 4).count()  # warm-up
    timed("q10_annotate_sustained",
          lambda: annotate(big, bc, num_partitions=nparts * 4).count())
    big.unpersist()

    # q17: Iceberg snapshot commit + metadata-planned read-back of the
    # mention triples (the north rule's materialization target; cost =
    # parquet write + avro manifest + metadata commit + planned scan)
    import shutil
    import tempfile
    from medcat_spark.sources.iceberg import IcebergTable

    def _iceberg_commit():
        loc = tempfile.mkdtemp(prefix="bench_ice_") + "/mentions"
        t = IcebergTable.create(loc, mention_triples(
            ann, distinct=True).schema)
        t.append_dataframe(mention_triples(ann, distinct=True))
        n = IcebergTable.load(loc).to_df(spark).count()
        shutil.rmtree(os.path.dirname(loc), ignore_errors=True)
        return n
    timed("q17_iceberg_commit", _iceberg_commit)

    ann.unpersist()
    docs.unpersist()
    total = round(sum(timings.values()), 3)
    # host-health stamp: first-touch fault latency for a fresh 133 MB
    # buffer and the steal counter — this box shows multi-hour hypervisor
    # degradation episodes (4-12 MB/s page backing, see
    # BENCH/host_health.jsonl) that inflate EVERY timing; a reader
    # comparing rounds needs the run's own context. Clean baseline <0.1s.
    import numpy as _np
    import time as _t
    _t0 = _t.monotonic()
    _buf = _np.ones((20000, 26, 32))
    first_touch = round(_t.monotonic() - _t0, 2)
    del _buf
    # the in-process stamp above now runs with the engine's THP fix
    # (session.tune_allocator) and stays clean even during host
    # degradation episodes; this subprocess probe measures the RAW
    # hugepage-fault path so the bench file still records host state
    # (r3/r4 root cause: MADV_HUGEPAGE faults at 50-100x during
    # episodes)
    import subprocess as _sp
    import sys as _sys
    _env = {k: v for k, v in os.environ.items()
            if k != "NUMPY_MADVISE_HUGEPAGE"}
    try:
        _p = _sp.run(
            [_sys.executable, "-c",
             "import numpy,time;t=time.monotonic();"
             "a=numpy.ones((20000,26,32));"
             "print(round(time.monotonic()-t,2))"],
            capture_output=True, text=True, env=_env, timeout=600)
        first_touch_huge = float(_p.stdout.strip() or -1)
    except (OSError, ValueError, _sp.TimeoutExpired):
        first_touch_huge = None
    try:
        with open("/proc/stat") as _f:
            _v = [int(x) for x in _f.readline().split()[1:]]
        steal_cum_pct = round(100.0 * _v[7] / max(sum(_v), 1), 3)
    except (OSError, IndexError):
        steal_cum_pct = None
    out = {"metric": "headline_total", "value": total, "unit": "sec",
           "queries": timings, "sf": SF_DIR.rstrip("/").split("sf")[-1],
           "host_first_touch_133mb_sec": first_touch,
           "host_first_touch_hugepage_sec": first_touch_huge,
           "host_steal_cum_pct": steal_cum_pct,
           "n_docs": n_docs,
           "docs_per_sec_annotate": round(n_docs / timings["q1_annotate"], 1),
           "docs_per_sec_sustained": round(
               n_big / timings["q10_annotate_sustained"], 1)}
    # surface the recorded N->4N scaling evidence (BASELINE.md protocol)
    scaling_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "BENCH", "scaling.json")
    if os.path.exists(scaling_path):
        with open(scaling_path) as f:
            pairs = json.load(f).get("pairs", {})
        for name, p in pairs.items():
            out[f"scaling_eff_{name}"] = p.get("efficiency_median")
            # steal/first-touch gate evidence (tools/scaling_bench.py):
            # n_clean == 0 means every round ran under measured host
            # interference — the number above is then the ungated
            # fallback, not criterion-quality evidence
            if p.get("gate") is not None:
                out[f"scaling_gate_{name}"] = {
                    "n_clean": p["gate"].get("n_clean"),
                    "n_total": p["gate"].get("n_total")}
    return out


def main():
    from medcat_spark.session import get_spark
    # fixed pre-touched heap: at local[32] a growable heap costs 298 s
    # of GC + 820k heap-expansion faults on this job shape
    # (BENCH/stage_attribution.json); A/B'd 9.6k -> 43.2k docs/s on the
    # 32-core scaling leg in the same host window
    from medcat_spark.session import fixed_heap_conf
    spark = get_spark("medcat-spark-bench", master=f"local[{CPUS}]",
                      extra_conf=fixed_heap_conf(
                          os.environ.get("BENCH_HEAP", "32g")),
                      shuffle_partitions=int(CPUS) if CPUS.isdigit() else 32)
    try:
        result = run(spark)
    finally:
        spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
