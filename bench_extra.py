"""Per-query isolation bench + plan capture (guide §1.1/§1.4/§1.5).

NOT the driver-timed bench (bench.py is frozen) — this harness exists to
attribute time inside each headline query: it labels every job, times
each query with the noop sink where the query is a DataFrame (count()
where bench.py counts, to match the measured methodology), repeats each
N times, and optionally writes .explain("formatted") to plans/r06/.

Usage:
  python bench_extra.py [--plans plans/r06 --suffix _before] [--runs 3]
                        [--queries q1,q15,...] [--events /tmp/sparkevents]

Prints one JSON line per query: {"query": ..., "runs": [...], "best": ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans", default=None,
                    help="directory to write explain('formatted') files")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--queries", default=None,
                    help="comma-separated subset, e.g. q15,q11")
    ap.add_argument("--events", default=None,
                    help="spark event log dir (enables event logging)")
    args = ap.parse_args()

    from medcat_spark.session import fixed_heap_conf, get_spark
    extra = fixed_heap_conf(os.environ.get("BENCH_HEAP", "32g"))
    if args.events:
        os.makedirs(args.events, exist_ok=True)
        extra.update({"spark.eventLog.enabled": "true",
                      "spark.eventLog.dir": args.events})
    spark = get_spark("medcat-spark-bench-extra", master=f"local[{CPUS}]",
                      extra_conf=extra,
                      shuffle_partitions=int(CPUS) if CPUS.isdigit() else 32)
    sel = set(args.queries.split(",")) if args.queries else None

    from pyspark.sql import functions as F

    from medcat_spark import demo
    from medcat_spark.functions import dedup as ddp
    from medcat_spark.functions import similarity as simf
    from medcat_spark.functions import text as txt
    from medcat_spark.triples import cooccurrence_triples, mention_triples

    docs = demo.load_docs(spark, SF_DIR).cache()
    docs.count()
    emb = demo.load_embeddings(spark, SF_DIR)
    nparts = int(CPUS) if CPUS.isdigit() else 32

    # warm-up identical to bench.py
    demo.flagship_annotations(spark, SF_DIR, num_partitions=nparts).count()
    ann = demo.flagship_annotations(spark, SF_DIR, num_partitions=nparts).cache()
    ann.count()

    from medcat_spark.functions.lstm_meta import (lstm_fixture_model,
                                                  meta_annotations_lstm)
    from medcat_spark.functions.meta_model import (meta_annotations_mlp,
                                                   meta_annotations_model,
                                                   negation_fixture_model,
                                                   negation_mlp_fixture_model)
    from medcat_spark.functions.rel_model import (relation_fixture_model,
                                                  relations_model)
    bcm = spark.sparkContext.broadcast(negation_fixture_model())
    bcmlp = spark.sparkContext.broadcast(negation_mlp_fixture_model())
    bclstm = spark.sparkContext.broadcast(lstm_fixture_model())
    bcr = spark.sparkContext.broadcast(relation_fixture_model())

    from medcat_spark.functions.deid import deid_text
    from medcat_spark.functions.ner_model import (ner_fixture_model,
                                                  score_table, tag_spans)
    nm = ner_fixture_model()
    sct = score_table(spark, nm)

    qv = emb.where(F.col("vec_id") == 0).first()["embedding"]

    from medcat_spark.config import EngineConfig
    from medcat_spark.core.model import VocabModel
    from medcat_spark.pipeline import annotate, broadcast_model
    big = (spark.range(20).crossJoin(docs)
           .select(F.concat(F.col("doc_id").cast("string"), F.lit("_"),
                            F.col("id")).alias("doc_id"), "text")
           .repartition(nparts * 4, "doc_id").cache())
    big.count()
    bc = broadcast_model(spark, demo.flagship_cdb(), VocabModel(),
                         EngineConfig())

    import shutil
    import tempfile

    from medcat_spark.sources.iceberg import IcebergTable

    def _iceberg_commit():
        loc = tempfile.mkdtemp(prefix="bextra_ice_") + "/mentions"
        t = IcebergTable.create(loc, mention_triples(
            ann, distinct=True).schema)
        t.append_dataframe(mention_triples(ann, distinct=True))
        n = IcebergTable.load(loc).to_df(spark).count()
        shutil.rmtree(os.path.dirname(loc), ignore_errors=True)
        return n

    # (name, df-factory or callable) — df-factory queries are also
    # explain-captured; callables (q17) are timed only
    queries = {
        "q1_annotate": lambda: demo.flagship_annotations(
            spark, SF_DIR, num_partitions=nparts),
        "q2_mention_triples": lambda: mention_triples(ann, distinct=True),
        "q3_cooccurrence": lambda: cooccurrence_triples(ann, materialize=False),
        "q4_disambiguation": lambda: demo.disamb_annotations(
            spark, SF_DIR, num_partitions=nparts),
        "q5_minhash_sig": lambda: ddp.minhash_signatures(docs),
        "q6_lsh_pairs": lambda: ddp.lsh_candidate_pairs(docs),
        "q7_simhash": lambda: ddp.simhash32(docs),
        "q15_dedup_components": lambda: ddp.dedup_clusters(docs,
                                                           min_jaccard=0.2),
        "q8_text_quality": lambda: txt.text_quality(docs),
        "q9_ann_topk": lambda: simf.cosine_topk(emb, qv, k=20),
        "q11_meta_model": lambda: meta_annotations_model(ann, docs, bcm),
        "q14_meta_mlp": lambda: meta_annotations_mlp(ann, docs, bcmlp),
        "q16_meta_lstm": lambda: meta_annotations_lstm(ann, docs, bclstm),
        "q12_relations": lambda: relations_model(ann, docs, bcr),
        "q13_tagger_deid": lambda: deid_text(
            docs, tag_spans(docs, nm, sct)
            .select("doc_id", "start", "end", F.col("label").alias("cui"))),
        "q10_annotate_sustained": lambda: annotate(big, bc,
                                                   num_partitions=nparts * 4),
    }

    results = []
    for name, make in queries.items():
        if sel and not any(name.startswith(s) for s in sel):
            continue
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            plan = make()._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution
                .ExplainMode.fromString("formatted"))
            with open(os.path.join(args.plans,
                                   f"{name}{args.suffix}.txt"), "w") as f:
                f.write(plan)
        runs = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"{name} run{i}")
            t0 = time.monotonic()
            make().count()
            runs.append(round(time.monotonic() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        rec = {"query": name, "runs": runs, "best": min(runs)}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    if sel is None or "q17" in {s[:3] for s in sel}:
        runs = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"q17_iceberg_commit run{i}")
            t0 = time.monotonic()
            _iceberg_commit()
            runs.append(round(time.monotonic() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        rec = {"query": "q17_iceberg_commit", "runs": runs, "best": min(runs)}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    big.unpersist()
    print(json.dumps({"total_best": round(sum(r["best"] for r in results), 3)}),
          flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
