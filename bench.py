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

    def timed(name, fn):
        t0 = time.monotonic()
        fn()
        timings[name] = round(time.monotonic() - t0, 3)

    # q1: flagship annotate (full NER pipeline, combined dict)
    ann = demo.flagship_annotations(spark, SF_DIR, num_partitions=nparts).cache()
    timed("q1_annotate", lambda: ann.count())
    # q2: KG triples (mentions distinct + co-occurrence agg)
    timed("q2_mention_triples",
          lambda: mention_triples(ann, distinct=True).count())
    timed("q3_cooccurrence", lambda: cooccurrence_triples(ann).count())
    # q4: context-vector disambiguation path
    timed("q4_disambiguation",
          lambda: demo.disamb_annotations(spark, SF_DIR,
                                          num_partitions=nparts).count())
    # q5-q7: dedup family
    timed("q5_minhash_sig", lambda: ddp.minhash_signatures(docs).count())
    timed("q6_lsh_pairs", lambda: ddp.lsh_candidate_pairs(docs).count())
    timed("q7_simhash", lambda: ddp.simhash32(docs).count())
    # q8: text quality
    timed("q8_text_quality", lambda: txt.text_quality(docs).count())
    # q9: ANN top-k
    qv = emb.where(F.col("vec_id") == 0).first()["embedding"]
    timed("q9_ann_topk", lambda: simf.cosine_topk(emb, qv, k=20).collect())

    ann.unpersist()
    docs.unpersist()
    total = round(sum(timings.values()), 3)
    return {"metric": "headline_total", "value": total, "unit": "sec",
            "queries": timings, "sf": SF_DIR.rstrip("/").split("sf")[-1],
            "n_docs": n_docs,
            "docs_per_sec_annotate": round(n_docs / timings["q1_annotate"], 1)}


def main():
    from medcat_spark.session import get_spark
    spark = get_spark("medcat-spark-bench", master=f"local[{CPUS}]",
                      shuffle_partitions=int(CPUS) if CPUS.isdigit() else 32)
    try:
        result = run(spark)
    finally:
        spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
