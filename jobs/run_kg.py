"""KG-construction job entrypoint for spark-submit.

  spark-submit --py-files dist/medcat_spark.zip jobs/run_kg.py \
      --docs /path/docs.parquet --model-pack /path/pack \
      --out /path/kg --partitions 512 [--max-docs N] [--bucketed 32]

Resumable: re-running with the same --out continues from the last
committed snapshot (anti-join on processed doc_ids).  Build the zip with
``python tools/package.py``.

``--bucketed N`` additionally persists the committed annotations as a
doc_id-bucketed managed table (the Iceberg ``bucket(N, doc_id)``
analogue) and derives the co-occurrence triples from it, so the self-
join runs WITHOUT an Exchange on the join key — the manifest records
the resulting shuffle count as evidence.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--docs", required=True)
    p.add_argument("--model-pack", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--partitions", type=int, default=None)
    p.add_argument("--max-docs", type=int, default=None)
    p.add_argument("--bucketed", type=int, default=None)
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from medcat_spark.checkpoint import read_annotations, resumable_annotate
    from medcat_spark.pipeline import broadcast_model
    from medcat_spark.session import get_spark
    from medcat_spark.sources.model_pack import load_model_pack
    from medcat_spark.triples import cooccurrence_triples, mention_triples

    spark = get_spark("medcat-spark-kg", master=args.master)
    cdb, vocab, cfg = load_model_pack(args.model_pack)
    bc = broadcast_model(spark, cdb, vocab, cfg)
    docs = spark.read.parquet(args.docs)

    manifest = resumable_annotate(spark, docs, bc, args.out,
                                  num_partitions=args.partitions,
                                  max_docs=args.max_docs, config=cfg)
    ann = read_annotations(spark, args.out)
    if ann is not None:
        if args.bucketed:
            from medcat_spark.operators.bucketing import (
                bucketed_cooccurrence, write_annotations_bucketed)
            write_annotations_bucketed(ann, "annotations_bucketed",
                                       num_buckets=args.bucketed)
            banns = spark.table("annotations_bucketed")
            mention_triples(banns, distinct=True).write.mode("overwrite") \
                .parquet(f"{args.out}/triples/mentions")
            cooc = bucketed_cooccurrence(spark, "annotations_bucketed")
            plan = cooc._jdf.queryExecution().executedPlan().toString()
            manifest["bucketed"] = args.bucketed
            manifest["cooc_shuffle_exchanges"] = \
                plan.count("Exchange hashpartitioning")
            cooc.write.mode("overwrite") \
                .parquet(f"{args.out}/triples/cooccurrence")
        else:
            mention_triples(ann, distinct=True).write.mode("overwrite") \
                .parquet(f"{args.out}/triples/mentions")
            # ann is a parquet scan of the committed snapshots: no
            # recompute risk, skip the defensive localCheckpoint
            cooccurrence_triples(ann, materialize=False) \
                .write.mode("overwrite") \
                .parquet(f"{args.out}/triples/cooccurrence")
    print(json.dumps(manifest))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
