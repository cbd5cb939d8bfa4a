"""Unsupervised model-training job for spark-submit
(reference cat.train, cat.py:620-674).

  spark-submit --py-files dist/medcat_spark.zip jobs/train_unsupervised.py \
      --docs /path/docs.parquet --model-pack /path/pack \
      --out-pack /path/pack_trained [--master local[8]]

Runs the distributed unsupervised trainer (L6 eligibility per entity,
count-weighted mean combine — model_ops.train_unsupervised_spark) over a
documents parquet (flat text or interleaved spans reconstructed), then
writes the updated pack distributively (save_trained_pack — no driver
collect of vectors).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--docs", required=True)
    p.add_argument("--model-pack", required=True)
    p.add_argument("--out-pack", required=True)
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from medcat_spark.model_ops import (save_trained_pack,
                                        train_unsupervised_spark)
    from medcat_spark.pipeline import broadcast_model
    from medcat_spark.session import get_spark
    from medcat_spark.sources.model_pack import load_any_pack

    spark = get_spark("medcat-spark-train-unsup", master=args.master)
    cdb, vocab, cfg = load_any_pack(args.model_pack)
    docs = spark.read.parquet(args.docs)
    if "spans" in docs.columns and "text" not in docs.columns:
        docs = docs.select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.concat_ws(" ", F.transform(
                F.filter("spans", lambda s: s["kind"] == "text"),
                lambda s: s["text"])).alias("text"))

    bc = broadcast_model(spark, cdb, vocab, cfg)
    trained = train_unsupervised_spark(spark, docs, bc, cfg)
    manifest = save_trained_pack(spark, args.out_pack, cdb, vocab,
                                 trained, cfg)
    print(json.dumps({"n_docs": int(docs.count()), **manifest}))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
