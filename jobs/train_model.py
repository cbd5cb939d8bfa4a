"""Supervised model-training job for spark-submit.

  spark-submit --py-files dist/medcat_spark.zip jobs/train_model.py \
      --mct /path/export.json --model-pack /path/pack \
      --out-pack /path/pack_trained [--master local[8]]

Reads a MedCATtrainer export (S7), runs the distributed supervised
trainer (count-weighted mean combine — see model_ops docstring for the
documented divergence from the reference's sequential anneal), applies
killed-annotation unlinks, and writes an updated model pack.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--mct", required=True)
    p.add_argument("--model-pack", required=True)
    p.add_argument("--out-pack", required=True)
    p.add_argument("--master", default=None)
    p.add_argument("--devalue-others", action="store_true",
                   help="negative-train other CUIs sharing a gold name "
                        "(reference cat.py:790-800)")
    p.add_argument("--no-add-names", action="store_true",
                   help="skip adding gold (cui, value) names to the CDB "
                        "(reference add_and_train_concept adds by default)")
    p.add_argument("--train-from-fp", action="store_true",
                   help="negative-train predicted annotations absent from "
                        "the gold set (reference cat.py:1061-1070)")
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from medcat_spark.model_ops import (add_gold_concepts, save_trained_pack,
                                        train_supervised_spark)
    from medcat_spark.pipeline import broadcast_model
    from medcat_spark.session import get_spark
    from medcat_spark.sources.mct_export import (documents_from_mct,
                                                 read_mct_export)
    from medcat_spark.sources.model_pack import load_any_pack

    spark = get_spark("medcat-spark-train", master=args.master)
    cdb, vocab, cfg = load_any_pack(args.model_pack)
    mct = read_mct_export(spark, args.mct).cache()

    # killed annotations unlink the name from the concept (cat.py:693-728)
    from medcat_spark.core.model import prepare_name
    killed = (mct.where(F.col("killed"))
              .select("cui", "value").distinct().collect())
    for r in killed:
        for name in prepare_name(r["value"], cfg):
            cdb.unlink_name(r["cui"], name)

    # gold names join the dictionary BEFORE training, like the
    # reference's per-annotation add_and_train_concept (cat.py:730-785)
    names_added = 0 if args.no_add_names else add_gold_concepts(cdb, mct, cfg)

    # positives/negatives per the reference training loop
    # (cat.py:1046-1059): every non-killed annotation trains — deleted
    # (annotator-rejected) ones NEGATIVELY; `validated` is not a train
    # gate there (it gates stats only, stats/stats.py)
    ann_cols = ["doc_id", F.col("start").cast("int").alias("start"),
                F.col("end").cast("int").alias("end"), "cui", "value"]
    gold = (mct.where(~F.col("killed") & ~F.col("deleted"))
            .select(*ann_cols))
    neg_gold = (mct.where(~F.col("killed") & F.col("deleted"))
                .select(*ann_cols))
    docs = documents_from_mct(mct)
    bc = broadcast_model(spark, cdb, vocab, cfg)
    # distributed pack write: mean context vectors go straight from the
    # trainer DataFrame into the pack's context_vectors.parquet — no
    # driver collect of vectors (VERDICT r01 finding #3)
    trained = train_supervised_spark(spark, gold, docs, bc, cfg,
                                     devalue_others=args.devalue_others,
                                     train_from_fp=args.train_from_fp,
                                     negative_gold=neg_gold)
    manifest = save_trained_pack(spark, args.out_pack, cdb, vocab,
                                 trained, cfg)
    print(json.dumps({"examples": int(gold.count()),
                      "negative_examples": int(neg_gold.count()),
                      "killed_unlinked": len(killed),
                      "gold_names_added": names_added, **manifest}))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
