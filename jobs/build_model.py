"""Model-creation job for spark-submit — the reference's
utils/model_creator.py create_models flow (CDB from concept source +
vocab from an unsupervised corpus + unsupervised context training),
Spark-first end to end.

  spark-submit --py-files dist/medcat_spark.zip jobs/build_model.py \
      --concepts-csv /path/concepts.csv        # or --snomed-rf2 <dir>
      --train-docs /path/docs.parquet \
      --out-pack /path/pack \
      [--vec-dim 100] [--min-count 2] [--no-word2vec]
      [--w2v-engine ml|sgns] [--master local[8]]

Steps (each distributed):
  1. concept rows (CSV or SNOMED RF2 Terminology dir) → CDB tables
     (cdb_build.build_cdb_tables) → collected broadcast model
  2. corpus word counts (+ pyspark.ml Word2Vec vectors unless
     --no-word2vec) → vocab
  3. unsupervised context-vector training over the corpus
     (model_ops.train_unsupervised_spark)
  4. distributed pack write (model_ops.save_trained_pack)
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    p = argparse.ArgumentParser()
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--concepts-csv")
    src.add_argument("--snomed-rf2")
    p.add_argument("--train-docs", required=True)
    p.add_argument("--out-pack", required=True)
    p.add_argument("--vec-dim", type=int, default=100)
    p.add_argument("--min-count", type=int, default=2)
    p.add_argument("--no-word2vec", action="store_true")
    p.add_argument("--w2v-engine", choices=["ml", "sgns"], default="ml",
                   help="embedding trainer: pyspark.ml Word2Vec "
                        "(hierarchical softmax) or the in-engine numpy "
                        "SGNS (gensim-objective analogue, "
                        "medcat_spark/word2vec.py)")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from medcat_spark.cdb_build import build_cdb_tables, collect_cdb_model
    from medcat_spark.config import EngineConfig
    from medcat_spark.core.model import VocabModel
    from medcat_spark.model_ops import (build_vocab_counts,
                                        build_vocab_word2vec,
                                        save_trained_pack,
                                        train_unsupervised_spark)
    from medcat_spark.pipeline import broadcast_model
    from medcat_spark.session import get_spark

    spark = get_spark("medcat-spark-build", master=args.master)
    cfg = EngineConfig()

    # 1. CDB
    if args.concepts_csv:
        raw = spark.read.csv(args.concepts_csv, header=True)
    else:
        from medcat_spark.sources.ontologies import read_snomed_rf2
        raw = read_snomed_rf2(spark, args.snomed_rf2)["concepts"]
    cdb = collect_cdb_model(build_cdb_tables(raw, cfg), cfg)

    # 2. vocab from the training corpus
    docs = spark.read.parquet(args.train_docs)
    if "spans" in docs.columns and "text" not in docs.columns:
        docs = docs.select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.concat_ws(" ", F.transform(
                F.filter("spans", lambda s: s["kind"] == "text"),
                lambda s: s["text"])).alias("text"))
    counts = build_vocab_counts(docs).where(F.col("cnt") >= args.min_count)
    if args.no_word2vec:
        vecs = None
        joined = counts.withColumn("vec", F.lit(None).cast("array<float>"))
    elif args.w2v_engine == "sgns":
        from medcat_spark.word2vec import train_word2vec_sgns
        vecs = train_word2vec_sgns(
            spark, docs, dim=args.vec_dim, min_count=args.min_count
        ).select("word", F.col("vec").cast("array<float>").alias("vec"))
        joined = counts.join(vecs, "word", "left")
    else:
        vecs = build_vocab_word2vec(docs, dim=args.vec_dim,
                                    min_count=args.min_count)
        joined = counts.join(vecs, "word", "left")
    # model-sized (~800k words at UMLS): fetch as ONE Arrow table and
    # slice vectors out of the flat buffer — no per-Row Python loop
    from medcat_spark.cdb_build import collect_vocab_model_arrow
    vocab = collect_vocab_model_arrow(joined)
    vocab.make_unigram_table()

    # 3 + 4. unsupervised training, distributed pack write
    bc = broadcast_model(spark, cdb, vocab, cfg)
    trained = train_unsupervised_spark(spark, docs, bc, cfg)
    manifest = save_trained_pack(spark, args.out_pack, cdb, vocab,
                                 trained, cfg)
    print(json.dumps({"n_concepts": len(cdb.cui2names),
                      "n_vocab_words": len(vocab.word2cnt),
                      "n_docs": int(docs.count()), **manifest}))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
