"""End-to-end training-data preparation for spark-submit — the full
published cleaning stack as ONE resumable job over a document table:

  quality/lang gates (C4-style) -> Gopher repetition gates ->
  [C4 line rules] -> [cross-doc paragraph dedup] ->
  LM perplexity filter (stupid-backoff, trained on the corpus) ->
  fuzzy MinHash/LSH dedup keeper -> [benchmark decontamination] ->
  [temperature-scaled domain mixing] -> [concat-and-chunk packing]

Every bracketed stage is opt-in by flag; every stage logs survivors
into the final one-line JSON manifest.  Output is the surviving
(doc_id, text, ...) table as parquet or an Iceberg v2 table
(--sink iceberg), plus <out>_packed when --ctx-len is given.

  spark-submit --py-files dist/medcat_spark.zip jobs/prepare_corpus.py \
      --docs /data/docs.parquet --out /data/clean \
      [--langs en] [--gopher] [--c4] [--paragraph-dedup] \
      [--lm-threshold -6.0] [--fuzzy] [--benchmark /data/bench.parquet] \
      [--mix-alpha 0.5 --mix-frac 0.5] [--ctx-len 2048] \
      [--sink iceberg] [--master local[8]]

100 TB posture: each stage is the already-audited operator (one
corpus-keyed shuffle or pure codegen; broadcast small sides); stages
chain through persisted boundaries so no stage recomputes its
predecessors, and per-stage counts ride the same persisted data.  The
LM count tables and the mixing-rate/benchmark-gram tables are
vocab-/domain-sized broadcasts.
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--docs", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--text-col", default="text")
    p.add_argument("--langs", default=None,
                   help="comma list for the language allowlist "
                        "(needs a lang column); omit to skip")
    p.add_argument("--min-tokens", type=int, default=10)
    p.add_argument("--max-tokens", type=int, default=100_000)
    p.add_argument("--gopher", action="store_true")
    p.add_argument("--c4", action="store_true",
                   help="C4 line/page rules (rewrites text)")
    p.add_argument("--paragraph-dedup", action="store_true",
                   help="cross-doc paragraph dedup (rewrites text)")
    p.add_argument("--lm-threshold", type=float, default=None,
                   help="stupid-backoff avg-logprob gate; omit to skip")
    p.add_argument("--clf-seed", default=None,
                   help="parquet of high-quality seed docs (text col); "
                        "trains the GPT-3-style LR quality classifier")
    p.add_argument("--clf-threshold", type=float, default=None,
                   help="absolute clf_score cutoff")
    p.add_argument("--clf-keep-frac", type=float, default=0.5,
                   help="keep the top fraction by clf_score (used when "
                        "--clf-threshold is not given; cutoff via "
                        "approxQuantile)")
    p.add_argument("--fuzzy", action="store_true",
                   help="MinHash/LSH fuzzy-dedup keeper filter")
    p.add_argument("--min-jaccard", type=float, default=0.2)
    p.add_argument("--benchmark", default=None,
                   help="parquet with a text column; drops docs sharing "
                        "any 8-gram with it")
    p.add_argument("--mix-alpha", type=float, default=None,
                   help="temperature mixing exponent (needs source col)")
    p.add_argument("--mix-frac", type=float, default=0.5)
    p.add_argument("--ctx-len", type=int, default=None,
                   help="also write <out>_packed chunk map")
    p.add_argument("--sink", choices=("parquet", "iceberg"),
                   default="parquet")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from medcat_spark.session import get_spark

    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark("prepare-corpus", master=args.master)
    docs = spark.read.parquet(args.docs)
    metrics = {"input_docs": docs.count()}

    def stage(df, name):
        # localCheckpoint cuts lineage at every stage boundary: the
        # logical plan would otherwise nest ALL previous stages (8 deep
        # with windows and exploded joins) and planning cost — not data
        # — becomes the bottleneck.  Same move dedup_clusters makes
        # between component-iteration rounds.
        df = df.localCheckpoint()
        metrics[name] = df.count()
        return df

    # 1. quality + language + exact-dedup keeper (corpus_clean)
    from medcat_spark.functions.text import c4_clean, corpus_clean
    langs = tuple(args.langs.split(",")) if args.langs else ()
    has_lang = "lang" in docs.columns
    base_cols = [c for c in docs.columns]
    cleaned = corpus_clean(
        docs if has_lang else docs.withColumn("lang", F.lit("und")),
        allow_langs=langs if (langs and has_lang) else None,
        min_tokens=args.min_tokens, max_tokens=args.max_tokens,
        text_col=args.text_col)
    # corpus_clean projects its own columns; rejoin any extras (source…)
    extras = [c for c in base_cols
              if c not in cleaned.columns and c != args.text_col]
    if extras:
        cleaned = cleaned.join(docs.select("doc_id", *extras), "doc_id")
    docs = stage(cleaned, "after_quality_dedup")

    # 2. Gopher repetition/quality gates
    if args.gopher:
        from medcat_spark.functions.gopher import gopher_gate
        gates = gopher_gate(docs, text_col=args.text_col) \
            .select("doc_id", "gopher_pass")
        docs = stage(docs.join(gates, "doc_id")
                     .where(F.col("gopher_pass").cast("int") == 1)
                     .drop("gopher_pass"), "after_gopher")

    # 3. C4 line rules (page gate + rewritten text)
    if args.c4:
        c4 = c4_clean(docs, text_col=args.text_col) \
            .select("doc_id", "c4_text", "c4_pass")
        docs = stage(docs.join(c4, "doc_id")
                     .where(F.col("c4_pass") == 1)
                     .drop(args.text_col, "c4_pass")
                     .withColumnRenamed("c4_text", args.text_col),
                     "after_c4")

    # 4. cross-doc paragraph dedup (rewrites text)
    if args.paragraph_dedup:
        from medcat_spark.functions.dedup import paragraph_dedup
        pd_ = paragraph_dedup(docs, text_col=args.text_col) \
            .select("doc_id", "clean_text")
        docs = stage(docs.join(pd_, "doc_id")
                     .where(F.length("clean_text") > 0)
                     .drop(args.text_col)
                     .withColumnRenamed("clean_text", args.text_col),
                     "after_paragraph_dedup")

    # 5. LM perplexity filter
    if args.lm_threshold is not None:
        from medcat_spark.functions.lm import lm_gate
        gate = lm_gate(docs.select("doc_id", args.text_col),
                       threshold=args.lm_threshold,
                       text_col=args.text_col) \
            .select("doc_id", "lm_pass", "avg_logprob")
        docs = stage(docs.join(gate, "doc_id")
                     .where(F.col("lm_pass") == 1)
                     .drop("lm_pass"), "after_lm")

    # 5b. classifier-based quality selection (GPT-3 style)
    if args.clf_seed:
        from medcat_spark.functions.selection import (
            quality_classifier_scores)
        seed = spark.read.parquet(args.clf_seed)
        # train on corpus ∪ seed so the positives carry label 1
        union = docs.select("doc_id", args.text_col).unionByName(
            seed.select((F.col("doc_id") + F.lit(10 ** 15))
                        .alias("doc_id"), args.text_col))
        scores = quality_classifier_scores(
            union, union.where(F.col("doc_id") >= 10 ** 15),
            text_col=args.text_col) \
            .where(F.col("doc_id") < 10 ** 15)
        if args.clf_threshold is not None:
            cut = args.clf_threshold
        else:
            scores = scores.localCheckpoint()
            cut = scores.approxQuantile(
                "clf_score", [1.0 - args.clf_keep_frac], 0.001)[0]
            metrics["clf_cutoff"] = cut
        clf = scores.where(F.col("clf_score") >= cut).select("doc_id")
        docs = stage(docs.join(clf, "doc_id"), "after_classifier")

    # 6. fuzzy dedup keeper
    if args.fuzzy:
        from medcat_spark.functions.dedup import dedup_clusters
        keep = dedup_clusters(
            docs.select(F.col("doc_id").cast("string").alias("doc_id"),
                        F.col(args.text_col).alias("text")),
            min_jaccard=args.min_jaccard) \
            .where(F.col("is_keeper")) \
            .select(F.col("doc_id").cast(docs.schema["doc_id"].dataType)
                    .alias("doc_id"))
        docs = stage(docs.join(keep, "doc_id"), "after_fuzzy_dedup")

    # 7. benchmark decontamination
    if args.benchmark:
        from medcat_spark.functions.lm import decontaminate
        bench = spark.read.parquet(args.benchmark)
        dec = decontaminate(docs, bench, n=8, text_col=args.text_col) \
            .where(F.col("contaminated") == 0).select("doc_id")
        docs = stage(docs.join(dec, "doc_id"), "after_decontaminate")

    # 8. temperature-scaled domain mixing
    if args.mix_alpha is not None:
        from medcat_spark.functions.selection import temperature_mix
        kept = temperature_mix(docs, alpha=args.mix_alpha,
                               target_frac=args.mix_frac) \
            .where(F.col("kept") == 1).select("doc_id")
        docs = stage(docs.join(kept, "doc_id"), "after_mix")

    # write survivors
    if args.sink == "iceberg":
        from medcat_spark.sources.iceberg import IcebergTable
        if IcebergTable.exists(args.out):
            table = IcebergTable.load(args.out)
        else:
            table = IcebergTable.create(args.out, docs.schema)
        snap = table.append_dataframe(
            docs, summary_extra={"job": "prepare_corpus"})
        metrics["iceberg_snapshot"] = snap
    else:
        docs.write.mode("overwrite").parquet(args.out)

    # 9. packing map
    if args.ctx_len:
        from medcat_spark.functions.lm import pack_sequences
        packed = pack_sequences(docs.select("doc_id", args.text_col),
                                ctx_len=args.ctx_len,
                                text_col=args.text_col)
        packed.write.mode("overwrite").parquet(args.out + "_packed")
        metrics["packed_chunks"] = \
            spark.read.parquet(args.out + "_packed") \
            .agg(F.countDistinct("chunk_id")).first()[0]

    metrics["output_docs"] = metrics[
        [k for k in metrics if k.startswith("after_")][-1]
        if any(k.startswith("after_") for k in metrics) else "input_docs"]
    print(json.dumps(metrics))
    if owns_session:
        spark.stop()
    return metrics


if __name__ == "__main__":
    main()
