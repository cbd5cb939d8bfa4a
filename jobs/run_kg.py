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
    p.add_argument("--dedup", action="store_true",
                   help="fuzzy-dedup the corpus first and annotate only "
                        "cluster keepers (functions/dedup.dedup_clusters)")
    p.add_argument("--dedup-min-jaccard", type=float, default=0.2)
    p.add_argument("--master", default=None)
    p.add_argument("--sink", choices=("parquet", "iceberg"),
                   default="parquet",
                   help="snapshot/triple store: the parquet snapshot "
                        "protocol (default) or real Iceberg v2 tables "
                        "(pure-Python writer, sources/iceberg.py)")
    p.add_argument("--meta", action="store_true",
                   help="run the pack's meta_* components (LSTM heads "
                        "from torch-format checkpoints) over the "
                        "committed annotations -> out/meta_annotations")
    p.add_argument("--relations", action="store_true",
                   help="run the pack's rel_* component (BERT/LLaMA/"
                        "ModernBERT pair classifier) over the committed "
                        "annotations -> out/triples/relations")
    p.add_argument("--export-rdf", action="store_true",
                   help="serialize the co-occurrence triples as RDF "
                        "N-Triples shards (RDF-star evidence counts) "
                        "-> out/rdf")
    p.add_argument("--embeddings", choices=("fastrp", "transe"),
                   default=None,
                   help="materialize node embeddings over the "
                        "co-occurrence graph -> out/embeddings")
    p.add_argument("--link-prediction", action="store_true",
                   help="score missing-edge candidates (common-"
                        "neighbors/Jaccard/Adamic-Adar on the kNN "
                        "affinity graph) -> out/link_candidates")
    args = p.parse_args(argv)

    from medcat_spark.checkpoint import read_annotations, resumable_annotate
    from medcat_spark.pipeline import broadcast_model
    from medcat_spark.session import get_spark
    from medcat_spark.sources.model_pack import (is_reference_pack,
                                                 load_model_pack)
    from medcat_spark.triples import cooccurrence_triples, mention_triples

    spark = get_spark("medcat-spark-kg", master=args.master)
    # ONE pack load: components come along when --meta asks for them
    comps: dict = {}
    is_ref = is_reference_pack(args.model_pack)
    if args.model_pack.endswith(".zip") and not is_ref:
        raise ValueError(f"{args.model_pack}: zip does not contain cdb.dat")
    if is_ref:
        from medcat_spark.sources.reference_pack import load_reference_pack
        cdb, vocab, cfg, comps = load_reference_pack(
            args.model_pack,
            load_components=args.meta or args.relations)
    else:
        cdb, vocab, cfg = load_model_pack(args.model_pack)
        if args.meta or args.relations:
            # columnar packs can carry component dirs too (written by
            # jobs/train_model.py --train-meta); scan the same way
            from medcat_spark.sources.reference_pack import (
                load_component_dirs)
            comps = load_component_dirs(args.model_pack)
            if len(comps) == 1:  # only _skipped, nothing found
                comps["_skipped"].append(
                    (args.model_pack, "columnar pack: no component dirs"))
    bc = broadcast_model(spark, cdb, vocab, cfg)
    docs = spark.read.parquet(args.docs)

    if args.dedup:
        # annotate only cluster keepers: for interleaved docs the dedup
        # text is the concatenated text spans (JVM expression — the same
        # content the annotate kernel reconstructs)
        from pyspark.sql import functions as F

        from medcat_spark.functions.dedup import dedup_clusters
        if "spans" in docs.columns:
            dd = docs.select(
                "doc_id",
                F.concat_ws(" ", F.transform(
                    F.filter("spans", lambda s: s["kind"] == "text"),
                    lambda s: s["text"])).alias("text"))
        else:
            dd = docs.select("doc_id", "text")
        keepers = (dedup_clusters(dd,
                                  min_jaccard=args.dedup_min_jaccard)
                   .where("is_keeper").select("doc_id"))
        n_before = docs.count()
        docs = docs.join(keepers, "doc_id")
        n_after = docs.count()
        dedup_stats = {"dedup_docs_in": n_before,
                       "dedup_keepers": n_after,
                       "dedup_dropped": n_before - n_after}
    else:
        dedup_stats = {}

    if args.sink == "iceberg":
        from medcat_spark.sources.iceberg import (IcebergKgSink,
                                                  resumable_annotate_iceberg)
        manifest = resumable_annotate_iceberg(
            spark, docs, bc, args.out, num_partitions=args.partitions,
            max_docs=args.max_docs, config=cfg)
        ann = IcebergKgSink(args.out).read_annotations(spark)
    else:
        manifest = resumable_annotate(spark, docs, bc, args.out,
                                      num_partitions=args.partitions,
                                      max_docs=args.max_docs, config=cfg)
        ann = read_annotations(spark, args.out)
    if args.sink == "iceberg" and ann is not None:
        # the KG triple tables themselves are Iceberg (REPLACE snapshot
        # per run: recomputed from all committed annotations)
        from medcat_spark.sources.iceberg import overwrite_table
        overwrite_table(f"{args.out}/triples/mentions",
                        mention_triples(ann, distinct=True))
        overwrite_table(f"{args.out}/triples/cooccurrence",
                        cooccurrence_triples(ann, materialize=False))
    elif ann is not None:
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
    meta_stats = {}

    def _docs_with_text():
        # JVM twin of core/docs.reconstruct_text: each text span PLACED
        # at its offset, gaps space-filled — annotation char offsets
        # only align against this exact reconstruction (shared by the
        # --meta and --relations scorers)
        from pyspark.sql import functions as F
        if "spans" not in docs.columns or "text" in docs.columns:
            return docs
        return docs.select(
            "doc_id",
            F.aggregate(
                F.filter("spans", lambda s: (s["kind"] == "text")
                         & s["text"].isNotNull()),
                F.lit(""),
                lambda acc, s: F.concat(
                    F.rpad(acc, F.greatest(F.length(acc), s["offset"]),
                           " "),
                    s["text"])).alias("text"))

    if (args.meta or args.relations) and comps.get("_skipped"):
        meta_stats["meta_skipped"] = [c[0] for c in comps["_skipped"]]
        meta_stats["skip_reasons"] = {c[0]: c[1]
                                      for c in comps["_skipped"]}
    if args.meta and ann is not None:
        from medcat_spark.functions.lstm_meta import meta_annotations_lstm
        src = _docs_with_text()
        # meta heads only: rel_*/trf_* components load under their
        # prefixed names and are NOT meta-annotation scorers
        meta_comps = {k: v for k, v in comps.items()
                      if k != "_skipped"
                      and not k.startswith(("rel_", "trf_"))}
        metas = None
        for name, model in sorted(meta_comps.items()):
            cur = meta_annotations_lstm(
                ann, src, spark.sparkContext.broadcast(model),
                meta_name=name)
            metas = cur if metas is None else metas.unionByName(cur)
        if metas is not None:
            metas.write.mode("overwrite") \
                .parquet(f"{args.out}/meta_annotations")
            meta_stats["n_meta_annotations"] = \
                spark.read.parquet(f"{args.out}/meta_annotations").count()
            meta_stats["meta_components"] = sorted(meta_comps)
    if args.relations and ann is not None:
        from medcat_spark.functions.bert_np import relations_bert
        rel_comps = {k: v for k, v in comps.items()
                     if k.startswith("rel_")}
        if not rel_comps:
            meta_stats["relations_skipped"] = (
                "no loadable rel_* component in pack"
                + (" (see skip_reasons)" if comps.get("_skipped") else ""))
        else:
            name, model = sorted(rel_comps.items())[0]
            if len(rel_comps) > 1:
                meta_stats["relation_components_unused"] = sorted(
                    rel_comps)[1:]
            rel = relations_bert(
                ann, _docs_with_text(),
                spark.sparkContext.broadcast(model))
            rel.write.mode("overwrite") \
                .parquet(f"{args.out}/triples/relations")
            meta_stats["n_relation_triples"] = spark.read.parquet(
                f"{args.out}/triples/relations").count()
            meta_stats["relation_component"] = name
    if ann is not None and (args.export_rdf or args.embeddings
                            or args.link_prediction):
        cooc = cooccurrence_triples(ann)     # shared by the consumers
        if args.export_rdf:
            from medcat_spark.sources.rdf import write_ntriples
            write_ntriples(cooc, f"{args.out}/rdf")
            meta_stats["rdf_statements"] = \
                spark.read.text(f"{args.out}/rdf").count()
        if args.embeddings:
            from medcat_spark.functions.graph import (fastrp_embeddings,
                                                      transe_train)
            emb = (fastrp_embeddings(cooc, dim=8)
                   if args.embeddings == "fastrp"
                   else transe_train(cooc, dim=8, iterations=2))
            emb.write.mode("overwrite") \
                .parquet(f"{args.out}/embeddings")
            meta_stats["embedding_rows"] = spark.read.parquet(
                f"{args.out}/embeddings").count()
            meta_stats["embedding_method"] = args.embeddings
        if args.link_prediction:
            from medcat_spark.functions.graph import (knn_graph,
                                                      link_prediction)
            link_prediction(knn_graph(cooc, k=2)) \
                .write.mode("overwrite") \
                .parquet(f"{args.out}/link_candidates")
            meta_stats["link_candidates"] = spark.read.parquet(
                f"{args.out}/link_candidates").count()
    print(json.dumps({**manifest, **dedup_stats, **meta_stats}))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
