"""Corpus-dedup job for spark-submit — the full fuzzy-dedup decision
(functions/dedup.dedup_clusters: shared shingle pass -> MinHash/LSH
candidates -> bounded Jaccard verify -> connected components -> keeper)
materialized as a parquet table a training pipeline filters on.

  spark-submit --py-files dist/medcat_spark.zip jobs/dedup_corpus.py \
      --docs /data/docs.parquet --out /data/dedup \
      [--min-jaccard 0.2] [--k 3] [--max-bucket-size 2000] \
      [--keepers-only] [--master local[8]]

Writes (doc_id, cluster_id, cluster_size, is_keeper) partitioned by
is_keeper so the downstream training scan prunes to keepers without
reading duplicate rows. Prints one JSON manifest line with the
reduction stats. 100 TB posture: the only corpus-width relations are
the shingle pass and the doc_id->cluster map; candidate work is
LSH-bucket bounded (mega-buckets capped), components iterate on the
pair-node relation only.
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--docs", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--text-col", default="text")
    p.add_argument("--min-jaccard", type=float, default=0.2)
    p.add_argument("--k", type=int, default=3)
    p.add_argument("--n-hashes", type=int, default=4)
    p.add_argument("--bands", type=int, default=2)
    p.add_argument("--max-bucket-size", type=int, default=None)
    p.add_argument("--keepers-only", action="store_true",
                   help="write only the keeper rows (smallest output)")
    p.add_argument("--write-index", action="store_true",
                   help="also write the LSH bucket index (<out>_index) "
                        "for incremental assign_to_clusters runs")
    p.add_argument("--iceberg-delete", default=None, metavar="TABLE",
                   help="apply the keeper decision to this Iceberg "
                        "table: non-keeper doc_ids are committed as ONE "
                        "equality-delete snapshot (merge-on-read; data "
                        "files untouched)")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from medcat_spark.functions.dedup import dedup_clusters
    from medcat_spark.session import get_spark

    spark = get_spark("dedup-corpus", master=args.master)
    docs = spark.read.parquet(args.docs).select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col(args.text_col).alias("text"))
    clusters = dedup_clusters(
        docs, k=args.k, n_hashes=args.n_hashes, bands=args.bands,
        min_jaccard=args.min_jaccard,
        max_bucket_size=args.max_bucket_size).cache()

    n_docs = clusters.count()
    n_keep = clusters.where("is_keeper").count()
    out = clusters.where("is_keeper") if args.keepers_only else clusters
    (out.write.mode("overwrite").partitionBy("is_keeper")
        .parquet(args.out))

    if args.write_index:
        from medcat_spark.functions.dedup import lsh_bucket_index
        (lsh_bucket_index(docs, k=args.k, n_hashes=args.n_hashes,
                          bands=args.bands)
         .write.mode("overwrite").partitionBy("band")
         .parquet(args.out + "_index"))

    delete_snapshot = None
    if args.iceberg_delete:
        # apply the keeper decision as one Iceberg row-level delete
        # snapshot: non-keeper doc_ids become equality-delete files,
        # data files untouched, prior snapshots still time-travelable
        from medcat_spark.sources.iceberg import IcebergTable
        t = IcebergTable.load(args.iceberg_delete)
        key_t = dict((f["name"], f["type"])
                     for f in t.schema()["fields"])["doc_id"]
        keys = clusters.where(~F.col("is_keeper")).select(
            F.col("doc_id").cast(key_t).alias("doc_id"))
        delete_snapshot = t.delete_keys(
            spark, keys, equality_cols=["doc_id"],
            summary_extra={"dedup-min-jaccard": str(args.min_jaccard)})

    print(json.dumps({
        "n_docs": n_docs,
        "n_clusters": n_keep,
        "n_duplicates_dropped": n_docs - n_keep,
        "reduction_pct": round(100.0 * (n_docs - n_keep) / max(n_docs, 1),
                               3),
        "iceberg_delete_snapshot": delete_snapshot,
        "out": args.out}))
    spark.stop()


if __name__ == "__main__":
    main()
