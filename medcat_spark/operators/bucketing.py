"""Bucketed-table co-location for the KG join stages (SURVEY §4 /
north_rule partitioning devices).

At 100 TB the annotations table is written ONCE and self-joined /
re-joined many times (co-occurrence, relation candidates, eval joins).
Writing it bucketed by the join key makes every later equi-join on that
key shuffle-free: both sides arrive pre-hashed into the same bucket
files, so the plan contains SortMergeJoin WITHOUT Exchange on the
bucketed side(s).

This module is the parquet/warehouse implementation of what the Iceberg
deployment gets from write-ordered bucket partition transforms
(``bucket(N, doc_id)``).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(df: DataFrame, table: str, num_buckets: int,
                   bucket_cols: List[str],
                   sort_cols: Optional[List[str]] = None,
                   mode: str = "overwrite") -> None:
    """Persist ``df`` as a bucketed (+optionally sorted) managed table.

    Drops any prior table AND its warehouse directory first: the default
    in-memory catalog forgets tables across sessions but leaves their
    directories behind, which blocks the next managed-table write.
    """
    import os
    import shutil

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(wh.removeprefix("file:"), table.lower())
    if os.path.isdir(loc):
        shutil.rmtree(loc)
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def write_annotations_bucketed(ann: DataFrame, table: str = "annotations",
                               num_buckets: int = 32) -> None:
    """The production layout for the annotations table: bucketed by
    doc_id (the co-occurrence self-join key) and sorted by (doc_id,
    start) for in-bucket locality."""
    write_bucketed(ann, table, num_buckets, ["doc_id"], ["doc_id", "start"])


def bucketed_cooccurrence(spark: SparkSession,
                          table: str = "annotations") -> DataFrame:
    """Co-occurrence triples from a doc_id-bucketed annotations table:
    the self-join on doc_id needs NO Exchange (bucket co-location); only
    the final (cui_a, cui_b) aggregation shuffles, and that relation is
    orders of magnitude smaller than the annotations."""
    dc = spark.table(table).select("doc_id", "cui").distinct()
    a, b = dc.alias("a"), dc.alias("b")
    pairs = (a.join(b, "doc_id")
             .where(F.col("a.cui") < F.col("b.cui"))
             .select(F.col("a.cui").alias("cui_a"),
                     F.col("b.cui").alias("cui_b")))
    return (pairs.groupBy("cui_a", "cui_b")
            .agg(F.count("*").alias("n_docs"))
            .select(F.concat(F.lit("cui:"), F.col("cui_a")).alias("subj"),
                    F.lit("cooccurs_with").alias("pred"),
                    F.concat(F.lit("cui:"), F.col("cui_b")).alias("obj"),
                    F.col("n_docs")))
