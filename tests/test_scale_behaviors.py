"""Scale-behavior invariants: salted repartitioning spreads hot doc_id
prefixes, and annotation output is partition-count invariant."""

from pyspark.sql import functions as F

from medcat_spark.config import EngineConfig
from medcat_spark.pipeline import annotate, broadcast_model, salted_repartition


def test_salted_repartition_spreads_hot_prefix(spark):
    """north_rule: explicit salted repartition on doc_id prefixes — a
    single hot prefix (hot source/date) must land on many partitions,
    not one."""
    docs = spark.createDataFrame(
        [(f"hot_{i:05d}", "x") for i in range(2000)],
        "doc_id string, text string")
    parts = (salted_repartition(docs, 16, prefix_len=4, salt=8)
             .select(F.spark_partition_id().alias("p"))
             .distinct().count())
    assert parts >= 6, f"hot prefix stuck on {parts} partitions"
    # deterministic: same input -> identical partition assignment
    a = (salted_repartition(docs, 16).select(
        "doc_id", F.spark_partition_id().alias("p")).collect())
    b = (salted_repartition(docs, 16).select(
        "doc_id", F.spark_partition_id().alias("p")).collect())
    assert {(r["doc_id"], r["p"]) for r in a} == \
           {(r["doc_id"], r["p"]) for r in b}


def test_annotate_partition_invariance(spark, docs_df, fixture_models):
    """The same corpus annotated at different parallelism produces the
    identical annotation set (resume/retry safety)."""
    cdb, vocab = fixture_models
    bc = broadcast_model(spark, cdb, vocab, EngineConfig())
    key = ["doc_id", "start", "end", "cui", "detected_name"]
    a = {tuple(r) for r in annotate(docs_df, bc, num_partitions=2)
         .select(*key).collect()}
    b = {tuple(r) for r in annotate(docs_df, bc, num_partitions=11)
         .select(*key).collect()}
    assert a == b and a
