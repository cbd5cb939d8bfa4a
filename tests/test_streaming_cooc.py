"""Continuously-maintained Iceberg co-occurrence triples: micro-batch
deltas MERGEd per epoch (IcebergMergeStreamSink), restart-safe, final
table == batch recompute."""

from pyspark.sql import functions as F

from medcat_spark.sources.iceberg import IcebergTable
from medcat_spark.streaming.iceberg_sink import (
    IcebergMergeStreamSink, cooccurrence_delta,
    stream_cooccurrence_to_iceberg)
from medcat_spark.triples import cooccurrence_triples


def _run(spark, src, loc, ckpt):
    stream = (spark.readStream
              .schema("doc_id string, cui string")
              .option("maxFilesPerTrigger", 1)
              .parquet(src))
    sink, q = stream_cooccurrence_to_iceberg(stream, loc, ckpt)
    q.awaitTermination(120)
    return sink


def test_streaming_cooc_matches_batch_and_survives_restart(spark, tmp_path):
    ann1 = spark.createDataFrame(
        [("d1", "A"), ("d1", "B"), ("d1", "A"),          # dup mention
         ("d2", "A"), ("d2", "C"),
         ("d3", "B"), ("d3", "C")],
        "doc_id string, cui string")
    ann2 = spark.createDataFrame(
        [("d4", "A"), ("d4", "B"),                        # touches (A,B)
         ("d5", "D"), ("d5", "A")],                       # new pair
        "doc_id string, cui string")
    src = str(tmp_path / "src")
    loc = str(tmp_path / "cooc")
    ckpt = str(tmp_path / "ckpt")

    # contract (see cooccurrence_delta): a document's annotations land
    # in one micro-batch — the annotate stream maps docs whole; here
    # each ingest writes a single file
    ann1.repartition(1).write.parquet(src)
    _run(spark, src, loc, ckpt)
    t1 = {(r["subj"], r["obj"]): r["n_docs"]
          for r in IcebergTable.load(loc).to_df(spark).collect()}
    assert t1 == {("cui:A", "cui:B"): 1, ("cui:A", "cui:C"): 1,
                  ("cui:B", "cui:C"): 1}

    # restart with the same checkpoint after new data lands: only the
    # new file is processed, merged additively
    ann2.repartition(1).write.mode("append").parquet(src)
    _run(spark, src, loc, ckpt)
    got = {(r["subj"], r["obj"]): r["n_docs"]
           for r in IcebergTable.load(loc).to_df(spark).collect()}
    want = {(r["subj"], r["obj"]): r["n_docs"]
            for r in cooccurrence_triples(
                ann1.unionByName(ann2).withColumn("start", F.lit(0)))
            .collect()}
    assert got == want
    assert got[("cui:A", "cui:B")] == 2          # touched pair summed

    # re-run with no new input: nothing changes (no snapshots beyond
    # what the epochs committed, no double counting)
    n_snaps = len(IcebergTable.load(loc).snapshots())
    _run(spark, src, loc, ckpt)
    assert len(IcebergTable.load(loc).snapshots()) == n_snaps
    got2 = {(r["subj"], r["obj"]): r["n_docs"]
            for r in IcebergTable.load(loc).to_df(spark).collect()}
    assert got2 == want


def test_merge_sink_epoch_idempotence(spark, tmp_path):
    loc = str(tmp_path / "t")
    sink = IcebergMergeStreamSink(loc, key_cols=["k"], sum_col="n",
                                  group_cols=["k"], query_id="q1")
    batch = spark.createDataFrame([("a", 2), ("b", 3)], "k string, n long")
    sink(batch, 0)
    sink(batch, 0)                     # redelivered epoch: skipped
    assert sink.skipped_epochs == 1
    sink(batch, 1)                     # genuine second epoch: merged
    got = {r["k"]: r["n"] for r in
           IcebergTable.load(loc).to_df(spark).collect()}
    assert got == {"a": 4, "b": 6}


def _run_stateful(spark, src, loc, ckpt):
    stream = (spark.readStream
              .schema("doc_id string, cui string")
              .option("maxFilesPerTrigger", 1)
              .parquet(src))
    from medcat_spark.streaming.iceberg_sink import \
        stream_cooccurrence_stateful_to_iceberg
    sink, q = stream_cooccurrence_stateful_to_iceberg(stream, loc, ckpt)
    q.awaitTermination(180)
    return sink


def test_stateful_cooc_handles_doc_split_across_batches(spark, tmp_path):
    # d1's mentions deliberately straggle: A in file1, B in file2, C in
    # file3 — the exact layout that breaks the whole-doc-per-batch
    # contract of the simple delta path
    f1 = spark.createDataFrame([("d1", "A"), ("d2", "A")],
                               "doc_id string, cui string")
    f2 = spark.createDataFrame([("d1", "B"), ("d2", "C"), ("d1", "A")],
                               "doc_id string, cui string")
    f3 = spark.createDataFrame([("d1", "C"), ("d3", "B"), ("d3", "C")],
                               "doc_id string, cui string")
    src = str(tmp_path / "src")
    loc = str(tmp_path / "cooc")
    ckpt = str(tmp_path / "ckpt")

    f1.repartition(1).write.parquet(src)
    f2.repartition(1).write.mode("append").parquet(src)
    _run_stateful(spark, src, loc, ckpt)
    got = {(r["subj"], r["obj"]): r["n_docs"]
           for r in IcebergTable.load(loc).to_df(spark).collect()}
    assert got == {("cui:A", "cui:B"): 1, ("cui:A", "cui:C"): 1}

    # restart from checkpoint: d1's third mention completes (A,C) and
    # (B,C); d3 arrives whole
    f3.repartition(1).write.mode("append").parquet(src)
    _run_stateful(spark, src, loc, ckpt)
    got = {(r["subj"], r["obj"]): r["n_docs"]
           for r in IcebergTable.load(loc).to_df(spark).collect()}
    want = {(r["subj"], r["obj"]): r["n_docs"]
            for r in cooccurrence_triples(
                f1.unionByName(f2).unionByName(f3)
                .withColumn("start", F.lit(0))).collect()}
    assert got == want
    assert got[("cui:A", "cui:C")] == 2      # d1 AND d2
