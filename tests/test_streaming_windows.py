"""Streaming windowed aggs (watermark), session windows, and the
applyInPandasWithState custom stateful operator."""

import time

from pyspark.sql import functions as F

from medcat_spark.streaming.windows import (sessionized_counts,
                                            stateful_cui_totals,
                                            windowed_mention_counts)


def _write_parquet(spark, path, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("append").parquet(path)


def _run_available_now(df, query_name):
    q = (df.writeStream.format("memory").queryName(query_name)
         .outputMode("complete" if query_name != "totals" else "update")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    return q


def test_windowed_counts_with_watermark(spark, tmp_path):
    src = str(tmp_path / "ann")
    _write_parquet(spark, src,
                   [("d1", "C1", "2026-01-01 10:05:00"),
                    ("d2", "C1", "2026-01-01 10:55:00"),
                    ("d3", "C2", "2026-01-01 11:05:00")],
                   "doc_id string, cui string, ts_s string")
    stream = (spark.readStream.schema("doc_id string, cui string, ts_s string")
              .parquet(src)
              .withColumn("ts", F.col("ts_s").cast("timestamp")))
    out = windowed_mention_counts(stream, window="1 hour")
    _run_available_now(out, "win_counts")
    rows = {(str(r["window_start"]), r["cui"]): r["n_mentions"]
            for r in spark.sql("select * from win_counts").collect()}
    assert rows[("2026-01-01 10:00:00", "C1")] == 2
    assert rows[("2026-01-01 11:00:00", "C2")] == 1


def test_sessionized_counts(spark, tmp_path):
    src = str(tmp_path / "ev")
    _write_parquet(spark, src,
                   [("u1", "2026-01-01 10:00:00"),
                    ("u1", "2026-01-01 10:10:00"),   # same session
                    ("u1", "2026-01-01 12:00:00"),   # new session (>30m gap)
                    ("u2", "2026-01-01 10:00:00")],
                   "user_id string, ts_s string")
    stream = (spark.readStream.schema("user_id string, ts_s string")
              .parquet(src)
              .withColumn("ts", F.col("ts_s").cast("timestamp")))
    _run_available_now(sessionized_counts(stream), "sessions")
    rows = spark.sql("select * from sessions").collect()
    per_user = {}
    for r in rows:
        per_user.setdefault(r["user_id"], []).append(r["n_events"])
    assert sorted(per_user["u1"]) == [1, 2]
    assert per_user["u2"] == [1]


def test_stateful_totals_across_batches(spark, tmp_path):
    src = str(tmp_path / "ann2")
    ckpt = str(tmp_path / "ckpt")
    _write_parquet(spark, src, [("d1", "C1"), ("d2", "C1"), ("d3", "C2")],
                   "doc_id string, cui string")

    def run_once():
        collected = []
        stream = (spark.readStream.schema("doc_id string, cui string")
                  .parquet(src))
        q = (stateful_cui_totals(stream)
             .writeStream
             .foreachBatch(lambda df, _eid: collected.extend(df.collect()))
             .outputMode("update")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return collected

    first = {r["cui"]: r["total_mentions"] for r in run_once()}
    assert first == {"C1": 2, "C2": 1}

    # second run: GroupState restored from the checkpoint carries the
    # running totals across query restarts
    _write_parquet(spark, src, [("d4", "C1")], "doc_id string, cui string")
    second = {r["cui"]: r["total_mentions"] for r in run_once()}
    assert second["C1"] == 3  # 2 from restored state + 1 new


def test_streaming_exact_dedup_across_batches(spark, tmp_path):
    """streaming_exact_dedup: duplicates are flagged against every doc
    ever seen (state restored from the checkpoint across restarts)."""
    from medcat_spark.streaming.windows import streaming_exact_dedup
    src = str(tmp_path / "docs")
    ckpt = str(tmp_path / "dckpt")
    _write_parquet(spark, src,
                   [("d1", "alpha beta"), ("d2", "alpha beta"),
                    ("d3", "unique text")],
                   "doc_id string, text string")

    def run_once():
        collected = []
        stream = (spark.readStream.schema("doc_id string, text string")
                  .parquet(src))
        q = (streaming_exact_dedup(stream)
             .writeStream
             .foreachBatch(lambda df, _eid: collected.extend(df.collect()))
             .outputMode("append")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return collected

    first = {r["doc_id"]: r["is_duplicate"] for r in run_once()}
    assert first["d3"] == "first"
    # d1/d2 share a fingerprint: exactly one is 'first' in the batch
    assert sorted([first["d1"], first["d2"]]) == ["dup", "first"]

    # restart with a new batch: a re-occurrence of old content is a dup
    # (state survived), new content is first
    _write_parquet(spark, src, [("d4", "alpha beta"), ("d5", "fresh")],
                   "doc_id string, text string")
    second = {r["doc_id"]: r["is_duplicate"] for r in run_once()}
    assert second["d4"] == "dup" and second["d5"] == "first"
