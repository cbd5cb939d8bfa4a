"""Exactly-once streaming appends into an Iceberg table.

Structured Streaming's ``foreachBatch`` delivers each micro-batch with
an epoch id, but AFTER a restart from checkpoint the last batch can be
REDELIVERED (at-least-once).  Exactly-once therefore needs an
idempotent sink: this one stamps every Iceberg snapshot with the
stream's (query-id, epoch-id) in the snapshot summary and skips a batch
whose epoch is already committed — the same recipe the real
iceberg-spark runtime uses (its ``spark.sql.streaming`` sink records
epoch ids in snapshot summaries too), re-expressed over the pure-Python
writer (sources/iceberg.py).

Usage::

    sink = IcebergStreamSink(location)
    q = (df.writeStream.option("checkpointLocation", ckpt)
           .foreachBatch(sink).start())

At 100 TB this is the streaming half of the resumable-commit story:
snapshot isolation makes downstream batch readers see whole micro-
batches or nothing, and the epoch stamp makes crash-replay safe.
"""

from __future__ import annotations

from typing import Optional

from medcat_spark.sources.iceberg import IcebergTable


class IcebergStreamSink:
    """``foreachBatch`` callable with epoch-id idempotence."""

    def __init__(self, location: str, query_id: Optional[str] = None):
        self.location = location
        self.query_id = query_id  # defaults to the df's query id source
        self.skipped_epochs = 0   # observability for tests/metrics

    def last_committed_epoch(self) -> Optional[int]:
        if not IcebergTable.exists(self.location):
            return None
        t = IcebergTable.load(self.location)
        qid = self.query_id or ""
        for snap in reversed(t.snapshots()):
            s = snap.get("summary", {})
            if s.get("streaming-query-id", "") == qid and \
                    "streaming-epoch-id" in s:
                return int(s["streaming-epoch-id"])
        return None

    def __call__(self, batch_df, epoch_id: int) -> None:
        last = self.last_committed_epoch()
        if last is not None and epoch_id <= last:
            # redelivered batch after restart — already committed
            self.skipped_epochs += 1
            return
        if IcebergTable.exists(self.location):
            t = IcebergTable.load(self.location)
        else:
            t = IcebergTable.create(self.location, batch_df.schema)
        t.append_dataframe(
            batch_df,
            summary_extra={"streaming-query-id": self.query_id or "",
                           "streaming-epoch-id": str(epoch_id)})


class IcebergMergeStreamSink(IcebergStreamSink):
    """Continuous KG maintenance: each micro-batch's rows are additive
    deltas to a keyed aggregate (co-occurrence counts), folded into the
    Iceberg table as ONE MERGE snapshot per epoch — the streaming twin
    of the batch kg_cooc_incremental path.

    Per epoch: group the batch to per-key deltas, semi-join the table
    for just the touched keys, sum, upsert.  Work scales with the
    batch, not the table; the epoch stamp (inherited idempotence)
    makes post-restart redelivery a no-op, and the MERGE commit is
    atomic, so a crash between read and commit leaves the table
    unchanged and the replay re-merges from the same base.  Single
    writer per table assumed (the streaming norm); concurrent appends
    to OTHER tables are unaffected.

    ``group_cols`` are the upsert keys plus any constant descriptors
    (e.g. pred); ``sum_col`` is the additive measure."""

    def __init__(self, location: str, key_cols, sum_col: str = "n_docs",
                 group_cols=None, query_id: Optional[str] = None):
        super().__init__(location, query_id)
        self.key_cols = list(key_cols)
        self.sum_col = sum_col
        self.group_cols = list(group_cols or key_cols)

    def __call__(self, batch_df, epoch_id: int) -> None:
        from pyspark.sql import functions as F

        last = self.last_committed_epoch()
        if last is not None and epoch_id <= last:
            self.skipped_epochs += 1
            return
        delta = (batch_df.groupBy(*self.group_cols)
                 .agg(F.sum(self.sum_col).alias(self.sum_col)))
        if not delta.take(1):
            # empty micro-batch: no snapshot; replay recomputes empty
            return
        stamp = {"streaming-query-id": self.query_id or "",
                 "streaming-epoch-id": str(epoch_id)}
        spark = batch_df.sparkSession
        if not IcebergTable.exists(self.location):
            t = IcebergTable.create(self.location, delta.schema)
            t.append_dataframe(delta, summary_extra=stamp)
            return
        t = IcebergTable.load(self.location)
        touched = t.to_df(spark).join(
            delta.select(*self.key_cols), self.key_cols, "left_semi")
        merged = (delta.unionByName(touched)
                  .groupBy(*self.group_cols)
                  .agg(F.sum(self.sum_col).alias(self.sum_col)))
        t.upsert_dataframe(spark, merged, key_cols=self.key_cols,
                           summary_extra=stamp)


def cooccurrence_delta(ann_batch):
    """Per-batch co-occurrence deltas from annotation rows (doc_id,
    cui): the batch-local version of triples.cooccurrence_triples,
    assuming document boundaries are respected by the source's batching
    (true for the annotate stream — a doc is mapped whole)."""
    from pyspark.sql import functions as F

    dc = ann_batch.select("doc_id", "cui").distinct()
    a, b = dc.alias("a"), dc.alias("b")
    return (a.join(b, on="doc_id")
            .where(F.col("a.cui") < F.col("b.cui"))
            .groupBy(F.col("a.cui").alias("cui_a"),
                     F.col("b.cui").alias("cui_b"))
            .agg(F.count("*").alias("n_docs"))
            .select(F.concat(F.lit("cui:"), "cui_a").alias("subj"),
                    F.lit("cooccurs_with").alias("pred"),
                    F.concat(F.lit("cui:"), "cui_b").alias("obj"),
                    "n_docs"))


def stream_cooccurrence_to_iceberg(ann_stream, location: str,
                                   checkpoint_dir: str,
                                   query_id: str = "cooc-stream"):
    """Wire an annotation stream into continuously-maintained Iceberg
    co-occurrence triples: foreachBatch(delta → MERGE).  Returns the
    (sink, StreamingQuery) pair; await and inspect snapshots/tables as
    usual."""
    sink = IcebergMergeStreamSink(
        location, key_cols=["subj", "obj"],
        group_cols=["subj", "pred", "obj"], query_id=query_id)

    def fn(batch_df, epoch_id):
        sink(cooccurrence_delta(batch_df), epoch_id)

    q = (ann_stream.writeStream
         .option("checkpointLocation", checkpoint_dir)
         .foreachBatch(fn)
         .trigger(availableNow=True)
         .start())
    return sink, q


def stream_cooccurrence_stateful_to_iceberg(ann_stream, location: str,
                                            checkpoint_dir: str,
                                            query_id: str = "cooc-state"):
    """Continuous co-occurrence maintenance WITHOUT the whole-doc-per-
    batch contract: windows.stateful_pair_deltas (GroupState per doc)
    emits each doc's newly-completed canonical pairs exactly once, and
    the merge sink folds per-batch pair counts into the Iceberg table.
    Correct even when a document's annotations straggle across
    micro-batches; the GroupState checkpoint and the epoch-stamped
    MERGE together give exactly-once counts across restarts."""
    from pyspark.sql import functions as F

    from medcat_spark.streaming.windows import stateful_pair_deltas

    sink = IcebergMergeStreamSink(
        location, key_cols=["subj", "obj"],
        group_cols=["subj", "pred", "obj"], query_id=query_id)

    def fn(batch_df, epoch_id):
        delta = (batch_df.groupBy("cui_a", "cui_b")
                 .agg(F.count("*").alias("n_docs"))
                 .select(F.concat(F.lit("cui:"), "cui_a").alias("subj"),
                         F.lit("cooccurs_with").alias("pred"),
                         F.concat(F.lit("cui:"), "cui_b").alias("obj"),
                         "n_docs"))
        sink(delta, epoch_id)

    q = (stateful_pair_deltas(ann_stream).writeStream
         .option("checkpointLocation", checkpoint_dir)
         .foreachBatch(fn)
         .trigger(availableNow=True)
         .start())
    return sink, q
