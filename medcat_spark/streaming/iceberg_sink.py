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
