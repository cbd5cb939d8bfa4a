"""Streaming windowed aggregations + custom stateful operators over
annotation/event streams (SURVEY §2.10 — the reference is batch-only;
these are the Spark-native stream analogues the 100 TB pipeline needs:
watermarks bound state for late data, session windows are native, and
``applyInPandasWithState`` carries custom per-key state).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (LongType, StringType, StructField, StructType)


def windowed_mention_counts(ann_stream: DataFrame, ts_col: str = "ts",
                            window: str = "1 hour",
                            watermark: str = "10 minutes") -> DataFrame:
    """Tumbling-window mention counts per CUI with a watermark so late
    rows beyond the bound are dropped and window state is evicted —
    the streaming analogue of the per-doc mention aggregation."""
    return (ann_stream
            .withWatermark(ts_col, watermark)
            .groupBy(F.window(F.col(ts_col), window).alias("win"), "cui")
            .agg(F.count("*").alias("n_mentions"))
            .select(F.col("win.start").alias("window_start"),
                    F.col("win.end").alias("window_end"),
                    "cui", "n_mentions"))


def sessionized_counts(events_stream: DataFrame, ts_col: str = "ts",
                       key_col: str = "user_id", gap: str = "30 minutes",
                       watermark: str = "10 minutes") -> DataFrame:
    """Native session windows (F.session_window) with watermark —
    the streaming version of the batch sessionize query."""
    return (events_stream
            .withWatermark(ts_col, watermark)
            .groupBy(F.session_window(F.col(ts_col), gap).alias("sess"),
                     key_col)
            .agg(F.count("*").alias("n_events"))
            .select(F.col(key_col),
                    F.col("sess.start").alias("session_start"),
                    F.col("sess.end").alias("session_end"),
                    "n_events"))


_STATE_SCHEMA = StructType([StructField("total", LongType())])
_TOTALS_SCHEMA = StructType([
    StructField("cui", StringType()),
    StructField("total_mentions", LongType()),
    StructField("batch_mentions", LongType()),
])


def _cui_totals_fn(key: Tuple[str],
                   pdfs: Iterator[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
    n = sum(len(pdf) for pdf in pdfs)
    (prev,) = state.get if state.exists else (0,)
    total = prev + n
    state.update((total,))
    yield pd.DataFrame({"cui": [key[0]], "total_mentions": [total],
                        "batch_mentions": [n]})


def stateful_cui_totals(ann_stream: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: running
    per-CUI mention totals carried in GroupState across micro-batches
    (the pattern for any bespoke streaming state — e.g. incremental
    context-vector training counters)."""
    return (ann_stream.groupBy("cui")
            .applyInPandasWithState(_cui_totals_fn,
                                    outputStructType=_TOTALS_SCHEMA,
                                    stateStructType=_STATE_SCHEMA,
                                    outputMode="update",
                                    timeoutConf=GroupStateTimeout.NoTimeout))


_SEEN_STATE = StructType([StructField("n_seen", LongType())])
_DEDUP_SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("fp", StringType()),
    StructField("is_duplicate", StringType()),
])


def _stream_dedup_fn(key: Tuple[str],
                     pdfs: Iterator[pd.DataFrame],
                     state: GroupState) -> Iterator[pd.DataFrame]:
    (prev,) = state.get if state.exists else (0,)
    for pdf in pdfs:
        flags = []
        for _ in range(len(pdf)):
            flags.append("dup" if prev > 0 else "first")
            prev += 1
        yield pd.DataFrame({"doc_id": pdf["doc_id"].astype(str),
                            "fp": key[0],
                            "is_duplicate": flags})
    state.update((prev,))


def streaming_exact_dedup(doc_stream: DataFrame,
                          text_col: str = "text") -> DataFrame:
    """Streaming exact-dedup: each document is flagged ``first`` or
    ``dup`` against every document EVER seen with the same content hash
    — ``GroupState`` keyed by md5(text) carries the seen-count across
    micro-batches, so the ingest pipeline filters duplicates before
    paying annotation cost.  The batch analogue is
    ``dedup.exact_dup_groups``; state is one counter per DISTINCT
    content (bounded by unique-doc count, not stream length).  Within a
    single micro-batch the first row of a group (arrival order) is the
    keeper, matching the batch operator's rank-1 rule.
    """
    fp = doc_stream.select(F.col("doc_id").cast("string").alias("doc_id"),
                           F.md5(F.col(text_col)).alias("fp"))
    return (fp.groupBy("fp")
            .applyInPandasWithState(_stream_dedup_fn,
                                    outputStructType=_DEDUP_SCHEMA,
                                    stateStructType=_SEEN_STATE,
                                    outputMode="append",
                                    timeoutConf=GroupStateTimeout.NoTimeout))


_PAIR_STATE = StructType([StructField("cuis", StringType())])
_PAIR_SCHEMA = StructType([
    StructField("cui_a", StringType()),
    StructField("cui_b", StringType()),
])


def _pair_delta_fn(key: Tuple[str],
                   pdfs: Iterator[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
    (blob,) = state.get if state.exists else ("",)
    seen = set(blob.split("\x00")) - {""}
    new = set()
    for pdf in pdfs:
        for c in pdf["cui"]:
            c = str(c)
            if c not in seen and c not in new:
                new.add(c)
    if new:
        a_out, b_out = [], []
        for c in sorted(new):
            for other in seen | (new - {c}):
                lo, hi = (c, other) if c < other else (other, c)
                a_out.append(lo)
                b_out.append(hi)
        # dedup new×new pairs emitted twice (once per endpoint)
        pairs = sorted(set(zip(a_out, b_out)))
        seen |= new
        state.update(("\x00".join(sorted(seen)),))
        yield pd.DataFrame({"cui_a": [p[0] for p in pairs],
                            "cui_b": [p[1] for p in pairs]})
    else:
        state.update((blob,))


def stateful_pair_deltas(ann_stream: DataFrame) -> DataFrame:
    """Streaming co-occurrence deltas WITHOUT the whole-doc-per-batch
    assumption: GroupState keyed by doc_id carries the CUI set seen so
    far for each document, and each micro-batch emits exactly the NEW
    canonical pairs it completes (new×seen ∪ new×new).  Feeding these
    into IcebergMergeStreamSink maintains exact co-occurrence counts
    even when a document's annotations straggle across micro-batches
    (late files, backfills, per-entity upstream operators).

    State is one CUI set per in-flight document — at production scale
    pair with a session-style timeout to evict completed documents
    (NoTimeout here keeps the test contract exact)."""
    ann = ann_stream.select(F.col("doc_id").cast("string").alias("doc_id"),
                            F.col("cui").cast("string").alias("cui"))
    return (ann.groupBy("doc_id")
            .applyInPandasWithState(_pair_delta_fn,
                                    outputStructType=_PAIR_SCHEMA,
                                    stateStructType=_PAIR_STATE,
                                    outputMode="append",
                                    timeoutConf=GroupStateTimeout.NoTimeout))
