"""Multimodal column plumbing: media spans as opaque references/bytes with
typed metadata, decoded/feature-extracted via Arrow-batched mapInPandas.

The real decode (PIL/ffmpeg) is unavailable in this container, so the
decode step is a clearly-marked deterministic fake (md5-derived pseudo
metadata) behind the same UDF signature, batch shape, and schema a real
decoder would use — the Spark-side plumbing is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (IntegerType, StringType, StructField,
                               StructType)

MEDIA_FEATURE_SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("span_idx", IntegerType()),
    StructField("kind", StringType()),
    StructField("media_ref", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("phash", StringType()),
])


def fake_decode(media_ref: str) -> dict:
    """Deterministic stand-in for image/audio decode.

    A real implementation would fetch bytes and run PIL/librosa here;
    the fake derives metadata from the reference hash so tests and
    oracles are reproducible.  Raise NotImplementedError semantics are
    confined to `real_decode`.
    """
    h = hashlib.md5(media_ref.encode()).hexdigest()
    return {"width": 64 + int(h[:4], 16) % 1024,
            "height": 64 + int(h[4:8], 16) % 1024,
            "phash": h[:16]}


def real_decode(media_bytes: bytes) -> dict:
    raise NotImplementedError(
        "image/audio decode libraries are not available in this "
        "environment; wire PIL/ffmpeg here on a real cluster")


def media_features(docs_with_spans: DataFrame) -> DataFrame:
    """Extract per-media-span features from interleaved documents.

    Input: (doc_id, spans array<struct<kind,text,media_ref,offset>>).
    One output row per media span; Arrow-batched, model-free.
    """
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {f.name: [] for f in MEDIA_FEATURE_SCHEMA.fields}
            for row in pdf.itertuples(index=False):
                for i, s in enumerate(row.spans):
                    if s["kind"] == "text" or not s.get("media_ref"):
                        continue
                    meta = fake_decode(s["media_ref"])
                    out["doc_id"].append(str(row.doc_id))
                    out["span_idx"].append(i)
                    out["kind"].append(s["kind"])
                    out["media_ref"].append(s["media_ref"])
                    out["width"].append(meta["width"])
                    out["height"].append(meta["height"])
                    out["phash"].append(meta["phash"])
            yield pd.DataFrame(out)

    return docs_with_spans.mapInPandas(fn, schema=MEDIA_FEATURE_SCHEMA)


def media_resize(features: DataFrame, target_w: int = 224,
                 target_h: int = 224) -> DataFrame:
    """Aspect-preserving resize plumbing over media_features rows: the
    output dims/scale are the real computation a resize UDF performs;
    the pixel work itself lives behind real_decode on a real cluster.
    Pure codegen arithmetic — no Python.

    → (..., out_w, out_h, scale): scale = min(target/width,
    target/height), dims rounded down, floor-capped at 1.
    """
    from pyspark.sql import functions as F
    scale = F.least(F.lit(float(target_w)) / F.col("width"),
                    F.lit(float(target_h)) / F.col("height"))
    return features.select(
        "doc_id", "span_idx", "kind", "media_ref", "width", "height",
        F.round(scale, 6).alias("scale"),
        F.greatest(F.floor(F.col("width") * scale), F.lit(1))
         .cast("int").alias("out_w"),
        F.greatest(F.floor(F.col("height") * scale), F.lit(1))
         .cast("int").alias("out_h"))


FRAME_SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("span_idx", IntegerType()),
    StructField("media_ref", StringType()),
    StructField("duration_ms", IntegerType()),
    StructField("frame_idx", IntegerType()),
    StructField("ts_ms", IntegerType()),
    StructField("frame_ref", StringType()),
])


def fake_duration_ms(media_ref: str) -> int:
    """Deterministic duration stand-in (ffprobe on a real cluster)."""
    h = hashlib.md5(media_ref.encode()).hexdigest()
    return 1000 + int(h[8:12], 16) % 60000


def frame_sample(docs_with_spans: DataFrame, interval_ms: int = 1000,
                 max_frames: int = 16) -> DataFrame:
    """Frame-sampling plumbing for video/audio spans: one row per
    sampled timestamp, Arrow-batched; frame decode itself is behind
    real_decode.  Mirrors ffmpeg -vf fps sampling: frames at
    0, interval, 2*interval, ... capped at max_frames.
    """
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {f.name: [] for f in FRAME_SCHEMA.fields}
            for row in pdf.itertuples(index=False):
                for i, s in enumerate(row.spans):
                    if s["kind"] == "text" or not s.get("media_ref"):
                        continue
                    dur = fake_duration_ms(s["media_ref"])
                    n = min(dur // interval_ms + 1, max_frames)
                    for f_i in range(n):
                        out["doc_id"].append(str(row.doc_id))
                        out["span_idx"].append(i)
                        out["media_ref"].append(s["media_ref"])
                        out["duration_ms"].append(dur)
                        out["frame_idx"].append(f_i)
                        out["ts_ms"].append(f_i * interval_ms)
                        out["frame_ref"].append(
                            f"{s['media_ref']}#f{f_i}")
            if out["doc_id"]:
                yield pd.DataFrame(out)

    return docs_with_spans.mapInPandas(fn, schema=FRAME_SCHEMA)
