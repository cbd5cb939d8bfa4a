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
