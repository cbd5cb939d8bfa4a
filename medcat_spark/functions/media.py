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
    """Real header decode for the formats whose metadata needs no
    library: PNG (IHDR chunk), JPEG (SOF frame header), GIF (logical
    screen descriptor) — pure struct parsing of the container bytes.
    Pixel decode / audio / video stay behind NotImplementedError until a
    cluster provides PIL/ffmpeg.

    Returns {format, width, height, phash} (phash = md5 of the bytes —
    a content fingerprint; a perceptual hash needs pixel decode).
    """
    import struct

    b = media_bytes or b""
    h = hashlib.md5(b).hexdigest()[:16]

    # PNG: 8-byte signature, first chunk must be IHDR (width/height BE)
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24 and b[12:16] == b"IHDR":
        w, ht = struct.unpack(">II", b[16:24])
        return {"format": "png", "width": int(w), "height": int(ht),
                "phash": h}

    # GIF: 6-byte signature then little-endian logical screen size
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w, ht = struct.unpack("<HH", b[6:10])
        return {"format": "gif", "width": int(w), "height": int(ht),
                "phash": h}

    # JPEG: walk the marker stream to the first SOFn (C0-CF minus
    # C4/C8/CC), whose payload is precision(1) height(2BE) width(2BE)
    if b[:2] == b"\xff\xd8":
        i = 2
        while i + 4 <= len(b):
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker == 0xFF:          # fill byte
                i += 1
                continue
            if marker in (0x01, 0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
                i += 2                  # standalone marker, no length
                continue
            if i + 4 > len(b):
                break
            seg_len = struct.unpack(">H", b[i + 2:i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 <= len(b):
                    ht, w = struct.unpack(">HH", b[i + 5:i + 9])
                    return {"format": "jpeg", "width": int(w),
                            "height": int(ht), "phash": h}
                break
            i += 2 + seg_len
        raise ValueError("truncated or SOF-less JPEG stream")

    raise NotImplementedError(
        "only PNG/JPEG/GIF headers decode without libraries; wire "
        "PIL/ffmpeg here on a real cluster for pixel/audio/video decode")


MEDIA_BYTES_SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("media_ref", StringType()),
    StructField("format", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("phash", StringType()),
])


def media_features_from_bytes(df: DataFrame, bytes_col: str = "media_bytes",
                              id_col: str = "doc_id",
                              ref_col: str = "media_ref") -> DataFrame:
    """media_features over a REAL binary column: Arrow-batched header
    decode of PNG/JPEG/GIF bytes (real_decode).  Undecodable rows get
    null dims and format 'unknown' instead of failing the batch —
    corpus-scale media tables always contain corrupt members."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {f.name: [] for f in MEDIA_BYTES_SCHEMA.fields}
            for row in pdf.itertuples(index=False):
                try:
                    meta = real_decode(getattr(row, bytes_col))
                except (NotImplementedError, ValueError):
                    meta = {"format": "unknown", "width": None,
                            "height": None,
                            "phash": hashlib.md5(
                                getattr(row, bytes_col) or b"")
                            .hexdigest()[:16]}
                out["doc_id"].append(str(getattr(row, id_col)))
                out["media_ref"].append(getattr(row, ref_col))
                out["format"].append(meta["format"])
                out["width"].append(meta["width"])
                out["height"].append(meta["height"])
                out["phash"].append(meta["phash"])
            if out["doc_id"]:
                yield pd.DataFrame(out)

    return df.mapInPandas(fn, schema=MEDIA_BYTES_SCHEMA)


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
