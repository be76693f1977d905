"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, partitioning, Arrow
batch shape through mapInPandas — while the actual codec work is stubbed
(this container ships no image/audio libraries): `decode_media` uses a
deterministic fake decoder by default and raises NotImplementedError when
a real decode is requested.

Table shape:
    media(media_ref string, doc_id string, kind string,   -- image|audio|video
          payload binary, width int, height int,
          duration_ms int, codec string)

Operators:
    synth_media_for_docs  — deterministic binary payloads for a span table
    decode_media          — mapInPandas: payload -> decoded struct (STUB)
    media_features        — per-item deterministic feature vector
    frame_sample          — every-k-th frame index plan for video rows
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_DDL = (
    "media_ref string, doc_id string, kind string, payload binary, "
    "width int, height int, duration_ms int, codec string"
)

DECODED_DDL = (
    "media_ref string, kind string, n_bytes long, "
    "mean_byte double, std_byte double, checksum string"
)

FEATURES_DDL = "media_ref string, features array<float>"

REAL_DECODE_UNAVAILABLE = (
    "real media decode requires image/audio codecs not present in this "
    "environment; pass fake=True (default) for the deterministic stub"
)


def synth_media_for_docs(docs: DataFrame) -> DataFrame:
    """One media row per media-anchor span: payload = deterministic bytes
    derived from the media_ref (sha256 stretched), metadata derived from
    the ref hash. Pure column expressions."""
    refs = docs.select(
        F.col("doc_id"),
        F.explode("spans").alias("s"),
    ).where(
        F.col("s.media_ref").isNotNull() & (F.col("s.media_ref") != "")
    ).select("doc_id", F.col("s.media_ref").alias("media_ref"))
    h = F.sha2(F.col("media_ref"), 256)
    return refs.select(
        "media_ref",
        "doc_id",
        F.lit("image").alias("kind"),
        F.to_binary(F.repeat(h, 16), F.lit("hex")).alias("payload"),
        (F.conv(F.substring(h, 1, 4), 16, 10).cast("int") % 1024 + 16)
        .alias("width"),
        (F.conv(F.substring(h, 5, 4), 16, 10).cast("int") % 1024 + 16)
        .alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
        F.lit("fake/v1").alias("codec"),
    )


def _fake_decode(payload: bytes) -> tuple[int, float, float, str]:
    arr = np.frombuffer(payload, dtype=np.uint8)
    return (
        int(arr.size),
        float(arr.mean()) if arr.size else 0.0,
        float(arr.std()) if arr.size else 0.0,
        hashlib.sha256(payload).hexdigest()[:16],
    )


def decode_media(media: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas decode: Arrow-batched binary in, decoded stats out.

    The real path is a stub (NotImplementedError) — the *plumbing* (batch
    iterator signature, binary Arrow transfer, output schema) is the
    deliverable; swap `_fake_decode` for PIL/ffmpeg on a real cluster.
    """
    if not fake:
        raise NotImplementedError(REAL_DECODE_UNAVAILABLE)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n, mean, std, csum = [], [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                r = _fake_decode(b)
                n.append(r[0]); mean.append(round(r[1], 6))
                std.append(round(r[2], 6)); csum.append(r[3])
            yield pd.DataFrame({
                "media_ref": pdf["media_ref"],
                "kind": pdf["kind"],
                "n_bytes": n,
                "mean_byte": mean,
                "std_byte": std,
                "checksum": csum,
            })

    return media.mapInPandas(batches, schema=DECODED_DDL)


def media_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Deterministic per-item feature vector (fake embedding) via
    mapInPandas — the ANN/similarity operators consume this shape."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                h = hashlib.sha256(b).digest()
                v = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4],
                                  dtype=np.uint32).astype(np.float32)
                v = (v % 1000) / 1000.0
                feats.append(v.tolist())
            yield pd.DataFrame({
                "media_ref": pdf["media_ref"], "features": feats,
            })

    return media.mapInPandas(batches, schema=FEATURES_DDL)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per sampled frame timestamp —
    pure expressions (sequence + explode), no decode needed to plan."""
    vids = media.where(F.col("kind") == "video")
    return vids.select(
        "media_ref",
        F.explode(
            F.sequence(
                F.lit(0),
                F.coalesce(F.col("duration_ms"), F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


RESIZED_DDL = (
    "media_ref string, kind string, width int, height int, "
    "payload binary"
)


def resize_media(media: DataFrame, max_side: int = 256,
                 fake: bool = True) -> DataFrame:
    """Resize plan for image rows: aspect-preserving clamp of the longer
    side to max_side. Geometry math is real (and what a cluster job would
    pushdown-project); the pixel resample is STUBBED like decode_media —
    the fake keeps a deterministic byte slice proportional to the area
    ratio so downstream batch shapes are realistic.
    """
    if not fake:
        raise NotImplementedError(REAL_DECODE_UNAVAILABLE)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_w, out_h, out_p = [], [], []
            for w, h, payload in zip(pdf["width"], pdf["height"],
                                     pdf["payload"]):
                w = int(w) if pd.notna(w) else 0
                h = int(h) if pd.notna(h) else 0
                side = max(w, h)
                scale = (max_side / side) if side > max_side else 1.0
                nw, nh = max(1, round(w * scale)), max(1, round(h * scale))
                b = bytes(payload) if payload is not None else b""
                keep = max(1, int(len(b) * (nw * nh) / max(1, w * h)))
                out_w.append(nw)
                out_h.append(nh)
                out_p.append(b[:keep])
            yield pd.DataFrame({
                "media_ref": pdf["media_ref"], "kind": pdf["kind"],
                "width": out_w, "height": out_h, "payload": out_p,
            })

    return media.where(F.col("kind") == "image").mapInPandas(
        batches, schema=RESIZED_DDL
    )
