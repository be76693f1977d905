"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, partitioning, Arrow
batch shape through mapInPandas. Two REAL decode paths ship here with no
external dependencies: uncompressed 24-bit BMP and 16-bit PCM WAV, parsed
with struct + numpy (`_decode_bmp` / `_decode_wav`, dispatched on the
payload's magic bytes) — width/height/duration and pixel/sample stats
come from the actual decoded data. Compressed codecs (JPEG/PNG/MP3/...)
are stubbed: `decode_media` falls back to a deterministic fake decoder by
default and raises NotImplementedError when a real decode of an
unsupported codec is requested (this container ships no codec libraries).

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
import struct
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
    "mean_byte double, std_byte double, checksum string, "
    "decoded_codec string, width int, height int, duration_ms int"
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


# ---------------------------------------------------------------- codecs
# Real, dependency-free codecs for the two formats that are pure layout:
# uncompressed 24-bit bottom-up BMP and 16-bit PCM (RIFF) WAV.

def encode_bmp(pixels: np.ndarray) -> bytes:
    """RGB uint8 array (H, W, 3) -> uncompressed 24bpp BMP bytes
    (BITMAPINFOHEADER, bottom-up rows, 4-byte row padding)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    row = w * 3
    pad = (-row) % 4
    data = bytearray()
    for y in range(h - 1, -1, -1):          # bottom-up
        bgr = pixels[y, :, ::-1].tobytes()  # RGB -> BGR
        data += bgr + b"\x00" * pad
    offset = 14 + 40
    size = offset + len(data)
    file_hdr = struct.pack("<2sIHHI", b"BM", size, 0, 0, offset)
    info_hdr = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                           2835, 2835, 0, 0)
    return file_hdr + info_hdr + bytes(data)


def _decode_bmp(b: bytes) -> tuple[int, int, np.ndarray]:
    """BMP bytes -> (width, height, RGB uint8 array (H, W, 3)).
    Supports the encode_bmp subset: 24bpp, BI_RGB, bottom-up or top-down.
    Raises ValueError on anything else."""
    if len(b) < 54 or b[:2] != b"BM":
        raise ValueError("not a BMP")
    offset = struct.unpack_from("<I", b, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", b, 14)
    planes, bpp = struct.unpack_from("<HH", b, 26)
    compression = struct.unpack_from("<I", b, 30)[0]
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError("unsupported BMP variant")
    top_down = h < 0
    h = abs(h)
    row = w * 3
    stride = row + ((-row) % 4)
    if offset + stride * h > len(b):
        raise ValueError("truncated BMP")
    rows = np.frombuffer(b, dtype=np.uint8, count=stride * h,
                         offset=offset).reshape(h, stride)[:, :row]
    img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    if not top_down:
        img = img[::-1]
    return w, h, np.ascontiguousarray(img)


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 mono sample array -> 16-bit PCM RIFF/WAVE bytes."""
    assert samples.dtype == np.int16 and samples.ndim == 1
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _decode_wav(b: bytes) -> tuple[int, int, np.ndarray]:
    """WAV bytes -> (sample_rate, duration_ms, int16 sample array).
    Supports 16-bit PCM; walks RIFF chunks. Raises ValueError otherwise."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, rate, channels, bits, data = 12, None, None, None, None
    while pos + 8 <= len(b):
        cid = b[pos:pos + 4]
        clen = struct.unpack_from("<I", b, pos + 4)[0]
        body = b[pos + 8:pos + 8 + clen]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated fmt chunk")
            audio_fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_fmt != 1 or bits != 16:
                raise ValueError("unsupported WAV encoding")
            if rate == 0 or channels == 0:
                raise ValueError("zero sample rate / channel count")
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen % 2)        # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    samples = np.frombuffer(data, dtype="<i2")
    n_frames = samples.size // max(1, channels)
    return rate, int(n_frames * 1000 / rate), samples


def _real_decode(b: bytes):
    """Dispatch on magic bytes; returns (codec, width, height,
    duration_ms, mean, std) or None when no real codec applies.
    Stats are over DECODED data (pixel bytes / int16 samples), not the
    container bytes — the number a real pipeline would feature on."""
    try:
        if b[:2] == b"BM":
            w, h, img = _decode_bmp(b)
            flat = img.astype(np.float64)
            return ("bmp", w, h, None, float(flat.mean()), float(flat.std()))
        if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            rate, dur_ms, samples = _decode_wav(b)
            s = samples.astype(np.float64)
            mean = float(s.mean()) if s.size else 0.0
            std = float(s.std()) if s.size else 0.0
            return ("pcm16", None, None, dur_ms, mean, std)
    except (ValueError, IndexError, struct.error):
        # malformed containers (truncated chunks, bad headers) must fall
        # back to the fake decoder, never crash the Spark task
        return None
    return None


def decode_media(media: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas decode: Arrow-batched binary in, decoded stats out.

    BMP and 16-bit PCM WAV payloads decode for REAL (pure struct+numpy —
    width/height/duration/mean/std from actual pixels/samples,
    decoded_codec 'bmp'/'pcm16'). Other payloads use the deterministic
    fake (decoded_codec NULL) when fake=True; fake=False raises
    NotImplementedError for them — swap in PIL/ffmpeg on a real cluster.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n, mean, std, csum = [], [], [], []
            codec, width, height, dur = [], [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                real = _real_decode(b)
                if real is not None:
                    c, w, h, d, m, s = real
                elif fake:
                    c, w, h, d = None, None, None, None
                    m, s = _fake_decode(b)[1:3]
                else:
                    raise NotImplementedError(REAL_DECODE_UNAVAILABLE)
                n.append(len(b)); csum.append(
                    hashlib.sha256(b).hexdigest()[:16])
                mean.append(round(m, 6)); std.append(round(s, 6))
                codec.append(c); width.append(w); height.append(h)
                dur.append(d)
            yield pd.DataFrame({
                "media_ref": pdf["media_ref"],
                "kind": pdf["kind"],
                "n_bytes": n,
                "mean_byte": mean,
                "std_byte": std,
                "checksum": csum,
                "decoded_codec": codec,
                "width": pd.array(width, dtype="Int32"),
                "height": pd.array(height, dtype="Int32"),
                "duration_ms": pd.array(dur, dtype="Int32"),
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
    side to max_side. BMP payloads resample for REAL (nearest-neighbor
    index sampling + re-encode, pure numpy); other codecs keep the
    deterministic fake — a byte slice proportional to the area ratio so
    downstream batch shapes stay realistic — or raise when fake=False.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_w, out_h, out_p = [], [], []
            for w, h, payload in zip(pdf["width"], pdf["height"],
                                     pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                try:
                    rw, rh, img = _decode_bmp(b)
                except ValueError:
                    img = None
                if img is not None:
                    w, h = rw, rh           # trust the actual pixel data
                else:
                    w = int(w) if pd.notna(w) else 0
                    h = int(h) if pd.notna(h) else 0
                side = max(w, h)
                scale = (max_side / side) if side > max_side else 1.0
                nw, nh = max(1, round(w * scale)), max(1, round(h * scale))
                if img is not None:
                    ys = (np.arange(nh) * (h / nh)).astype(np.intp)
                    xs = (np.arange(nw) * (w / nw)).astype(np.intp)
                    out = np.ascontiguousarray(img[ys][:, xs])
                    out_w.append(nw); out_h.append(nh)
                    out_p.append(encode_bmp(out))
                    continue
                if not fake:
                    raise NotImplementedError(REAL_DECODE_UNAVAILABLE)
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
