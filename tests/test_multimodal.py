"""Multimodal plumbing: binary payload synthesis, Arrow-batched decode
stub, feature extraction shape, frame-sampling plan."""

import pytest

from document_parser_private_spark.operators.multimodal import (
    REAL_DECODE_UNAVAILABLE,
    decode_media,
    frame_sample,
    media_features,
    synth_media_for_docs,
)


def _media(spark, corpus_df):
    return synth_media_for_docs(corpus_df).cache()


def test_synth_media_rows(spark, corpus_df):
    media = _media(spark, corpus_df)
    rows = media.collect()
    # corpus has resume_media docs -> at least some media-anchor spans
    assert len(rows) > 0
    for r in rows[:20]:
        assert r["media_ref"].startswith("img://")
        assert isinstance(r["payload"], (bytes, bytearray))
        assert len(r["payload"]) == 512  # 64-hex sha256 * 16 reps / 2
        assert 16 <= r["width"] < 1040 and 16 <= r["height"] < 1040


def test_decode_media_deterministic(spark, corpus_df):
    media = _media(spark, corpus_df)
    a = {r["media_ref"]: r["checksum"] for r in decode_media(media).collect()}
    b = {r["media_ref"]: r["checksum"] for r in decode_media(media).collect()}
    assert a == b and len(a) > 0
    stats = decode_media(media).first()
    assert stats["n_bytes"] == 512
    assert 0.0 <= stats["mean_byte"] <= 255.0


def test_real_decode_unsupported_codec_raises(spark, corpus_df):
    # synthetic payloads are not BMP/WAV, so fake=False must fail loudly
    # (inside the UDF -> surfaces as a PythonException at the action)
    with pytest.raises(Exception, match="codecs"):
        decode_media(_media(spark, corpus_df), fake=False).collect()
    assert "codecs" in REAL_DECODE_UNAVAILABLE


def _gradient_bmp(w, h):
    import numpy as np
    from document_parser_private_spark.operators.multimodal import encode_bmp
    y, x = np.mgrid[0:h, 0:w]
    img = np.stack([(x * 7) % 256, (y * 11) % 256, (x + y) % 256],
                   axis=-1).astype(np.uint8)
    return img, encode_bmp(img)


def test_bmp_roundtrip_exact():
    import numpy as np
    from document_parser_private_spark.operators.multimodal import _decode_bmp
    img, payload = _gradient_bmp(13, 9)     # odd width exercises padding
    w, h, back = _decode_bmp(payload)
    assert (w, h) == (13, 9)
    assert np.array_equal(back, img)


def test_decode_media_real_bmp_and_wav(spark):
    import numpy as np
    from document_parser_private_spark.operators.multimodal import (
        MEDIA_DDL, encode_wav,
    )
    img, bmp = _gradient_bmp(20, 10)
    samples = (np.sin(np.arange(8000) / 20.0) * 12000).astype(np.int16)
    wav = encode_wav(samples, sample_rate=16000)
    rows = [
        ("img://bmp1", "d1", "image", bytearray(bmp), None, None, None, "bmp"),
        ("aud://wav1", "d1", "audio", bytearray(wav), None, None, None, "wav"),
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_DDL)
    # fake=False: both payloads decode for REAL, no stub fallback needed
    out = {r["media_ref"]: r
           for r in decode_media(media, fake=False).collect()}
    b = out["img://bmp1"]
    assert b["decoded_codec"] == "bmp"
    assert (b["width"], b["height"]) == (20, 10)
    assert b["mean_byte"] == pytest.approx(float(img.mean()), abs=1e-4)
    assert b["std_byte"] == pytest.approx(float(img.std()), abs=1e-4)
    a = out["aud://wav1"]
    assert a["decoded_codec"] == "pcm16"
    assert a["duration_ms"] == 500          # 8000 frames @ 16 kHz
    assert a["mean_byte"] == pytest.approx(float(samples.mean()), abs=1e-4)
    assert a["std_byte"] == pytest.approx(float(samples.std()), abs=1e-4)


def test_resize_media_real_bmp(spark):
    import numpy as np
    from document_parser_private_spark.operators.multimodal import (
        MEDIA_DDL, _decode_bmp, resize_media,
    )
    img, bmp = _gradient_bmp(100, 40)
    rows = [("img://big", "d1", "image", bytearray(bmp), 100, 40, None, "bmp")]
    media = spark.createDataFrame(rows, schema=MEDIA_DDL)
    r = resize_media(media, max_side=50, fake=False).first()
    assert (r["width"], r["height"]) == (50, 20)
    w, h, small = _decode_bmp(bytes(r["payload"]))
    assert (w, h) == (50, 20)
    # nearest-neighbor: every output pixel exists in the source image
    ys = (np.arange(20) * 2).astype(int)
    xs = (np.arange(50) * 2).astype(int)
    assert np.array_equal(small, img[ys][:, xs])


def test_media_features_shape(spark, corpus_df):
    feats = media_features(_media(spark, corpus_df), dim=16).collect()
    assert len(feats) > 0
    for r in feats[:10]:
        assert len(r["features"]) == 16
        assert all(0.0 <= x <= 1.0 for x in r["features"])


def test_frame_sample_plan(spark):
    rows = [
        ("vid://1", "d1", "video", None, None, None, 3500, "fake"),
        ("img://1", "d1", "image", None, None, None, None, "fake"),
    ]
    from document_parser_private_spark.operators.multimodal import MEDIA_DDL
    media = spark.createDataFrame(rows, schema=MEDIA_DDL)
    out = frame_sample(media, every_ms=1000).collect()
    got = sorted((r["media_ref"], r["frame_ts_ms"]) for r in out)
    assert got == [("vid://1", 0), ("vid://1", 1000),
                   ("vid://1", 2000), ("vid://1", 3000)]


def test_resize_media_geometry(spark, corpus_df):
    from document_parser_private_spark.operators.multimodal import resize_media
    media = _media(spark, corpus_df)
    out = {r["media_ref"]: r for r in resize_media(media, max_side=64).collect()}
    src = {r["media_ref"]: r for r in media.where("kind = 'image'").collect()}
    assert set(out) == set(src) and len(out) > 0
    for ref, r in out.items():
        s = src[ref]
        assert max(r["width"], r["height"]) <= 64
        if max(s["width"], s["height"]) > 64:
            # aspect preserved within rounding
            assert abs(r["width"] * s["height"] - r["height"] * s["width"]) \
                <= max(s["width"], s["height"])
        else:
            assert (r["width"], r["height"]) == (s["width"], s["height"])
        assert len(r["payload"]) >= 1


def test_malformed_containers_fall_back_not_crash():
    """RIFF payloads with truncated fmt chunks, zero sample rates, or
    short headers must return None from _real_decode (-> fake fallback),
    never raise struct.error/ZeroDivisionError into the Spark task."""
    import struct
    from document_parser_private_spark.operators.multimodal import (
        _real_decode, encode_wav,
    )
    import numpy as np

    good = encode_wav(np.zeros(8, dtype=np.int16), 16000)
    assert _real_decode(good) is not None

    # truncated fmt chunk: declares 16 bytes, carries 4
    trunc = (b"RIFF" + struct.pack("<I", 16) + b"WAVE"
             + b"fmt " + struct.pack("<I", 16) + b"\x01\x00\x01\x00")
    assert _real_decode(trunc) is None

    # zero sample rate
    fmt = struct.pack("<HHIIHH", 1, 1, 0, 0, 2, 16)
    zero_rate = (b"RIFF" + struct.pack("<I", 36) + b"WAVE"
                 + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                 + b"data" + struct.pack("<I", 4) + b"\x00" * 4)
    assert _real_decode(zero_rate) is None

    # BMP too short for its own header
    assert _real_decode(b"BM" + b"\x00" * 20) is None
