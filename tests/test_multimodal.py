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


def test_real_decode_is_explicit_stub(spark, corpus_df):
    with pytest.raises(NotImplementedError, match="codecs"):
        decode_media(_media(spark, corpus_df), fake=False)
    assert "codecs" in REAL_DECODE_UNAVAILABLE


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
