"""Multimodal plumbing: schema, Arrow batch shape, deterministic stub decode."""

from __future__ import annotations

import pytest

from tsidx.multimodal import (
    attach_media_metadata,
    default_fake_decode,
    extract_features,
    frame_sample_plan,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (0, b"\x89PNG fake image bytes"),
        (1, b"RIFF fake wav bytes"),
        (2, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    return attach_media_metadata(df, kind="image")


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == ["media_id", "payload", "meta"]
    meta_fields = [f.name for f in media.schema["meta"].dataType.fields]
    assert meta_fields == [
        "kind", "mime", "width", "height", "duration_ms", "sample_rate"
    ]
    kinds = [r["meta"]["kind"] for r in media.collect()]
    assert kinds == ["image", "image", "image"]


def test_extract_features_deterministic(media):
    feats = {r["media_id"]: r for r in extract_features(media).collect()}
    assert set(feats) == {0, 1, 2}
    assert feats[0]["n_bytes"] == len(b"\x89PNG fake image bytes")
    assert feats[2]["n_bytes"] == 0  # null payload -> empty bytes
    assert len(feats[0]["feat"]) == 8
    # stub decode is a pure function of the payload
    expect = default_fake_decode(b"\x89PNG fake image bytes", "image")
    # feat column is array<float> — float32 round-trip tolerance
    assert all(abs(a - b) < 1e-6 for a, b in zip(feats[0]["feat"], expect))
    again = {r["media_id"]: r for r in extract_features(media).collect()}
    assert feats[0]["digest"] == again[0]["digest"]


def test_custom_decode_fn(media):
    def fake(payload, kind, dim=8):
        return [float(len(payload))] * 4

    rows = extract_features(media, decode_fn=fake).collect()
    assert all(len(r["feat"]) == 4 for r in rows)


def test_frame_sample_plan(spark):
    from pyspark.sql import functions as F

    rows = [(0, b"x"), (1, b"y")]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    media = attach_media_metadata(df, kind="video")
    # stub metadata (null duration) -> one frame at t=0 per video
    plan = frame_sample_plan(media, every_ms=500)
    got = sorted((r["media_id"], r["ts_ms"]) for r in plan.collect())
    assert got == [(0, 0), (1, 0)]
    # with real durations the plan explodes one row per sampled timestamp
    with_dur = media.withColumn(
        "meta",
        F.struct(
            F.col("meta.kind"), F.col("meta.mime"), F.col("meta.width"),
            F.col("meta.height"),
            F.lit(1500).alias("duration_ms"), F.col("meta.sample_rate"),
        ),
    )
    got2 = sorted((r["media_id"], r["ts_ms"]) for r in
                  frame_sample_plan(with_dur, every_ms=500).collect())
    assert got2 == [(0, 0), (0, 500), (0, 1000), (1, 0), (1, 500), (1, 1000)]


def _png(w, h):
    return (b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR"
            + w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + b"\x08\x06\x00\x00\x00")


def _jpeg(w, h):
    app0 = (b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00"
            + b"\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    sof0 = (b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
            + h.to_bytes(2, "big") + w.to_bytes(2, "big")
            + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01")
    return b"\xff\xd8" + app0 + sof0


def _jpeg_progressive(w, h):
    # SOF2 (progressive) behind a DHT segment that must be skipped
    dht = b"\xff\xc4" + (5).to_bytes(2, "big") + b"\x00\x01\x02"
    sof2 = (b"\xff\xc2" + (11).to_bytes(2, "big") + b"\x08"
            + h.to_bytes(2, "big") + w.to_bytes(2, "big") + b"\x01\x01\x11\x00")
    return b"\xff\xd8" + dht + sof2


def _gif(w, h):
    return (b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little")
            + b"\x00\x00\x00")


def _bmp(w, h):
    return (b"BM" + (54).to_bytes(4, "little") + b"\x00" * 4
            + (54).to_bytes(4, "little") + (40).to_bytes(4, "little")
            + w.to_bytes(4, "little", signed=True)
            + (-h).to_bytes(4, "little", signed=True))  # top-down rows


def _webp_vp8x(w, h):
    return (b"RIFF" + (30).to_bytes(4, "little") + b"WEBP" + b"VP8X"
            + (10).to_bytes(4, "little") + b"\x00" * 4
            + (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little"))


def _webp_vp8l(w, h):
    bits = (w - 1) | ((h - 1) << 14)
    return (b"RIFF" + (20).to_bytes(4, "little") + b"WEBP" + b"VP8L"
            + (9).to_bytes(4, "little") + b"\x2f" + bits.to_bytes(4, "little"))


def _webp_vp8(w, h):
    return (b"RIFF" + (20).to_bytes(4, "little") + b"WEBP" + b"VP8 "
            + (10).to_bytes(4, "little") + b"\x00\x00\x00" + b"\x9d\x01\x2a"
            + w.to_bytes(2, "little") + h.to_bytes(2, "little"))


def test_parse_image_dims_goldens():
    from tsidx.multimodal import parse_image_dims

    assert parse_image_dims(_png(640, 480)) == ("image/png", 640, 480)
    assert parse_image_dims(_jpeg(1920, 1080)) == ("image/jpeg", 1920, 1080)
    assert parse_image_dims(_jpeg_progressive(300, 200)) == (
        "image/jpeg", 300, 200)
    assert parse_image_dims(_gif(12, 34)) == ("image/gif", 12, 34)
    assert parse_image_dims(_bmp(800, 600)) == ("image/bmp", 800, 600)
    assert parse_image_dims(_webp_vp8x(1024, 768)) == ("image/webp", 1024, 768)
    assert parse_image_dims(_webp_vp8l(55, 77)) == ("image/webp", 55, 77)
    assert parse_image_dims(_webp_vp8(320, 240)) == ("image/webp", 320, 240)
    # garbage / truncation never raises
    assert parse_image_dims(b"") == (None, None, None)
    assert parse_image_dims(None) == (None, None, None)
    assert parse_image_dims(b"not an image at all") == (None, None, None)
    assert parse_image_dims(_png(640, 480)[:12]) == (None, None, None)
    assert parse_image_dims(b"\xff\xd8\xff") == (None, None, None)
    assert parse_image_dims(b"\x89PNG\r\n\x1a\nXXXXIHDR") == (None, None, None)


def test_fill_image_dims(spark):
    from tsidx.multimodal import fill_image_dims

    rows = [
        (0, _png(100, 50)),
        (1, _jpeg(30, 20)),
        (2, _gif(7, 9)),
        (3, b"utter garbage"),
        (4, None),
        (5, _webp_vp8x(16, 8)),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    media = fill_image_dims(attach_media_metadata(df, kind="image"))
    got = {
        r["media_id"]: (r["meta"]["mime"], r["meta"]["width"], r["meta"]["height"])
        for r in media.collect()
    }
    assert got == {
        0: ("image/png", 100, 50),
        1: ("image/jpeg", 30, 20),
        2: ("image/gif", 7, 9),
        3: (None, None, None),
        4: (None, None, None),
        5: ("image/webp", 16, 8),
    }
    # schema is preserved, kind untouched, payload flows through
    assert media.schema == attach_media_metadata(df, kind="image").schema
    kinds = {r["media_id"]: r["meta"]["kind"] for r in media.collect()}
    assert all(k == "image" for k in kinds.values())
