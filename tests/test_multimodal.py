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


def _wav(rate, ch, secs):
    byte_rate = rate * ch * 2
    data = byte_rate * secs
    return (b"RIFF" + (36 + data).to_bytes(4, "little") + b"WAVE"
            + b"fmt " + (16).to_bytes(4, "little")
            + (1).to_bytes(2, "little") + ch.to_bytes(2, "little")
            + rate.to_bytes(4, "little") + byte_rate.to_bytes(4, "little")
            + (ch * 2).to_bytes(2, "little") + (16).to_bytes(2, "little")
            + b"data" + data.to_bytes(4, "little"))


def _flac(rate, ch, total_samples, extra_block_first=False):
    packed = ((rate << 44) | ((ch - 1) << 41) | ((16 - 1) << 36)
              | total_samples)
    si = ((4096).to_bytes(2, "big") * 2 + b"\x00" * 6
          + packed.to_bytes(8, "big") + b"\x00" * 16)
    streaminfo = bytes([0x80]) + (34).to_bytes(3, "big") + si
    if extra_block_first:
        # a PADDING block before STREAMINFO exercises the block walk
        pad = bytes([0x01]) + (6).to_bytes(3, "big") + b"\x00" * 6
        streaminfo = pad + bytes([0x80]) + (34).to_bytes(3, "big") + si
    return b"fLaC" + streaminfo


def _ogg_vorbis(rate, ch):
    return (b"OggS" + b"\x00" * 22 + b"\x01vorbis"
            + (0).to_bytes(4, "little") + bytes([ch])
            + rate.to_bytes(4, "little") + b"\x00" * 8)


def _mp3_v1(n_bytes=41700, stereo=False):
    # 0xFF 0xFB = MPEG1 Layer III; 0x90 = 128 kbps @ 44100 Hz
    return (bytes([0xFF, 0xFB, 0x90, 0x00 if stereo else 0xC0])
            + b"\x00" * (n_bytes - 4))


def _mp3_v2(n_bytes=10000):
    # 0xFF 0xF3 = MPEG2 Layer III; 0x54 = 40 kbps @ 24000 Hz
    return bytes([0xFF, 0xF3, 0x54, 0xC0]) + b"\x00" * (n_bytes - 4)


def test_parse_audio_meta_goldens():
    from tsidx.multimodal import parse_audio_meta

    assert parse_audio_meta(_wav(44100, 2, 3)) == ("audio/wav", 44100, 2, 3000)
    assert parse_audio_meta(_wav(8000, 1, 10)) == ("audio/wav", 8000, 1, 10000)
    assert parse_audio_meta(_flac(48000, 2, 48000 * 5)) == (
        "audio/flac", 48000, 2, 5000)
    assert parse_audio_meta(_flac(48000, 2, 48000 * 5,
                                  extra_block_first=True)) == (
        "audio/flac", 48000, 2, 5000)
    # total_samples=0 means unknown -> duration null
    assert parse_audio_meta(_flac(22050, 1, 0)) == ("audio/flac", 22050, 1, None)
    assert parse_audio_meta(_ogg_vorbis(22050, 1)) == (
        "audio/ogg", 22050, 1, None)
    # MPEG1 L3 CBR 128 kbps: 41700 B * 8 / 128 kbps = 2606 ms
    assert parse_audio_meta(_mp3_v1()) == ("audio/mpeg", 44100, 1, 2606)
    assert parse_audio_meta(_mp3_v1(stereo=True)) == (
        "audio/mpeg", 44100, 2, 2606)
    # MPEG2 L3 40 kbps @ 24 kHz: 10000 B * 8 / 40 kbps = 2000 ms
    assert parse_audio_meta(_mp3_v2()) == ("audio/mpeg", 24000, 1, 2000)
    # garbage / truncation never raises
    assert parse_audio_meta(b"") == (None, None, None, None)
    assert parse_audio_meta(None) == (None, None, None, None)
    assert parse_audio_meta(b"not audio at all") == (None, None, None, None)
    assert parse_audio_meta(_wav(44100, 2, 3)[:10]) == (None, None, None, None)
    assert parse_audio_meta(b"fLaC\x80") == (None, None, None, None)
    assert parse_audio_meta(b"OggS no vorbis header") == (
        None, None, None, None)
    # reserved sample-rate index / reserved version / non-Layer-III rejected
    assert parse_audio_meta(bytes([0xFF, 0xFB, 0x9C, 0xC0]) + b"\x00" * 100
                            ) == (None, None, None, None)
    assert parse_audio_meta(bytes([0xFF, 0xEB, 0x90, 0xC0]) + b"\x00" * 100
                            ) == (None, None, None, None)
    assert parse_audio_meta(bytes([0xFF, 0xFD, 0x90, 0xC0]) + b"\x00" * 100
                            ) == (None, None, None, None)


def test_fill_audio_meta(spark):
    from tsidx.multimodal import fill_audio_meta

    rows = [
        (0, _wav(44100, 2, 2)),
        (1, _flac(48000, 1, 48000 * 7)),
        (2, _ogg_vorbis(16000, 2)),
        (3, _mp3_v1()),
        (4, b"utter garbage"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    media = fill_audio_meta(attach_media_metadata(df, kind="audio"))
    got = {
        r["media_id"]: (r["meta"]["mime"], r["meta"]["sample_rate"],
                        r["meta"]["duration_ms"])
        for r in media.collect()
    }
    assert got == {
        0: ("audio/wav", 44100, 2000),
        1: ("audio/flac", 48000, 7000),
        2: ("audio/ogg", 16000, None),
        3: ("audio/mpeg", 44100, 2606),
        4: (None, None, None),
        5: (None, None, None),
    }
    assert media.schema == attach_media_metadata(df, kind="audio").schema
    kinds = {r["media_id"]: r["meta"]["kind"] for r in media.collect()}
    assert all(k == "audio" for k in kinds.values())


# ---------------------------------------------------------------------------
# video container headers (MP4 ISO BMFF / AVI RIFF)
# ---------------------------------------------------------------------------


def _box(typ: bytes, payload: bytes) -> bytes:
    return (8 + len(payload)).to_bytes(4, "big") + typ + payload


def _mp4(timescale, dur_units, w, h, v=0, extra_audio_trak=True):
    if v == 1:
        mvhd = bytes([1, 0, 0, 0]) + b"\x00" * 16 + timescale.to_bytes(
            4, "big"
        ) + dur_units.to_bytes(8, "big") + b"\x00" * 80
    else:
        mvhd = bytes([0, 0, 0, 0]) + b"\x00" * 8 + timescale.to_bytes(
            4, "big"
        ) + dur_units.to_bytes(4, "big") + b"\x00" * 80
    def tkhd(width, height, version=0):
        pre = 88 if version == 1 else 76
        return bytes([version, 0, 0, 0]) + b"\x00" * (pre - 4) + (
            width << 16
        ).to_bytes(4, "big") + (height << 16).to_bytes(4, "big")
    traks = b""
    if extra_audio_trak:  # audio track first: 0x0 dims must be skipped
        traks += _box(b"trak", _box(b"tkhd", tkhd(0, 0)))
    traks += _box(b"trak", _box(b"tkhd", tkhd(w, h, version=v)))
    moov = _box(b"moov", _box(b"mvhd", mvhd) + traks)
    return _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + moov + _box(
        b"mdat", b"\x00" * 32
    )


def _avi(us_pf, frames, w, h):
    avih = (
        us_pf.to_bytes(4, "little")
        + b"\x00" * 12
        + frames.to_bytes(4, "little")
        + b"\x00" * 12
        + w.to_bytes(4, "little")
        + h.to_bytes(4, "little")
        + b"\x00" * 16
    )
    hdrl = b"LIST" + (4 + 8 + len(avih)).to_bytes(4, "little") + b"hdrl" + (
        b"avih" + len(avih).to_bytes(4, "little") + avih
    )
    body = b"AVI " + hdrl
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def test_parse_video_meta_goldens():
    from tsidx.multimodal import parse_video_meta

    # MP4 v0: 90000 units/s, 3s, 640x360, audio trak skipped
    assert parse_video_meta(_mp4(90000, 270000, 640, 360)) == (
        "video/mp4", 640, 360, 3000,
    )
    # MP4 v1 mvhd + v1 tkhd
    assert parse_video_meta(_mp4(600, 9000, 1920, 1080, v=1)) == (
        "video/mp4", 1920, 1080, 15000,
    )
    # no audio trak variant
    assert parse_video_meta(
        _mp4(1000, 2500, 320, 240, extra_audio_trak=False)
    ) == ("video/mp4", 320, 240, 2500)
    # AVI: 40ms/frame x 250 frames = 10s, 704x576
    assert parse_video_meta(_avi(40000, 250, 704, 576)) == (
        "video/x-msvideo", 704, 576, 10000,
    )
    # garbage / truncated / empty never raise
    assert parse_video_meta(b"not a video") == (None, None, None, None)
    assert parse_video_meta(b"") == (None, None, None, None)
    assert parse_video_meta(_mp4(90000, 270000, 640, 360)[:20]) == (
        "video/mp4", None, None, None,
    )
    assert parse_video_meta(None) == (None, None, None, None)


def test_fill_video_meta_spark(spark):
    from tsidx.multimodal import attach_media_metadata, fill_video_meta

    rows = [
        (0, _mp4(90000, 180000, 1280, 720)),
        (1, _avi(33333, 300, 640, 480)),
        (2, b"junk payload"),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    media = fill_video_meta(attach_media_metadata(df, kind="video"))
    got = {
        r["media_id"]: (
            r["meta"]["mime"],
            r["meta"]["width"],
            r["meta"]["height"],
            r["meta"]["duration_ms"],
        )
        for r in media.collect()
    }
    assert got == {
        0: ("video/mp4", 1280, 720, 2000),
        1: ("video/x-msvideo", 640, 480, 9999),
        2: (None, None, None, None),
    }


def test_media_meta_unified_mixed_corpus(spark):
    """One pass over interleaved image/audio/video/garbage payloads:
    sniff_media_meta dispatches on magic bytes and fills kind + the
    family fields; unknown bytes yield an all-null meta."""
    from tsidx.multimodal import media_meta, sniff_media_meta

    png = (b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR"
           + (40).to_bytes(4, "big") + (30).to_bytes(4, "big")
           + b"\x08\x06\x00\x00\x00")
    wav = _wav(22050, 2, 3)  # 3 s stereo
    mp4 = _mp4(90000, 180000, 1280, 720)
    rows = [(0, png), (1, wav), (2, mp4), (3, b"junk"), (4, None)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    media = media_meta(attach_media_metadata(df, kind=None))
    got = {
        r["media_id"]: (
            r["meta"]["kind"], r["meta"]["mime"], r["meta"]["width"],
            r["meta"]["height"], r["meta"]["duration_ms"],
            r["meta"]["sample_rate"],
        )
        for r in media.collect()
    }
    assert got[0] == ("image", "image/png", 40, 30, None, None)
    assert got[1] == ("audio", "audio/wav", None, None, 3000, 22050)
    assert got[2] == ("video", "video/mp4", 1280, 720, 2000, None)
    assert got[3] == (None, None, None, None, None, None)
    assert got[4] == (None, None, None, None, None, None)
    # the pure function agrees with the Spark pass
    assert sniff_media_meta(png) == ("image", "image/png", 40, 30, None, None)
