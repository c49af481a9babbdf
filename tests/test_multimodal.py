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
