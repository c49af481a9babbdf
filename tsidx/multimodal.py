"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Training-data-pipeline extension (no reference counterpart). Images /
audio / video ride through the engine as ``binary`` columns with a typed
metadata struct; the Spark-side plumbing — schemas, partition-friendly
batch shapes, Arrow UDF signatures — is real and tested, while the actual
codec work (JPEG decode, resampling, frame extraction) is stubbed: the
decode libraries are not in this container, so ``decode_fn`` defaults to a
deterministic fake that derives feature values from the payload bytes.
Swap in a real decoder (PIL / torchaudio / pyav) via the ``decode_fn``
parameter on a cluster that ships one.

Batch shape notes for 100 TB: payloads dominate row size, so stages that
don't need bytes must prune the column (metadata-only plans never touch
payload pages in parquet); feature extraction uses ``mapInPandas`` so one
Arrow batch holds few rows of large payloads without 2 GB record limits
being hit per row-group.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "MEDIA_SCHEMA",
    "attach_media_metadata",
    "extract_features",
    "frame_sample_plan",
    "default_fake_decode",
]

# (payload binary, media struct) — the typed metadata carried beside bytes
MEDIA_SCHEMA = (
    "media_id long, payload binary, "
    "meta struct<kind: string, mime: string, width: int, height: int, "
    "duration_ms: int, sample_rate: int>"
)

_FEATURES_SCHEMA = "media_id long, kind string, n_bytes long, digest string, feat array<float>"


def attach_media_metadata(df: DataFrame, payload_col: str = "payload",
                          kind: str = "image") -> DataFrame:
    """Wrap a raw binary column in the typed media schema. Width/height and
    friends are unknown until decode -> left null; the decode stage fills
    them on a real cluster."""
    return df.select(
        F.col("media_id"),
        F.col(payload_col).alias("payload"),
        F.struct(
            F.lit(kind).alias("kind"),
            F.lit(None).cast("string").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def default_fake_decode(payload: bytes, kind: str, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder: features derived from a
    sha256 of the payload. NOT a real decode — clearly-marked stub; the
    pipeline shape (bytes in, float vector out) matches the real thing."""
    digest = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in digest[:dim]]


def extract_features(
    media: DataFrame, decode_fn=None, dim: int = 8
) -> DataFrame:
    """Arrow-batched feature extraction over (media_id, payload, meta).

    ``decode_fn(payload: bytes, kind: str, dim: int) -> list[float]`` is the
    pluggable decode step; defaults to :func:`default_fake_decode`.
    """
    fn = decode_fn or default_fake_decode

    def _extract(batches):
        import pandas as pd

        for pdf in batches:
            out = {
                "media_id": [], "kind": [], "n_bytes": [], "digest": [],
                "feat": [],
            }
            kinds = [m["kind"] if m is not None else None for m in pdf["meta"]]
            for media_id, payload, kind in zip(
                pdf["media_id"], pdf["payload"], kinds
            ):
                data = bytes(payload) if payload is not None else b""
                out["media_id"].append(media_id)
                out["kind"].append(kind)
                out["n_bytes"].append(len(data))
                out["digest"].append(hashlib.sha256(data).hexdigest()[:16])
                out["feat"].append(fn(data, kind, dim))
            yield pd.DataFrame(out)

    return media.mapInPandas(_extract, schema=_FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Plan for video frame sampling: one output row per sampled timestamp.

    The frame *positions* are computed JVM-side from metadata only (no
    payload touched until the decode stage); a real decoder then seeks each
    (media_id, ts_ms). With stubbed metadata (null duration) this yields
    one row at t=0 per video — the plan shape is what's under test.
    """
    duration = F.coalesce(F.col("meta.duration_ms"), F.lit(0))
    n_frames = F.greatest(
        (duration / every_ms).cast("int"), F.lit(1)
    )
    return media.select(
        "media_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_frames - 1),
                lambda i: i * every_ms,
            )
        ).alias("ts_ms"),
    )
