"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Training-data-pipeline extension (no reference counterpart). Images /
audio / video ride through the engine as ``binary`` columns with a typed
metadata struct; the Spark-side plumbing — schemas, partition-friendly
batch shapes, Arrow UDF signatures — is real and tested. Image
*dimensions and mime type* are parsed genuinely from container headers
(PNG IHDR, JPEG SOFn, GIF, BMP, WebP — :func:`parse_image_dims`, pure
Python, no codec library). Only the pixel-level feature decode is
stubbed: those libraries are not in this container, so ``decode_fn``
defaults to a deterministic fake that derives feature values from the
payload bytes. Swap in a real decoder (PIL / torchaudio / pyav) via the
``decode_fn`` parameter on a cluster that ships one.

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
    "parse_image_dims",
    "fill_image_dims",
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


# JPEG start-of-frame markers that carry dimensions (SOF0..SOF15 minus
# DHT 0xC4 / JPG 0xC8 / DAC 0xCC, which share the range but aren't frames)
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def parse_image_dims(payload: bytes) -> tuple[str | None, int | None, int | None]:
    """``(mime, width, height)`` parsed from image container headers alone
    — pure Python over the first bytes, no codec library needed (the
    dimensions live in the header for every mainstream format):

    - PNG: IHDR chunk — big-endian uint32 pair right after the 8-byte
      signature + chunk header.
    - JPEG: walk the segment list to the first SOFn marker; height/width
      are big-endian uint16s after the precision byte.
    - GIF (87a/89a): logical screen descriptor — little-endian uint16s.
    - BMP: BITMAPINFOHEADER int32s at offset 18 (height may be negative
      for top-down rows — absolute value).
    - WebP: VP8X (24-bit canvas-1), VP8L (14-bit packed -1), or lossy
      VP8 key-frame dimensions.

    Unknown/truncated/corrupt payloads return ``(None, None, None)`` —
    never raises, so a 10^10-image scan can't be killed by one bad blob.
    """
    try:
        b = payload or b""
        if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24 and b[12:16] == b"IHDR":
            w = int.from_bytes(b[16:20], "big")
            h = int.from_bytes(b[20:24], "big")
            return ("image/png", w, h)
        if b[:2] == b"\xff\xd8":  # JPEG SOI
            i = 2
            n = len(b)
            while i + 4 <= n:
                if b[i] != 0xFF:
                    return (None, None, None)
                marker = b[i + 1]
                if marker == 0xFF:  # fill byte padding
                    i += 1
                    continue
                if 0xD0 <= marker <= 0xD9 or marker == 0x01:  # bare markers
                    i += 2
                    continue
                seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
                if marker in _JPEG_SOF:
                    if i + 9 > n:
                        break
                    h = int.from_bytes(b[i + 5 : i + 7], "big")
                    w = int.from_bytes(b[i + 7 : i + 9], "big")
                    return ("image/jpeg", w, h)
                i += 2 + seg_len
            return (None, None, None)
        if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
            w = int.from_bytes(b[6:8], "little")
            h = int.from_bytes(b[8:10], "little")
            return ("image/gif", w, h)
        if b[:2] == b"BM" and len(b) >= 26:
            w = int.from_bytes(b[18:22], "little", signed=True)
            h = int.from_bytes(b[22:26], "little", signed=True)
            return ("image/bmp", abs(w), abs(h))
        if b[:4] == b"RIFF" and b[8:12] == b"WEBP":
            chunk = b[12:16]
            if chunk == b"VP8X" and len(b) >= 30:
                w = int.from_bytes(b[24:27], "little") + 1
                h = int.from_bytes(b[27:30], "little") + 1
                return ("image/webp", w, h)
            if chunk == b"VP8L" and len(b) >= 25 and b[20] == 0x2F:
                bits = int.from_bytes(b[21:25], "little")
                w = (bits & 0x3FFF) + 1
                h = ((bits >> 14) & 0x3FFF) + 1
                return ("image/webp", w, h)
            if chunk == b"VP8 " and len(b) >= 30 and b[23:26] == b"\x9d\x01\x2a":
                w = int.from_bytes(b[26:28], "little") & 0x3FFF
                h = int.from_bytes(b[28:30], "little") & 0x3FFF
                return ("image/webp", w, h)
        return (None, None, None)
    except Exception:
        return (None, None, None)


def fill_image_dims(media: DataFrame) -> DataFrame:
    """Fill ``meta.mime/width/height`` genuinely from the payload's
    container header (:func:`parse_image_dims`) — the first profiling
    question over an image corpus, answered without any codec library.

    Scale shape: one map-only Arrow pass (``mapInPandas``); no shuffle,
    no driver data. Only the header bytes are *read* per row, though the
    payload column is necessarily scanned (parquet stores the blob
    inline) — at 100 TB run this once at ingest and persist the metadata
    so downstream profiling plans stay payload-pruned.
    """

    def _fill(batches):
        for pdf in batches:
            metas = []
            for payload, m in zip(pdf["payload"], pdf["meta"]):
                data = bytes(payload) if payload is not None else b""
                mime, w, h = parse_image_dims(data)
                d = dict(m) if m is not None else {
                    "kind": None, "mime": None, "width": None,
                    "height": None, "duration_ms": None, "sample_rate": None,
                }
                d.update(mime=mime, width=w, height=h)
                metas.append(d)
            pdf = pdf.copy()
            pdf["meta"] = metas
            yield pdf

    return media.mapInPandas(_fill, schema=media.schema)


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
