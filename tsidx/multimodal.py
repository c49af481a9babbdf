"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Training-data-pipeline extension (no reference counterpart). Images /
audio / video ride through the engine as ``binary`` columns with a typed
metadata struct; the Spark-side plumbing — schemas, partition-friendly
batch shapes, Arrow UDF signatures — is real and tested. Image
*dimensions and mime type* are parsed genuinely from container headers
(PNG IHDR, JPEG SOFn, GIF, BMP, WebP — :func:`parse_image_dims`) and
audio *sample rate / channels / duration* from audio container headers
(WAV fmt+data chunks, FLAC STREAMINFO, Ogg Vorbis identification header,
MP3 frame header — :func:`parse_audio_meta`), all pure Python, no codec
library. Only the sample-level feature decode is stubbed: those
libraries are not in this container, so ``decode_fn`` defaults to a
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
    "parse_image_dims",
    "fill_image_dims",
    "parse_audio_meta",
    "fill_audio_meta",
    "parse_video_meta",
    "fill_video_meta",
    "sniff_media_meta",
    "media_meta",
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
            F.lit(kind).cast("string").alias("kind"),
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


# MPEG audio frame-header tables (MPEG1/2/2.5 × Layer I/II/III).
# Bitrate rows indexed by the 4-bit bitrate field; kbit/s; 0 = free, None = bad.
_MP3_RATES = {  # (version_bits) -> sample rates by the 2-bit rate field
    3: (44100, 48000, 32000),   # MPEG1
    2: (22050, 24000, 16000),   # MPEG2
    0: (11025, 12000, 8000),    # MPEG2.5
}
_MP3_BITRATE_V1L3 = (None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                     224, 256, 320, None)
_MP3_BITRATE_V2L3 = (None, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112,
                     128, 144, 160, None)


def parse_audio_meta(
    payload: bytes,
) -> tuple[str | None, int | None, int | None, int | None]:
    """``(mime, sample_rate, channels, duration_ms)`` parsed from audio
    container headers alone — pure Python, no codec library:

    - WAV: walk the RIFF chunk list; ``fmt `` carries channels /
      sample rate / byte rate, ``data``'s declared size over the byte
      rate gives the exact duration.
    - FLAC: STREAMINFO metadata block — sample rate (20 bits),
      channels-1 (3 bits) and total samples (36 bits) packed big-endian;
      duration = total_samples / rate (null when total_samples is 0,
      i.e. unknown/streamed).
    - Ogg Vorbis: the identification header (``\\x01vorbis``) in the
      first page carries channels + rate; duration lives in the LAST
      page's granule position, which a header-only scan can't reach —
      left null.
    - MP3: first frame header's version/layer/bitrate/rate fields;
      duration estimated from the declared byte length only for CBR
      Layer III (VBR without a Xing walk would lie — left null).

    Unknown/truncated/corrupt payloads return all-``None`` — never
    raises, so a 10^10-clip scan can't be killed by one bad blob.
    """
    try:
        b = payload or b""
        if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            rate = channels = byte_rate = data_size = None
            i, n = 12, len(b)
            while i + 8 <= n:
                cid = b[i : i + 4]
                clen = int.from_bytes(b[i + 4 : i + 8], "little")
                if cid == b"fmt " and i + 24 <= n:
                    channels = int.from_bytes(b[i + 10 : i + 12], "little")
                    rate = int.from_bytes(b[i + 12 : i + 16], "little")
                    byte_rate = int.from_bytes(b[i + 16 : i + 20], "little")
                elif cid == b"data":
                    data_size = clen
                i += 8 + clen + (clen & 1)  # chunks are word-aligned
            dur = (
                data_size * 1000 // byte_rate
                if byte_rate and data_size is not None
                else None
            )
            if rate is None:
                return (None, None, None, None)
            return ("audio/wav", rate, channels, dur)
        if b[:4] == b"fLaC" and len(b) >= 8:
            i, n = 4, len(b)
            while i + 4 <= n:
                btype = b[i] & 0x7F
                blen = int.from_bytes(b[i + 1 : i + 4], "big")
                if btype == 0 and i + 4 + 18 <= n:  # STREAMINFO
                    s = i + 4
                    packed = int.from_bytes(b[s + 10 : s + 18], "big")
                    rate = packed >> 44
                    channels = ((packed >> 41) & 0x7) + 1
                    total = packed & ((1 << 36) - 1)
                    dur = total * 1000 // rate if rate and total else None
                    if not rate:
                        return (None, None, None, None)
                    return ("audio/flac", rate, channels, dur)
                if b[i] & 0x80:  # last-metadata-block flag
                    break
                i += 4 + blen
            return (None, None, None, None)
        if b[:4] == b"OggS":
            j = b.find(b"\x01vorbis", 0, 256)
            if j >= 0 and j + 16 <= len(b):
                channels = b[j + 11]
                rate = int.from_bytes(b[j + 12 : j + 16], "little")
                return ("audio/ogg", rate or None, channels or None, None)
            return (None, None, None, None)
        if len(b) >= 4 and b[0] == 0xFF and (b[1] & 0xE0) == 0xE0:
            version = (b[1] >> 3) & 0x3  # 3=MPEG1 2=MPEG2 0=MPEG2.5
            layer = (b[1] >> 1) & 0x3    # 1=Layer III
            if version == 1 or layer != 1:
                return (None, None, None, None)
            rate_idx = (b[2] >> 2) & 0x3
            if rate_idx == 3:
                return (None, None, None, None)
            rate = _MP3_RATES[version][rate_idx]
            channels = 1 if (b[3] >> 6) & 0x3 == 3 else 2
            table = _MP3_BITRATE_V1L3 if version == 3 else _MP3_BITRATE_V2L3
            kbps = table[(b[2] >> 4) & 0xF]
            dur = len(b) * 8 // kbps if kbps else None
            return ("audio/mpeg", rate, channels, dur)
        return (None, None, None, None)
    except Exception:
        return (None, None, None, None)


def fill_audio_meta(media: DataFrame) -> DataFrame:
    """Fill ``meta.mime/sample_rate/duration_ms`` genuinely from the
    payload's audio container header (:func:`parse_audio_meta`) — the
    audio twin of :func:`fill_image_dims`, same map-only Arrow pass, no
    shuffle, no driver data. Channel count is parsed too but the shared
    media struct doesn't carry a channels field; callers that need it
    use :func:`parse_audio_meta` directly in their own pass."""

    def _fill(batches):
        for pdf in batches:
            metas = []
            for payload, m in zip(pdf["payload"], pdf["meta"]):
                data = bytes(payload) if payload is not None else b""
                mime, rate, _channels, dur = parse_audio_meta(data)
                d = dict(m) if m is not None else {
                    "kind": None, "mime": None, "width": None,
                    "height": None, "duration_ms": None, "sample_rate": None,
                }
                d.update(mime=mime, sample_rate=rate, duration_ms=dur)
                metas.append(d)
            pdf = pdf.copy()
            pdf["meta"] = metas
            yield pdf

    return media.mapInPandas(_fill, schema=media.schema)


def parse_video_meta(
    payload: bytes,
) -> tuple[str | None, int | None, int | None, int | None]:
    """``(mime, width, height, duration_ms)`` parsed from video container
    headers alone — pure Python, no codec library (the video twin of
    :func:`parse_audio_meta`):

    - MP4 / ISO BMFF: walk the top-level box list (``[size be32][type]``)
      to ``moov``; ``moov > mvhd`` carries timescale + duration (v0:
      32-bit, v1: 64-bit fields), ``moov > trak > tkhd`` carries
      presentation width/height as 16.16 fixed point — the first track
      with nonzero dimensions is the video track (audio tracks store 0×0).
    - AVI: walk the RIFF chunk list descending into ``LIST`` chunks; the
      ``avih`` main header carries µs-per-frame, total frames, and
      width/height; duration = frames · µs-per-frame.

    Codec payloads (``mdat``, ``movi``) are never touched. Unknown /
    truncated / corrupt payloads return all-``None`` — never raises, so
    a 10^10-clip scan can't be killed by one bad blob.
    """
    try:
        b = payload or b""
        n = len(b)
        if n >= 12 and b[4:8] == b"ftyp":
            dur_ms = width = height = None
            i = 0
            while i + 8 <= n:
                size = int.from_bytes(b[i : i + 4], "big")
                typ = b[i + 4 : i + 8]
                if size < 8:
                    break
                if typ == b"moov":
                    j, end = i + 8, min(i + size, n)
                    while j + 8 <= end:
                        s2 = int.from_bytes(b[j : j + 4], "big")
                        t2 = b[j + 4 : j + 8]
                        if s2 < 8:
                            break
                        if t2 == b"mvhd" and j + 8 < end:
                            v = b[j + 8]
                            if v == 1 and j + 8 + 28 + 8 <= end:
                                ts = int.from_bytes(
                                    b[j + 28 : j + 32], "big"
                                )
                                dur = int.from_bytes(
                                    b[j + 32 : j + 40], "big"
                                )
                            elif j + 8 + 12 + 8 <= end:
                                ts = int.from_bytes(
                                    b[j + 20 : j + 24], "big"
                                )
                                dur = int.from_bytes(
                                    b[j + 24 : j + 28], "big"
                                )
                            else:
                                ts = dur = 0
                            if ts:
                                dur_ms = dur * 1000 // ts
                        elif t2 == b"trak":
                            k, tend = j + 8, min(j + s2, end)
                            while k + 8 <= tend:
                                s3 = int.from_bytes(b[k : k + 4], "big")
                                t3 = b[k + 4 : k + 8]
                                if s3 < 8:
                                    break
                                if t3 == b"tkhd" and k + 8 < tend:
                                    v3 = b[k + 8]
                                    # v0 payload: 4+4+4+4+4+4+8+2+2+2+2+36
                                    # = 76 bytes before width; v1 adds 12
                                    off = k + 8 + (88 if v3 == 1 else 76)
                                    if off + 8 <= tend:
                                        w = int.from_bytes(
                                            b[off : off + 4], "big"
                                        ) >> 16
                                        h = int.from_bytes(
                                            b[off + 4 : off + 8], "big"
                                        ) >> 16
                                        if w and h and width is None:
                                            width, height = w, h
                                k += s3
                        j += s2
                i += size
            return ("video/mp4", width, height, dur_ms)
        if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
            i = 12
            while i + 8 <= n:
                cid = b[i : i + 4]
                clen = int.from_bytes(b[i + 4 : i + 8], "little")
                if cid == b"LIST":
                    i += 12  # descend into the list's children
                    continue
                if cid == b"avih" and i + 8 + 40 <= n:
                    us_pf = int.from_bytes(b[i + 8 : i + 12], "little")
                    frames = int.from_bytes(b[i + 24 : i + 28], "little")
                    w = int.from_bytes(b[i + 40 : i + 44], "little")
                    h = int.from_bytes(b[i + 44 : i + 48], "little")
                    dur = (
                        frames * us_pf // 1000 if us_pf and frames else None
                    )
                    return (
                        "video/x-msvideo",
                        w or None,
                        h or None,
                        dur,
                    )
                i += 8 + clen + (clen & 1)
            return ("video/x-msvideo", None, None, None)
    except Exception:
        pass
    return (None, None, None, None)


def fill_video_meta(media: DataFrame) -> DataFrame:
    """Fill ``meta.mime/width/height/duration_ms`` genuinely from the
    payload's video container header (:func:`parse_video_meta`) — same
    map-only Arrow pass as :func:`fill_image_dims` / `fill_audio_meta`."""

    def _fill(batches):
        for pdf in batches:
            metas = []
            for payload, m in zip(pdf["payload"], pdf["meta"]):
                data = bytes(payload) if payload is not None else b""
                mime, w, h, dur = parse_video_meta(data)
                d = dict(m) if m is not None else {
                    "kind": None, "mime": None, "width": None,
                    "height": None, "duration_ms": None, "sample_rate": None,
                }
                d.update(mime=mime, width=w, height=h, duration_ms=dur)
                metas.append(d)
            pdf = pdf.copy()
            pdf["meta"] = metas
            yield pdf

    return media.mapInPandas(_fill, schema=media.schema)


def sniff_media_meta(
    payload: bytes,
) -> tuple[str | None, str | None, int | None, int | None, int | None, int | None]:
    """``(kind, mime, width, height, duration_ms, sample_rate)`` for a
    payload of UNKNOWN type: dispatch on the container magic bytes, then
    reuse the per-family header parsers. The unified entry point for
    mixed-media corpora where rows don't arrive pre-sorted by kind.

    Magic-byte dispatch, not try-each-parser: every supported container
    is identified by its first bytes (PNG/JPEG/GIF/BMP/WebP; RIFF-WAVE
    vs RIFF-AVI vs RIFF-WEBP by the form type at offset 8; fLaC; OggS;
    MP3 frame sync; ISO-BMFF ``ftyp``), so a payload is parsed at most
    once and garbage touches only the first 16 bytes.
    """
    data = payload or b""
    head = data[:16]
    if head[:8] == b"\x89PNG\r\n\x1a\n" or head[:2] == b"\xff\xd8" or head[
        :6
    ] in (b"GIF87a", b"GIF89a") or head[:2] == b"BM":
        mime, w, h = parse_image_dims(data)
        return ("image", mime, w, h, None, None) if mime else _NO_META
    if head[:4] == b"RIFF" and len(head) >= 12:
        form = head[8:12]
        if form == b"WEBP":
            mime, w, h = parse_image_dims(data)
            return ("image", mime, w, h, None, None) if mime else _NO_META
        if form == b"WAVE":
            mime, rate, _ch, dur = parse_audio_meta(data)
            return ("audio", mime, None, None, dur, rate) if mime else _NO_META
        if form == b"AVI ":
            mime, w, h, dur = parse_video_meta(data)
            return ("video", mime, w, h, dur, None) if mime else _NO_META
        return _NO_META
    if head[:4] in (b"fLaC", b"OggS") or (
        len(head) >= 2 and head[0] == 0xFF and (head[1] & 0xE0) == 0xE0
    ):
        mime, rate, _ch, dur = parse_audio_meta(data)
        return ("audio", mime, None, None, dur, rate) if mime else _NO_META
    if len(head) >= 8 and head[4:8] == b"ftyp":
        mime, w, h, dur = parse_video_meta(data)
        return ("video", mime, w, h, dur, None) if mime else _NO_META
    return _NO_META


_NO_META = (None, None, None, None, None, None)


def media_meta(media: DataFrame) -> DataFrame:
    """Unified metadata fill for a MIXED media corpus: one map-only
    Arrow pass sniffs each payload's container (:func:`sniff_media_meta`)
    and fills the WHOLE ``meta`` struct — kind included — behind the one
    :data:`MEDIA_SCHEMA`. The single profiling entry point when a corpus
    column holds images, audio, and video interleaved (the usual shape of
    a crawled attachment table); rows whose bytes match no supported
    container come back with an all-null meta rather than an error.

    Scale shape: identical to the per-family fills — no shuffle, no
    driver data, header-bytes-only reads; run once at ingest and persist
    the meta column so later profiling never rescans payloads.

    **Deep-decode plug point**: this pass (and :func:`extract_features`)
    is where a real decoder slots in. Replace
    :func:`default_fake_decode` with a function ``(payload: bytes,
    kind: str) -> list[float]`` backed by PIL/pyav/ffmpeg on a cluster
    that has them — the Spark plumbing (Arrow batching, schema,
    payload-pruned downstream plans) is identical; ONLY the pure
    function changes. No codec faking here: absent a real library the
    pipeline reports honest header facts and a clearly-labeled stub
    embedding, never synthesized pixels.
    """

    def _fill(batches):
        for pdf in batches:
            metas = []
            for payload in pdf["payload"]:
                data = bytes(payload) if payload is not None else b""
                kind, mime, w, h, dur, rate = sniff_media_meta(data)
                metas.append({
                    "kind": kind, "mime": mime, "width": w, "height": h,
                    "duration_ms": dur, "sample_rate": rate,
                })
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
