"""Winnowing document fingerprints (MOSS-style local fingerprinting).

Schleimer, Wilkerson & Aiken, "Winnowing: Local Algorithms for Document
Fingerprinting" (SIGMOD 2003): hash every k-gram of a document, slide a
window of w consecutive gram hashes, and in each window select the
minimum hash (rightmost occurrence on ties). The selected (hash,
position) pairs form the document's fingerprint with the guarantee that
any match of length >= w + k - 1 tokens between two documents shares at
least one fingerprint — unlike MinHash (a whole-document sketch) the
fingerprints are *local*, so they localize shared passages, and unlike
the full gram set they are ~2/(w+1) of the grams.

Operators:
- :func:`winnow_fingerprints` — per-doc selected (pos, fp) rows.
- :func:`winnow_pairs` — document pairs sharing >= min_shared
  fingerprint values (plagiarism / quote-reuse candidates).

Scale design:
- Fingerprint selection is **map-only, zero shuffles**: token split,
  gram hashing, and the window-minimum fold are all JVM higher-order
  functions over per-row arrays; `array_distinct` dedupes selected
  pairs per doc *before* the explode, so no row-level DISTINCT shuffle
  is ever needed. A 100 TB corpus fingerprint pass is one scan.
- The gram hash is md5 (hex string, lexicographic min) so the selection
  is engine-reproducible — the DuckDB oracle twin computes the identical
  fingerprint set. The per-window fold is O(w) per window via a running
  (hash, pos) accumulator; `<=` keeps the *rightmost* minimal gram,
  matching the paper's tie rule.
- Pair generation (:func:`winnow_pairs`) reuses the hot-key-capped
  sorted-array combination shape of tsidx/cooccur.py: group docs by
  fingerprint value, cap pathological fingerprints (boilerplate) at
  *max_key_df* docs, emit exactly b(b-1)/2 pairs per fingerprint.
  Shuffle volume is (fp, doc_id) rows — 16-byte keys, never text.

No reference counterpart; training-data-pipeline operator (plagiarism /
near-dup passage detection) per the build brief.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["winnow_fingerprints", "winnow_pairs", "winnow_cross_pairs"]

#: Fold seed: md5 hex is [0-9a-f]{32}, so any string starting past 'f'
#: compares greater than every real hash.
_SENTINEL = "~"


def winnow_fingerprints(
    docs: DataFrame,
    *,
    k: int = 4,
    w: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(id_col, pos, fp)`` — the winnowing fingerprint set of each doc.

    ``pos`` is the 1-based token index where the selected k-gram starts;
    ``fp`` is the md5 hex of the space-joined k tokens. Documents
    shorter than k tokens contribute their single truncated gram
    (``slice`` truncates at the array end, as does the oracle's array
    slice), so every doc has >= 1 fingerprint.
    """
    if k < 1 or w < 1:
        raise ValueError("k and w must be >= 1")
    with_t = docs.select(
        F.col(id_col), F.split(F.trim(F.col(text_col)), r"\s+").alias("_t")
    )
    # gram hash array: one md5 per window start (truncating slice)
    with_g = with_t.select(
        id_col,
        F.expr(
            f"transform(sequence(1, greatest(size(_t) - {k} + 1, 1)),"
            f" i -> md5(concat_ws(' ', slice(_t, i, {k}))))"
        ).alias("_g"),
    )
    # per window j: rightmost-minimum (hash, pos) via a running fold;
    # `<=` keeps the rightmost among equal minima (the paper's tie rule)
    sel = (
        f"transform(sequence(1, greatest(size(_g) - {w} + 1, 1)),"
        f" j -> aggregate(sequence(j, least(j + {w} - 1, size(_g))),"
        f"   struct(cast('{_SENTINEL}' as string) AS h, cast(-1 as int) AS p),"
        f"   (acc, q) -> if(element_at(_g, q) <= acc.h,"
        f"     struct(element_at(_g, q) AS h, q AS p), acc)))"
    )
    return (
        with_g.select(
            id_col, F.explode(F.expr(f"array_distinct({sel})")).alias("_s")
        )
        .select(
            id_col,
            F.col("_s.p").cast("long").alias("pos"),
            F.col("_s.h").alias("fp"),
        )
    )


def winnow_pairs(
    fingerprints: DataFrame,
    *,
    min_shared: int = 2,
    max_key_df: int | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """``(id_a, id_b, n_shared)`` — unordered doc pairs sharing at least
    *min_shared* distinct fingerprint *values* (positions ignored: a
    shared passage fingerprints at different offsets in each doc).

    *max_key_df* drops fingerprints present in more than that many docs
    (boilerplate grams — the quadratic hot-key safety valve, same role
    as the shingle cap in tsidx/dedup.py). Call with a cap at scale.
    """
    if max_key_df is None:
        warnings.warn(
            "winnow_pairs without max_key_df: boilerplate fingerprints "
            "make pair generation quadratic; set a cap at scale",
            stacklevel=2,
        )
    incidence = fingerprints.select("fp", F.col(id_col).alias("_d")).distinct()
    grouped = incidence.groupBy("fp").agg(
        F.sort_array(F.collect_set("_d")).alias("ds")
    )
    if max_key_df is not None:
        grouped = grouped.filter(F.size("ds") <= int(max_key_df))
    # combination explode: exactly b(b-1)/2 rows per fingerprint
    pairs = grouped.select(
        F.explode(
            F.expr(
                "flatten(transform(ds, (a, i) ->"
                " transform(slice(ds, i + 2, size(ds)), b ->"
                " struct(a AS id_a, b AS id_b))))"
            )
        ).alias("pr")
    ).select("pr.id_a", "pr.id_b")
    return (
        pairs.groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= int(min_shared))
    )


def winnow_cross_pairs(
    new_fps: DataFrame,
    ref_fps: DataFrame,
    *,
    min_shared: int = 2,
    max_key_df: int | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """``(new_id, ref_id, n_shared)`` — cross-corpus plagiarism / reuse
    detection: new docs sharing at least *min_shared* distinct winnowing
    fingerprint values with a REFERENCE corpus (the MOSS deployment
    shape: submissions vs the archive; a crawl batch vs the curated
    training set). Directional by construction — new x new and
    ref x ref pairs are never generated, so per-bucket cost is
    ``|new ∩ bucket| * |ref ∩ bucket|``, not ``|bucket|²`` (the same
    asymmetry as ``tsidx.dedup.cross_dup_candidates``).

    *max_key_df* caps the REFERENCE side's bucket width (boilerplate
    fingerprints; the quadratic safety valve). Both inputs are
    :func:`winnow_fingerprints` outputs — build the reference side once
    and persist it; incremental batches then join against it.
    """
    if max_key_df is None:
        warnings.warn(
            "winnow_cross_pairs without max_key_df: boilerplate "
            "fingerprints make the bucket join quadratic; set a cap at "
            "scale",
            stacklevel=2,
        )
    new_inc = new_fps.select("fp", F.col(id_col).alias("new_id")).distinct()
    ref_inc = ref_fps.select("fp", F.col(id_col).alias("ref_id")).distinct()
    if max_key_df is not None:
        ref_df = ref_inc.groupBy("fp").agg(F.count("*").alias("_df"))
        ref_inc = ref_inc.join(
            ref_df.filter(F.col("_df") <= int(max_key_df)).select("fp"), "fp"
        )
    return (
        new_inc.join(ref_inc, "fp")
        .groupBy("new_id", "ref_id")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= int(min_shared))
    )
