"""Bloom-filter semi-join reduction — broadcast a bitmap, not a table.

The decontamination operators (tsidx/decontam.py) broadcast the
benchmark's distinct gram-hash TABLE, which is right while eval suites
are MBs. At cross-corpus scale (decontaminating against 10^8-10^9 held-
out grams) the table outgrows the broadcast budget and the exact join
would shuffle the full corpus gram stream. The classic fix — what Spark
itself does for runtime filtering, rebuilt here because
``bloom_filter_agg`` is not SQL-registered in stock builds — is to
broadcast a compact Bloom BITMAP instead and pre-filter the corpus side
with it: grams that fail the bitmap (guaranteed non-members) drop
before the join, so the exact join's streamed side shrinks to true
matches + the fp-rate residue, and the final join keeps the result
EXACT (false positives die there; Bloom filters have no false
negatives — the pre-filter can never drop a real hit).

Everything is JVM expressions:

- **build** — one pass over the key table explodes each key into its k
  bit positions (``pmod(xxhash64(key, i), m)``), then ONE partial-
  aggregated groupBy over at most ``m/64`` word indices ``bit_or``-folds
  the words. Shuffle is bounded by the bitmap size, never the key count.
- **probe** — the dense word array rides a broadcast single row
  (1-row BNLJ, the repo's waived bounded-by-construction pattern;
  an ARRAY LITERAL would put m/64 children in the expression tree);
  membership is ``forall`` over the k bit tests, whole-stage-codegen
  eligible, no Python.

Determinism: xxhash64 with fixed per-probe seeds — the bitmap and every
probe outcome are pure functions of the data, identical across
partitionings and retries (same discipline as tsidx/sketches.py's
sampled candidates).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "bloom_params",
    "bloom_words",
    "bloom_bitmap",
    "bloom_prefilter",
    "ngram_overlap_bloom",
]

_WORD = 64


def bloom_params(n_keys: int, bits_per_key: int = 10) -> tuple[int, int]:
    """``(m_bits, k)`` for *n_keys* expected members: m rounded up to a
    whole word, k = round(ln2 * m/n) clamped to [1, 8] (~1% fp at the
    default 10 bits/key)."""
    n_keys = max(1, int(n_keys))
    m_bits = max(_WORD, ((n_keys * bits_per_key + _WORD - 1) // _WORD) * _WORD)
    k = min(8, max(1, round(math.log(2.0) * m_bits / n_keys)))
    return m_bits, k


def bloom_words(keys: DataFrame, key_col: str, m_bits: int, k: int) -> DataFrame:
    """``(idx, word)`` — the set words of the bitmap (absent idx = 0).
    One partial-aggregated groupBy over <= m/64 indices; the key table
    is scanned once and never collected."""
    m_bits, k = int(m_bits), int(k)
    if m_bits % _WORD:
        raise ValueError("m_bits must be a multiple of 64")
    pos = F.explode(
        F.expr(
            f"transform(sequence(0, {k - 1}),"
            f" i -> pmod(xxhash64(`{key_col}`, i), {m_bits}L))"
        )
    ).alias("pos")
    return (
        keys.where(F.col(key_col).isNotNull())
        .select(pos)
        .groupBy(F.expr(f"pos div {_WORD}").alias("idx"))
        .agg(
            F.expr(
                f"bit_or(shiftleft(1L, cast(pos % {_WORD} AS int)))"
            ).alias("word")
        )
    )


def bloom_bitmap(words: DataFrame, m_bits: int) -> DataFrame:
    """ONE row ``(_bloom_arr array<long>)`` — the dense bitmap, built
    from :func:`bloom_words` with absent words zero-filled. The single
    row is what gets broadcast to probes; its size is m_bits/8 bytes
    regardless of how many keys went in."""
    n_words = int(m_bits) // _WORD
    return words.agg(
        F.map_from_entries(
            F.collect_list(F.struct("idx", "word"))
        ).alias("_m")
    ).select(
        F.expr(
            f"transform(sequence(0, {n_words - 1}),"
            f" i -> coalesce(element_at(_m, cast(i AS bigint)), 0L))"
        ).alias("_bloom_arr")
    )


def bloom_prefilter(
    probe: DataFrame,
    key_col: str,
    bitmap: DataFrame,
    m_bits: int,
    k: int,
) -> DataFrame:
    """Rows of *probe* whose *key_col* might be a member: ``forall`` of
    the k bit tests against the broadcast one-row bitmap. Guaranteed to
    pass every true member through (no false negatives); non-members
    leak at the fp rate and MUST be killed by a downstream exact join."""
    m_bits, k = int(m_bits), int(k)
    test = (
        f"forall(sequence(0, {k - 1}), i -> ("
        f"  element_at(_bloom_arr,"
        f"    cast(pmod(xxhash64(`{key_col}`, i), {m_bits}L) div {_WORD}"
        f"         AS int) + 1)"
        f"  & shiftleft(1L, cast(pmod(xxhash64(`{key_col}`, i), {m_bits}L)"
        f"                       % {_WORD} AS int))"
        f") != 0L)"
    )
    return (
        probe.crossJoin(F.broadcast(bitmap))
        .where(F.expr(test))
        .drop("_bloom_arr")
    )


def ngram_overlap_bloom(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    *,
    tau: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits_per_key: int = 10,
    max_bitmap_bytes: int = 64 << 20,
) -> DataFrame:
    """Exactly :func:`tsidx.decontam.ngram_overlap` — same schema, same
    values for every input — via the Bloom plan: the benchmark gram
    table is folded into a bitmap (broadcast bytes = m/8, independent
    of the benchmark's row count), corpus grams pre-filter against it,
    and the exact hash join over the surviving sliver restores
    exactness. Use when the benchmark side outgrows the broadcast
    budget; the DuckDB twin is the plain exact overlap, which is the
    point — the plan changes, the answer must not.

    The bitmap itself is a driver-side/broadcast expansion, so it gets
    the repo-standard explicit byte bound (ADVICE r4): if ``m_bits/8``
    exceeds *max_bitmap_bytes* (default 64 MiB, ~3.4e8 keys at the
    default 10 bits/key), the Bloom pre-filter is skipped and the plan
    degrades to the plain distributed exact join — same answer, no
    unbounded single-row array ever built."""
    from tsidx.decontam import benchmark_grams, doc_ngram_hashes

    bench = benchmark_grams(benchmark, n, text_col=text_col)
    bench = bench.localCheckpoint(eager=False)  # feeds count + build + join
    n_bench = bench.count()
    m_bits, k = bloom_params(n_bench, bits_per_key)

    grams = doc_ngram_hashes(corpus, n, id_col=id_col, text_col=text_col)
    grams = grams.localCheckpoint(eager=False)  # totals + probe share it
    totals = grams.groupBy(id_col).agg(F.count("gram_hash").alias("n_grams"))
    live = grams.where(F.col("gram_hash").isNotNull())
    if m_bits // 8 <= int(max_bitmap_bytes):
        bitmap = bloom_bitmap(
            bloom_words(bench, "gram_hash", m_bits, k), m_bits
        )
        candidates = bloom_prefilter(live, "gram_hash", bitmap, m_bits, k)
    else:  # over budget: exact distributed join, no bitmap materialized
        candidates = live
    hits = (
        candidates.join(bench, on="gram_hash")  # exact: fp die here
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_hit"))
    )
    agg = totals.join(hits, on=id_col, how="left").select(
        id_col,
        "n_grams",
        F.coalesce(F.col("n_hit"), F.lit(0)).cast("long").alias("n_hit"),
    )
    frac = F.when(
        F.col("n_grams") > 0,
        F.col("n_hit").cast("double") / F.col("n_grams"),
    ).otherwise(F.lit(0.0))
    return agg.select(
        id_col,
        "n_grams",
        "n_hit",
        frac.alias("overlap_frac"),
        (frac >= F.lit(float(tau))).alias("contaminated"),
    )
