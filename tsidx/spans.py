"""Repeated-span detection and removal (substring deduplication).

"Deduplicating Training Data Makes Language Models Better" (Lee et al.,
2021) shows that removing *spans* repeated across a corpus — not just
whole-document duplicates — measurably improves LMs. Their ExactSubstr
tool builds a suffix array; the Spark-native equivalent is a rolling
window of token n-grams: a span of >= n tokens repeated anywhere in the
corpus necessarily repeats every one of its length-n sub-grams, so
flagging duplicated n-grams and merging overlapping flagged windows
recovers maximal repeated regions (with resolution n).

Operators:
- :func:`repeated_spans` — per-doc merged token ranges covered by
  n-grams occurring >= min_count times corpus-wide.
- :func:`strip_repeated_spans` — the pipeline action: re-emit each doc's
  text with flagged token ranges removed.

Scale design (the honest costs, and what bounds them):
- The gram-hash exchange is THE irreducible shuffle of substring
  dedup (Lee et al. pay the same cost as a distributed suffix sort).
  Grams are hashed to 8 bytes *before* the exchange, so shuffle rows are
  (hash, doc_id, pos) — ~24 bytes regardless of n. No raw text is ever
  shuffled. Two flagging strategies trade fold-CPU against hot-gram
  skew handling (see :func:`repeated_spans`).
- Span merging is a per-doc window (lag + running sum), bounded by the
  flagged positions of one document — never corpus-wide.
- A gram-hash collision (62-bit: two independent 31-bit polynomial
  hashes packed into one long) can only *over*-flag a span — the safe
  direction for dedup.

No reference-repo equivalent; training-data-pipeline operator per the
build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["gram_positions", "repeated_spans", "strip_repeated_spans"]

#: Mersenne prime 2^31 - 1 — rolling-hash modulus. Two independent
#: 31-bit polynomial hashes pack into one 62-bit key (h1 * P + h2), all
#: intermediate products < 2^62 so the arithmetic is ANSI-overflow-safe.
_P31 = 2147483647


def _chain_expr(arr: str, n: int, mult: int) -> str:
    """Unrolled polynomial hash of the n-window starting at lambda var
    ``i``: ``element_at`` chain with the modulo DEFERRED — after each
    ``pmod`` the accumulator is < 2^31, and 6 deferred steps at mult <=
    37 keep it < 2^31·37^6 + Σh·37^j ≈ 5.7e18 < 2^63, so one pmod per 6
    steps is overflow-safe and congruent (bit-identical) to per-step
    pmod. Must be spliced inside a ``transform`` whose lambda var is
    ``i``."""
    assert mult <= 37
    acc = f"cast(element_at({arr}, i) as bigint)"
    steps = 0
    for j in range(1, n):
        acc = f"({acc} * {mult} + element_at({arr}, i + {j}))"
        steps += 1
        if steps % 6 == 0:
            acc = f"pmod({acc}, {_P31})"
    return f"pmod({acc}, {_P31})"


def _gram_struct_expr(text_col: str, n: int) -> str:
    """SQL for ``transform(...) -> array<struct<pos, gram_hash>>`` over
    pre-hashed token arrays ``_th1``/``_th2``. A numeric polynomial hash
    per window beats materializing the gram *string* (array_join +
    xxhash64 over ~6n bytes) by ~2x at 41M grams (measured 24s -> 12s
    for the count-aggregate stage on the 640k-turn bench corpus), and
    the unrolled ``element_at`` chain beats the original
    ``aggregate(slice(...))`` fold by a further 4.7x (16.4s -> 3.5s on
    32M grams, bit-identical): ``slice`` allocated-and-copied two fresh
    arrays per window, the chain reads in place."""
    t = f"split(trim({text_col}), '\\\\s+')"
    return (
        f"transform(sequence(1, greatest(size({t}) - {n} + 1, 1)),"
        f" i -> struct(i AS pos,"
        f" {_chain_expr('_th1', n, 31)} * {_P31}"
        f" + {_chain_expr('_th2', n, 37)} AS gram_hash))"
    )


def _with_token_hashes(docs: DataFrame, text_col: str) -> DataFrame:
    """Append ``_th1``/``_th2``: per-token 31-bit hashes (each token
    hashed ONCE per doc, not once per covering window)."""
    t = f"split(trim({text_col}), '\\\\s+')"
    return docs.withColumn(
        "_th1", F.expr(f"transform({t}, x -> pmod(xxhash64(x), {_P31}))")
    ).withColumn(
        "_th2", F.expr(f"transform({t}, x -> pmod(xxhash64(x, 1), {_P31}))")
    )


def gram_positions(
    docs: DataFrame,
    n: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(id_col, pos, gram_hash)`` — one row per n-gram START position
    (1-based token index), multiplicity preserved. Docs with < n tokens
    emit no rows. Pure JVM expressions (per-token xxhash64 then a
    62-bit polynomial fold per window — no gram strings materialized),
    whole-stage codegen."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    pairs = F.expr(_gram_struct_expr(text_col, n))
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    guarded = F.when(F.size(toks) >= n, pairs).otherwise(
        F.array().cast("array<struct<pos:int,gram_hash:bigint>>")
    )
    return (
        _with_token_hashes(docs, text_col)
        .select(F.col(id_col), F.explode(guarded).alias("g"))
        .select(
            id_col, F.col("g.pos").alias("pos"), F.col("g.gram_hash").alias("gram_hash")
        )
    )


def repeated_spans(
    docs: DataFrame,
    n: int = 8,
    *,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    strategy: str = "window",
) -> DataFrame:
    """Per-doc merged repeated regions:
    ``(id_col, span_start, span_end, n_grams)``.

    A token position is covered when some corpus-wide-duplicated n-gram
    starts at or spans it; overlapping or contiguous flagged windows
    merge into one span (``span_start``/``span_end`` are 1-based
    inclusive token indices; ``n_grams`` = flagged windows merged into
    the span). ``min_count`` counts TOTAL occurrences (within-doc
    repeats count, as in Lee et al.'s ExactSubstr).

    ``strategy`` picks how duplicated grams are flagged — both are
    bit-identical (asserted in tests/test_spans.py); the difference is
    the 100 TB cost shape:

    - ``"window"`` (default): ONE evaluation of the gram pipeline and
      ONE gram-hash shuffle; the per-hash occurrence count is a window
      aggregate over the shuffled stream. Measured 4x faster at 640k
      turns (the polynomial fold is CPU-bound, and the rejoin plan
      evaluates it twice). Caveat: a single gram hash's occurrences
      all buffer in one task, so a pathologically hot boilerplate gram
      (10^9+ repeats) needs the rejoin plan instead.
    - ``"rejoin"``: aggregate counts (map-side partial combine), then
      join the duplicated-hash set back onto a second evaluation of the
      gram stream. Costs the fold twice, but the hot-gram case rides
      Spark's machinery: a small dup set broadcasts (no stream shuffle
      at all), a large one gets AQE's skew-split sort-merge join.
    """
    if strategy not in ("window", "rejoin"):
        raise ValueError(f"unknown strategy {strategy!r}")
    grams = gram_positions(docs, n, id_col=id_col, text_col=text_col)
    if strategy == "window":
        wcnt = Window.partitionBy("gram_hash")
        flagged = (
            grams.withColumn("cnt", F.count("*").over(wcnt))
            .where(F.col("cnt") >= min_count)
            .select(id_col, "pos")
        )
    else:
        dup = (
            grams.groupBy("gram_hash")
            .agg(F.count("*").alias("cnt"))
            .where(F.col("cnt") >= min_count)
            .select("gram_hash")
        )
        flagged = grams.join(dup, on="gram_hash", how="inner").select(
            id_col, "pos"
        )
    w = Window.partitionBy(id_col).orderBy("pos")
    # new span when this window starts past the previous window's
    # coverage (+1 keeps contiguous windows in one span)
    gap = F.when(
        F.col("pos") > F.lag("pos").over(w) + n, F.lit(1)
    ).otherwise(F.lit(0))
    grp = F.sum(gap).over(w)
    return (
        flagged.withColumn("grp", grp)
        .groupBy(id_col, "grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + n - 1).alias("span_end"),
            F.count("*").alias("n_grams"),
        )
        .drop("grp")
    )


def strip_repeated_spans(
    docs: DataFrame,
    n: int = 8,
    *,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    strategy: str = "window",
) -> DataFrame:
    """``(id_col, clean_text, n_removed)`` — each doc's text with flagged
    token ranges removed (tokens re-joined with single spaces; docs with
    nothing flagged pass through verbatim).

    The per-doc span list is tiny (merged ranges), so it gathers into an
    array and tokens filter against it with a JVM ``exists`` — no
    per-token range join.
    """
    spans = repeated_spans(
        docs, n, min_count=min_count, id_col=id_col, text_col=text_col,
        strategy=strategy,
    )
    span_arr = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    kept = F.filter(
        F.zip_with(
            toks,
            F.sequence(F.lit(1), F.size(toks)),
            lambda tok, i: F.struct(tok.alias("tok"), i.alias("i")),
        ),
        lambda s: ~F.exists(
            F.col("_spans"),
            lambda sp: (s["i"] >= sp["span_start"]) & (s["i"] <= sp["span_end"]),
        ),
    )
    cleaned = docs.join(span_arr, on=id_col, how="left").select(
        F.col(id_col),
        F.when(F.col("_spans").isNull(), F.trim(F.col(text_col)))
        .otherwise(
            F.array_join(F.transform(kept, lambda s: s["tok"]), " ")
        )
        .alias("clean_text"),
        F.when(F.col("_spans").isNull(), F.lit(0))
        .otherwise(F.size(toks) - F.size(kept))
        .cast("long")
        .alias("n_removed"),
    )
    return cleaned
