"""Benchmark decontamination: n-gram overlap between a corpus and a
benchmark (eval) set.

Training-data pipelines must drop corpus documents that leak evaluation
data (GPT-3 App. C / PaLM-style "n-gram collision" decontamination). The
operator computes, per corpus document, the fraction of its distinct
word n-grams that also occur anywhere in the benchmark set, and flags
documents above a threshold.

Scale design (100 TB corpus, benchmark ~10^4-10^6 grams):
- The benchmark side is aggregated to DISTINCT n-gram hashes first —
  that table is tiny relative to the corpus (eval suites are MBs, not
  TBs) and is **broadcast**, so the corpus is never shuffled: the whole
  job is one corpus scan -> generate grams (JVM ``transform``/``slice``,
  whole-stage codegen) -> broadcast-hash-join -> partial-agg groupBy on
  ``doc_id`` (map-side combine; doc_id keys are unique, no skew).
- Grams are compared by a 62-bit key (two packed 31-bit polynomial
  rolling hashes over per-token xxhash64, shared with ``tsidx.spans``),
  not by string: the join key is 8 bytes regardless of n, no gram
  string is ever materialized (~2x faster at bench scale), and the
  broadcast table carries only hashes. A collision can only *over*-flag
  (safe direction for decontamination).
- Per-doc gram sets are deduplicated with ``array_distinct`` *before*
  the explode, so a pathological doc repeating one n-gram 10^6 times
  contributes one row, not 10^6.

No reference-repo equivalent (the reference indexes a closed menu
corpus); this is a training-data-pipeline operator per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "doc_ngrams",
    "doc_ngram_hashes",
    "benchmark_grams",
    "ngram_overlap",
    "decontaminate",
]


def doc_ngrams(
    docs: DataFrame,
    n: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(id_col, gram)`` — the DISTINCT word ``n``-grams of each doc.

    Docs with fewer than ``n`` tokens yield one row with ``gram IS NULL``
    (``explode_outer``) so downstream per-doc aggregates still see them.
    Pure JVM expressions: split -> guarded ``transform(sequence(...))``
    over ``slice`` -> ``array_distinct`` -> ``explode_outer``.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    # Materialize the token array BEFORE the lambda references it: an
    # inlined split re-evaluates per window — O(tokens^2) per doc (see
    # tsidx.lmquality.doc_bigrams, measured 16x there).
    with_t = docs.select(
        F.col(id_col), F.split(F.trim(F.col(text_col)), r"\s+").alias("_t")
    )
    # Guard: Spark's sequence(1, k) DESCENDS for k < 1, so gate on size.
    grams = F.when(
        F.size("_t") >= n,
        F.expr(
            f"transform(sequence(1, size(_t) - {n} + 1),"
            f" i -> array_join(slice(_t, i, {n}), ' '))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    return with_t.select(
        F.col(id_col),
        F.explode_outer(F.array_distinct(grams)).alias("gram"),
    )


def doc_ngram_hashes(
    docs: DataFrame,
    n: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(id_col, gram_hash)`` — DISTINCT 62-bit n-gram hashes per doc
    (two packed 31-bit polynomial rolling hashes over per-token
    xxhash64; see ``tsidx.spans``). No gram strings are materialized —
    ~2x faster than join+hash at bench scale. Docs with fewer than ``n``
    tokens yield one ``gram_hash IS NULL`` row (``explode_outer``)."""
    from tsidx.spans import _gram_struct_expr, _with_token_hashes

    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    hashes = F.when(
        F.size(toks) >= n,
        F.expr(f"transform({_gram_struct_expr(text_col, n)}, g -> g.gram_hash)"),
    ).otherwise(F.array().cast("array<bigint>"))
    return _with_token_hashes(docs, text_col).select(
        F.col(id_col),
        F.explode_outer(F.array_distinct(hashes)).alias("gram_hash"),
    )


def benchmark_grams(
    benchmark: DataFrame,
    n: int,
    *,
    text_col: str = "text",
) -> DataFrame:
    """``(gram_hash)`` — distinct hash of every benchmark n-gram.

    This is the broadcast side: distinct-aggregate (partial agg prunes
    duplicates map-side). Null hashes (too-short benchmark rows) are
    dropped.
    """
    bid = benchmark.columns[0]
    return (
        doc_ngram_hashes(benchmark, n, id_col=bid, text_col=text_col)
        .where(F.col("gram_hash").isNotNull())
        .select("gram_hash")
        .distinct()
    )


def ngram_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    *,
    tau: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-corpus-doc benchmark contamination stats.

    Returns ``(id_col, n_grams, n_hit, overlap_frac, contaminated)``:
    ``n_grams`` = distinct n-grams in the doc, ``n_hit`` = how many of
    them occur in the benchmark, ``overlap_frac = n_hit / n_grams``
    (0.0 for docs shorter than ``n`` tokens), ``contaminated`` =
    ``overlap_frac >= tau``.

    Plan: one corpus scan; benchmark grams broadcast; groupBy(doc_id)
    with map-side combine. No corpus shuffle other than the unique-key
    doc_id agg.
    """
    bench = F.broadcast(benchmark_grams(benchmark, n, text_col=text_col))
    grams = doc_ngram_hashes(corpus, n, id_col=id_col, text_col=text_col)
    joined = grams.join(
        bench.withColumn("_hit", F.lit(1)), on="gram_hash", how="left"
    )
    agg = joined.groupBy(id_col).agg(
        F.count("gram_hash").alias("n_grams"),
        F.coalesce(F.sum("_hit"), F.lit(0)).cast("long").alias("n_hit"),
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


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    *,
    tau: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The corpus with contaminated docs removed (the pipeline action).

    Left-semi-style: join corpus rows to the per-doc flag and keep the
    clean ones. Same single-broadcast plan as :func:`ngram_overlap`.
    """
    flags = ngram_overlap(
        corpus, benchmark, n, tau=tau, id_col=id_col, text_col=text_col
    ).select(id_col, "contaminated")
    return (
        corpus.join(flags, on=id_col, how="left")
        .where(~F.coalesce(F.col("contaminated"), F.lit(False)))
        .drop("contaminated")
    )
