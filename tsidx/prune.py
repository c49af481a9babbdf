"""Hot-term (stopword) pruning: index maintenance that drops terms above
a document-frequency cap.

The reference index is append-only and keeps every term
(``/root/reference/ts_type_filter/inverted_index.py:48-65``); at corpus
scale the df distribution is Zipfian and the hottest few hundred terms
(stopwords, boilerplate markup) own a large share of posting bytes while
contributing near-zero BM25 idf. Pruning them shrinks the index and every
downstream scan.

Scale shape: pruning is **metadata-only** — posting blocks are keyed by
(term, block_id), so dropping a term drops whole block rows via one
broadcast anti-join against the pruned-term set (hot terms are few by
definition: df > cap selects the head of the Zipf curve). No block is
decoded, no byte re-encoded. Corpus statistics (n_docs, total_tokens,
avgdl) and the per-posting dl stream are kept as-built, so BM25 scores of
surviving terms are unchanged — the same
stopwords-still-count-in-length-norm semantics Lucene has when stopwords
are filtered rather than never indexed.

The positional artifact (tsidx/positions.py) is a separate structure
rebuilt from the docs table and stays term-complete: pruning targets the
match/BM25 path, while phrase/proximity search remains exact — pruning
"the" must not break the phrase "the merge".
"""

from __future__ import annotations

from dataclasses import replace

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tsidx.index import InvertedIndex

__all__ = ["prune_terms", "vocab_coverage"]


def prune_terms(
    index: InvertedIndex,
    max_df: int | None = None,
    max_df_ratio: float | None = None,
    terms: list[str] | None = None,
) -> InvertedIndex:
    """Return the index without terms above *max_df* (or *max_df_ratio* ·
    n_docs), and/or without the explicit stopword list *terms*.

    Non-destructive: the returned index shares the docs table and the
    surviving posting/dictionary rows with the input. ``meta`` records the
    cap under ``"pruned_max_df"`` for lineage; n_docs/avgdl are unchanged
    by design (see module docstring).
    """
    if max_df is None and max_df_ratio is None and terms is None:
        raise ValueError("prune_terms: pass max_df, max_df_ratio, or terms")
    cap: int | None = None
    if max_df_ratio is not None:
        cap = int(max_df_ratio * int(index.meta["n_docs"]))
    if max_df is not None:
        cap = min(cap, int(max_df)) if cap is not None else int(max_df)

    pruned: DataFrame | None = None
    if cap is not None:
        pruned = index.terms.filter(F.col("df") > cap).select("term")
    if terms:
        spark = index.docs.sparkSession
        explicit = spark.createDataFrame(
            [(t,) for t in sorted(set(terms))], "term string"
        )
        pruned = explicit if pruned is None else pruned.unionByName(explicit)
    pruned = pruned.distinct()

    new_postings = index.postings.join(F.broadcast(pruned), "term", "anti")
    new_terms = index.terms.join(F.broadcast(pruned), "term", "anti")
    meta = dict(index.meta)
    if cap is not None:
        meta["pruned_max_df"] = cap
    return replace(index, postings=new_postings, terms=new_terms, meta=meta)


def vocab_coverage(index: InvertedIndex, top_v: int) -> DataFrame:
    """Vocabulary-induction analytics: the ``top_v`` dictionary terms by
    collection frequency with their cumulative token-coverage fraction —
    ``(rank, term, cf, coverage_r)`` where ``coverage_r = Σ cf(1..rank) /
    total_tokens``. The first question a tokenizer/vocab designer asks of
    a corpus ("how much of the token stream do the top-V words cover?"),
    answered from the index alone.

    Scale shape: collection frequency comes from the posting blocks'
    ``sum_tf`` **metadata column** — one aggregation over (term, block)
    rows with zero posting-byte decode, then a TakeOrdered down to
    ``top_v`` rows. The running sum is a window over those ``top_v``
    rows only (bounded, driver-adjacent by construction) — never a
    global single-partition window over the dictionary. ``total_tokens``
    is an index-build invariant read from meta.
    """
    total = float(index.meta["total_tokens"])
    top = (
        index.postings.groupBy("term")
        .agg(F.sum(F.col("sum_tf").cast("long")).alias("cf"))
        .orderBy(F.desc("cf"), F.asc("term"))
        .limit(int(top_v))
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("cf"), F.asc("term"))
    return top.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "term",
        "cf",
        F.round(
            (F.sum("cf").over(w)).cast("double") / F.lit(total), 6
        ).alias("coverage_r"),
    )
