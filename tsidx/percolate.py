"""Percolation (reverse search): match the indexed document stream against
a registry of STORED queries — the Elasticsearch-percolator shape. At
pipeline scale this is how standing alerts / routing rules / labeling
filters are applied to a transcript firehose: thousands of stored queries,
one pass over the corpus.

No reference counterpart (the reference engine answers ad-hoc queries
only); north-rule extension.

Registry schema: ``(query_id string, terms array<string>, min_match int)``
— *terms* are already-stemmed index terms, *min_match* the number of
distinct terms a doc must contain (``len(terms)`` = conjunctive, ``1`` =
disjunctive, in between = minimum-should-match).

Physical shape: the registry's distinct vocabulary is collected
(registry-bounded, never data-scale — a million stored queries over a
10^6-term dictionary still collect at most the dictionary) and re-planted
as a pushed ``term IN`` filter on the posting scan, so only the blocks of
terms ANY stored query uses are read; each gaps-only posting row fans out
to the stored queries containing its term via a join with the (query_id,
term) pairs, and one (query_id, doc_id) aggregation applies each query's
threshold. Above *max_pushdown_terms* the literal IN list would bloat the
plan, so the scan falls back to the full index with the same fan-out join
— one index scan either way.

The fan-out join is broadcast only while the registry's estimated
serialized pairs table fits ``PERC_BROADCAST_MAX_BYTES`` (the docids
offsets size-gate pattern): a 10^6-stored-query registry at ~5 terms each
is multi-hundred-MB — past the bound the hint is dropped and the join
shuffles on ``term`` instead (one extra shuffle of the already
registry-filtered posting rows; AQE skew-splits hot terms).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["percolate", "percolate_docs", "PERC_BROADCAST_MAX_BYTES"]

#: broadcast the (query_id, term) fan-out pairs / (query_id, min_match)
#: thresholds only while their estimated serialized bytes fit this bound
PERC_BROADCAST_MAX_BYTES = 64 << 20


def percolate(
    engine,
    registry: DataFrame,
    max_pushdown_terms: int = 10000,
    broadcast_max_bytes: int = PERC_BROADCAST_MAX_BYTES,
) -> DataFrame:
    """(query_id, doc_id, n_matched): every (stored query, document) pair
    where the doc contains at least the query's ``min_match`` distinct
    terms. Deterministic; ``n_matched`` counts distinct matched terms.
    """
    pairs = registry.select(
        "query_id", F.explode("terms").alias("term")
    ).distinct()
    need = registry.select(
        "query_id", F.col("min_match").cast("long").alias("min_match")
    )
    est = pairs.agg(
        F.count("*").alias("n"),
        F.sum(F.length("term") + F.length("query_id")).alias("chars"),
    ).collect()[0]
    # per-row overhead (UnsafeRow header + field offsets) + string bytes
    est_bytes = int(est["chars"] or 0) + int(est["n"] or 0) * 32
    small = est_bytes <= broadcast_max_bytes
    vocab = [
        r["term"]
        for r in pairs.select("term")
        .distinct()
        .limit(max_pushdown_terms + 1)
        .collect()
    ]
    if len(vocab) <= max_pushdown_terms:
        blocks = engine._blocks_for(sorted(vocab))
    else:  # registry vocabulary too wide for a literal IN — scan all blocks
        blocks = engine.index.postings
    rows = engine._live(engine.posting_doc_ids(blocks))
    fan = F.broadcast(pairs) if small else pairs
    thresholds = F.broadcast(need) if small else need
    matched = (
        rows.join(fan, "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count_distinct("term").cast("long").alias("n_matched"))
    )
    return (
        matched.join(thresholds, "query_id")
        .filter(F.col("n_matched") >= F.col("min_match"))
        .select("query_id", "doc_id", "n_matched")
    )


def percolate_docs(
    docs: DataFrame,
    registry: DataFrame,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Index-free percolation of a DOCUMENT STREAM: (id..., query_id,
    n_matched) for every (doc, stored query) pair meeting the query's
    ``min_match``. Same registry schema and matching semantics as
    :func:`percolate` (distinct-stem containment), but the input is raw
    text rather than a built index — the shape for routing an incoming
    transcript firehose to standing alerts BEFORE anything is indexed.

    Entirely STATELESS: one Arrow stem pass per row, then a broadcast
    join against the (bounded) registry and a per-row
    ``array_intersect`` — no aggregation, no shuffle of the doc stream,
    no watermark needed. The identical expression therefore runs under
    Structured Streaming in append mode (tested) and compiles to a
    map-only stage in batch.
    """
    from tsidx.tokenize import stem_array_udf

    reg = registry.select(
        "query_id",
        F.array_distinct("terms").alias("_qterms"),
        F.col("min_match").cast("long").alias("_mm"),
    )
    stems = docs.select(
        *id_cols, stem_array_udf()(F.col(text_col)).alias("_stems")
    ).withColumn("_stems", F.array_distinct("_stems"))
    n_matched = F.size(F.array_intersect("_stems", "_qterms")).cast("long")
    return (
        stems.join(F.broadcast(reg))
        .withColumn("n_matched", n_matched)
        .filter(F.col("n_matched") >= F.col("_mm"))
        .select(*id_cols, "query_id", "n_matched")
    )
