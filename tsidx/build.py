"""Distributed index build.

Pipeline (one wide shuffle, SURVEY §4):

    transcripts ──assign_doc_ids──▶ docs(+doc_id)
        ──mapInPandas tokenize──▶ (doc_id, term, tf, dl) rows   [Arrow batches]
        ──groupBy(term, block_id)──▶ posting blocks             [the shuffle]
        ──groupBy(term)──▶ global df table

Design notes for 10^12-turn scale:

- Posting rows are (term, docID-range block) shards, not whole-term rows:
  a df≈N term at 10^12 docs cannot be one array cell (SURVEY §7.2). The
  ``doc_id // block_size`` salt also splits Zipf-hot terms (``the``/``and``
  reach df 148/154 in the reference goldens) across ``N/block_size`` groups,
  bounding both shuffle skew and single-row size. AQE skew handling covers
  joins, not aggregations, so this manual salt is required (SURVEY §2.4 N4).
- Blocks are docID-contiguous, so the global posting list of a term is the
  concatenation of its blocks in block_id order — merge is free.
- Block metadata (min/max doc, block max of the BM25 tf/length factor) is
  computed JVM-side in the same aggregation; WAND uses it to skip blocks.
- idf is *not* materialized: it needs only (N, df) and is computed on the
  driver at query time with CPython ``math.log`` so that engine scores are
  bit-identical to the single-node oracle (JVM ``Math.log`` may differ in the
  last ulp).
- Checkpoint-resume (SURVEY §2.4 N8) shards the build by conversation hash
  into independent jobs, each committing a manifest row; see
  :func:`build_index_resumable`.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tsidx.compress import encode_posting_block
from tsidx.docids import assign_doc_ids, check_unique_keys
from tsidx.index import POSTINGS_VARBYTE_SCHEMA, InvertedIndex
from tsidx.oracle import B, K1
from tsidx.ship import ensure_shipped
from tsidx.tokenize import TOKENS_SCHEMA, tokenize_map_in_pandas

__all__ = ["build_index", "DEFAULT_BLOCK_SIZE"]

DEFAULT_BLOCK_SIZE = 1 << 20


def _wtf_expr(avgdl: float):
    """BM25 tf/length factor: tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)).

    Parenthesized to match the oracle's Python evaluation order exactly
    (IEEE754 ops are deterministic given identical order — SURVEY §7.2)."""
    tf = F.col("tf").cast("double")
    dl = F.col("dl").cast("double")
    return (tf * F.lit(K1 + 1.0)) / (
        tf + F.lit(K1) * (F.lit(1.0 - B) + (F.lit(B) * dl) / F.lit(avgdl))
    )


def _encode_blocks(batches):
    """Arrow-batched varbyte encoder: array plist -> binary streams."""
    import numpy as np
    import pandas as pd

    for pdf in batches:
        gaps_col, tfs_col, dls_col = [], [], []
        for plist in pdf["plist"]:
            doc_ids = np.fromiter((p["doc_id"] for p in plist), dtype=np.uint64)
            tfs = np.fromiter((p["tf"] for p in plist), dtype=np.uint64)
            dls = np.fromiter((p["dl"] for p in plist), dtype=np.uint64)
            g, t, d = encode_posting_block(doc_ids, tfs, dls)
            gaps_col.append(g)
            tfs_col.append(t)
            dls_col.append(d)
        yield pd.DataFrame(
            {
                "term": pdf["term"],
                "block_id": pdf["block_id"],
                "block_df": pdf["block_df"],
                "min_doc": pdf["min_doc"],
                "max_doc": pdf["max_doc"],
                "max_wtf": pdf["max_wtf"],
                "doc_gaps": gaps_col,
                "tfs": tfs_col,
                "dls": dls_col,
            }
        )


def build_index(
    transcripts: DataFrame,
    *,
    order_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    block_size: int = DEFAULT_BLOCK_SIZE,
    codec: str = "varbyte",
    docid_method: str = "prefix_sum",
    num_partitions: int | None = None,
    check_unique: bool = True,
    k1: float = K1,
    b: float = B,
) -> InvertedIndex:
    """Build an inverted index over a transcripts DataFrame.

    Distributed analog of reference ``Index.add`` over the whole corpus
    (``inverted_index.py:48-65``): extract text stream, whitespace-break,
    stem; duplicates rejected via *check_unique*; docID order = total order
    on *order_cols* = the reference's insertion order.
    """
    if codec not in ("varbyte", "array"):
        raise ValueError(f"unknown codec: {codec}")
    ensure_shipped(transcripts.sparkSession)
    if check_unique:
        check_unique_keys(transcripts, order_cols)

    docs = assign_doc_ids(
        transcripts, order_cols, method=docid_method, num_partitions=num_partitions
    )
    docs.persist(StorageLevel.MEMORY_AND_DISK)
    n_docs = docs.count()

    tokens = docs.select("doc_id", "text").mapInPandas(
        tokenize_map_in_pandas(), schema=TOKENS_SCHEMA
    )
    tokens.persist(StorageLevel.MEMORY_AND_DISK)
    total_tokens = tokens.agg(F.sum(F.col("tf").cast("long"))).collect()[0][0] or 0
    avgdl = (total_tokens / n_docs) if n_docs else 0.0

    blocks = (
        tokens.withColumn("block_id", F.expr(f"doc_id DIV {int(block_size)}"))
        .groupBy("term", "block_id")
        .agg(
            F.sort_array(F.collect_list(F.struct("doc_id", "tf", "dl"))).alias("plist"),
            F.count("*").alias("block_df"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
            F.max(_wtf_expr(avgdl)).alias("max_wtf"),
        )
    )
    if codec == "varbyte":
        postings = blocks.mapInPandas(_encode_blocks, schema=POSTINGS_VARBYTE_SCHEMA)
    else:
        postings = blocks.select(
            "term", "block_id", "block_df", "min_doc", "max_doc", "max_wtf", "plist"
        )
    postings.persist(StorageLevel.MEMORY_AND_DISK)

    terms = postings.groupBy("term").agg(F.sum("block_df").alias("df"))

    tokens.unpersist()
    meta = {
        "n_docs": int(n_docs),
        "total_tokens": int(total_tokens),
        "avgdl": avgdl,
        "k1": k1,
        "b": b,
        "block_size": int(block_size),
        "codec": codec,
        "order_cols": list(order_cols),
        # no wall-clock fields: index content and metadata are pure functions
        # of the input table (SURVEY §7.2 determinism bans)
        "version": 1,
    }
    return InvertedIndex(docs=docs, postings=postings, terms=terms, meta=meta)
