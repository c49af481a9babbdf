"""Block-max WAND top-k: safe block pruning with a bounded heap.

SURVEY §2.4 N7. The naive plan (`QueryEngine.bm25_topk`) decodes every
posting of every query term, scores, and TakeOrdereds. This engine prunes
whole posting *blocks* using the block-max metadata stored at build time
(`max_wtf` = block max of the BM25 tf/length factor, `tsidx/build.py`):

1. **Upper bounds.** For each candidate ``block_id`` (a docID range),
   ``UB = Σ_t idf_t · wtf(max_tf, min_dl)`` over the query's terms — the
   BM25 tf/length factor is monotone increasing in tf and decreasing in dl,
   so this bounds every doc in the range. Computed JVM-side from metadata
   columns only (no posting bytes touched).
2. **Seed θ.** Exactly score the few highest-UB block groups (enough to
   cover ≥ seed_factor·k candidate postings); θ = the k-th best seed score —
   a valid lower bound on the final k-th score.
3. **Prune + score.** Only blocks with ``UB ≥ θ − ε`` are decoded and scored.
   Scoring runs as ``applyInPandas`` over ``groupBy(block_id)``: because a
   document's postings for *all* terms share its block_id, every doc's score
   is complete within one group, so each group emits only its local top-k
   (bounded min-heap semantics) and the global top-k is the TakeOrdered
   merge of group winners.

Rank identity: per-doc contributions accumulate in sorted-term order into a
float64 dense array — the same IEEE754 op order as the single-node oracle
(`tsidx/oracle.py`) and the naive engine, so scores are bit-identical to
both. Ties break by ascending doc_id. Pruning is safe: skipped groups have
UB < θ ≤ final k-th score, and θ is established from ≥ k fully-scored docs.

At 10^12 docs: block metadata is ~|q| rows per 2^20-doc range; the UB
aggregation shuffles only metadata and *stays a DataFrame* — the driver
never materializes per-block rows. The only collects are bounded: the
seed-block selection (``ORDER BY ub DESC LIMIT seed_factor·k`` — each block
holds ≥ 1 candidate, so that prefix always covers the seed quota) and the
k-row seed top-k. Survivors are selected by a broadcast **semi-join** of
the candidate postings against ``ub_df.filter(ub ≥ θ − ε)``, so pruning
scales past 10^6 blocks with no giant ``isin()`` literal in the plan.
``ε`` absorbs the nondeterministic partial-agg summation order of the UB
doubles (relative slack 1e-9 ≫ ulp error): keeping a few extra borderline
blocks is safe; pruning stays exact because every kept block is scored
exactly.
"""

from __future__ import annotations

import heapq

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tsidx.index import InvertedIndex
from tsidx.oracle import bm25_idf

__all__ = ["wand_topk"]

_SCORE_SCHEMA = "doc_id long, score double"


def _make_group_scorer(idfs: dict[str, float], k: int, k1: float, b: float,
                       avgdl: float, block_size: int, codec: str):
    """applyInPandas scorer: one group = one block_id's term blocks."""
    sorted_terms = sorted(idfs)

    def score_group(pdf):
        import numpy as np
        import pandas as pd

        from tsidx.compress import decode_posting_block

        base = int(pdf["block_id"].iloc[0]) * block_size
        dense = np.zeros(block_size, dtype=np.float64)
        touched = np.zeros(block_size, dtype=bool)
        rows_by_term = {t: i for i, t in zip(pdf.index, pdf["term"])}
        for term in sorted_terms:  # canonical accumulation order
            i = rows_by_term.get(term)
            if i is None:
                continue
            if codec == "varbyte":
                doc_ids, tfs, dls = decode_posting_block(
                    bytes(pdf["doc_gaps"][i]), bytes(pdf["tfs"][i]), bytes(pdf["dls"][i])
                )
                tf = tfs.astype(np.float64)
                dl = dls.astype(np.float64)
                off = (doc_ids - np.uint64(base)).astype(np.int64)
            else:
                plist = pdf["plist"][i]
                off = np.fromiter((p["doc_id"] for p in plist), dtype=np.int64) - base
                tf = np.fromiter((p["tf"] for p in plist), dtype=np.float64)
                dl = np.fromiter((p["dl"] for p in plist), dtype=np.float64)
            # identical op order to oracle.bm25_contributions
            contrib = idfs[term] * ((tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + (b * dl) / avgdl)))
            dense[off] += contrib
            touched[off] = True
        if "_dead" in pdf.columns:
            # tombstoned docs are masked BEFORE the local top-k: they must
            # neither seed θ nor crowd live docs out of a group's k rows
            dead = pdf["_dead"].iloc[0]
            if dead is not None and len(dead):
                doff = np.asarray(dead, dtype=np.int64) - base
                doff = doff[(doff >= 0) & (doff < block_size)]
                touched[doff] = False
        idx = np.nonzero(touched)[0]
        scores = dense[idx]
        if len(idx) > k:
            # local bounded top-k. argpartition alone is tie-UNSAFE: docs tied
            # at the k-th score would be picked arbitrarily, breaking the
            # deterministic (-score, doc_id) order. Select everything >= the
            # k-th score, then refine by the exact order.
            kth = -np.partition(-scores, k - 1)[k - 1]
            cand = np.nonzero(scores >= kth)[0]
            order = np.lexsort((idx[cand], -scores[cand]))[:k]
            sel = cand[order]
        else:
            sel = np.lexsort((idx, -scores))
        return pd.DataFrame(
            {"doc_id": (idx[sel] + base).astype("int64"), "score": scores[sel]}
        )

    return score_group


def wand_topk(index: InvertedIndex, query: str | list[str], k: int,
              seed_factor: int = 4, small_candidate_limit: int = 200_000) -> DataFrame:
    """Deterministic BM25 top-k with block-max pruning; returns
    (doc_id, score) ordered by (-score, doc_id), bit-identical to the
    oracle and to ``QueryEngine.bm25_topk``."""
    from tsidx.ship import ensure_shipped
    from tsidx.tokenize import query_terms

    spark = index.docs.sparkSession
    ensure_shipped(spark)
    terms = query_terms(query)
    n = index.meta["n_docs"]
    rows = (
        index.terms.filter(F.col("term").isin(terms)).collect() if terms else []
    )
    idfs = {r["term"]: bm25_idf(n, r["df"]) for r in rows}
    if not idfs:
        return spark.createDataFrame([], _SCORE_SCHEMA)
    k1, b = float(index.meta["k1"]), float(index.meta["b"])
    avgdl = float(index.meta["avgdl"])
    block_size = int(index.meta["block_size"])
    codec = index.meta["codec"]

    cand = index.postings.filter(F.col("term").isin(sorted(idfs)))
    if index.tombstones is not None:
        # per-block deleted-id lists ride along with the candidate blocks;
        # the scorer masks them before its local top-k. UBs stay valid
        # upper bounds (removing docs only lowers block scores).
        dead_by_block = (
            index.tombstones.select(
                "doc_id", F.expr(f"doc_id DIV {block_size}").alias("block_id")
            )
            .groupBy("block_id")
            .agg(F.collect_list("doc_id").alias("_dead"))
        )
        cand = cand.join(dead_by_block, "block_id", "left")
    scorer = _make_group_scorer(idfs, k, k1, b, avgdl, block_size, codec)
    # total candidate postings = Σ df over the query terms — already on the
    # driver from the (|q|-row) terms fetch above; no extra job
    total_cand = sum(r["df"] for r in rows if r["term"] in idfs)
    if total_cand <= small_candidate_limit:
        # fast path: below this size the seed/prune choreography (3 jobs)
        # costs more than exactly scoring every candidate block in one pass
        return (
            cand.groupBy("block_id")
            .applyInPandas(scorer, schema=_SCORE_SCHEMA)
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )
    idf_map = F.create_map(*[F.lit(x) for t in sorted(idfs) for x in (t, idfs[t])])
    max_tf = F.col("max_tf").cast("double")
    min_dl = F.col("min_dl").cast("double")
    bound_wtf = (max_tf * F.lit(k1 + 1.0)) / (
        max_tf + F.lit(k1) * (F.lit(1.0 - b) + (F.lit(b) * min_dl) / F.lit(avgdl))
    )
    # per-block upper bounds — a metadata-only DataFrame (payload columns are
    # pruned from the scan); never collected in full. Eagerly checkpointed:
    # both the seed selection and the survivor filter read it, and the
    # checkpoint (~24 B/block, <= ~10^6 blocks at 10^12 docs) avoids
    # re-scanning the candidate metadata per consumer; blocks are freed by
    # the context cleaner when the frame is garbage-collected.
    ub_df = cand.groupBy("block_id").agg(
        F.sum(idf_map[F.col("term")] * bound_wtf).alias("ub"),
        F.sum("block_df").alias("cand_count"),
    ).localCheckpoint()
    # bounded seed collect: every block carries >= 1 candidate posting, so
    # the seed_factor*k highest-UB blocks always cover the seed quota
    seed_rows = (
        ub_df.orderBy(F.desc("ub"), F.asc("block_id"))
        .limit(seed_factor * k)
        .collect()
    )
    seed_ids, seen = [], 0
    for r in seed_rows:
        seed_ids.append(r["block_id"])
        seen += r["cand_count"]
        if seen >= seed_factor * k:
            break

    seed_scores = (
        cand.filter(F.col("block_id").isin(seed_ids))
        .groupBy("block_id")
        .applyInPandas(scorer, schema=_SCORE_SCHEMA)
    )
    seed_top = seed_scores.orderBy(F.desc("score"), F.asc("doc_id")).limit(k).collect()
    seed_df = spark.createDataFrame(
        [(r["doc_id"], r["score"]) for r in seed_top] or [], _SCORE_SCHEMA
    )
    survivors = ub_df.filter(~F.col("block_id").isin(seed_ids))
    if len(seed_top) >= k:
        theta = seed_top[k - 1]["score"]
        # ε slack: UB partial-agg summation order is nondeterministic, so a
        # degenerate block's UB can land a few ulps below a contained doc's
        # exact score; 1e-9 relative slack keeps such blocks (safe — they
        # are then scored exactly) without materially weakening pruning
        eps = 1e-9 * abs(theta) + 1e-12
        survivors = survivors.filter(F.col("ub") >= F.lit(theta - eps))
    rest = (
        cand.join(F.broadcast(survivors.select("block_id")), "block_id", "semi")
        .groupBy("block_id")
        .applyInPandas(scorer, schema=_SCORE_SCHEMA)
    )
    return (
        seed_df.unionByName(rest)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
