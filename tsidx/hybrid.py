"""Hybrid retrieval: BM25 ⊕ embedding ANN fused with Reciprocal Rank Fusion.

The modern search stack pairs the lexical index (this engine) with a vector
index over the same corpus and fuses the two rankings. RRF (Cormack et al.,
SIGIR 2009) is the standard score-free fusion: ``score(d) = Σ_r 1/(c +
rank_r(d))`` over the rankings that contain *d* — robust because it ignores
incomparable score scales.

Scale shape: each side produces a small top-*pool* ranking (BM25 via the
pushed term-scan plan, cosine via one corpus scan with the broadcast query
vector — or the IVF/LSH path for big corpora); the fusion itself is a
full-outer join of two ≤pool-row frames — driver-trivial, executor-free in
practice. Determinism: ranks break ties by ascending id; the RRF sum is a
two-term fixed-order float64 expression, so it is bit-identical across
engines given identical ranks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["ranked", "rrf_fuse", "hybrid_topk", "comb_fuse", "hybrid_topk_comb"]


def ranked(
    df: DataFrame, score_col: str, pool: int, id_col: str = "doc_id"
) -> DataFrame:
    """(id, rank) of the top-*pool* rows by (-score, id)."""
    w = Window.orderBy(F.desc(score_col), F.asc(id_col))
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= pool)
        .select(F.col(id_col).alias("doc_id"), "rank")
    )


def rrf_fuse(
    text_ranks: DataFrame, vec_ranks: DataFrame, k: int, c: int = 60
) -> DataFrame:
    """Fuse two (doc_id, rank) frames -> top-k (doc_id, rrf, r_text, r_vec).

    Docs absent from a ranking contribute 0 from that side (ranks reported
    as 0). Ties break by ascending doc_id.
    """
    t = text_ranks.select("doc_id", F.col("rank").alias("r_text"))
    v = vec_ranks.select("doc_id", F.col("rank").alias("r_vec"))
    both = t.join(v, "doc_id", "full_outer")
    contrib_t = F.when(
        F.col("r_text").isNotNull(), F.lit(1.0) / (F.lit(float(c)) + F.col("r_text"))
    ).otherwise(F.lit(0.0))
    contrib_v = F.when(
        F.col("r_vec").isNotNull(), F.lit(1.0) / (F.lit(float(c)) + F.col("r_vec"))
    ).otherwise(F.lit(0.0))
    return (
        both.select(
            "doc_id",
            (contrib_t + contrib_v).alias("rrf"),
            F.coalesce("r_text", F.lit(0)).alias("r_text"),
            F.coalesce("r_vec", F.lit(0)).alias("r_vec"),
        )
        .orderBy(F.desc("rrf"), F.asc("doc_id"))
        .limit(k)
    )


def hybrid_topk(
    engine,
    embeddings: DataFrame,
    query_text: str | list[str],
    query_vec_id: int,
    k: int,
    pool: int = 50,
    c: int = 60,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Top-k hybrid retrieval: BM25(query_text) ⊕ cosine-NN(query_vec_id).

    *embeddings* must share the docID space (``vec_id == doc_id``). The
    vector side uses the exact brute-force scorer here; swap in
    ``ivf_topk``/``lsh_bucketed_topk`` for the approximate scale path —
    fusion is oblivious to how either ranking was produced.
    """
    from tsidx.ann import cosine_topk

    q = embeddings.filter(F.col(id_col) == query_vec_id).select(
        F.col(id_col).alias("query_id"), F.col(emb_col).alias("q_emb")
    )
    vec_top = cosine_topk(embeddings, q, k=pool, id_col=id_col, emb_col=emb_col)
    vec_ranks = ranked(vec_top, "sim", pool, id_col=id_col)
    text_ranks = ranked(engine.bm25_scores(query_text), "score", pool)
    return rrf_fuse(text_ranks, vec_ranks, k, c)


def _pooled(
    df: DataFrame, score_col: str, pool: int, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, score) of the top-*pool* rows by (-score, id) — the
    score-keeping sibling of :func:`ranked` for score-based fusion."""
    w = Window.orderBy(F.desc(score_col), F.asc(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= pool)
        .select(F.col(id_col).alias("doc_id"), F.col(score_col).alias("score"))
    )


def _minmax(df: DataFrame, out: str) -> DataFrame:
    """Min-max normalize a pool's scores into [0, 1] (Lee, SIGIR 1997's
    standard normalization for Comb* fusion). A degenerate pool (all
    scores equal) normalizes to 1.0 everywhere. The min/max ride a 1-row
    cross join — in-plan, no collect."""
    mm = df.agg(F.min("score").alias("_mn"), F.max("score").alias("_mx"))
    return df.crossJoin(mm).select(
        "doc_id",
        F.when(
            F.col("_mx") > F.col("_mn"),
            (F.col("score") - F.col("_mn")) / (F.col("_mx") - F.col("_mn")),
        )
        .otherwise(F.lit(1.0))
        .alias(out),
    )


def comb_fuse(
    text_scores: DataFrame, vec_scores: DataFrame, k: int, mnz: bool = False
) -> DataFrame:
    """Fuse two pool-bounded (doc_id, score) frames with CombSUM (Fox &
    Shaw, TREC-2) — the sum of min-max-normalized scores — or CombMNZ
    (``mnz=True``): that sum multiplied by the number of rankings
    containing the doc, rewarding multi-evidence hits. Returns top-k
    ``(doc_id, fused, n_lists)``, ties by ascending doc_id.

    The score-aware alternative to :func:`rrf_fuse` (which discards
    scores for ranks): Comb* preserves score gaps inside each ranking,
    RRF is immune to scale mismatch — standard practice is CombMNZ when
    both scorers are calibrated-ish, RRF otherwise.
    """
    t = _minmax(text_scores, "_st")
    v = _minmax(vec_scores, "_sv")
    both = t.join(v, "doc_id", "full_outer")
    s = F.coalesce("_st", F.lit(0.0)) + F.coalesce("_sv", F.lit(0.0))
    nz = (
        F.col("_st").isNotNull().cast("int")
        + F.col("_sv").isNotNull().cast("int")
    )
    fused = (s * nz.cast("double")) if mnz else s
    return (
        both.select(
            "doc_id",
            fused.alias("fused"),
            nz.cast("long").alias("n_lists"),
        )
        .orderBy(F.desc("fused"), F.asc("doc_id"))
        .limit(int(k))
    )


def hybrid_topk_comb(
    engine,
    embeddings: DataFrame,
    query_text: str | list[str],
    query_vec_id: int,
    k: int,
    pool: int = 50,
    mnz: bool = False,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """CombSUM/CombMNZ twin of :func:`hybrid_topk`: identical candidate
    generation (BM25 pushed scan ⊕ exact cosine pool), score-based
    fusion instead of rank-based."""
    from tsidx.ann import cosine_topk

    q = embeddings.filter(F.col(id_col) == query_vec_id).select(
        F.col(id_col).alias("query_id"), F.col(emb_col).alias("q_emb")
    )
    vec_top = cosine_topk(embeddings, q, k=pool, id_col=id_col, emb_col=emb_col)
    vec_pool = _pooled(vec_top, "sim", pool, id_col=id_col)
    text_pool = _pooled(engine.bm25_scores(query_text), "score", pool)
    return comb_fuse(text_pool, vec_pool, k, mnz=mnz)
