"""Ranking-quality evaluation: nDCG@k and MRR over a graded relevance
table — the measurement side of the retrieval engine (reranker training
and BM25-parameter tuning both need it computed at corpus scale).

No reference counterpart (the reference ships no evaluation harness);
standard IR definitions: DCG@k = Σ rel_i / log2(rank_i + 1) over the
ranked list, IDCG@k = the same sum over the k largest relevance grades in
the corpus, nDCG = DCG/IDCG, MRR = 1 / first rank with rel > 0.

Scale shape: the ranked list is k rows by construction; the relevance
table can be corpus-sized, but it is only ever (a) hash-joined against
the k ranked rows and (b) TakeOrdered down to its k largest grades for
IDCG — no global sort, no corpus-wide window. The output is one row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["ranking_metrics", "rbo_min", "rank_agreement"]


def ranking_metrics(
    ranked: DataFrame,
    rels: DataFrame,
    k: int,
    rank_col: str = "rank",
    id_col: str = "doc_id",
    rel_col: str = "rel",
) -> DataFrame:
    """One row ``(k, dcg_r, idcg_r, ndcg_r, mrr_r)`` for a ranked list
    *ranked* ``(doc_id, rank)`` (1-based, best first) against graded
    relevance *rels* ``(doc_id, rel)``; docs absent from *rels* count as
    rel = 0, and an all-zero ideal list yields ndcg = 0. Duplicate doc_ids
    in *rels* (multi-judge qrels) resolve to the max grade — without this
    the join would fan ranked rows out and inflate DCG past nDCG = 1.
    """
    k = int(k)
    rels = rels.groupBy(F.col(id_col)).agg(
        F.max(F.col(rel_col)).alias(rel_col)
    )
    r = ranked.filter(F.col(rank_col) <= k).select(
        F.col(id_col).alias("doc_id"), F.col(rank_col).alias("rank")
    )
    j = r.join(
        rels.select(F.col(id_col).alias("doc_id"), F.col(rel_col).alias("rel")),
        "doc_id",
        "left",
    ).withColumn("rel", F.coalesce(F.col("rel"), F.lit(0)).cast("double"))
    # DCG and MRR come from the same k-row join — one aggregation pass
    dcg_mrr = j.agg(
        F.coalesce(
            F.sum(F.col("rel") / F.log2(F.col("rank") + F.lit(1.0))), F.lit(0.0)
        ).alias("dcg"),
        F.coalesce(
            F.lit(1.0)
            / F.min(F.when(F.col("rel") > 0, F.col("rank"))),
            F.lit(0.0),
        ).alias("mrr"),
    )
    # ideal list: the k largest grades in the corpus (TakeOrdered — the
    # corpus-sized rels table is never globally sorted or windowed)
    top_rels = (
        rels.select(F.col(rel_col).cast("double").alias("rel"))
        .orderBy(F.desc("rel"))
        .limit(k)
    )
    w = Window.orderBy(F.desc("rel"))
    idcg = top_rels.withColumn("i", F.row_number().over(w)).agg(
        F.coalesce(
            F.sum(F.col("rel") / F.log2(F.col("i") + F.lit(1.0))), F.lit(0.0)
        ).alias("idcg")
    )
    # the one remaining crossJoin is two single-row aggregates — a
    # BroadcastNestedLoopJoin over exactly 1x1 rows, bounded by
    # construction (flagged-and-waived in the plan audit, PLANS.md)
    return (
        dcg_mrr.crossJoin(idcg)
        .select(
            F.lit(k).cast("long").alias("k"),
            F.round("dcg", 4).alias("dcg_r"),
            F.round("idcg", 4).alias("idcg_r"),
            F.round(
                F.when(F.col("idcg") > 0, F.col("dcg") / F.col("idcg"))
                .otherwise(F.lit(0.0)),
                4,
            ).alias("ndcg_r"),
            F.round("mrr", 4).alias("mrr_r"),
        )
    )


def rbo_min(
    a: list[int], b: list[int], p: float = 0.9
) -> float:
    """Rank-Biased Overlap, lower bound (Webber, Moffat & Zobel, TOIS
    2010 eq. 11 truncated at the seen depth): for prefix lists *a*, *b*

        RBO_min = (1 - p) * sum over d = 1..k of p^(d-1) * |a_:d ∩ b_:d| / d

    Top-weighted (disagreement deep in the lists matters geometrically
    less — the property Kendall's tau lacks for rankings) and defined on
    non-conjoint lists. Driver-side over two k-row lists — the bounded
    setting it exists for."""
    k = min(len(a), len(b))
    seen_a: set = set()
    seen_b: set = set()
    overlap = 0
    s = 0.0
    for d in range(1, k + 1):
        x, y = a[d - 1], b[d - 1]
        if x == y:
            overlap += 1
        else:
            if x in seen_b:
                overlap += 1
            if y in seen_a:
                overlap += 1
            seen_a.add(x)
            seen_b.add(y)
        s += (p ** (d - 1)) * overlap / d
    return (1.0 - p) * s


def rank_agreement(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    k: int,
    p: float = 0.9,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """One row ``(k, n_common, rbo_min_r)`` comparing two ranked lists
    (1-based *rank_col*, best first) — e.g. BM25 vs an LM ranker, or
    pre- vs post-deploy rankings in an A/B regression gate.

    Plan: both inputs are k-row lists by construction, collected
    driver-side (2k rows) and folded in rank order — the same bounded
    discipline as the recall gates. ``n_common`` = |top-k ∩ top-k|.
    """
    k = int(k)
    rows_a = (
        ranked_a.filter(F.col(rank_col) <= k)
        .orderBy(rank_col)
        .select(id_col)
        .collect()
    )
    rows_b = (
        ranked_b.filter(F.col(rank_col) <= k)
        .orderBy(rank_col)
        .select(id_col)
        .collect()
    )
    a = [r[id_col] for r in rows_a]
    b = [r[id_col] for r in rows_b]
    score = rbo_min(a, b, p)
    spark = ranked_a.sparkSession
    return spark.createDataFrame(
        [(k, len(set(a) & set(b)), round(score, 6))],
        "k long, n_common long, rbo_min_r double",
    )
