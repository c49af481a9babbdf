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

__all__ = ["ranking_metrics"]


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
