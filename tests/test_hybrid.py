"""Hybrid retrieval (tsidx/hybrid.py): RRF fusion vs a pure-Python oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tsidx.hybrid import hybrid_topk, ranked, rrf_fuse

SF = "/root/testdata/sf0.001"


def test_rrf_fuse_pure(spark):
    t = spark.createDataFrame([(10, 1), (20, 2), (30, 3)], "doc_id long, rank int")
    v = spark.createDataFrame([(20, 1), (40, 2)], "doc_id long, rank int")
    got = {
        r["doc_id"]: (r["rrf"], r["r_text"], r["r_vec"])
        for r in rrf_fuse(t, v, k=10, c=60).collect()
    }
    assert got == {
        10: (1 / 61, 1, 0),
        20: (1 / 62 + 1 / 61, 2, 1),
        30: (1 / 63, 3, 0),
        40: (1 / 62, 0, 2),
    }
    # ordering: fused doc first
    order = [r["doc_id"] for r in rrf_fuse(t, v, k=10, c=60).collect()]
    assert order[0] == 20


def test_ranked_tie_break(spark):
    df = spark.createDataFrame(
        [(5, 1.0), (3, 1.0), (9, 2.0)], "doc_id long, score double"
    )
    got = [(r["doc_id"], r["rank"]) for r in ranked(df, "score", pool=2).collect()]
    assert sorted(got) == [(3, 2), (9, 1)]  # tie 5 vs 3 -> lower id wins pool


def test_hybrid_topk_vs_python(spark):
    from tsidx.build import build_index
    from tsidx.query import QueryEngine

    import __spark_entry__ as entry

    tr = entry.documents_as_transcripts(spark, SF)
    eng = QueryEngine(build_index(tr, block_size=1024))
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")

    pool, k, c = 25, 10, 60
    got = [
        (r["doc_id"], r["rrf"], r["r_text"], r["r_vec"])
        for r in hybrid_topk(eng, emb, "customer query", 0, k, pool=pool, c=c).collect()
    ]

    # python oracle from the engine's own exact scores/sims
    scores = {
        r["doc_id"]: r["score"]
        for r in eng.bm25_scores("customer query").collect()
    }
    t_rank = {
        d: i + 1
        for i, (d, _) in enumerate(
            sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:pool]
        )
    }
    from tsidx.ann import cosine_topk

    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    sims = {
        r["vec_id"]: r["sim"] for r in cosine_topk(emb, q, k=pool).collect()
    }
    v_rank = {
        d: i + 1
        for i, (d, _) in enumerate(
            sorted(sims.items(), key=lambda x: (-x[1], x[0]))[:pool]
        )
    }
    fused = {}
    for d in set(t_rank) | set(v_rank):
        rrf = (1.0 / (60.0 + t_rank[d]) if d in t_rank else 0.0) + (
            1.0 / (60.0 + v_rank[d]) if d in v_rank else 0.0
        )
        fused[d] = (rrf, t_rank.get(d, 0), v_rank.get(d, 0))
    exp = [
        (d, *fused[d])
        for d in sorted(fused, key=lambda d: (-fused[d][0], d))[:k]
    ]
    assert got == exp
