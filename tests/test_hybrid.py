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


# ---------------------------------------------------------------------------
# CombSUM / CombMNZ fusion
# ---------------------------------------------------------------------------


def _py_minmax(scores):
    if not scores:
        return {}
    vals = list(scores.values())
    mn, mx = min(vals), max(vals)
    if mx > mn:
        return {d: (s - mn) / (mx - mn) for d, s in scores.items()}
    return {d: 1.0 for d in scores}


def _py_comb(t, v, k, mnz):
    tn, vn = _py_minmax(t), _py_minmax(v)
    out = []
    for d in set(tn) | set(vn):
        s = tn.get(d, 0.0) + vn.get(d, 0.0)
        nl = (d in tn) + (d in vn)
        out.append((d, s * nl if mnz else s, nl))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]


@pytest.mark.parametrize("mnz", [False, True], ids=["combsum", "combmnz"])
def test_comb_fuse_pure(spark, mnz):
    from tsidx.hybrid import comb_fuse

    t = {10: 5.0, 20: 3.0, 30: 1.0}
    v = {20: 0.9, 40: 0.7, 30: 0.5}
    tf = spark.createDataFrame(list(t.items()), "doc_id long, score double")
    vf = spark.createDataFrame(list(v.items()), "doc_id long, score double")
    got = [
        (r["doc_id"], r["fused"], r["n_lists"])
        for r in comb_fuse(tf, vf, k=10, mnz=mnz).collect()
    ]
    want = _py_comb(t, v, 10, mnz)
    assert [(d, n) for d, _, n in got] == [(d, n) for d, _, n in want]
    for (_, s1, _), (_, s2, _) in zip(got, want):
        assert s1 == pytest.approx(s2, abs=1e-12)
    if mnz:
        # doc 20 appears in both lists -> MNZ doubles it to the top
        assert got[0][0] == 20


def test_comb_fuse_degenerate_pool(spark):
    from tsidx.hybrid import comb_fuse

    t = spark.createDataFrame([(1, 2.0), (2, 2.0)], "doc_id long, score double")
    v = spark.createDataFrame([(3, 0.4)], "doc_id long, score double")
    got = {r["doc_id"]: r["fused"] for r in comb_fuse(t, v, 10).collect()}
    assert got == {1: 1.0, 2: 1.0, 3: 1.0}  # all-equal pools normalize to 1


def test_hybrid_topk_comb_vs_python(spark):
    from tsidx.build import build_index
    from tsidx.query import QueryEngine
    from tsidx.ann import cosine_topk
    from tsidx.hybrid import hybrid_topk_comb

    import __spark_entry__ as entry

    tr = entry.documents_as_transcripts(spark, SF)
    eng = QueryEngine(build_index(tr, block_size=1024))
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    pool, k = 25, 10

    scores = {
        r["doc_id"]: r["score"]
        for r in eng.bm25_scores("customer query").collect()
    }
    t_pool = dict(sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:pool])
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    sims = {
        r["vec_id"]: r["sim"]
        for r in cosine_topk(emb, q, k=pool).collect()
    }
    for mnz in (False, True):
        got = [
            (r["doc_id"], r["n_lists"])
            for r in hybrid_topk_comb(
                eng, emb, "customer query", 0, k, pool=pool, mnz=mnz
            ).collect()
        ]
        want = [(d, n) for d, _, n in _py_comb(t_pool, sims, k, mnz)]
        assert got == want, f"mnz={mnz}"


# ---------------------------------------------------------------------------
# BM25+ (delta floor)
# ---------------------------------------------------------------------------


def test_bm25_plus_vs_python(spark):
    """BM25+ score == BM25 score + δ · Σ idf over the doc's matching
    terms — verified doc-by-doc from the engine's own exact outputs."""
    from tsidx.build import build_index
    from tsidx.query import QueryEngine

    import __spark_entry__ as entry

    tr = entry.documents_as_transcripts(spark, SF)
    eng = QueryEngine(build_index(tr, block_size=1024))
    delta = 0.5
    q = "customer query merge"
    idfs = eng.query_idfs(eng.terms_of(q))
    base = {r["doc_id"]: r["score"] for r in eng.bm25_scores(q).collect()}
    rows = eng.posting_rows(sorted(idfs)).select("doc_id", "term").collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["term"])
    got = {
        r["doc_id"]: r["score"]
        for r in eng.bm25_plus_scores(q, delta).collect()
    }
    assert set(got) == set(base)
    for d in got:
        bump = sum(idfs[t] * delta for t in sorted(by_doc[d]))
        assert got[d] == pytest.approx(base[d] + bump, abs=1e-9), d
    # ranking: top page well-formed and deterministic
    page = [r["doc_id"] for r in eng.bm25_plus_topk(q, 5, delta).collect()]
    assert len(page) == 5
