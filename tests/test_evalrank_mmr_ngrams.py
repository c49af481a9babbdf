"""ranking_metrics vs hand-computed nDCG/MRR; MMR greedy vs a pure-Python
oracle; stemmed n-gram counts vs Python."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from tsidx.ann import mmr_rerank
from tsidx.evalrank import ranking_metrics
from tsidx.porter2 import stem
from tsidx.textstats import ngram_counts


def test_ranking_metrics_hand_case(spark):
    ranked = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 3), (13, 4)], "doc_id long, rank int"
    )
    rels = spark.createDataFrame(
        [(10, 3), (12, 1), (13, 0), (99, 2)], "doc_id long, rel int"
    )
    got = ranking_metrics(ranked, rels, 4).collect()[0]
    dcg = 3 / math.log2(2) + 0 / math.log2(3) + 1 / math.log2(4) + 0
    idcg = 3 / math.log2(2) + 2 / math.log2(3) + 1 / math.log2(4) + 0
    assert got["dcg_r"] == round(dcg, 4)
    assert got["idcg_r"] == round(idcg, 4)
    assert got["ndcg_r"] == round(dcg / idcg, 4)
    assert got["mrr_r"] == 1.0  # first relevant at rank 1


def test_ranking_metrics_edge_cases(spark):
    ranked = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank int")
    no_rel = spark.createDataFrame([(9, 5)], "doc_id long, rel int")
    got = ranking_metrics(ranked, no_rel, 2).collect()[0]
    assert got["dcg_r"] == 0.0 and got["mrr_r"] == 0.0
    assert got["ndcg_r"] == 0.0
    zero = spark.createDataFrame([(1, 0)], "doc_id long, rel int")
    got = ranking_metrics(ranked, zero, 2).collect()[0]
    assert got["idcg_r"] == 0.0 and got["ndcg_r"] == 0.0  # no div-by-zero


def py_mmr(cands, lam, k):
    # cands: list of (id, sim, unit_vec)
    import numpy as np

    rem = list(cands)
    sel, out = [], []
    while rem and len(out) < k:
        best = None
        for cid, sim, v in rem:
            pen = max((float(np.dot(v, sv)) for _, _, sv in sel), default=0.0)
            score = lam * sim - (1 - lam) * pen if sel else lam * sim
            key = (-score, cid)
            if best is None or key < best[0]:
                best = (key, (cid, sim, v), score)
        out.append((best[1][0], best[2]))
        sel.append(best[1])
        rem = [c for c in rem if c[0] != best[1][0]]
    return out


def test_mmr_vs_python(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(30, 8))
    # plant near-duplicates: vec 1 ~ vec 0, vec 5 ~ vec 4
    vecs[1] = vecs[0] + rng.normal(scale=1e-3, size=8)
    vecs[5] = vecs[4] + rng.normal(scale=1e-3, size=8)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(30)],
        "vec_id long, embedding array<double>",
    )
    q = vecs[0] * 0.9 + rng.normal(scale=0.05, size=8)
    got = mmr_rerank(corpus, [float(x) for x in q], k=8, fetch_k=30, lam=0.5).collect()
    # python oracle over the same candidate set
    qn = q / np.linalg.norm(q)
    unit = vecs / np.linalg.norm(vecs, axis=1)[:, None]
    sims = unit @ qn
    cands = [(i, float(sims[i]), unit[i]) for i in range(30)]
    want = py_mmr(cands, 0.5, 8)
    assert [r["vec_id"] for r in got] == [i for i, _ in want]
    for r, (_, score) in zip(got, want):
        assert abs(r["mmr"] - score) < 1e-9
    # diversity: vec 0 and its near-dup vec 1 are not BOTH in the top
    ids = [r["vec_id"] for r in got]
    assert not (0 in ids[:2] and 1 in ids[:2])


def test_mmr_lambda_one_is_cosine_topk(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(20, 4))
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    q = [float(x) for x in vecs[2]]
    got = [r["vec_id"] for r in mmr_rerank(corpus, q, k=5, fetch_k=20, lam=1.0).collect()]
    unit = vecs / np.linalg.norm(vecs, axis=1)[:, None]
    sims = unit @ (vecs[2] / np.linalg.norm(vecs[2]))
    want = sorted(range(20), key=lambda i: (-sims[i], i))[:5]
    assert got == want


def test_ngram_counts_vs_python(spark):
    rows = [
        (0, "the merge window and the merge plan"),
        (1, "merge window size"),
        (2, "one"),                       # too short for bigrams
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["gram"]: (r["cf"], r["df"])
        for r in ngram_counts(docs, n=2).collect()
    }
    cf, df = Counter(), Counter()
    for _, text in rows:
        st = [stem(t) for t in text.split()]
        grams = [" ".join(st[i : i + 2]) for i in range(len(st) - 1)]
        cf.update(grams)
        df.update(set(grams))
    assert got == {g: (cf[g], df[g]) for g in cf}
    assert got["merg window"] == (2, 2)   # stemmed, cross-doc
    # min_cf bounds the output
    capped = {r["gram"] for r in ngram_counts(docs, n=2, min_cf=2).collect()}
    assert capped == {g for g in cf if cf[g] >= 2}


# ------------------------------------------------------- rank-biased overlap


def test_rbo_min_reference_values():
    from tsidx.evalrank import rbo_min

    # identical lists: RBO_min = (1-p) * sum p^(d-1) (overlap/d = 1)
    p = 0.9
    want = (1 - p) * sum(p ** (d - 1) for d in range(1, 4))
    assert rbo_min([1, 2, 3], [1, 2, 3], p) == pytest.approx(want)
    # disjoint lists: 0
    assert rbo_min([1, 2], [3, 4], p) == 0.0
    # hand-computed: a=[1,2,3], b=[2,1,3] -> overlaps d=1:0, d=2:2, d=3:3
    want = (1 - p) * (0 + p * (2 / 2) + p * p * (3 / 3))
    assert rbo_min([1, 2, 3], [2, 1, 3], p) == pytest.approx(want)
    # swap symmetry
    assert rbo_min([5, 6, 7], [7, 6, 5], p) == pytest.approx(
        rbo_min([7, 6, 5], [5, 6, 7], p)
    )


def test_rank_agreement_frame(spark):
    from tsidx.evalrank import rank_agreement, rbo_min

    a = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "doc_id long, rank int"
    )
    b = spark.createDataFrame(
        [(20, 1), (10, 2), (40, 3)], "doc_id long, rank int"
    )
    row = rank_agreement(a, b, 3, p=0.9).collect()[0]
    assert row["k"] == 3
    assert row["n_common"] == 2
    assert row["rbo_min_r"] == pytest.approx(
        round(rbo_min([10, 20, 30], [20, 10, 40], 0.9), 6)
    )


# ------------------------------------------------- cross-corpus winnowing


def test_winnow_cross_pairs_directional(spark):
    from tsidx.winnow import winnow_cross_pairs, winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta eta theta " * 3
    new = spark.createDataFrame(
        [(1, "new intro " + shared), (3, "wholly original content here today")],
        "doc_id long, text string",
    )
    ref = spark.createDataFrame(
        [(0, shared + "archive tail"), (2, "other archived material entirely")],
        "doc_id long, text string",
    )
    nf = winnow_fingerprints(new, k=4, w=5)
    rf = winnow_fingerprints(ref, k=4, w=5)
    got = {
        (r["new_id"], r["ref_id"]): r["n_shared"]
        for r in winnow_cross_pairs(
            nf, rf, min_shared=2, max_key_df=50
        ).collect()
    }
    assert set(got) == {(1, 0)}  # only the plagiarized pair; never new x new
    assert got[(1, 0)] >= 2


def test_winnow_cross_matches_brute_force(spark):
    """Cross pairs == shared-distinct-fingerprint counts computed from
    the raw fingerprint frames."""
    from collections import defaultdict

    from tsidx.winnow import winnow_cross_pairs, winnow_fingerprints

    rows = [(d, " ".join(f"w{(d * 7 + i * (1 + d % 3)) % 23}" for i in range(30)))
            for d in range(12)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    nf = winnow_fingerprints(docs.filter("doc_id % 2 = 1"), k=4, w=5)
    rf = winnow_fingerprints(docs.filter("doc_id % 2 = 0"), k=4, w=5)
    nfp = defaultdict(set)
    for r in nf.collect():
        nfp[r["doc_id"]].add(r["fp"])
    rfp = defaultdict(set)
    for r in rf.collect():
        rfp[r["doc_id"]].add(r["fp"])
    want = {}
    for a, sa in nfp.items():
        for b, sb in rfp.items():
            n = len(sa & sb)
            if n >= 2:
                want[(a, b)] = n
    got = {
        (r["new_id"], r["ref_id"]): r["n_shared"]
        for r in winnow_cross_pairs(nf, rf, min_shared=2, max_key_df=100).collect()
    }
    assert got == want
