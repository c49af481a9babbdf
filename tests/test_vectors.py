"""Sparse tf-idf export vs brute-force ground truth on the sonnets."""

import math

import pytest

from tsidx.build import build_index
from tsidx.oracle import OracleIndex, bm25_idf
from tsidx.query import QueryEngine
from tsidx.vectors import tfidf_rows


@pytest.fixture(scope="module")
def built(spark, sonnets_transcripts):
    return build_index(sonnets_transcripts, block_size=64, num_partitions=4)


@pytest.fixture(scope="module")
def oracle(sonnets):
    o = OracleIndex()
    o.add_corpus(sonnets)
    return o


def _brute(oracle):
    n = oracle.n_docs
    out = {}
    for term, plist in oracle.postings.items():
        idf = bm25_idf(n, len(plist))
        for doc_id, tf in plist:
            out[(doc_id, term)] = tf * idf
    return out


def test_tfidf_rows_match_bruteforce(built, oracle):
    eng = QueryEngine(built)
    got = {
        (r["doc_id"], r["term"]): r["w"] for r in tfidf_rows(eng).collect()
    }
    want = _brute(oracle)
    assert set(got) == set(want)
    for key, w in want.items():
        assert got[key] == pytest.approx(w, rel=1e-12), key


def test_tfidf_normalized_unit_norm(built, oracle):
    eng = QueryEngine(built)
    rows = tfidf_rows(eng, normalized=True).collect()
    by_doc: dict[int, float] = {}
    for r in rows:
        by_doc[r["doc_id"]] = by_doc.get(r["doc_id"], 0.0) + r["w"] ** 2
    assert len(by_doc) == 154
    for doc_id, sq in by_doc.items():
        assert math.sqrt(sq) == pytest.approx(1.0, rel=1e-9), doc_id
    # direction is preserved: normalized ratios equal raw ratios
    raw = _brute(oracle)
    r0 = [r for r in rows if r["doc_id"] == 0]
    t_ref = r0[0]["term"]
    for r in r0[1:4]:
        assert r["w"] / r0[0]["w"] == pytest.approx(
            raw[(0, r["term"])] / raw[(0, t_ref)], rel=1e-9
        )


def test_top_terms_per_doc(built, oracle):
    from tsidx.vectors import top_terms_per_doc

    eng = QueryEngine(built)
    m = 4
    rows = top_terms_per_doc(eng, m=m).collect()
    got: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r["doc_id"], r["rank"])):
        got.setdefault(r["doc_id"], []).append((r["term"], r["w"], r["rank"]))
    want_all = _brute(oracle)
    assert set(got) == set(range(154))
    for doc_id, terms in got.items():
        # ranks are 1..m, weights non-increasing, tie-broken by term
        assert [t[2] for t in terms] == list(range(1, len(terms) + 1))
        doc_terms = sorted(
            ((w, term) for (d, term), w in want_all.items() if d == doc_id),
            key=lambda x: (-x[0], x[1]),
        )[:m]
        assert [(t, pytest.approx(w, rel=1e-12)) for t, w, _ in terms] == [
            (term, pytest.approx(w, rel=1e-12)) for w, term in doc_terms
        ]


def test_top_terms_per_doc_rejects_nonpositive(built):
    from tsidx.vectors import top_terms_per_doc

    eng = QueryEngine(built)
    with pytest.raises(ValueError):
        top_terms_per_doc(eng, m=0)


def _brute_sim_topk(oracle, k, max_df):
    """Pure-Python replay of the df-capped tf-idf cosine top-k."""
    import math
    from collections import defaultdict

    n = oracle.n_docs
    vecs: dict = defaultdict(dict)
    for term, plist in oracle.postings.items():
        if len(plist) > max_df:
            continue
        idf = bm25_idf(n, len(plist))
        for doc_id, tf in plist:
            vecs[doc_id][term] = tf * idf
    for d, v in vecs.items():
        nrm = math.sqrt(sum(w * w for w in v.values()))
        vecs[d] = {t: w / nrm for t, w in v.items()}
    sims: dict = defaultdict(dict)
    docs = sorted(vecs)
    for i, d1 in enumerate(docs):
        for d2 in docs[i + 1:]:
            v1, v2 = vecs[d1], vecs[d2]
            if len(v2) < len(v1):
                v1, v2 = v2, v1
            s = sum(w * v2[t] for t, w in v1.items() if t in v2)
            if s > 0:
                sims[d1][d2] = s
                sims[d2][d1] = s
    out = {}
    for d, nbrs in sims.items():
        ranked = sorted(nbrs.items(), key=lambda kv: (-round(kv[1], 9), kv[0]))
        out[d] = [(sd, round(s, 6)) for sd, s in ranked[:k]]
    return out


def test_doc_sim_topk_matches_bruteforce(built, oracle):
    from tsidx.vectors import doc_sim_topk

    k, cap = 5, 40
    got: dict = {}
    rows = doc_sim_topk(
        QueryEngine(built), k=k, max_df=cap, rank_round=9
    ).collect()
    for r in rows:
        got.setdefault(r["doc_id"], []).append(
            (r["sim_doc_id"], round(r["sim"], 6))
        )
    want = _brute_sim_topk(oracle, k, cap)
    assert set(got) == {d for d, v in want.items() if v}
    for d, nbrs in got.items():
        assert nbrs == want[d], (d, nbrs, want[d])


def test_doc_sim_topk_rejects_bad_k(built):
    from tsidx.vectors import doc_sim_topk

    with pytest.raises(ValueError):
        doc_sim_topk(QueryEngine(built), k=0)
