"""LM-Dirichlet ranking and significant-terms aggregation.

Both are verified against an independent driver-side Python computation
over a tiny transcript corpus (formulas re-derived with math.log /
collections, not the engine's code path), plus invariants: descending
order, determinism, empty-query behavior.
"""

from __future__ import annotations

import datetime
import math
from collections import Counter

import pytest

from tsidx.build import build_index
from tsidx.query import QueryEngine
from tsidx.tokenize import stem_tokens

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)

TEXTS = [
    "merge the customer table",
    "customer query planner",
    "query merge merge conflict",
    "scan the stream for errors",
    "customer customer customer service",
    "the planner picks a scan",
    "merge window stream",
    "query the query planner twice",
]


def _ts(i):
    return datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc) + datetime.timedelta(minutes=i)


@pytest.fixture(scope="module")
def engine(spark):
    rows = [(f"c{i//4}", i % 4, "user", t, "", _ts(i)) for i, t in enumerate(TEXTS)]
    idx = build_index(spark.createDataFrame(rows, TRANSCRIPT_SCHEMA), block_size=4)
    return QueryEngine(idx)


def _tok_docs():
    return [stem_tokens(t) for t in TEXTS]


def _lm_reference(query: str, mu: float):
    """Independent Dirichlet query-likelihood computation."""
    docs = _tok_docs()
    c_tokens = sum(len(d) for d in docs)
    cf = Counter(t for d in docs for t in d)
    qterms = sorted(set(stem_tokens(query)))
    scores = {}
    for doc_id, d in enumerate(docs):
        tf = Counter(d)
        matched = [t for t in qterms if tf[t] > 0]
        if not matched:
            continue
        s = 0.0
        for t in matched:
            s += math.log(1.0 + tf[t] / (mu * (cf[t] / c_tokens)))
            s += math.log(mu / (mu + len(d)))
        scores[doc_id] = s
    return scores


def test_lm_dirichlet_matches_reference(engine):
    mu = 500.0
    got = {
        r["doc_id"]: r["score"]
        for r in engine.lm_dirichlet_scores("customer merge", mu=mu).collect()
    }
    want = _lm_reference("customer merge", mu)
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-12)


def test_lm_dirichlet_topk_order(engine):
    rows = engine.lm_dirichlet_topk("customer query", 4, mu=100.0).collect()
    assert len(rows) == 4
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # deterministic across runs
    again = engine.lm_dirichlet_topk("customer query", 4, mu=100.0).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_lm_dirichlet_empty_query(engine):
    assert engine.lm_dirichlet_scores("").count() == 0


def test_lm_dirichlet_more_tf_scores_higher(engine):
    # doc 4 has tf(customer)=3; doc 1 has tf(customer)=1 and is longer-ish
    got = {
        r["doc_id"]: r["score"]
        for r in engine.lm_dirichlet_scores("customer", mu=200.0).collect()
    }
    assert got[4] > got[1]


def _sig_reference(query: str, min_fg_df: int):
    docs = _tok_docs()
    n_docs = len(docs)
    qterms = set(stem_tokens(query))
    fg_ids = [i for i, d in enumerate(docs) if qterms & set(d)]
    fg_n = len(fg_ids)
    fg_df = Counter(t for i in fg_ids for t in set(docs[i]))
    bg_df = Counter(t for d in docs for t in set(d))
    out = {}
    for t, f in fg_df.items():
        if f < min_fg_df:
            continue
        fg_pct = f / fg_n
        bg_pct = bg_df[t] / n_docs
        if fg_pct <= bg_pct:
            continue
        out[t] = ((fg_pct - bg_pct) * (fg_pct / bg_pct), f, bg_df[t])
    return out


def test_significant_terms_matches_reference(engine):
    rows = engine.significant_terms("query", min_fg_df=2, top_n=50).collect()
    want = _sig_reference("query", 2)
    got = {r["term"]: (r["score"], r["fg_df"], r["bg_df"]) for r in rows}
    assert set(got) == set(want)
    for t, (score, fgd, bgd) in want.items():
        assert got[t][1] == fgd and got[t][2] == bgd
        assert got[t][0] == pytest.approx(score, rel=1e-12)
    # ordering: score desc, term asc
    keys = [(-r["score"], r["term"]) for r in rows]
    assert keys == sorted(keys)


def test_significant_terms_top_n_and_empty(engine):
    assert len(engine.significant_terms("query", min_fg_df=1, top_n=2).collect()) == 2
    assert engine.significant_terms("zzzunknown").count() == 0


# ------------------------------------------------------- Jelinek-Mercer LM


def _jm_reference(query: str, lam: float):
    """Independent JM query-likelihood computation (Lucene form)."""
    docs = _tok_docs()
    c_tokens = sum(len(d) for d in docs)
    cf = Counter(t for d in docs for t in d)
    qterms = sorted(set(stem_tokens(query)))
    scores = {}
    for doc_id, d in enumerate(docs):
        tf = Counter(d)
        matched = [t for t in qterms if tf[t] > 0]
        if not matched:
            continue
        s = 0.0
        for t in matched:
            s += math.log(
                1.0 + ((1.0 - lam) * tf[t] / len(d)) / (lam * cf[t] / c_tokens)
            )
        scores[doc_id] = s
    return scores


def test_lm_jm_matches_reference(engine):
    lam = 0.1
    got = {
        r["doc_id"]: r["score"]
        for r in engine.lm_jm_scores("customer merge", lam=lam).collect()
    }
    want = _jm_reference("customer merge", lam)
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-12)


def test_lm_jm_topk_deterministic(engine):
    rows = engine.lm_jm_topk("customer query", 4, lam=0.3).collect()
    assert len(rows) == 4
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    again = engine.lm_jm_topk("customer query", 4, lam=0.3).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_lm_jm_empty_query(engine):
    assert engine.lm_jm_scores("").count() == 0


# -------------------------------------------------------------- clarity QPP


def _clarity_reference(query: str, fb_docs: int):
    """Independent Clarity computation (Cronen-Townsend 2002, BM25 fb
    weights rounded@4 like the engine)."""
    from tsidx.oracle import OracleIndex

    oi = OracleIndex()
    oi.add_corpus(TEXTS)
    scores = [
        (d, math.floor(s * 1e4 + 0.5) / 1e4)
        for d, s in oi.bm25_topk(query, len(TEXTS))
    ]
    scores.sort(key=lambda x: (-x[1], x[0]))
    fb = scores[:fb_docs]
    z = sum(s for _, s in fb)
    docs = _tok_docs()
    pwq = {}
    for d, s in fb:
        toks = docs[d]
        tf = Counter(toks)
        for t, f in tf.items():
            pwq[t] = pwq.get(t, 0.0) + (s / z) * (f / len(toks))
    cf = Counter(t for dd in docs for t in dd)
    c = sum(len(dd) for dd in docs)
    clarity = sum(
        p * math.log2(p * c / cf[t]) for t, p in sorted(pwq.items())
    )
    return len(fb), len(pwq), clarity


def test_clarity_matches_reference(engine):
    row = engine.clarity_score("customer merge", fb_docs=3).collect()[0]
    n_fb, n_terms, want = _clarity_reference("customer merge", 3)
    assert row["n_fb_docs"] == n_fb
    assert row["n_terms"] == n_terms
    assert row["clarity"] == pytest.approx(want, rel=1e-9)


def test_clarity_rare_query_clearer_than_stopword(engine):
    rare = engine.clarity_score("conflict", fb_docs=4).collect()[0]["clarity"]
    common = engine.clarity_score("the", fb_docs=4).collect()[0]["clarity"]
    assert rare > common


def test_clarity_empty_and_nomatch(engine):
    assert engine.clarity_score("").count() == 0
    row = engine.clarity_score("zzzmissing").collect()[0]
    assert row["n_fb_docs"] == 0 and row["clarity"] is None


# ------------------------------------------------------------------ DFR PL2


def _pl2_reference(query: str, c: float):
    """Independent PL2 computation (Amati & van Rijsbergen 2002)."""
    docs = _tok_docs()
    n = len(docs)
    avgdl = sum(len(d) for d in docs) / n
    cf = Counter(t for d in docs for t in d)
    qterms = sorted(set(stem_tokens(query)))
    scores = {}
    for doc_id, d in enumerate(docs):
        tf = Counter(d)
        matched = [t for t in qterms if tf[t]]
        if not matched:
            continue
        s = 0.0
        for t in matched:
            tfn = tf[t] * math.log2(1.0 + c * avgdl / len(d))
            lam = cf[t] / n
            s += (1.0 / (tfn + 1.0)) * (
                tfn * math.log2(tfn / lam)
                + (lam - tfn) * math.log2(math.e)
                + 0.5 * math.log2(2.0 * math.pi * tfn)
            )
        scores[doc_id] = s
    return scores


def test_pl2_matches_reference(engine):
    got = {
        r["doc_id"]: r["score"]
        for r in engine.pl2_scores("customer merge", c=1.0).collect()
    }
    want = _pl2_reference("customer merge", 1.0)
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-9)


def test_pl2_topk_deterministic(engine):
    rows = engine.pl2_topk("customer query", 4).collect()
    assert len(rows) == 4
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert [tuple(r) for r in rows] == [
        tuple(r) for r in engine.pl2_topk("customer query", 4).collect()
    ]
