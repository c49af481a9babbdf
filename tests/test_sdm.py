"""Sequential Dependence Model ranking (tsidx/sdm.py).

Ground truth: a from-scratch pure-Python SDM implementation over the same
stemmed token streams (Metzler & Croft 2005 feature definitions applied
literally, no shared code with the engine path).
"""

from __future__ import annotations

import datetime
import math
from collections import Counter

import pytest

from tsidx.build import build_index
from tsidx.query import QueryEngine
from tsidx.sdm import sdm_scores, sdm_topk
from tsidx.tokenize import stem_tokens

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)

TEXTS = [
    "merge the customer table now",
    "customer query planner",
    "query merge merge conflict query merge",
    "scan the stream for errors",
    "customer customer customer service",
    "the planner picks a scan",
    "merge window stream merge window",
    "query the query planner twice",
    "customer query merge customer query merge",
    "unrelated filler text entirely",
]


def _ts(i):
    return datetime.datetime(
        2026, 1, 1, tzinfo=datetime.timezone.utc
    ) + datetime.timedelta(minutes=i)


@pytest.fixture(scope="module")
def engine(spark):
    rows = [
        (f"c{i // 4}", i % 4, "user", t, "", _ts(i)) for i, t in enumerate(TEXTS)
    ]
    idx = build_index(
        spark.createDataFrame(rows, TRANSCRIPT_SCHEMA), block_size=4
    )
    return QueryEngine(idx)


@pytest.fixture(scope="module")
def positional(spark):
    from tsidx.positions import positional_postings

    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )
    return positional_postings(docs, block_size=4).cache()


def _sdm_ref(query, mu=2000.0, lam=(0.85, 0.1, 0.05), window=8):
    """Literal SDM: score every doc matching >= 1 unigram."""
    lam_t, lam_o, lam_u = lam
    docs = [stem_tokens(t) for t in TEXTS]
    c_tokens = sum(len(d) for d in docs)
    cf = Counter(t for d in docs for t in d)
    q = stem_tokens(query)
    pairs = list(zip(q, q[1:]))

    def o_count(d, a, b):
        return sum(
            1 for i in range(len(d) - 1) if d[i] == a and d[i + 1] == b
        )

    def u_count(d, a, b):
        if a == b:
            ps = [i for i, t in enumerate(d) if t == a]
            return sum(
                1
                for x in range(len(ps))
                for y in range(x + 1, len(ps))
                if ps[y] - ps[x] < window
            )
        pa = [i for i, t in enumerate(d) if t == a]
        pb = [i for i, t in enumerate(d) if t == b]
        return sum(
            1 for x in pa for y in pb if 0 < abs(x - y) < window
        )

    cf_o = {p: sum(o_count(d, *p) for d in docs) for p in set(pairs)}
    cf_u = {p: sum(u_count(d, *p) for d in docs) for p in set(pairs)}

    def f(c, cfe, dl):
        cfe = max(cfe, 0.5)
        return math.log((c + mu * cfe / c_tokens) / (dl + mu))

    scores = {}
    for doc_id, d in enumerate(docs):
        tf = Counter(d)
        if not any(tf[t] for t in q):
            continue
        s = 0.0
        for t in q:
            s += lam_t * f(tf[t], cf[t], len(d))
        for p in pairs:
            s += lam_o * f(o_count(d, *p), cf_o[p], len(d))
            s += lam_u * f(u_count(d, *p), cf_u[p], len(d))
        scores[doc_id] = s
    return scores


@pytest.mark.parametrize(
    "query",
    [
        "customer query merge",
        "query planner",
        "merge window",
        "merge merge",  # duplicated query term
        "customer zzzmissing",  # pair feature with corpus cf = 0
    ],
)
def test_sdm_matches_python_reference(engine, positional, query):
    want = _sdm_ref(query)
    got = {
        r["doc_id"]: r["score"]
        for r in sdm_scores(engine, positional, query).collect()
    }
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-9), (query, d)


def test_sdm_topk_order_and_determinism(engine, positional):
    rows = sdm_topk(engine, positional, "customer query merge", 5).collect()
    assert len(rows) == 5
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    again = sdm_topk(engine, positional, "customer query merge", 5).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]
    # phrase-bearing doc 8 ("customer query merge" twice) must win
    assert rows[0]["doc_id"] == 8


def test_sdm_empty_query(engine, positional):
    assert sdm_scores(engine, positional, "").count() == 0


def test_sdm_single_term_equals_dirichlet_shape(engine, positional):
    """One-term query has no pair features: SDM = lam_t * Dirichlet QL
    (same candidates, scores proportional)."""
    q = "planner"
    sdm = {
        r["doc_id"]: r["score"]
        for r in sdm_scores(engine, positional, q).collect()
    }
    want = _sdm_ref(q)
    assert set(sdm) == set(want)
    for d in want:
        assert sdm[d] == pytest.approx(want[d], rel=1e-9)
