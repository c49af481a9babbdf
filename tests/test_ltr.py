"""LTR feature extraction (tsidx/ltr.py): every feature pinned against
either the single-query engine paths (bm25, lmd — bit identity) or a
pure-Python computation (tf/idf stats)."""

from __future__ import annotations

import datetime
import math
from collections import Counter

import pytest

from tsidx.build import build_index
from tsidx.ltr import ltr_features
from tsidx.query import QueryEngine
from tsidx.oracle import bm25_idf
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
]

QUERIES = {
    "q1": "customer query merge",
    "q2": "planner scan",
    "q3": "window",
}


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
def feats(engine):
    return {
        (r["query_id"], r["doc_id"]): r
        for r in ltr_features(engine, QUERIES, mu=500.0).collect()
    }


def test_candidate_sets_and_counts(feats):
    docs = [stem_tokens(t) for t in TEXTS]
    for qid, q in QUERIES.items():
        qts = sorted(set(stem_tokens(q)))
        for doc_id, d in enumerate(docs):
            tf = Counter(d)
            matched = [t for t in qts if tf[t]]
            key = (qid, doc_id)
            if not matched:
                assert key not in feats
                continue
            r = feats[key]
            assert r["n_query_terms"] == len(qts)
            assert r["n_matched"] == len(matched)
            assert r["dl"] == len(d)
            assert r["sum_tf"] == sum(tf[t] for t in matched)
            assert r["min_tf"] == min(tf[t] for t in matched)
            assert r["max_tf"] == max(tf[t] for t in matched)


def test_idf_and_tfidf_features(feats):
    docs = [stem_tokens(t) for t in TEXTS]
    n = len(docs)
    df = Counter(t for d in docs for t in set(d))
    for qid, q in QUERIES.items():
        qts = sorted(set(stem_tokens(q)))
        for doc_id, d in enumerate(docs):
            tf = Counter(d)
            matched = [t for t in qts if tf[t]]
            if not matched:
                continue
            r = feats[(qid, doc_id)]
            want_idf = sum(bm25_idf(n, df[t]) for t in matched)
            want_tfidf = sum(tf[t] * bm25_idf(n, df[t]) for t in matched)
            assert r["sum_idf"] == pytest.approx(want_idf, rel=1e-12)
            assert r["sum_tfidf"] == pytest.approx(want_tfidf, rel=1e-12)


def test_bm25_feature_bit_identical_to_engine(engine, feats):
    for qid, q in QUERIES.items():
        want = {
            r["doc_id"]: r["score"] for r in engine.bm25_scores(q).collect()
        }
        got = {d: r["bm25"] for (qq, d), r in feats.items() if qq == qid}
        assert got == want  # exact equality: same fold, same doubles


def test_lmd_feature_bit_identical_to_engine(engine, feats):
    for qid, q in QUERIES.items():
        want = {
            r["doc_id"]: r["score"]
            for r in engine.lm_dirichlet_scores(q, mu=500.0).collect()
        }
        got = {d: r["lmd"] for (qq, d), r in feats.items() if qq == qid}
        assert got == want


def test_empty_batch(engine):
    assert ltr_features(engine, {}).count() == 0
