"""Champion lists (tsidx/champion.py): artifact contents and the tier-1
probe, incl. the single-term exactness guarantee."""

from __future__ import annotations

import datetime
from collections import Counter

import pytest

from tsidx.build import build_index
from tsidx.champion import champion_lists, champion_topk
from tsidx.query import QueryEngine
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
    "merge merge merge merge merge merge merge merge",
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


def _py_wtf(tf, dl, k1, b, avgdl):
    import math

    w = (tf * (k1 + 1)) / (tf + k1 * ((1 - b) + b * dl / avgdl))
    return math.floor(w * 1e6 + 0.5) / 1e6  # the artifact's rounded@6 rank key


def test_champion_lists_contents(engine):
    m = 3
    champs = champion_lists(engine, m)
    rows = champs.collect()
    k1 = engine.index.meta["k1"]
    b = engine.index.meta["b"]
    avgdl = engine.index.meta["avgdl"]
    docs = [stem_tokens(t) for t in TEXTS]
    by_term = {}
    for doc_id, d in enumerate(docs):
        for t, f in Counter(d).items():
            by_term.setdefault(t, []).append(
                (-_py_wtf(f, len(d), k1, b, avgdl), doc_id, f, len(d))
            )
    want = set()
    for t, lst in by_term.items():
        for neg, doc_id, f, dl in sorted(lst)[:m]:
            want.add((t, doc_id, f, dl))
    got = {(r["term"], r["doc_id"], r["tf"], r["dl"]) for r in rows}
    assert got == want
    # bound respected
    per_term = Counter(r["term"] for r in rows)
    assert max(per_term.values()) <= m


def test_single_term_query_exact_with_m_ge_k(engine):
    champs = champion_lists(engine, 4)
    got = [
        (r["doc_id"], r["score"])
        for r in champion_topk(engine, champs, "merge", 4).collect()
    ]
    want = [
        (r["doc_id"], r["score"])
        for r in engine.bm25_topk("merge", 4).collect()
    ]
    assert got == want  # exact: ids AND bit-identical scores


def test_multi_term_probe_scores_are_true_partials(engine):
    """Every returned doc's score equals its exact BM25 restricted to
    the terms that championed it — never larger than the full score."""
    champs = champion_lists(engine, 2)
    full = {
        r["doc_id"]: r["score"]
        for r in engine.bm25_scores("customer query merge").collect()
    }
    for r in champion_topk(engine, champs, "customer query merge", 10).collect():
        assert r["score"] <= full[r["doc_id"]] + 1e-12


def test_probe_recall_reasonable(engine):
    """With m = k the probe must recover most of the true top-k here
    (every heavy doc is championed by at least one of its terms)."""
    k = 5
    champs = champion_lists(engine, k)
    exact = {r["doc_id"] for r in engine.bm25_topk("customer query merge", k).collect()}
    probe = {
        r["doc_id"]
        for r in champion_topk(engine, champs, "customer query merge", k).collect()
    }
    assert len(exact & probe) / k >= 0.8


def test_rescored_exact_when_everything_championed(engine):
    """champion_topk_rescored (IIR-canonical: champion candidates, full
    BM25 rescoring) with m >= n_docs has every posting championed, so it
    must reproduce the exact BM25 top-k rows bit-identically."""
    from tsidx.champion import champion_topk_rescored

    champs = champion_lists(engine, len(TEXTS))
    for q in ("customer query merge", "merge", "planner scan"):
        exact = [
            tuple(r) for r in engine.bm25_topk(q, 5).collect()
        ]
        got = [
            tuple(r)
            for r in champion_topk_rescored(engine, champs, q, 5).collect()
        ]
        assert got == exact, q


def test_rescored_scores_are_full_scores(engine):
    """Even with a tiny m, every RETURNED candidate's score equals its
    full bm25_scores value (the rescoring half of the contract), and the
    result is a subset of the champion-candidate union."""
    from pyspark.sql import functions as F

    from tsidx.champion import champion_topk_rescored

    champs = champion_lists(engine, 2)
    q = "customer query merge"
    full = {
        r["doc_id"]: r["score"] for r in engine.bm25_scores(q).collect()
    }
    cand = {
        r["doc_id"]
        for r in champs.filter(
            F.col("term").isin(stem_tokens(q))
        ).select("doc_id").collect()
    }
    for r in champion_topk_rescored(engine, champs, q, 5).collect():
        assert r["doc_id"] in cand
        assert r["score"] == full[r["doc_id"]]
