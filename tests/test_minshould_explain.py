"""min-should-match retrieval and BM25 explain vs pure-Python oracles
over the sonnets corpus (reference tokenization semantics)."""

from __future__ import annotations

import math

import pytest

from tsidx.build import build_index
from tsidx.porter2 import stem
from tsidx.query import QueryEngine

QUERY = "love fire sweet thrall"


@pytest.fixture(scope="module")
def built(spark, sonnets_transcripts):
    return build_index(sonnets_transcripts, block_size=64, num_partitions=4)


@pytest.fixture(scope="module")
def engine(built):
    return QueryEngine(built)


@pytest.fixture(scope="module")
def doc_stems(sonnets):
    return [set(stem(t) for t in s.split()) for s in sonnets]


@pytest.mark.parametrize("m", [1, 2, 3, 4])
def test_min_should_vs_python(engine, doc_stems, m):
    qs = set(engine.terms_of(QUERY))
    want = {
        i: len(qs & ts)
        for i, ts in enumerate(doc_stems)
        if len(qs & ts) >= m
    }
    got = {
        r["doc_id"]: r["n_matched"]
        for r in engine.match_min_should(QUERY, m).collect()
    }
    assert got == want


def test_min_should_edges(engine, doc_stems):
    # m=1 == match; m=len == match_all; m>len == empty
    qs = engine.terms_of(QUERY)
    m1 = [r["doc_id"] for r in engine.match_min_should(QUERY, 1).collect()]
    assert m1 == [r["doc_id"] for r in engine.match(QUERY).collect()]
    mall = [
        r["doc_id"] for r in engine.match_min_should(QUERY, len(qs)).collect()
    ]
    assert mall == [r["doc_id"] for r in engine.match_all(QUERY).collect()]
    assert engine.match_min_should(QUERY, len(qs) + 1).count() == 0
    assert engine.match_min_should("zzzznotaword", 1).count() == 0


def test_explain_sums_to_topk(engine):
    k = 10
    top = engine.bm25_topk(QUERY, k).collect()
    rows = engine.explain_scores(QUERY, k).collect()
    assert {r["doc_id"] for r in rows} == {r["doc_id"] for r in top}
    # per-doc contribs sum (in sorted-term order) bit-identically to score
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for t in top:
        acc = 0.0
        for r in sorted(by_doc[t["doc_id"]], key=lambda r: r["term"]):
            acc += r["contrib"]
        assert acc == t["score"]


def test_explain_fields_consistent(engine, built):
    rows = engine.explain_scores(QUERY, 5).collect()
    n = built.meta["n_docs"]
    dfs = {r["term"]: r["df"] for r in built.terms.collect()}
    for r in rows:
        want_idf = math.log((n - dfs[r["term"]] + 0.5) / (dfs[r["term"]] + 0.5) + 1.0)
        assert r["idf"] == want_idf
        assert r["tf"] >= 1 and r["dl"] >= r["tf"]


def test_explain_empty_query(engine):
    assert engine.explain_scores("zzzznotaword", 5).count() == 0


def test_min_should_includes_pinned(spark, sonnets_transcripts):
    """Pinned docs appear regardless of threshold (reference pin
    semantics), with their actual n_matched."""
    from dataclasses import replace

    idx = build_index(sonnets_transcripts, block_size=64, num_partitions=4)
    idx.pin(0)   # sonnet I — does not contain 'thrall'
    eng = QueryEngine(idx)
    got = {r["doc_id"]: r["n_matched"] for r in eng.match_min_should("thrall", 1).collect()}
    assert 0 in got and got[0] == 0
    m1 = [r["doc_id"] for r in eng.match_min_should("thrall", 1).collect()]
    assert m1 == [r["doc_id"] for r in eng.match("thrall").collect()]
    # above-threshold docs keep their counts
    assert all(v >= 1 for d, v in got.items() if d != 0)
