"""Block-max WAND rank-identity tests: WAND vs naive plan vs oracle."""

from __future__ import annotations

import pytest

from tsidx.build import build_index
from tsidx.oracle import OracleIndex
from tsidx.query import QueryEngine
from tsidx.wand import wand_topk

QUERIES = [
    "same",
    "thrall quench",
    "fire heat",
    "love beauty time",
    "the and of",  # hot terms — every block is a candidate
    "nonexistentterm",
    "sonnet",  # df == n_docs
]


@pytest.fixture(scope="module")
def built(spark, sonnets_transcripts, sonnets):
    idx = build_index(sonnets_transcripts, block_size=16)  # many blocks
    oracle = OracleIndex()
    oracle.add_corpus(sonnets)
    return idx, oracle


@pytest.mark.parametrize("limit", [0, 200_000], ids=["pruned-path", "fast-path"])
@pytest.mark.parametrize("query", QUERIES)
@pytest.mark.parametrize("k", [1, 10, 200])
def test_wand_rank_identical_to_oracle(built, query, k, limit):
    idx, oracle = built
    got = [
        (r["doc_id"], r["score"])
        for r in wand_topk(idx, query, k, small_candidate_limit=limit).collect()
    ]
    want = oracle.bm25_topk(query, k)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (d1, s1), (d2, s2) in zip(got, want):
        assert s1 == s2, (query, d1, s1, s2)  # bit-identical


@pytest.mark.parametrize("query", ["fire heat", "love beauty time"])
def test_wand_matches_naive_plan(built, query):
    idx, _ = built
    eng = QueryEngine(idx)
    naive = [(r["doc_id"], r["score"]) for r in eng.bm25_topk(query, 25).collect()]
    wand = [(r["doc_id"], r["score"]) for r in wand_topk(idx, query, 25).collect()]
    assert naive == wand


def test_wand_array_codec(spark, sonnets_transcripts, sonnets):
    idx = build_index(sonnets_transcripts, block_size=32, codec="array")
    oracle = OracleIndex()
    oracle.add_corpus(sonnets)
    got = [(r["doc_id"], r["score"]) for r in wand_topk(idx, "fire heat", 10).collect()]
    assert got == oracle.bm25_topk("fire heat", 10)


def test_wand_tie_break_with_duplicate_docs(spark, sonnets):
    """Replicated corpus -> exact score ties; tie-break must be ascending
    doc_id (regression: argpartition picked arbitrary tied docs)."""
    import datetime

    from tsidx.oracle import OracleIndex

    base = datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc)
    texts = [t for rep in range(4) for t in sonnets[:40]]
    rows = [
        (f"r{i // 10:04d}", i % 10, "user", t, "", base)
        for i, t in enumerate(texts)
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    ).repartition(8)
    idx = build_index(df, block_size=32)
    oracle = OracleIndex()
    oracle.add_corpus(texts)
    for q in ["fire heat", "love beauty time", "the and of"]:
        for k in (3, 10, 50):
            got = [
                (r["doc_id"], r["score"]) for r in wand_topk(idx, q, k).collect()
            ]
            assert got == oracle.bm25_topk(q, k), (q, k)
