"""Skew behavior: a term in 50% of all turns plus rare planted markers.

The fused build shuffles by block_id (uniform), so a Zipf-hot term cannot
skew the exchange; these tests assert the hot term's postings are still
exactly right, block metadata stays bounded, and rare markers land at
their planted positions (SURVEY §7.1 step 6)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from tsidx.build import build_index
from tsidx.oracle import OracleIndex
from tsidx.query import QueryEngine
from tsidx.wand import wand_topk

N_DOCS = 600
MARKED = (7, 123, 456)


def corpus():
    texts = []
    for i in range(N_DOCS):
        words = [f"w{i % 17}", f"w{(i * 3) % 29}", "filler"]
        if i % 2 == 0:
            words.insert(0, "hotword")  # 50% of turns
        if i in MARKED:
            words.append("raremarker")
        texts.append(" ".join(words))
    return texts


@pytest.fixture(scope="module")
def built(spark):
    texts = corpus()
    base = datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc)
    rows = [
        (f"c{i // 5:04d}", i % 5, "user", t, "", base) for i, t in enumerate(texts)
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    ).repartition(8)
    idx = build_index(df, block_size=64)
    oracle = OracleIndex()
    oracle.add_corpus(texts)
    return idx, oracle


def test_hot_term_postings_exact(built):
    idx, oracle = built
    df_row = idx.terms.filter(F.col("term") == "hotword").collect()
    assert df_row[0]["df"] == N_DOCS // 2
    eng = QueryEngine(idx)
    assert [r["doc_id"] for r in eng.match("hotword").collect()] == list(
        range(0, N_DOCS, 2)
    )


def test_hot_term_block_rows_bounded(built):
    idx, _ = built
    rows = idx.postings.filter(F.col("term") == "hotword").collect()
    # block sharding caps every posting row at block_size docs
    assert len(rows) == N_DOCS // 64 + (1 if N_DOCS % 64 else 0)
    assert all(r["block_df"] <= 64 for r in rows)


def test_rare_markers_planted_exactly(built):
    idx, oracle = built
    eng = QueryEngine(idx)
    assert [r["doc_id"] for r in eng.match("raremarker").collect()] == list(MARKED)
    got = [(r["doc_id"], r["score"]) for r in wand_topk(idx, "raremarker", 10).collect()]
    assert got == oracle.bm25_topk("raremarker", 10)
    assert [d for d, _ in got] == list(MARKED)  # equal-length docs tie -> id order


def test_mixed_hot_rare_query(built):
    idx, oracle = built
    eng = QueryEngine(idx)
    for q in ["hotword raremarker", "hotword w3 raremarker"]:
        got = [(r["doc_id"], r["score"]) for r in eng.bm25_topk(q, 20).collect()]
        assert got == oracle.bm25_topk(q, 20), q
