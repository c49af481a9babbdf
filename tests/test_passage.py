"""Passage retrieval (tsidx/passage.py): chunk-level BM25 + MaxP pooling
pinned against a pure-Python replay over the same windows."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from tsidx.passage import build_passage_index, chunk_corpus, passage_topk
from tsidx.query import QueryEngine
from tsidx.tokenize import stem_tokens

# long docs where whole-doc BM25 and best-passage BM25 disagree
TEXTS = [
    (0, "customer query merge " + "filler padding words " * 20),
    (1, "customer query merge"),
    (2, ("noise tokens here " * 10) + "customer query merge " + ("more noise " * 10)),
    (3, "completely unrelated content about streams and windows"),
    (4, "customer " + "x " * 30 + "query " + "y " * 30 + "merge"),
    (5, "short one"),
    (6, ""),
]

SIZE, STRIDE, K1, B = 8, 8, 1.2, 0.75


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(TEXTS, "doc_id long, text string")


@pytest.fixture(scope="module")
def chunk_engine(docs):
    idx = build_passage_index(docs, SIZE, STRIDE, block_size=4)
    return QueryEngine(idx)


def _py_chunks():
    out = []  # (parent, chunk_id, [stems])
    for d, t in TEXTS:
        toks = t.split()
        for ci, start in enumerate(range(0, len(toks), STRIDE)):
            w = toks[start : start + SIZE]
            if w:
                out.append((d, ci, [s for s in stem_tokens(" ".join(w))]))
    return out


def _py_passage_topk(query, k):
    chunks = _py_chunks()
    n = len(chunks)
    avgdl = sum(len(c) for _, _, c in chunks) / n
    df = Counter(t for _, _, c in chunks for t in set(c))
    q = sorted(set(stem_tokens(query)))
    pooled = {}
    for parent, ci, c in chunks:
        tf = Counter(c)
        matched = [t for t in q if tf[t]]
        if not matched:
            continue
        s = 0.0
        for t in matched:
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            s += idf * (tf[t] * (K1 + 1)) / (
                tf[t] + K1 * ((1 - B) + B * len(c) / avgdl)
            )
        s = math.floor(s * 1e4 + 0.5) / 1e4  # round_scores=4
        best = pooled.get(parent)
        if best is None or (s, -ci) > (best[0], -best[1]):
            pooled[parent] = (s, ci, (best[2] + 1 if best else 1))
        else:
            pooled[parent] = (best[0], best[1], best[2] + 1)
    ranked = sorted(pooled.items(), key=lambda kv: (-kv[1][0], kv[0]))[:k]
    return {p: v for p, v in ranked}


def test_chunk_corpus_shape(docs):
    rows = chunk_corpus(docs, SIZE, STRIDE).collect()
    assert all(set(r.asDict()) == {"parent_id", "chunk_id", "chunk"} for r in rows)
    got = {(r["parent_id"], r["chunk_id"]) for r in rows}
    want = {(p, ci) for p, ci, _ in _py_chunks()}
    assert got == want


def test_passage_topk_matches_python(chunk_engine):
    got = {
        r["parent_id"]: (r["score"], r["best_chunk"], r["n_chunks_matched"])
        for r in passage_topk(
            chunk_engine, "customer query merge", 10, round_scores=4
        ).collect()
    }
    want = _py_passage_topk("customer query merge", 10)
    assert set(got) == set(want)
    for p, (s, ci, nm) in want.items():
        assert got[p][0] == pytest.approx(s, abs=1e-9)
        assert got[p][1] == ci
        assert got[p][2] == nm


def test_short_passage_beats_long_doc_dilution(chunk_engine):
    """Doc 1 (exact 3-token doc) and the phrase-bearing chunks of long
    docs must outrank nothing-relevant docs; doc 3 must be absent."""
    rows = passage_topk(chunk_engine, "customer query merge", 10).collect()
    ids = [r["parent_id"] for r in rows]
    assert 1 in ids and 0 in ids and 2 in ids
    assert 3 not in ids


def test_passage_topk_deterministic(chunk_engine):
    a = passage_topk(chunk_engine, "customer query", 5).collect()
    b = passage_topk(chunk_engine, "customer query", 5).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
