"""RAKE keyword extraction (tsidx/keywords.py) vs a literal pure-Python
implementation of Rose et al. 2010."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest

from tsidx.keywords import RAKE_STOPWORDS, rake_keywords, rake_phrases

CORPUS = [
    (0, "the quick brown fox jumps over a lazy dog in the park"),
    (1, "deep learning of feature representations for keyword extraction"),
    (2, "the the a of"),  # stopwords only: no phrases
    (3, "singleword"),
    (4, "alpha beta the alpha beta the alpha"),  # repeated phrases
    (5, ""),
    (6, "Mixed CASE The tokens A kept verbatim"),
]


def _py_rake(text, top_m):
    stop = set(RAKE_STOPWORDS)
    phrases, cur = [], []
    for tok in text.split():
        if tok.lower() in stop:
            if cur:
                phrases.append(cur)
            cur = []
        else:
            cur.append(tok)
    if cur:
        phrases.append(cur)
    freq, deg = Counter(), Counter()
    for p in phrases:
        for w in p:
            freq[w] += 1
            deg[w] += len(p)
    scored = {}
    for p in phrases:
        key = " ".join(p)
        if key not in scored:
            scored[key] = sum(deg[w] / freq[w] for w in p)
    ranked = sorted(
        scored.items(),
        key=lambda kv: (-(math.floor(kv[1] * 1e6 + 0.5) / 1e6), kv[0]),
    )[:top_m]
    return {
        k: (math.floor(v * 1e6 + 0.5) / 1e6, i + 1)
        for i, (k, v) in enumerate(ranked)
    }


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_rake_phrases_segmentation(docs):
    rows = rake_phrases(docs).collect()
    by_doc = defaultdict(list)
    for r in rows:
        by_doc[r["doc_id"]].append((r["phrase_id"], r["phrase"]))
    assert [p for _, p in sorted(by_doc[0])] == [
        "quick brown fox jumps over",
        "lazy dog",
        "park",
    ]
    assert 2 not in by_doc  # stopword-only doc
    assert [p for _, p in sorted(by_doc[6])] == [
        "Mixed CASE",
        "tokens",
        "kept verbatim",
    ]


def test_rake_keywords_match_python(docs):
    got = defaultdict(dict)
    for r in rake_keywords(docs, top_m=3).collect():
        got[r["doc_id"]][r["phrase"]] = (r["score_r"], r["rank"])
    for doc_id, text in CORPUS:
        want = _py_rake(text, 3)
        assert got.get(doc_id, {}).keys() == want.keys(), doc_id
        for k, (s, rank) in want.items():
            assert got[doc_id][k][0] == pytest.approx(s, abs=1e-9)
            assert got[doc_id][k][1] == rank


def test_rake_long_phrase_words_outscore(docs):
    """Words living in long phrases get higher deg/freq: the 5-word
    phrase must outrank the 2-word phrase in doc 0."""
    rows = {
        r["rank"]: r["phrase"]
        for r in rake_keywords(docs, top_m=3).collect()
        if r["doc_id"] == 0
    }
    assert rows[1] == "quick brown fox jumps over"
