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


# ------------------------------------------------------------------ TextRank


def _py_textrank(text, window=3, d=0.85, iters=10, top_m=3):
    """Independent dict-based TextRank (no numpy, no shared code)."""
    from tsidx.keywords import RAKE_STOPWORDS

    stop = set(RAKE_STOPWORDS)
    toks = [t for t in text.split() if t.lower() not in stop]
    if not toks:
        return {}
    words = sorted(set(toks))
    wt = defaultdict(float)
    for i in range(len(toks)):
        for j in range(i + 1, min(i + window, len(toks))):
            a, b = toks[i], toks[j]
            if a != b:
                wt[(a, b)] += 1.0
                wt[(b, a)] += 1.0
    deg = defaultdict(float)
    for (u, _v), w in wt.items():
        deg[u] += w
    r = {w: 1.0 for w in words}
    for _ in range(iters):
        nxt = {}
        for v in words:
            s = sum(
                (wt[(u, v)] / deg[u]) * r[u]
                for u in words
                if wt.get((u, v))
            )
            nxt[v] = (1 - d) + d * s
        r = nxt
    r = {w: math.floor(x * 1e6 + 0.5) / 1e6 for w, x in r.items()}
    ranked = sorted(r.items(), key=lambda kv: (-kv[1], kv[0]))[:top_m]
    return {w: (s, i + 1) for i, (w, s) in enumerate(ranked)}


def test_textrank_matches_python(docs):
    from tsidx.keywords import textrank_keywords

    got = defaultdict(dict)
    for r in textrank_keywords(docs, top_m=3).collect():
        got[r["doc_id"]][r["word"]] = (r["score_r"], r["rank"])
    for doc_id, text in CORPUS:
        want = _py_textrank(text, top_m=3)
        assert got.get(doc_id, {}).keys() == want.keys(), doc_id
        for w, (s, rank) in want.items():
            assert got[doc_id][w][0] == pytest.approx(s, abs=2e-6), (doc_id, w)
            assert got[doc_id][w][1] == rank, (doc_id, w)


def test_textrank_isolated_node_score(spark):
    """A single non-stopword token has no edges: score settles at 1-d."""
    from tsidx.keywords import textrank_keywords

    df = spark.createDataFrame([(0, "the word")], "doc_id long, text string")
    rows = textrank_keywords(df, top_m=5).collect()
    assert len(rows) == 1
    assert rows[0]["word"] == "word"
    assert rows[0]["score_r"] == pytest.approx(0.15, abs=1e-9)


def test_textrank_hub_word_wins(spark):
    """A word co-occurring with everything must rank first."""
    from tsidx.keywords import textrank_keywords

    df = spark.createDataFrame(
        [(0, "hub alpha hub beta hub gamma hub delta")],
        "doc_id long, text string",
    )
    rows = textrank_keywords(df, top_m=1).collect()
    assert rows[0]["word"] == "hub"
