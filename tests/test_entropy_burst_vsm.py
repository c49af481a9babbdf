"""Entropy signals, term burstiness, and VSM cosine retrieval vs
pure-Python references."""

from __future__ import annotations

import datetime
import math
from collections import Counter

import pytest

from tsidx.porter2 import stem


# ---------------------------------------------------------------------------
# entropy_signals
# ---------------------------------------------------------------------------


def _py_entropy(symbols):
    if not symbols:
        return None
    n = len(symbols)
    c = Counter(symbols)
    acc = 0.0
    for s in sorted(c):  # fixed fold order, mirroring the engine
        p = c[s] / n
        acc += p * math.log(p)
    return round(-acc + 0.0, 4)


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "aaaa"),  # single symbol: char entropy 0 (not -0.0)
    (2, "spam spam spam spam"),  # token entropy 0, char entropy > 0
    (3, "a b a b a b"),  # alternating tokens: low token entropy
    (4, "x"),
    (5, "abcdefgh ijklmnop"),  # near-uniform chars
]


def test_entropy_signals_match_python(spark):
    from tsidx.textstats import entropy_signals

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_chars, r.char_entropy_r, r.n_tokens, r.token_entropy_r)
        for r in entropy_signals(df).collect()
    }
    for d, t in DOCS:
        toks = t.strip().split() or [""]
        want = (
            len(t),
            _py_entropy(list(t)),
            len(toks),
            _py_entropy(toks),
        )
        assert got[d] == pytest.approx(want, abs=2e-4), (d, got[d], want)
    # semantic spot checks
    assert got[1][1] == 0.0 and str(got[1][1])[0] != "-"  # canonical +0.0
    assert got[2][3] == 0.0  # repeated token
    assert got[5][1] > got[1][1]  # uniform chars beat a single symbol


def test_entropy_signals_empty_text(spark):
    """Empty text splits to [''] on both engines (Spark and DuckDB): one
    empty symbol, entropy exactly 0.0 — the degenerate-page signal."""
    from tsidx.textstats import entropy_signals

    df = spark.createDataFrame([(0, "")], "doc_id long, text string")
    r = entropy_signals(df).collect()[0]
    assert r.char_entropy_r == 0.0
    assert r.token_entropy_r == 0.0


# ---------------------------------------------------------------------------
# term_burstiness
# ---------------------------------------------------------------------------


def _py_burstiness(rows, bucket_of, min_total):
    """rows: (doc_id, text, ts). Returns {(bucket, stem): (n, z_r)}."""
    counts: dict[tuple, int] = {}
    buckets = set()
    for _d, text, ts in rows:
        b = bucket_of(ts)
        buckets.add(b)
        for t in {stem(w) for w in text.split()}:
            counts[(b, t)] = counts.get((b, t), 0) + 1
    nb = len(buckets)
    s1: dict[str, int] = {}
    s2: dict[str, int] = {}
    for (_b, t), n in counts.items():
        s1[t] = s1.get(t, 0) + n
        s2[t] = s2.get(t, 0) + n * n
    out = {}
    for (b, t), n in counts.items():
        if s1[t] < min_total:
            continue
        mean = s1[t] / nb
        var = s2[t] / nb - mean * mean
        std = math.sqrt(max(var, 0.0))
        out[(b, t)] = (n, round((n - mean) / std, 4) if std > 0 else None)
    return out


def test_term_burstiness_matches_python(spark):
    import random

    from tsidx.sessions import term_burstiness

    rng = random.Random(5)
    base = datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc)
    vocab = ["alpha", "beta", "gamma", "delta", "filler"]
    rows = []
    for i in range(300):
        ts = base + datetime.timedelta(minutes=i * 7)
        words = [rng.choice(vocab) for _ in range(6)]
        if 100 <= i < 115:
            words += ["bursty", "bursty"]  # spike in one window
        rows.append((i, " ".join(words), ts))
    df = spark.createDataFrame(
        [(d, t, ts) for d, t, ts in rows], "doc_id long, text string, ts timestamp"
    )
    got = {
        (r.bucket_epoch, r.term): (r.n_docs, r.z_r)
        for r in term_burstiness(df, bucket="hour", min_total=5).collect()
    }

    def bucket_of(ts):
        return int(ts.replace(minute=0, second=0, microsecond=0).timestamp())

    want = _py_burstiness(rows, bucket_of, 5)
    assert set(got) == set(want)
    for key in want:
        assert got[key][0] == want[key][0], key
        if want[key][1] is None:
            assert got[key][1] is None, key
        else:
            assert got[key][1] == pytest.approx(want[key][1], abs=2e-4), key
    # the planted burst term's max z dwarfs the steady fillers'
    zmax = lambda t: max(
        v[1] for (b, tt), v in got.items() if tt == t and v[1] is not None
    )
    assert zmax("bursti") > 2 * max(zmax("filler"), zmax("alpha"))


# ---------------------------------------------------------------------------
# vsm_topk
# ---------------------------------------------------------------------------


def _py_vsm(oracle, query_terms_sorted, k):
    n = oracle.n_docs
    idf = {
        t: math.log((n - len(p) + 0.5) / (len(p) + 0.5) + 1.0)
        for t, p in oracle.postings.items()
    }
    qw = {t: idf[t] for t in query_terms_sorted if t in idf}
    if not qw:
        return []
    qn = math.sqrt(sum(qw[t] * qw[t] for t in sorted(qw)))
    # doc norms over ALL terms
    sq: dict[int, float] = {}
    for t, plist in oracle.postings.items():
        for d, tf in plist:
            w = tf * idf[t]
            sq[d] = sq.get(d, 0.0) + w * w
    nrm = {d: round(math.sqrt(v), 6) for d, v in sq.items()}
    dots: dict[int, float] = {}
    for t in sorted(qw):
        for d, tf in oracle.postings[t]:
            dots[d] = dots.get(d, 0.0) + tf * ((qw[t] / qn) * idf[t])
    scored = [(d, s / nrm[d]) for d, s in dots.items()]
    scored.sort(key=lambda x: (-round(x[1], 6), x[0]))
    return scored[:k]


@pytest.fixture(scope="module")
def built(spark, sonnets_transcripts, sonnets):
    from tsidx.build import build_index
    from tsidx.oracle import OracleIndex

    idx = build_index(sonnets_transcripts, num_partitions=4)
    oracle = OracleIndex()
    oracle.add_corpus(sonnets)
    return idx, oracle


@pytest.mark.parametrize(
    "query,k",
    [("fire heat", 10), ("love beauty time", 25), ("same", 5), ("sonnet", 3)],
)
def test_vsm_topk_matches_python(built, query, k):
    from tsidx.query import QueryEngine
    from tsidx.tokenize import query_terms
    from tsidx.vectors import vsm_topk

    idx, oracle = built
    eng = QueryEngine(idx)
    got = [(r.doc_id, r.score) for r in vsm_topk(eng, query, k).collect()]
    want = _py_vsm(oracle, query_terms(query), k)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (d1, s1), (_d2, s2) in zip(got, want):
        assert s1 == pytest.approx(s2, abs=1e-9), (d1, s1, s2)


def test_vsm_topk_precomputed_norms(built):
    from tsidx.query import QueryEngine
    from tsidx.vectors import doc_norms, vsm_topk

    idx, _ = built
    eng = QueryEngine(idx)
    norms = doc_norms(eng).cache()
    a = [(r.doc_id, r.score) for r in vsm_topk(eng, "fire heat", 10).collect()]
    b = [
        (r.doc_id, r.score)
        for r in vsm_topk(eng, "fire heat", 10, norms=norms).collect()
    ]
    assert a == b


def test_vsm_topk_empty_query(built):
    from tsidx.query import QueryEngine
    from tsidx.vectors import vsm_topk

    idx, _ = built
    assert vsm_topk(QueryEngine(idx), "zzznope", 5).collect() == []


def test_entropy_signals_is_map_only(spark):
    from tsidx.textstats import entropy_signals

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = entropy_signals(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
