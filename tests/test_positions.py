"""Positional postings + phrase queries (tsidx/positions.py).

Ground truth: a pure-Python phrase scanner over the same stemmed token
streams (reference tokenization semantics — whitespace split + Porter2).
"""

from __future__ import annotations

import pytest

from tsidx.porter2 import stem


def _stems(text: str) -> list[str]:
    return [stem(t) for t in text.split()]


def _py_phrase_occurrences(docs: list[tuple[int, str]], phrase: str):
    """doc_id -> occurrence count of the exact consecutive stemmed phrase."""
    p = _stems(phrase)
    out = {}
    for doc_id, text in docs:
        toks = _stems(text)
        n = sum(
            1
            for i in range(len(toks) - len(p) + 1)
            if toks[i : i + len(p)] == p
        )
        if n:
            out[doc_id] = n
    return out


CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "quick brown foxes are jumping over lazy dogs"),  # stems align
    (2, "brown quick fox"),  # words present, order wrong
    (3, "the quick   brown\tfox"),  # whitespace runs
    (4, "quick brown quick brown quick brown"),  # overlapping repeats
    (5, "big big big"),  # repeated-term phrase
    (6, ""),
    (7, "quick"),
    (8, "nothing relevant here"),
    (9, "wrapping quick brown fox quick brown fox twice"),
]


@pytest.fixture(scope="module")
def positional(spark):
    from tsidx.positions import positional_postings

    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    return positional_postings(docs, block_size=4).cache()


def _match_ids(positional, phrase):
    from tsidx.positions import phrase_match

    return [r["doc_id"] for r in phrase_match(positional, phrase).collect()]


def test_phrase_counts_vs_python_oracle(positional):
    from tsidx.positions import phrase_counts

    for phrase in [
        "quick brown",
        "quick brown fox",
        "the quick brown fox",
        "lazy dog",
        "big big",
        "brown quick",
        "absent words",
        "quick",
    ]:
        exp = _py_phrase_occurrences(CORPUS, phrase)
        got = {
            r["doc_id"]: r["n_occ"]
            for r in phrase_counts(positional, phrase).collect()
        }
        assert got == exp, f"phrase {phrase!r}: {got} != {exp}"


def test_phrase_match_order_and_stemming(positional):
    # "jumping over" stems to "jump over" — matches docs 0 and 1
    assert _match_ids(positional, "jumps over") == [0, 1]
    assert _match_ids(positional, "jumping over") == [0, 1]


def test_overlapping_occurrences(positional):
    from tsidx.positions import phrase_counts

    got = {
        r["doc_id"]: r["n_occ"]
        for r in phrase_counts(positional, "quick brown").collect()
    }
    assert got[4] == 3 and got[9] == 2


def test_repeated_term_phrase(positional):
    from tsidx.positions import phrase_counts

    got = {
        r["doc_id"]: r["n_occ"]
        for r in phrase_counts(positional, "big big").collect()
    }
    assert got == {5: 2}  # overlapping at positions 0 and 1


def test_empty_phrase(positional):
    from tsidx.positions import phrase_counts

    assert phrase_counts(positional, "   ").count() == 0


def test_blocks_decode_roundtrip(spark, positional):
    """Decoded (term, doc_id, pos) rows == direct tokenization."""
    from tsidx.positions import decode_positional

    exp = set()
    for doc_id, text in CORPUS:
        for pos, s in enumerate(_stems(text)):
            exp.add((s, doc_id, pos))
    got = {
        (r["term"], r["doc_id"], r["pos"])
        for r in decode_positional(positional).collect()
    }
    assert got == exp


def test_random_corpora_vs_python_oracle(spark):
    """Deterministic pseudo-random corpora (seeded — SURVEY §7.2 bans
    wall-clock/RNG in engine code, not in test data) across block
    boundaries; every 1-3-gram phrase from a fixed probe set must match the
    pure-Python scanner exactly."""
    import random

    from tsidx.positions import phrase_counts, positional_postings

    rng = random.Random(20260817)
    vocab = ["red", "blue", "green", "red's", "blues", "a", "b"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 25))))
        for i in range(60)
    ]
    positional = positional_postings(
        spark.createDataFrame(docs, "doc_id long, text string"), block_size=7
    ).cache()
    probes = [
        "red", "red blue", "blue red", "red red", "a b a",
        "red's blues", "green green green", "b", "blue green red",
    ]
    for phrase in probes:
        exp = _py_phrase_occurrences(docs, phrase)
        got = {
            r["doc_id"]: r["n_occ"]
            for r in phrase_counts(positional, phrase).collect()
        }
        assert got == exp, phrase


def test_write_read_roundtrip(spark, positional, tmp_path):
    from tsidx.positions import phrase_counts, read_positional, write_positional

    path = str(tmp_path / "pos")
    write_positional(positional, path, num_partitions=2)
    loaded = read_positional(spark, path)
    exp = {
        (r["doc_id"], r["n_occ"])
        for r in phrase_counts(positional, "quick brown").collect()
    }
    got = {
        (r["doc_id"], r["n_occ"])
        for r in phrase_counts(loaded, "quick brown").collect()
    }
    assert got == exp and exp


def _py_best_window(docs, query, width):
    qstems = set(_stems(query))
    out = {}
    for doc_id, text in docs:
        hits = [(p, s) for p, s in enumerate(_stems(text)) if s in qstems]
        best = None
        lo = 0
        for hi in range(len(hits)):
            while hits[hi][0] - hits[lo][0] >= width:
                lo += 1
            win = hits[lo : hi + 1]
            key = (-len({s for _, s in win}), -len(win), win[0][0])
            if best is None or key < best:
                best = key
        if best is not None:
            out[doc_id] = (best[2], -best[0], -best[1])
    return out


def test_best_window_vs_python_oracle(spark, positional):
    from tsidx.positions import best_window

    for query, width in [
        ("quick fox", 3),
        ("quick fox", 10),
        ("the lazy dog", 4),
        ("brown", 1),
        ("zzzunknown", 5),
    ]:
        exp = _py_best_window(CORPUS, query, width)
        got = {
            r["doc_id"]: (r["start"], r["n_terms"], r["n_hits"])
            for r in best_window(positional, query, width).collect()
        }
        assert got == exp, (query, width)


def test_best_window_randomized(spark):
    import random

    from tsidx.positions import best_window, positional_postings

    rng = random.Random(7)
    vocab = ["x", "y", "z", "w", "v"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 30))))
        for i in range(40)
    ]
    pos = positional_postings(
        spark.createDataFrame(docs, "doc_id long, text string"), block_size=16
    )
    for query, width in [("x y", 4), ("x y z", 6), ("w", 2)]:
        exp = _py_best_window(docs, query, width)
        got = {
            r["doc_id"]: (r["start"], r["n_terms"], r["n_hits"])
            for r in best_window(pos, query, width).collect()
        }
        assert got == exp, (query, width)


def test_block_partitioning(positional):
    """block_id = doc_id // block_size; blocks stay docID-contiguous."""
    rows = positional.collect()
    assert {r["block_id"] for r in rows} == {0, 1, 2}
    for r in rows:
        assert r["block_df"] >= 1


def _py_proximity(docs, ta, tb, slop):
    """doc_id -> (n_pairs, min_dist) ground truth by brute force."""
    sa, sb = _stems(ta)[0], _stems(tb)[0]
    out = {}
    for doc_id, text in docs:
        toks = _stems(text)
        pa = [i for i, t in enumerate(toks) if t == sa]
        pb = [i for i, t in enumerate(toks) if t == sb]
        if sa == sb:
            pairs = [(x, y) for x in pa for y in pb
                     if x < y and abs(x - y) <= slop]
        else:
            pairs = [(x, y) for x in pa for y in pb if abs(x - y) <= slop]
        if pairs:
            out[doc_id] = (len(pairs), min(abs(x - y) for x, y in pairs))
    return out


@pytest.mark.parametrize(
    "ta,tb,slop",
    [
        ("quick", "dog", 5),
        ("quick", "dog", 2),
        ("quick", "fox", 1),
        ("brown", "brown", 2),   # same stem both sides
        ("quick", "missing", 3),
        ("big", "big", 1),
    ],
)
def test_proximity_counts_matches_bruteforce(positional, ta, tb, slop):
    from tsidx.positions import proximity_counts

    got = {
        r["doc_id"]: (r["n_pairs"], r["min_dist"])
        for r in proximity_counts(positional, ta, tb, slop).collect()
    }
    assert got == _py_proximity(CORPUS, ta, tb, slop)


def test_proximity_boosted_topk_matches_bruteforce(spark, positional):
    import datetime
    import math

    from tsidx.build import build_index
    from tsidx.oracle import OracleIndex
    from tsidx.positions import proximity_boosted_topk
    from tsidx.query import QueryEngine

    base = datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc)
    rows = [
        (f"c{d // 6:04d}", d % 6, "user", t, "", base) for d, t in CORPUS
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    eng = QueryEngine(build_index(df, block_size=4))
    oracle = OracleIndex()
    oracle.add_corpus([t for _, t in CORPUS])

    query, ta, tb, slop, boost, k = "quick dog fox", "quick", "dog", 5, 0.5, 6
    prox = _py_proximity(CORPUS, ta, tb, slop)
    want = sorted(
        (
            (d, s * (1.0 + boost * math.log(1.0 + prox.get(d, (0, 0))[0])))
            for d, s in oracle.bm25_topk(query, len(CORPUS))
        ),
        key=lambda p: (-p[1], p[0]),
    )[:k]
    got = [
        (r["doc_id"], r["score"], r["n_pairs"])
        for r in proximity_boosted_topk(
            eng, positional, query, ta, tb, k, slop=slop, boost=boost
        ).collect()
    ]
    assert [d for d, _, _ in got] == [d for d, _ in want]
    for (gd, gs, gn), (wd, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-12), gd
        assert gn == prox.get(gd, (0, 0))[0]
    # docs without the near pair keep their plain BM25 score
    plain = dict(oracle.bm25_topk(query, len(CORPUS)))
    for gd, gs, gn in got:
        if gn == 0:
            assert gs == plain[gd]


def test_proximity_counts_bucket_boundaries(spark):
    """Distances straddling the slop+1 bucket width must still pair up
    (the adjacent-bucket replication), and dist == slop is inclusive."""
    from tsidx.positions import positional_postings, proximity_counts

    # positions of 'a': 0; 'b': exactly slop and slop+1 away
    docs = spark.createDataFrame(
        [(0, "alpha x x x beta"), (1, "alpha x x x x beta")],
        "doc_id long, text string",
    )
    pos = positional_postings(docs, block_size=4)
    got = {
        r["doc_id"]: (r["n_pairs"], r["min_dist"])
        for r in proximity_counts(pos, "alpha", "beta", slop=4).collect()
    }
    assert got == {0: (1, 4)}


@pytest.mark.parametrize(
    "ta,tb,slop",
    [("quick", "dog", 5), ("dog", "quick", 5), ("brown", "brown", 3)],
)
def test_proximity_ordered_matches_bruteforce(positional, ta, tb, slop):
    """ordered=True keeps only A-before-B pairs."""
    from tsidx.positions import proximity_counts

    sa, sb = _stems(ta)[0], _stems(tb)[0]
    want = {}
    for doc_id, text in CORPUS:
        toks = _stems(text)
        pairs = [
            (x, y)
            for x, t in enumerate(toks)
            if t == sa
            for y, u in enumerate(toks)
            if u == sb and 0 < y - x <= slop
        ]
        if pairs:
            want[doc_id] = (len(pairs), min(y - x for x, y in pairs))
    got = {
        r["doc_id"]: (r["n_pairs"], r["min_dist"])
        for r in proximity_counts(
            positional, ta, tb, slop, ordered=True
        ).collect()
    }
    assert got == want


def test_proximity_hot_doc_exact_counts(spark):
    """A doc with 300 occurrences of each term: the brute-force pair space
    is 9·10⁴ but the bucketed join must still count the qualifying pairs
    exactly (hot-doc shape the bucket design exists for)."""
    from tsidx.positions import positional_postings, proximity_counts

    text = " ".join("alpha beta" for _ in range(300))  # a at even, b at odd
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    pos = positional_postings(docs, block_size=128)
    slop = 5
    rows = proximity_counts(pos, "alpha", "beta", slop).collect()
    assert len(rows) == 1
    # ground truth: a_i = 2i, b_j = 2j+1 (i,j in 0..299); |2i - 2j - 1| <= 5
    n_pairs = sum(
        1
        for i in range(300)
        for j in range(300)
        if abs(2 * i - 2 * j - 1) <= slop
    )
    assert rows[0]["n_pairs"] == n_pairs
    assert rows[0]["min_dist"] == 1


def test_proximity_counts_rejects_multiword(positional):
    import pytest as _pytest

    from tsidx.positions import proximity_counts

    with _pytest.raises(ValueError):
        proximity_counts(positional, "two words", "x", 3)


@pytest.fixture(scope="module")
def sonnets_positional(spark, sonnets):
    from tsidx.positions import positional_postings

    docs = spark.createDataFrame(
        list(enumerate(sonnets)), "doc_id long, text string"
    )
    return positional_postings(docs, block_size=64).cache()


def test_gapped_phrase_vs_python(spark, sonnets, sonnets_positional):
    """'<a> * <b>' matches any single token in the starred slot."""
    from tsidx.porter2 import stem
    from tsidx.positions import gapped_phrase_counts

    pattern = "the * of"
    got = {
        r["doc_id"]: r["n_occ"]
        for r in gapped_phrase_counts(sonnets_positional, pattern).collect()
    }
    want: dict[int, int] = {}
    for i, s in enumerate(sonnets):
        st = [stem(t) for t in s.split()]
        n = sum(
            1
            for j in range(len(st) - 2)
            if st[j] == "the" and st[j + 2] == "of"
        )
        if n:
            want[i] = n
    assert got == want and want  # non-trivial on the sonnets


def test_gapped_phrase_edge_semantics(spark, sonnets_positional):
    from tsidx.positions import gapped_phrase_counts, phrase_counts

    # no stars == exact phrase
    a = sorted(
        map(tuple, gapped_phrase_counts(sonnets_positional, "of thy beauti").collect())
    )
    b = sorted(
        map(tuple, phrase_counts(sonnets_positional, "of thy beauti").collect())
    )
    assert a == b
    # leading/trailing stars are stripped (same result)
    c = sorted(
        map(
            tuple,
            gapped_phrase_counts(sonnets_positional, "* of thy beauti *").collect(),
        )
    )
    assert c == a
    # empty after stripping -> empty result
    assert gapped_phrase_counts(sonnets_positional, "* *").count() == 0


def test_phrase_prefix_vs_python(spark, sonnets, sonnets_positional):
    """'of th*' == phrase where slot 2 is any dictionary stem starting 'th'."""
    from collections import Counter

    from tsidx.porter2 import stem
    from tsidx.positions import phrase_prefix_counts

    vocab = sorted({stem(t) for s in sonnets for t in s.split()})
    terms_df = spark.createDataFrame([(t,) for t in vocab], "term string")
    got = {
        r["doc_id"]: r["n_occ"]
        for r in phrase_prefix_counts(
            sonnets_positional, "of th*", terms_df
        ).collect()
    }
    want: Counter = Counter()
    for i, s in enumerate(sonnets):
        st = [stem(t) for t in s.split()]
        for j in range(len(st) - 1):
            if st[j] == "of" and st[j + 1].startswith("th"):
                want[i] += 1
    assert got == dict(want) and want


def test_phrase_prefix_edges(spark, sonnets_positional):
    from tsidx.positions import phrase_counts, phrase_prefix_counts

    # dictionary terms are STEMS ("thy" stems to "thi"); a prefix whose
    # only expansion is the exact stem == the exact phrase
    terms_df = spark.createDataFrame(
        [("thi",), ("thee",), ("thou",)], "term string"
    )
    a = sorted(
        map(tuple, phrase_prefix_counts(sonnets_positional, "of thi*", terms_df).collect())
    )
    b = sorted(map(tuple, phrase_counts(sonnets_positional, "of thy").collect()))
    assert a == b and a
    with pytest.raises(ValueError):
        phrase_prefix_counts(sonnets_positional, "no star here", terms_df)
    with pytest.raises(ValueError):
        phrase_prefix_counts(sonnets_positional, "bare *", terms_df)
    with pytest.raises(ValueError):
        phrase_prefix_counts(
            sonnets_positional, "of t*", terms_df, max_expansion=1
        )


# ---------------------------------------------------------------------------
# kwic (keyword-in-context concordance)
# ---------------------------------------------------------------------------


def _py_kwic(docs, query, before, after):
    from tsidx.tokenize import query_terms

    qt = set(query_terms(query))
    out = set()
    for doc_id, text in docs:
        toks = text.split()
        for i, t in enumerate(toks):
            if stem(t) in qt:
                out.add(
                    (
                        doc_id,
                        i,
                        " ".join(toks[max(i - before, 0) : i]),
                        t,
                        " ".join(toks[i + 1 : i + 1 + after]),
                    )
                )
    return out


@pytest.mark.parametrize(
    "query,before,after",
    [("quick", 3, 3), ("quick brown", 2, 1), ("dog fox", 0, 5), ("jumping", 4, 0)],
)
def test_kwic_matches_python(spark, positional, query, before, after):
    from tsidx.positions import kwic

    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {
        (r.doc_id, r.pos, r.left, r.hit, r.right)
        for r in kwic(
            positional, docs, query, before=before, after=after
        ).collect()
    }
    assert got == _py_kwic(CORPUS, query, before, after)


def test_kwic_empty_query(spark, positional):
    from tsidx.positions import kwic

    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    assert kwic(positional, docs, "").collect() == []


# ------------------------------------------------------------- phrase BM25


def test_phrase_bm25_topk_matches_python(spark, positional):
    """Phrase-as-pseudo-term BM25 vs a literal Python computation over
    the same occurrence counts / document lengths."""
    import datetime
    import math

    from tsidx.build import build_index
    from tsidx.oracle import bm25_idf
    from tsidx.positions import phrase_bm25_topk
    from tsidx.query import QueryEngine

    schema = (
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp"
    )
    base = datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc)
    rows = [
        (f"c{i // 4}", i % 4, "user", t, "", base + datetime.timedelta(minutes=i))
        for i, t in enumerate(t for _, t in CORPUS)
    ]
    eng = QueryEngine(
        build_index(spark.createDataFrame(rows, schema), block_size=4)
    )

    phrase = "quick brown"
    occ = _py_phrase_occurrences(CORPUS, phrase)
    docs_toks = [_stems(t) for _, t in CORPUS]
    n = len([1 for d in docs_toks])  # all docs (incl. empty) are indexed
    dls = [len(d) for d in docs_toks]
    avgdl = sum(dls) / n
    idf = bm25_idf(n, len(occ))
    k1, b = eng.index.meta["k1"], eng.index.meta["b"]
    want = {}
    for d, tf in occ.items():
        dl = dls[d]
        want[d] = idf * (tf * (k1 + 1)) / (
            tf + k1 * ((1 - b) + b * dl / avgdl)
        )
    got = {
        r["doc_id"]: (r["tf"], r["score"])
        for r in phrase_bm25_topk(eng, positional, phrase, 10).collect()
    }
    assert {d: v[0] for d, v in got.items()} == occ
    for d, s in want.items():
        assert got[d][1] == pytest.approx(s, rel=1e-12)
    # more occurrences with comparable dl must not rank lower
    assert got[9][0] == 2  # doc 9 contains the phrase twice


def test_phrase_bm25_topk_no_match(spark, positional):
    from tsidx.build import build_index
    from tsidx.positions import phrase_bm25_topk
    from tsidx.query import QueryEngine
    import datetime

    schema = (
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp"
    )
    base = datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc)
    rows = [
        (f"c{i // 4}", i % 4, "user", t, "", base)
        for i, (_, t) in enumerate(CORPUS)
    ]
    eng = QueryEngine(
        build_index(spark.createDataFrame(rows, schema), block_size=4)
    )
    assert phrase_bm25_topk(eng, positional, "dog fox quick", 5).count() == 0


def test_phrase_bm25_topk_excludes_deleted(spark, positional):
    """Tombstoned docs contribute neither candidates nor phrase df —
    after delete_docs the deleted doc disappears from the top-k AND the
    survivors' idf reflects the reduced document frequency (same live
    semantics as sdm_scores / champion_topk)."""
    import datetime

    from tsidx.build import build_index
    from tsidx.deletes import delete_docs
    from tsidx.oracle import bm25_idf
    from tsidx.positions import phrase_bm25_topk
    from tsidx.query import QueryEngine

    schema = (
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp"
    )
    base = datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc)
    rows = [
        (f"c{i // 4}", i % 4, "user", t, "", base)
        for i, (_, t) in enumerate(t for t in CORPUS)
    ]
    idx = build_index(spark.createDataFrame(rows, schema), block_size=4)

    phrase = "quick brown"
    occ = _py_phrase_occurrences(CORPUS, phrase)
    victim = sorted(occ)[0]
    live = QueryEngine(delete_docs(idx, [victim]))
    got = {
        r["doc_id"]: r["score"]
        for r in phrase_bm25_topk(live, positional, phrase, 10).collect()
    }
    assert victim not in got
    assert set(got) == set(occ) - {victim}
    # idf must be recomputed from the LIVE phrase df, not the raw one
    n = live.index.meta["n_docs"]
    assert bm25_idf(n, len(occ) - 1) > bm25_idf(n, len(occ))
    docs_toks = [_stems(t) for _, t in CORPUS]
    dls = [len(d) for d in docs_toks]
    avgdl = sum(dls) / len(docs_toks)
    k1, b = live.index.meta["k1"], live.index.meta["b"]
    idf = bm25_idf(n, len(occ) - 1)
    for d, s in got.items():
        tf, dl = occ[d], dls[d]
        want = idf * (tf * (k1 + 1)) / (tf + k1 * ((1 - b) + b * dl / avgdl))
        assert s == pytest.approx(want, rel=1e-12)
