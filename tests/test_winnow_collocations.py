"""Winnowing fingerprints + Dunning-LLR collocations vs pure-Python
references (Schleimer et al. SIGMOD 2003 window-min rule; Dunning CL 1993
G² contingency formula)."""

from __future__ import annotations

import hashlib
import math
import random
from itertools import combinations

import pytest


# ---------------------------------------------------------------------------
# pure-Python winnowing reference
# ---------------------------------------------------------------------------


def _py_fingerprints(text: str, k: int, w: int) -> set[tuple[int, str]]:
    toks = text.strip().split()
    n_grams = max(len(toks) - k + 1, 1)
    grams = [
        hashlib.md5(" ".join(toks[i : i + k]).encode()).hexdigest()
        for i in range(n_grams)
    ]
    out: set[tuple[int, str]] = set()
    n_win = max(len(grams) - w + 1, 1)
    for j in range(n_win):
        window = grams[j : j + w]
        h, p = None, -1
        for q, g in enumerate(window, start=j + 1):
            if h is None or g <= h:  # rightmost minimal gram
                h, p = g, q
        out.add((p, h))
    return out


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "pack my box with five dozen liquor jugs today"),
    (2, "the quick brown fox jumps over the old tree"),
    (3, "solo"),
    (4, "a b"),
    (5, "a a a a a a a a"),  # all grams identical: tie rule exercised
    (6, "one two three four five six seven eight nine ten eleven twelve"),
]


@pytest.mark.parametrize("k,w", [(4, 5), (2, 3), (1, 1), (3, 8)])
def test_winnow_fingerprints_match_python(spark, k, w):
    from tsidx.winnow import winnow_fingerprints

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got: dict[int, set] = {}
    for r in winnow_fingerprints(df, k=k, w=w).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.fp))
    want = {d: _py_fingerprints(t, k, w) for d, t in DOCS}
    assert got == want


def test_winnow_fingerprints_random_corpus(spark):
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 40))))
        for i in range(30)
    ]
    from tsidx.winnow import winnow_fingerprints

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got: dict[int, set] = {}
    for r in winnow_fingerprints(df, k=3, w=4).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.fp))
    want = {d: _py_fingerprints(t, 3, 4) for d, t in docs}
    assert got == want


def test_winnow_guarantee_shared_passage(spark):
    """The paper's guarantee: a shared token run of length >= w + k - 1
    yields at least one shared fingerprint VALUE between the two docs."""
    k, w = 4, 5
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 = w+k-1
    docs = [
        (0, "left filler words here " + shared + " and a right tail"),
        (1, shared + " entirely different continuation follows now"),
    ]
    from tsidx.winnow import winnow_fingerprints

    df = spark.createDataFrame(docs, "doc_id long, text string")
    by_doc: dict[int, set] = {0: set(), 1: set()}
    for r in winnow_fingerprints(df, k=k, w=w).collect():
        by_doc[r.doc_id].add(r.fp)
    assert by_doc[0] & by_doc[1]


def test_winnow_pairs_match_bruteforce(spark):
    from tsidx.winnow import winnow_fingerprints, winnow_pairs

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    fps = winnow_fingerprints(df, k=3, w=4)
    got = {
        (r.id_a, r.id_b): r.n_shared
        for r in winnow_pairs(fps, min_shared=1, max_key_df=100).collect()
    }
    by_doc = {d: {h for _, h in _py_fingerprints(t, 3, 4)} for d, t in DOCS}
    want = {}
    for a, b in combinations(sorted(by_doc), 2):
        n = len(by_doc[a] & by_doc[b])
        if n >= 1:
            want[(a, b)] = n
    assert got == want
    # docs 0 and 2 share "the quick brown fox" -> must pair
    assert (0, 2) in got


def test_winnow_pairs_key_cap_drops_boilerplate(spark):
    from tsidx.winnow import winnow_fingerprints, winnow_pairs

    # every doc carries the same boilerplate line; cap below n_docs
    docs = [(i, f"unique{i} tokens here copyright footer text") for i in range(6)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fps = winnow_fingerprints(df, k=3, w=3)
    capped = winnow_pairs(fps, min_shared=1, max_key_df=3).collect()
    assert capped == []  # boilerplate fp present in all 6 docs > cap
    uncapped = winnow_pairs(fps, min_shared=1, max_key_df=100).collect()
    assert len(uncapped) == 15  # all C(6,2) pairs share the footer


def test_winnow_pairs_uncapped_warns(spark):
    from tsidx.winnow import winnow_fingerprints, winnow_pairs

    df = spark.createDataFrame(DOCS[:2], "doc_id long, text string")
    with pytest.warns(UserWarning, match="max_key_df"):
        winnow_pairs(winnow_fingerprints(df))


def test_winnow_rejects_bad_params(spark):
    from tsidx.winnow import winnow_fingerprints

    df = spark.createDataFrame(DOCS[:1], "doc_id long, text string")
    with pytest.raises(ValueError):
        winnow_fingerprints(df, k=0)
    with pytest.raises(ValueError):
        winnow_fingerprints(df, w=0)


# ---------------------------------------------------------------------------
# collocations_llr (Dunning G²)
# ---------------------------------------------------------------------------


def _py_llr(docs, min_pair):
    c12: dict[tuple, int] = {}
    for _d, t in docs:
        toks = t.strip().split()
        for a, b in zip(toks, toks[1:]):
            c12[(a, b)] = c12.get((a, b), 0) + 1
    r1: dict[str, int] = {}
    c1: dict[str, int] = {}
    for (a, b), c in c12.items():
        r1[a] = r1.get(a, 0) + c
        c1[b] = c1.get(b, 0) + c
    n = sum(c12.values())

    def term(k, row, col):
        return k * math.log((n * k) / (row * col)) if k > 0 else 0.0

    out = {}
    for (a, b), k11 in c12.items():
        if k11 < min_pair:
            continue
        g2 = 2.0 * (
            term(k11, r1[a], c1[b])
            + term(r1[a] - k11, r1[a], n - c1[b])
            + term(c1[b] - k11, n - r1[a], c1[b])
            + term(n - r1[a] - c1[b] + k11, n - r1[a], n - c1[b])
        )
        out[(a, b)] = (k11, round(g2, 4))
    return out


def test_collocations_llr_matches_bruteforce(spark):
    from tsidx.cooccur import collocations_llr

    rng = random.Random(11)
    vocab = [f"t{i}" for i in range(9)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 30))))
        for i in range(40)
    ]
    # plant a strong collocation
    docs += [(100 + i, "strong pair strong pair filler") for i in range(5)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.w1, r.w2): (r.pair_count, r.llr_r)
        for r in collocations_llr(df, min_pair=2).collect()
    }
    want = _py_llr(docs, 2)
    assert set(got) == set(want)
    for key in want:
        assert got[key][0] == want[key][0], key
        assert got[key][1] == pytest.approx(want[key][1], abs=2e-4), key
    # the planted collocation scores far above the random pairs
    planted = got[("strong", "pair")][1]
    assert planted > max(
        v for (a, b), (_, v) in got.items() if (a, b) != ("strong", "pair")
    )


def test_collocations_llr_empty_corpus(spark):
    from tsidx.cooccur import collocations_llr

    df = spark.createDataFrame([(0, "solo")], "doc_id long, text string")
    assert collocations_llr(df).collect() == []


def test_winnow_fingerprints_is_map_only(spark):
    from tsidx.winnow import winnow_fingerprints

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = (
        winnow_fingerprints(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
