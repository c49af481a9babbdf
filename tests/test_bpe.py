"""Distributed BPE training vs an independent single-node reference.

The reference implements classic Sennrich BPE with sequential merge
replay (a genuinely different convention from the engine's rank-priority
encoder), so agreement is evidence, not tautology.
"""

from __future__ import annotations

from collections import Counter

import pytest

from tsidx.bpe import bpe_segment, train_bpe, word_counts

TEXTS = [
    "low lower lowest low low",
    "new newer newest new",
    "wide wider widest wide",
    "low newer low wide lowest",
    "the the the the the",
]


def _ref_bpe(texts, n_merges, min_pair=2):
    wc = Counter(w for t in texts for w in t.split())
    segs = {w: list(w[:-1]) + [w[-1] + "</w>"] for w in wc}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, n in wc.items():
            s = segs[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += n
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_pair:
            break
        merges.append((a, b, cnt))
        for w, s in segs.items():
            res, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(s[i])
                    i += 1
            segs[w] = res
    return merges, segs


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_word_counts(spark, docs):
    got = {r["word"]: r["n"] for r in word_counts(docs).collect()}
    want = Counter(w for t in TEXTS for w in t.split())
    assert got == dict(want)


def test_train_bpe_matches_reference(spark, docs):
    got = train_bpe(docs, 12)
    want, _ = _ref_bpe(TEXTS, 12)
    assert got == want
    # sanity: the hot "low" stem merges early
    assert ("l", "o") == (got[1][0], got[1][1]) or ("l", "o") == (got[0][0], got[0][1])


def test_train_bpe_early_stop(spark, docs):
    """min_pair above every pair count stops training immediately."""
    assert train_bpe(docs, 5, min_pair=10**9) == []


def test_bpe_segment_matches_reference(spark, docs):
    n_merges = 10
    merges = train_bpe(docs, n_merges)
    ref_merges, ref_segs = _ref_bpe(TEXTS, n_merges)
    assert merges == ref_merges
    got = {r["doc_id"]: (r["n_words"], r["n_pieces"])
           for r in bpe_segment(docs, merges).collect()}
    for i, t in enumerate(TEXTS):
        ws = t.split()
        want_pieces = sum(len(ref_segs[w]) for w in ws)
        assert got[i] == (len(ws), want_pieces), (i, t)


def test_bpe_segment_no_merges(spark, docs):
    """With an empty merge table every character (+</w> fused) is a piece."""
    got = {r["doc_id"]: r["n_pieces"] for r in bpe_segment(docs, []).collect()}
    for i, t in enumerate(TEXTS):
        assert got[i] == sum(len(w) for w in t.split())


def test_driver_and_distributed_paths_identical(spark, docs):
    """The size-gated driver fast path and the per-round distributed loop
    must learn the exact same merge list (count, order, tie-breaks)."""
    fast = train_bpe(docs, 12)  # small dict -> driver path
    slow = train_bpe(docs, 12, driver_dict_max_bytes=0)  # force distributed
    assert fast == slow
    assert fast == _ref_bpe(TEXTS, 12)[0]


def test_driver_path_matches_reference_on_sonnets(spark, sonnets):
    """Deeper replay on the 4,034-word golden corpus: 60 merges through
    the incremental-stats driver loop equal the full-recount reference."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(sonnets)], "doc_id long, text string"
    )
    got = train_bpe(df, 60)
    want, _ = _ref_bpe(sonnets, 60)
    assert got == want
