"""Dedup operators: exact groups, shingle Jaccard, MinHash/LSH, SimHash."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tsidx.dedup import (
    exact_dedup_groups,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingle_sets,
    simhash,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),   # near-dup of 0
    (2, "the quick brown fox jumps over the lazy dog"),   # exact dup of 0
    (3, "completely different text with unrelated words here"),
    (4, "spark builds inverted index postings at scale"),
    (5, "spark builds inverted index postings at scale quickly"),  # near-dup of 4
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def test_exact_dedup_groups(docs):
    groups = {r["keep_id"]: r for r in exact_dedup_groups(docs).collect()}
    assert groups[0]["n_dups"] == 2
    assert groups[0]["member_ids"] == [0, 2]
    assert sum(r["n_dups"] for r in groups.values()) == 6


def test_exact_dedup_members_capped(spark):
    """A 10^5-way duplicated text must not produce a giant member_ids row:
    the list is capped while n_dups stays exact."""
    big = spark.range(100_000).select(
        F.col("id").alias("doc_id"), F.lit("same text every time").alias("text")
    ).unionByName(
        spark.createDataFrame([(100_000, "a unique one")], "doc_id long, text string")
    )
    rows = {r["keep_id"]: r for r in
            exact_dedup_groups(big, members_cap=50).collect()}
    assert rows[0]["n_dups"] == 100_000
    assert rows[0]["member_ids"] == list(range(50))
    assert rows[100_000]["n_dups"] == 1
    assert rows[100_000]["member_ids"] == [100_000]


def test_ngram_jaccard_uncapped_warns(docs):
    with pytest.warns(UserWarning, match="max_key_df"):
        ngram_jaccard_pairs(docs, n=3, tau=0.3)


def test_shingle_sets(docs):
    sh = {r["doc_id"]: r for r in shingle_sets(docs, n=3).collect()}
    assert sh[0]["n_shingles"] == 7  # 9 tokens -> 7 distinct trigrams
    assert "the quick brown" in sh[0]["shingles"]


def test_ngram_jaccard_pairs(docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(docs, n=3, tau=0.3).collect()}
    assert (0, 2) in pairs and pairs[(0, 2)] == 1.0  # exact dup
    assert (0, 1) in pairs and 0.4 < pairs[(0, 1)] < 1.0
    assert (4, 5) in pairs
    assert not any(3 in p for p in pairs)


def test_ngram_jaccard_hot_key_cap(docs):
    """Capping shingle df drops only pairs that relied on hot shingles."""
    uncapped = set(
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(docs, n=3, tau=0.3).collect()
    )
    capped = set(
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(docs, n=3, tau=0.3, max_key_df=2).collect()
    )
    assert capped <= uncapped


def test_minhash_identical_docs_share_signature(docs):
    sigs = {r["doc_id"]: list(r["sig"]) for r in
            minhash_signatures(docs, num_hashes=16).collect()}
    assert sigs[0] == sigs[2]           # exact dups -> identical signature
    agree01 = sum(a == b for a, b in zip(sigs[0], sigs[1]))
    agree03 = sum(a == b for a, b in zip(sigs[0], sigs[3]))
    assert agree01 > agree03            # near-dup agrees more than unrelated


def test_lsh_candidates_find_dups(docs):
    sigs = minhash_signatures(docs, num_hashes=16)
    pairs = {(r["doc_a"], r["doc_b"]) for r in
             lsh_candidate_pairs(sigs, bands=8, rows_per_band=2).collect()}
    assert (0, 2) in pairs              # identical docs always collide


def test_simhash_hamming(docs):
    fps = {r["doc_id"]: r["simhash"] for r in
           simhash(docs, bits=32).collect()}
    assert fps[0] == fps[2]
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(fps[0], fps[1]) < ham(fps[0], fps[3])


def test_simhash_deterministic(docs):
    a = sorted(map(tuple, simhash(docs).collect()))
    b = sorted(map(tuple, simhash(docs).collect()))
    assert a == b


def test_simhash_pairs_banding_is_exact(spark):
    """Banded Hamming-LSH pairs == brute-force all-pairs at hamming<=3
    (pigeonhole: 3 differing bits cannot touch all 4 bands)."""
    import itertools

    from tsidx.dedup import simhash, simhash_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sigs = {r["doc_id"]: r["simhash"] for r in simhash(docs, bits=32).collect()}
    brute = {
        (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
        for a, b in itertools.combinations(sorted(sigs), 2)
        if bin(sigs[a] ^ sigs[b]).count("1") <= 3
    }
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_pairs(docs, bits=32, max_hamming=3, n_bands=4).collect()
    }
    assert got == brute and brute


def test_simhash_pairs_rejects_bad_params(spark):
    import pytest as _pytest

    from tsidx.dedup import simhash_pairs

    docs = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        simhash_pairs(docs, bits=32, max_hamming=4, n_bands=4)
    with _pytest.raises(ValueError):
        simhash_pairs(docs, bits=30, max_hamming=2, n_bands=4)


def test_connected_components_chain_and_stars(spark):
    """Components over a chain (0-1-2-3), a pair (10-11), a triangle
    (20-21-22), and a star (30-31,30-32,30-33): every vertex labels with
    its component minimum, regardless of edge direction/order."""
    from tsidx.dedup import connected_components

    pairs = spark.createDataFrame(
        [
            (1, 0), (1, 2), (3, 2),            # chain, mixed directions
            (11, 10),                           # pair
            (20, 21), (21, 22), (20, 22),       # triangle
            (30, 31), (30, 32), (30, 33),       # star
        ],
        "doc_a long, doc_b long",
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(pairs).collect()
    }
    assert got == {
        0: 0, 1: 0, 2: 0, 3: 0,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20,
        30: 30, 31: 30, 32: 30, 33: 30,
    }


def test_connected_components_long_path_converges(spark):
    """A 40-vertex path needs ~diameter rounds of propagation — exercises
    the iteration/convergence logic well past one round."""
    from tsidx.dedup import connected_components

    n = 40
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    rows = connected_components(pairs).collect()
    assert len(rows) == n
    assert {r["cluster_id"] for r in rows} == {0}


def test_connected_components_matches_jaccard_pairs(docs):
    """End-to-end: clusters over the test corpus's Jaccard pairs."""
    from tsidx.dedup import connected_components

    pairs = ngram_jaccard_pairs(docs, n=3, tau=0.3, max_key_df=16)
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(pairs).collect()
    }
    # docs 0/1/2 chain through shared shingles; 4/5 pair up
    assert got[0] == got[1] == got[2] == 0
    assert got[4] == got[5] == 4
    assert 3 not in got  # no pair -> not a vertex


def test_cluster_split_leakage_safe(spark):
    """Every member of a near-dup cluster gets the same split; docs in no
    pair are singleton clusters keyed by their own doc_id (so their
    assignment equals group_split on doc_id)."""
    from tsidx.dedup import cluster_split
    from tsidx.textstats import group_split

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(60)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11), (30, 40)], "doc_a long, doc_b long"
    )
    fracs = {"train": 0.6, "valid": 0.2, "test": 0.2}
    rows = cluster_split(docs, pairs, fracs).collect()
    by_id = {r["doc_id"]: r for r in rows}
    assert len(by_id) == 60
    # chained cluster 0-1-2 shares a split; so do 10/11 and 30/40
    for grp in ([0, 1, 2], [10, 11], [30, 40]):
        splits = {by_id[i]["split"] for i in grp}
        clusters = {by_id[i]["cluster_id"] for i in grp}
        assert len(splits) == 1 and clusters == {min(grp)}
    # singletons: cluster_id == doc_id and split == plain group_split
    plain = {
        r["doc_id"]: r["split"]
        for r in group_split(docs, fracs, group_col="doc_id").collect()
    }
    singles = set(range(60)) - {0, 1, 2, 10, 11, 30, 40}
    for i in singles:
        assert by_id[i]["cluster_id"] == i
        assert by_id[i]["split"] == plain[i]
    # with 60 docs and these fracs all three splits should be populated
    assert {r["split"] for r in rows} == {"train", "valid", "test"}


# ------------------------------------------------------ cross-corpus dedup


def test_cross_dedup_exact(spark):
    from tsidx.dedup import cross_dedup_exact

    ref = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "delta epsilon"), (2, "zeta eta")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(10, "delta epsilon"), (11, "brand new text"), (12, "zeta eta"),
         (13, "alpha beta gamma "),  # trailing space: NOT an exact dup
         ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["is_dup"]
           for r in cross_dedup_exact(new, ref).collect()}
    assert got == {10: True, 11: False, 12: True, 13: False}
    # the reference corpus is never re-flagged: output ids are new-side only
    assert set(got) == {10, 11, 12, 13}


def test_cross_dup_candidates_near_dups(spark, docs):
    """Identical texts across corpora must collide (equal signatures agree
    on every band); unrelated texts must not; no same-side pairs exist."""
    from tsidx.dedup import cross_dup_candidates, minhash_signatures

    ref = docs  # ids 0-5
    new = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog"),  # == doc 0/2
         (101, "totally novel content nothing shared anywhere"),
         (102, "spark builds inverted index postings at scale")],  # == doc 4
        "doc_id long, text string",
    )
    sig_ref = minhash_signatures(ref, num_hashes=32)
    sig_new = minhash_signatures(new, num_hashes=32)
    pairs = {(r["new_id"], r["ref_id"])
             for r in cross_dup_candidates(sig_new, sig_ref).collect()}
    assert (100, 0) in pairs and (100, 2) in pairs
    assert (102, 4) in pairs
    assert not any(n == 101 for n, _ in pairs)
    # strictly cross: every left id is new-side, every right id ref-side
    assert all(n >= 100 and r < 100 for n, r in pairs)


# ------------------------------------------------- prefix-filtered Jaccard


def _brute_jaccard_pairs(doc_rows, tau):
    """O(N^2) token-set Jaccard reference."""
    sets = {d: set(t.split()) for d, t in doc_rows if t.split()}
    ids = sorted(sets)
    out = {}
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(sets[a] & sets[b])
            jac = inter / len(sets[a] | sets[b])
            if jac >= tau:
                out[(a, b)] = jac
    return out


def test_prefix_jaccard_pairs_planted(spark, docs):
    from tsidx.dedup import prefix_jaccard_pairs

    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in prefix_jaccard_pairs(docs, tau=0.5).collect()
    }
    want = _brute_jaccard_pairs(DOCS, 0.5)
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)


@pytest.mark.parametrize("tau", [0.3, 0.5, 0.7, 0.9, 1.0])
def test_prefix_jaccard_exact_vs_brute_force(spark, tau):
    """Deterministic pseudo-random corpus with heavy vocab reuse: the
    prefix-filtered join must return EXACTLY the brute-force pair set at
    every threshold (the no-lost-candidates guarantee)."""
    from tsidx.dedup import prefix_jaccard_pairs

    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for d in range(60):
        # deterministic LCG to pick 3-12 tokens with overlap across docs
        s, n = (d * 2654435761) % 97, 3 + (d * 31) % 10
        toks = [vocab[(s + i * (1 + d % 7)) % len(vocab)] for i in range(n)]
        rows.append((d, " ".join(toks)))
    rows.append((100, ""))  # empty doc: excluded, must not crash
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in prefix_jaccard_pairs(df, tau=tau).collect()
    }
    want = _brute_jaccard_pairs(rows, tau)
    assert got.keys() == want.keys(), (
        f"tau={tau}: missing={set(want) - set(got)} extra={set(got) - set(want)}"
    )
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)


def test_prefix_jaccard_prefix_actually_prunes(spark):
    """The stopword shared by every doc must not form a candidate bucket:
    with tau=0.8 and distinct rare tokens, candidate count stays 0 even
    though all docs share 'the'."""
    from tsidx.dedup import prefix_jaccard_pairs

    rows = [(d, f"the unique{d}a unique{d}b unique{d}c unique{d}d") for d in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert prefix_jaccard_pairs(df, tau=0.8).count() == 0


def test_pair_join_guard_uniform_shard(spark):
    """VERDICT r4 task #3: a planted degenerate shard (every doc drawn
    from the same tiny closed vocab, so every token is hot and every
    pair qualifies) must fail fast on the candidate-volume guard BEFORE
    the pair join executes — for both pair generators — and the same
    call succeeds once the bound is lifted."""
    import warnings

    from tsidx.dedup import containment_pairs, prefix_jaccard_pairs

    vocab = ["aa", "bb", "cc", "dd", "ee"]
    rows = [
        (d, " ".join(vocab[(d + i) % 5] for i in range(5))) for d in range(120)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    with pytest.raises(ValueError, match="candidate volume"):
        prefix_jaccard_pairs(df, tau=0.8, max_candidates=1000)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        with pytest.raises(ValueError, match="candidate volume"):
            containment_pairs(df, tau=0.9, max_candidates=1000)
    # lifted bound: the joins run and (docs being permutations of the
    # same 5-token set) every ordered/unordered pair qualifies
    assert prefix_jaccard_pairs(df, tau=0.8, max_candidates=None).count() == (
        120 * 119 // 2
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        assert (
            containment_pairs(df, tau=0.9, max_candidates=None).count()
            == 120 * 119
        )


# --------------------------------------------------------- containment join


def _brute_containment(doc_rows, tau, max_key_df=None):
    from collections import Counter

    sets = {d: set(t.split()) for d, t in doc_rows if t.split()}
    if max_key_df is not None:
        df = Counter(tok for s in sets.values() for tok in s)
        sets = {
            d: {t for t in s if df[t] <= max_key_df} for d, s in sets.items()
        }
        sets = {d: s for d, s in sets.items() if s}
    out = {}
    for a in sets:
        for b in sets:
            if a == b:
                continue
            c = len(sets[a] & sets[b]) / len(sets[a])
            if c >= tau:
                out[(a, b)] = c
    return out


@pytest.mark.parametrize("tau", [0.5, 0.8, 1.0])
def test_containment_exact_uncapped(spark, tau):
    """Quote/subset corpus: the excerpt is contained in the article."""
    import warnings

    from tsidx.dedup import containment_pairs

    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta"),  # article
        (1, "beta gamma delta"),                               # excerpt of 0
        (2, "alpha beta gamma delta epsilon zeta eta theta"),  # exact dup of 0
        (3, "unrelated words entirely different"),
        (4, "beta gamma xi"),                                  # partial overlap
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        got = {
            (r["doc_small"], r["doc_big"]): r["containment"]
            for r in containment_pairs(df, tau=tau).collect()
        }
    want = _brute_containment(rows, tau)
    assert got.keys() == want.keys(), tau
    for k, v in want.items():
        assert got[k] == pytest.approx(v, rel=1e-12)


def test_containment_capped_matches_capped_brute_force(spark):
    from tsidx.dedup import containment_pairs

    vocab = [f"w{i}" for i in range(20)]
    rows = []
    for d in range(50):
        s, n = (d * 48271) % 97, 3 + (d * 13) % 8
        toks = [vocab[(s + i * (1 + d % 5)) % len(vocab)] for i in range(n)]
        rows.append((d, " ".join(toks)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_small"], r["doc_big"]): r["containment"]
        for r in containment_pairs(df, tau=0.7, max_key_df=20).collect()
    }
    want = _brute_containment(rows, 0.7, max_key_df=20)
    assert got.keys() == want.keys()
    for k, v in want.items():
        assert got[k] == pytest.approx(v, rel=1e-12)


def test_containment_asymmetry(spark):
    """The excerpt contains-in the article but not vice versa."""
    import warnings

    from tsidx.dedup import containment_pairs

    rows = [(0, "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"), (1, "a2 a3 a4")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        pairs = {
            (r["doc_small"], r["doc_big"])
            for r in containment_pairs(df, tau=0.9).collect()
        }
    assert (1, 0) in pairs and (0, 1) not in pairs
