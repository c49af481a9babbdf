"""Co-occurrence PMI vs brute-force ground truth on the sonnets corpus."""

import math
from itertools import combinations

import pytest

from tsidx.build import build_index
from tsidx.cooccur import cooccurrence_pmi
from tsidx.oracle import OracleIndex
from tsidx.query import QueryEngine


@pytest.fixture(scope="module")
def built(spark, sonnets_transcripts):
    return build_index(sonnets_transcripts, num_partitions=4)


@pytest.fixture(scope="module")
def oracle(sonnets):
    o = OracleIndex()
    o.add_corpus(sonnets)
    return o


def _brute_pmi(oracle, min_df, max_df, min_pair):
    n = oracle.n_docs
    band = {
        t: len(p)
        for t, p in oracle.postings.items()
        if min_df <= len(p) <= max_df
    }
    by_doc: dict[int, set] = {}
    for t in band:
        for d, _tf in oracle.postings[t]:
            by_doc.setdefault(d, set()).add(t)
    counts: dict[tuple, int] = {}
    for terms in by_doc.values():
        for a, b in combinations(sorted(terms), 2):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    out = {}
    for (a, b), c in counts.items():
        if c >= min_pair:
            out[(a, b)] = (c, math.log((c * n) / (band[a] * band[b])))
    return out


@pytest.mark.parametrize(
    "min_df,max_df,min_pair", [(20, 100, 5), (5, 40, 3), (100, 200, 10)]
)
def test_pmi_matches_bruteforce(built, oracle, min_df, max_df, min_pair):
    eng = QueryEngine(built)
    got = {
        (r["term_a"], r["term_b"]): (r["df_ab"], r["pmi"])
        for r in cooccurrence_pmi(
            eng, min_df=min_df, max_df=max_df, min_pair=min_pair
        ).collect()
    }
    want = _brute_pmi(oracle, min_df, max_df, min_pair)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], k
        assert got[k][1] == pytest.approx(want[k][1], abs=1e-12), k


def test_pmi_uncapped_warns(built):
    eng = QueryEngine(built)
    with pytest.warns(UserWarning, match="max_df"):
        cooccurrence_pmi(eng, min_df=150)


# --------------------------------------------------------- query segmentation


def test_segment_query_merges_and_splits(spark):
    from tsidx.cooccur import collocations_llr, segment_query

    # 'new york' is a strong collocation; 'york pizza' never co-occurs
    rows = [(i, "new york city guide") for i in range(20)]
    rows += [(100 + i, "pizza delivery fast") for i in range(20)]
    rows += [(200 + i, "random words here now") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    colloc = collocations_llr(docs, min_pair=2)
    segs = {
        r["seg_idx"]: r["segment"]
        for r in segment_query(colloc, "new york pizza delivery").collect()
    }
    assert segs == {0: "new york", 1: "pizza delivery"}


def test_segment_query_all_split_and_edge_cases(spark):
    from tsidx.cooccur import collocations_llr, segment_query

    docs = spark.createDataFrame(
        [(0, "a b"), (1, "c d")], "doc_id long, text string"
    )
    colloc = collocations_llr(docs, min_pair=1)
    # unknown pairs split token-per-token
    segs = [
        r["segment"]
        for r in segment_query(colloc, "x y z").orderBy("seg_idx").collect()
    ]
    assert segs == ["x", "y", "z"]
    assert segment_query(colloc, "").count() == 0
    one = segment_query(colloc, "solo").collect()
    assert [(r["seg_idx"], r["segment"]) for r in one] == [(0, "solo")]
