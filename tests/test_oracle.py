"""Oracle-vs-reference goldens over the sonnets corpus.

Golden values come from the reference's documented output:
- stats 154 docs / 4,034 terms / 13,044 postings
  (``documentation/inverted-index.md:134-136``)
- df head table (``documentation/inverted-index.md:139-149``)
- match results for ``same`` / ``thrall quench`` / ``fire heat``
  (``documentation/inverted-index.md:22-123``, ``samples/inverted_index/query.md:3-113``)
"""

import pytest

from tsidx.oracle import OracleIndex


@pytest.fixture(scope="module")
def index(sonnets):
    idx = OracleIndex()
    idx.add_corpus(sonnets)
    return idx


def roman(n: int) -> str:
    vals = [(1000, "M"), (900, "CM"), (500, "D"), (400, "CD"), (100, "C"),
            (90, "XC"), (50, "L"), (40, "XL"), (10, "X"), (9, "IX"),
            (5, "V"), (4, "IV"), (1, "I")]
    out = ""
    for v, s in vals:
        while n >= v:
            out += s
            n -= v
    return out


def test_statistics_golden(index):
    assert index.statistics() == {
        "num_documents": 154,
        "num_unique_terms": 4034,
        "num_postings": 13044,
    }


def test_df_head_golden(index):
    expected = [("sonnet", 154), ("and", 148), ("to", 146), ("in", 139),
                ("the", 135), ("of", 134), ("that", 130), ("my", 117),
                ("i", 110), ("but", 108), ("with", 98)]
    assert index.document_frequencies()[:11] == expected


@pytest.mark.parametrize(
    "query,expected",
    [
        ("same", ["V", "L", "LXIX"]),
        ("thrall quench", ["CXXIV", "CLIV"]),
        ("fire heat", ["XII", "XLV", "LV", "CXLIV", "CLIII", "CLIV"]),
        ("", []),
        ("zzzunknown", []),
    ],
)
def test_match_golden(index, query, expected):
    assert [roman(d + 1) for d in index.match(query)] == expected


def test_match_list_query(index):
    # list-of-strings queries are flattened into one term set
    # (inverted_index.py:87-92); union of 'thrall' and 'quench' parts
    assert index.match(["thrall", "quench"]) == index.match("thrall quench")


def test_pinned_union(index, sonnets):
    idx = OracleIndex()
    idx.add_corpus(sonnets)
    idx.pin(7)
    got = idx.match("same")
    assert 7 in got and got == sorted(set(idx.match("same")) | {7})
    # pinned docs appear even for empty/unknown queries
    assert idx.match("zzzunknown") == [7]


def test_duplicate_rejected(index):
    idx = OracleIndex()
    idx.add(0, "hello world")
    with pytest.raises(ValueError):
        idx.add(0, "hello again")


def test_bm25_topk_deterministic(index):
    top = index.bm25_topk("fire heat", 5)
    assert len(top) == 5
    # scores strictly ordered, ties by doc_id
    for (d1, s1), (d2, s2) in zip(top, top[1:]):
        assert s1 > s2 or (s1 == s2 and d1 < d2)
    # candidates are exactly the disjunctive match set
    all_scored = index.bm25_topk("fire heat", 10**9)
    assert sorted(d for d, _ in all_scored) == index.match("fire heat")
