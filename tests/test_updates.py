"""In-place document updates == fresh build over the updated corpus."""

import pytest

from tsidx.build import build_index
from tsidx.deletes import delete_docs
from tsidx.query import QueryEngine
from tsidx.updates import update_docs

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "a fast brown dog outpaces the fox",
    "slow green turtle sleeps all day",
    "the dog and the fox became friends",
    "quick thinking saves the lazy turtle",
    "foxes and dogs and turtles",
    "nothing relevant here at all",
    "brown bears are not foxes",
]

UPDATES = [
    (1, "a zebra replaces every animal mentioned before"),
    (6, "suddenly extremely relevant zebra content"),
]


def _mk(spark, texts, block_size=4):
    rows = [(f"c{i:03d}", 0, t) for i, t in enumerate(texts)]
    return build_index(
        spark.createDataFrame(rows, "conv_id string, turn_idx int, text string"),
        block_size=block_size,
        num_partitions=4,
    )


@pytest.fixture(scope="module")
def updated_pair(spark):
    idx = _mk(spark, CORPUS)
    got = update_docs(idx, UPDATES)
    fresh_texts = list(CORPUS)
    for d, t in UPDATES:
        fresh_texts[d] = t
    fresh = _mk(spark, fresh_texts)
    return got, fresh


def _posting_rows(idx):
    return sorted(
        (
            r["term"], r["block_id"], r["block_df"], r["min_doc"],
            r["max_doc"], r["max_tf"], r["min_dl"], r["sum_tf"],
            bytes(r["doc_gaps"]), bytes(r["tfs"]), bytes(r["dls"]),
        )
        for r in idx.postings.collect()
    )


def test_postings_byte_identical_to_fresh_build(updated_pair):
    got, fresh = updated_pair
    assert _posting_rows(got) == _posting_rows(fresh)


def test_stats_and_terms_match_fresh_build(updated_pair):
    got, fresh = updated_pair
    assert got.statistics() == fresh.statistics()
    assert got.meta["total_tokens"] == fresh.meta["total_tokens"]
    assert got.meta["avgdl"] == fresh.meta["avgdl"]
    g = {r["term"]: r["df"] for r in got.terms.collect()}
    f = {r["term"]: r["df"] for r in fresh.terms.collect()}
    assert g == f


def test_queries_see_updated_text(updated_pair):
    got, fresh = updated_pair
    eng = QueryEngine(got)
    hits = [r["doc_id"] for r in eng.match("zebra").collect()]
    assert hits == [1, 6]
    old = [r["doc_id"] for r in eng.match("outpaces").collect()]
    assert old == []  # the old text of doc 1 is gone
    ge = [
        (r["doc_id"], r["score"])
        for r in eng.bm25_topk("zebra relevant", 5).collect()
    ]
    fe = [
        (r["doc_id"], r["score"])
        for r in QueryEngine(fresh).bm25_topk("zebra relevant", 5).collect()
    ]
    assert ge == fe


def test_docs_table_carries_new_text(updated_pair):
    got, _ = updated_pair
    rows = {
        r["doc_id"]: r["text"]
        for r in got.docs.filter("doc_id IN (1, 6, 2)").collect()
    }
    assert rows[1] == UPDATES[0][1]
    assert rows[6] == UPDATES[1][1]
    assert rows[2] == CORPUS[2]


def test_unknown_doc_id_rejected(spark):
    idx = _mk(spark, CORPUS)
    with pytest.raises(ValueError, match="not inserts"):
        update_docs(idx, [(99, "whatever")])


def test_pending_tombstones_rejected(spark):
    idx = _mk(spark, CORPUS)
    with pytest.raises(ValueError, match="apply_deletes"):
        update_docs(delete_docs(idx, [2]), UPDATES)
