"""Hot-term pruning vs brute-force ground truth on the sonnets corpus."""

import pytest

from tsidx.build import build_index
from tsidx.oracle import OracleIndex
from tsidx.prune import prune_terms
from tsidx.query import QueryEngine


@pytest.fixture(scope="module")
def built(spark, sonnets_transcripts):
    return build_index(sonnets_transcripts, block_size=64, num_partitions=4)


@pytest.fixture(scope="module")
def oracle(sonnets):
    o = OracleIndex()
    o.add_corpus(sonnets)
    return o


def test_prune_statistics(built, oracle):
    cap = 100
    pruned = prune_terms(built, max_df=cap)
    keep = {t: p for t, p in oracle.postings.items() if len(p) <= cap}
    stats = pruned.statistics()
    assert stats["num_unique_terms"] == len(keep)
    assert stats["num_postings"] == sum(len(p) for p in keep.values())
    assert stats["num_documents"] == 154  # n_docs unchanged by design
    # non-destructive: the source index still has everything
    assert built.statistics()["num_unique_terms"] == 4034


def test_prune_ratio_and_meta(built):
    pruned = prune_terms(built, max_df_ratio=0.5)
    assert pruned.meta["pruned_max_df"] == 77
    assert "pruned_max_df" not in built.meta


def test_pruned_term_matches_nothing(built, oracle):
    # "the" has df=135 > 100: pruned, so match returns nothing
    pruned = prune_terms(built, max_df=100)
    eng = QueryEngine(pruned)
    assert eng.match("the").count() == 0
    assert oracle.match("the")  # ...but the unpruned corpus does match


def test_kept_term_match_unchanged(built, oracle):
    pruned = prune_terms(built, max_df=100)
    eng = QueryEngine(pruned)
    got = [r["doc_id"] for r in eng.match("thrall quench").collect()]
    assert got == oracle.match("thrall quench")


def test_kept_query_scores_bit_identical(built, oracle):
    # avgdl/dl are kept as-built, so all-kept-term queries score identically
    pruned = prune_terms(built, max_df=100)
    got = {
        r["doc_id"]: r["score"]
        for r in QueryEngine(pruned).bm25_topk("fire heat", 10).collect()
    }
    want = dict(oracle.bm25_topk("fire heat", 10))
    assert got == want


def test_mixed_query_drops_pruned_contribution(built):
    # "the" pruned + "quench" kept: scores equal the kept-term-only query
    # on the unpruned index
    pruned = prune_terms(built, max_df=100)
    got = {
        r["doc_id"]: r["score"]
        for r in QueryEngine(pruned).bm25_scores("the quench").collect()
    }
    want = {
        r["doc_id"]: r["score"]
        for r in QueryEngine(built).bm25_scores("quench").collect()
    }
    assert got == want


def test_explicit_stopword_list(built, oracle):
    stems = ["the", "and", "to"]
    pruned = prune_terms(built, terms=stems)
    stats = pruned.statistics()
    keep = {t: p for t, p in oracle.postings.items() if t not in stems}
    assert stats["num_unique_terms"] == len(keep)
    assert stats["num_postings"] == sum(len(p) for p in keep.values())


def test_no_criteria_raises(built):
    with pytest.raises(ValueError):
        prune_terms(built)
