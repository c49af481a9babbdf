"""The composed index-maintenance recipe, end to end (round-3 verdict
task #7): build -> write/read -> term-prune -> impact-prune -> champion
tier -> query -> delete, with fsck green after every step. The pruning
markers x fsck interactions were round 3's bug farm (ADVICE items 2-3:
pruned dictionaries tripping the df cross-checks), so every stage here
round-trips through disk and re-runs the full fsck.

Parity: the reference has no maintenance pipeline (its index is an
in-memory dict, ts_type_filter/inverted_index.py:35-153); this chain is
the persistent-index operational surface a 100 TB deployment needs.
"""

from __future__ import annotations

import pytest

from tsidx.build import build_index
from tsidx.champion import champion_lists, champion_topk
from tsidx.deletes import delete_docs
from tsidx.fsck import fsck_index
from tsidx.index import InvertedIndex
from tsidx.oracle import OracleIndex
from tsidx.prune import prune_by_impact, prune_terms
from tsidx.query import QueryEngine

Q = "thrall quench"  # rare terms: survive both prunes


def _fsck_green(idx) -> dict:
    checks = {r["check"]: int(r["n_bad"]) for r in fsck_index(idx).collect()}
    assert checks and all(v == 0 for v in checks.values()), checks
    return checks


def _roundtrip(spark, idx, path: str) -> "InvertedIndex":
    idx.write(path)
    return InvertedIndex.read(spark, path)


@pytest.fixture(scope="module")
def oracle(sonnets):
    o = OracleIndex()
    o.add_corpus(sonnets)
    return o


def test_full_maintenance_chain(spark, sonnets_transcripts, oracle, tmp_path_factory):
    root = tmp_path_factory.mktemp("chain")

    # 1. build + persist + verify
    built = build_index(sonnets_transcripts, block_size=64, num_partitions=4)
    idx = _roundtrip(spark, built, str(root / "idx0"))
    _fsck_green(idx)
    assert idx.statistics()["num_unique_terms"] == 4034

    # 2. term-prune (stopword list + df cap), persist, fsck must stay
    #    green with the pruned-dictionary markers present
    pruned = prune_terms(idx, max_df=100, terms=["sonnet"])
    pruned = _roundtrip(spark, pruned, str(root / "idx1"))
    assert pruned.meta["pruned_max_df"] == 100
    assert pruned.meta["pruned_terms_n"] == 1
    _fsck_green(pruned)
    eng1 = QueryEngine(pruned)
    assert eng1.match("the").count() == 0  # df 135 > cap: gone
    assert [r["doc_id"] for r in eng1.match(Q).collect()] == oracle.match(Q)

    # 3. impact-prune ON TOP of the term prune, persist, fsck green with
    #    both lineage markers
    impacted = prune_by_impact(eng1, lam=0.1)
    impacted = _roundtrip(spark, impacted, str(root / "idx2"))
    assert impacted.meta["pruned_max_df"] == 100
    assert impacted.meta["pruned_impact_lam"] == pytest.approx(0.1)
    _fsck_green(impacted)
    eng2 = QueryEngine(impacted)

    # surviving (term, doc) pairs score exactly as in the full index
    full_scores = {
        r["doc_id"]: r["score"]
        for r in QueryEngine(idx).bm25_scores(Q).collect()
    }
    for r in eng2.bm25_scores(Q).collect():
        assert r["score"] == pytest.approx(full_scores[r["doc_id"]], rel=1e-12)

    # 4. champion tier over the maintained index: single-term queries
    #    with m >= k are exact end to end (tsidx/champion.py docstring)
    champs = champion_lists(eng2, m=25).localCheckpoint()
    want = {
        r["doc_id"]: r["score"]
        for r in eng2.bm25_topk("thrall", 5).collect()
    }
    got = {
        r["doc_id"]: r["score"]
        for r in champion_topk(eng2, champs, "thrall", 5).collect()
    }
    assert got.keys() == want.keys()
    for d, s in want.items():
        assert got[d] == pytest.approx(s, rel=1e-12)

    # 5. delete docs on the maintained index; fsck stays green and both
    #    the index scan and the champion tier exclude the tombstones
    victims = oracle.match(Q)[:1]
    deleted = delete_docs(impacted, victims)
    _fsck_green(deleted)
    eng3 = QueryEngine(deleted)
    assert victims[0] not in [r["doc_id"] for r in eng3.match(Q).collect()]
    assert victims[0] not in [
        r["doc_id"]
        for r in champion_topk(eng3, champs, "thrall", 5).collect()
    ]
