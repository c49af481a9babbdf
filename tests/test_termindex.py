"""Dictionary-acceleration indexes (tsidx/termindex.py): the SymSpell
deletes-index probe and the trigram infix probe must return row-identical
results to the full-dictionary scan plans they replace."""

from __future__ import annotations

import re

import pytest

from pyspark.sql import functions as F

from tsidx.build import build_index
from tsidx.query import QueryEngine
from tsidx.termindex import (
    contains_terms,
    deletes_index,
    deletion_variants,
    query_grams,
    symspell_terms,
    trigram_index,
)


@pytest.fixture(scope="module")
def engine(sonnets_transcripts):
    idx = build_index(sonnets_transcripts, block_size=64, num_partitions=4)
    idx.postings.cache().count()
    idx.terms.cache().count()
    return QueryEngine(idx)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# ------------------------------------------------------------- SymSpell


def test_deletion_variants_bounds():
    vs = deletion_variants("abc", 1)
    assert vs == ["ab", "abc", "ac", "bc"]
    vs2 = deletion_variants("abc", 2)
    assert set(vs2) == {"abc", "ab", "ac", "bc", "a", "b", "c"}
    assert deletion_variants("", 2) == [""]


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_sharing_lemma_brute_force():
    """lev(a, b) <= d  ==>  a and b share a <= d-deletion variant (the
    correctness core of the probe: candidates are a superset)."""
    words = ["merge", "merg", "mere", "serge", "urge", "emerge", "go",
             "gone", "one", "query", "querri", "queri", "quer"]
    for d in (1, 2):
        for a in words:
            va = set(deletion_variants(a, d))
            for b in words:
                if _lev(a, b) <= d:
                    assert va & set(deletion_variants(b, d)), (a, b, d)


@pytest.mark.parametrize("token,dist", [
    ("merg", 1), ("merg", 2), ("querri", 2), ("windoww", 1), ("zzzz", 2),
])
def test_symspell_equals_scan(engine, token, dist):
    scan = engine.suggest_terms(token, dist)
    probe = engine.suggest_terms_indexed(token, dist)
    assert _rows(probe) == _rows(scan)


def test_symspell_with_persisted_index(engine, tmp_path):
    """The production path: a persisted deletes table probed by key, with
    the del_key IN filter pushed to the scan."""
    path = str(tmp_path / "deletes")
    deletes_index(engine.index.terms, 1).sortWithinPartitions(
        "del_key"
    ).write.parquet(path)
    spark = engine.index.docs.sparkSession
    persisted = spark.read.parquet(path)
    probe = symspell_terms(engine.index.terms, "merg", 1, persisted)
    scan = engine.suggest_terms("merg", 1)
    assert _rows(probe) == _rows(scan)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "del_key" in plan


@pytest.mark.parametrize("dist", [1, 2])
def test_correct_query_indexed_equals_scan(engine, dist):
    """The full-query at-scale spell path (r5 decision memo): the
    SymSpell-probe correct_query_indexed must be row-identical to the
    vocab-scan correct_query — in-vocab self-corrections, near-miss
    corrections, and NULL hopeless tokens alike."""
    q = "merg the querry zzzzqq summer"
    scan = engine.correct_query(q, dist)
    probe = engine.correct_query_indexed(q, dist)
    assert _rows(probe) == _rows(scan)


def test_correct_query_indexed_persisted(engine, tmp_path):
    """Persisted deletes table variant, as production would run it."""
    path = str(tmp_path / "deletes2")
    deletes_index(engine.index.terms, 2).sortWithinPartitions(
        "del_key"
    ).write.parquet(path)
    spark = engine.index.docs.sparkSession
    persisted = spark.read.parquet(path)
    scan = engine.correct_query("merg summer", 2)
    probe = engine.correct_query_indexed("merg summer", 2, persisted)
    assert _rows(probe) == _rows(scan)


# ------------------------------------------------------------- trigram


def test_query_grams():
    assert query_grams("abcd") == ["abc", "bcd"]
    assert query_grams("ab") == []


@pytest.mark.parametrize("infix", ["erg", "ame", "ight", "zzz", "on"])
def test_contains_terms_equals_scan(engine, infix):
    scan = engine.index.terms.filter(
        F.col("term").contains(infix)
    ).select("term", "df")
    probe = contains_terms(engine.index.terms, infix)
    assert _rows(probe) == _rows(scan)


@pytest.mark.parametrize("infix", ["erg", "ight", "on"])
def test_match_contains_equals_regex(engine, infix):
    via_regex = engine.match_regex(re.escape(infix))
    via_trigram = engine.match_contains(infix)
    assert _rows(via_trigram) == _rows(via_regex)


def test_match_contains_with_persisted_grams(engine, tmp_path):
    path = str(tmp_path / "grams")
    trigram_index(engine.index.terms).sortWithinPartitions(
        "gram"
    ).write.parquet(path)
    spark = engine.index.docs.sparkSession
    grams = spark.read.parquet(path)
    assert _rows(engine.match_contains("erg", grams)) == _rows(
        engine.match_regex("erg")
    )
