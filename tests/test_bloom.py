"""Bloom semi-join reduction (tsidx/bloom.py): no false negatives ever,
bitmap determinism across partitionings, and exact equality of the
Bloom-planned overlap with the broadcast-planned one."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tsidx.bloom import (
    bloom_bitmap,
    bloom_params,
    bloom_prefilter,
    bloom_words,
    ngram_overlap_bloom,
)


def test_bloom_params():
    m, k = bloom_params(1000)
    assert m % 64 == 0 and m >= 10_000
    assert 1 <= k <= 8
    assert bloom_params(0)[0] >= 64  # degenerate floor


def test_no_false_negatives_and_low_fp(spark):
    members = spark.range(0, 500).select(
        F.xxhash64(F.col("id")).alias("key")
    )
    m, k = bloom_params(500)
    bitmap = bloom_bitmap(bloom_words(members, "key", m, k), m)
    # every member passes
    got = bloom_prefilter(members, "key", bitmap, m, k).count()
    assert got == 500
    # non-members leak only at ~fp rate
    others = spark.range(10_000, 20_000).select(
        F.xxhash64(F.col("id")).alias("key")
    )
    leaked = bloom_prefilter(others, "key", bitmap, m, k).count()
    assert leaked < 10_000 * 0.05  # 10 bits/key ~= 1% fp; 5x slack


@pytest.mark.parametrize("parts", [1, 7])
def test_bitmap_partitioning_invariant(spark, parts):
    members = (
        spark.range(0, 300)
        .select(F.xxhash64(F.col("id")).alias("key"))
        .repartition(parts)
    )
    m, k = bloom_params(300)
    arr = bloom_bitmap(bloom_words(members, "key", m, k), m).collect()[0][
        "_bloom_arr"
    ]
    base = bloom_bitmap(
        bloom_words(
            spark.range(0, 300).select(F.xxhash64(F.col("id")).alias("key")),
            "key", m, k,
        ),
        m,
    ).collect()[0]["_bloom_arr"]
    assert arr == base


def test_empty_member_set_rejects_everything(spark):
    empty = spark.range(0).select(F.xxhash64(F.col("id")).alias("key"))
    m, k = bloom_params(0)
    bitmap = bloom_bitmap(bloom_words(empty, "key", m, k), m)
    probe = spark.range(100).select(F.xxhash64(F.col("id")).alias("key"))
    assert bloom_prefilter(probe, "key", bitmap, m, k).count() == 0


def test_ngram_overlap_bloom_equals_broadcast_plan(spark):
    """The whole point: plan changes, answer must not — row-for-row
    equality with tsidx.decontam.ngram_overlap on a corpus with clean,
    partially- and fully-contaminated docs plus a too-short doc."""
    from tsidx.decontam import ngram_overlap

    bench = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog"),
         (1, "pack my box with five dozen liquor jugs")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog tonight"),
         (11, "completely unrelated text about spark plans and shuffles"),
         (12, "pack my box with five dozen liquor jugs"),
         (13, "tiny doc"),
         (14, "")],
        "doc_id long, text string",
    )
    want = sorted(
        tuple(r) for r in ngram_overlap(corpus, bench, n=3, tau=0.4).collect()
    )
    got = sorted(
        tuple(r)
        for r in ngram_overlap_bloom(corpus, bench, n=3, tau=0.4).collect()
    )
    assert got == want
    # sanity on the fixture itself: all three contamination classes occur
    by_id = {r[0]: r for r in got}
    assert by_id[12][4] is True  # fully contaminated
    assert by_id[11][2] == 0  # clean
    assert 0 < by_id[10][2] < by_id[10][1]  # partial
