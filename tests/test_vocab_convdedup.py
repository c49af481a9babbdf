"""vocab_coverage vs a pure-Python oracle; conversation-level fingerprint
dedup semantics (order sensitivity, per-turn-dedup blindness)."""

from __future__ import annotations

from collections import Counter

import pytest

from tsidx.build import build_index
from tsidx.dedup import conversation_dup_groups, conversation_fingerprint
from tsidx.porter2 import stem
from tsidx.prune import vocab_coverage


@pytest.fixture(scope="module")
def built(spark, sonnets_transcripts):
    return build_index(sonnets_transcripts, block_size=64, num_partitions=4)


def test_vocab_coverage_vs_python(built, sonnets):
    cf = Counter()
    total = 0
    for s in sonnets:
        for t in s.split():
            cf[stem(t)] += 1
            total += 1
    assert total == built.meta["total_tokens"]
    want = sorted(cf.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = vocab_coverage(built, 10).collect()
    run = 0
    for row, (term, c) in zip(got, want):
        run += c
        assert row["term"] == term
        assert row["cf"] == c
        assert row["coverage_r"] == round(run / total, 6)
    assert [r["rank"] for r in got] == list(range(1, 11))


def _tx(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string"
    )


def test_conv_fingerprint_order_sensitive(spark):
    rows = [
        ("c0", 0, "hello world"), ("c0", 1, "goodbye moon"),
        ("c1", 0, "hello world"), ("c1", 1, "goodbye moon"),   # dup of c0
        ("c2", 0, "goodbye moon"), ("c2", 1, "hello world"),   # permuted
        ("c3", 0, "hello world"),                              # prefix only
    ]
    fps = {r["conv_id"]: r["fp"] for r in conversation_fingerprint(_tx(spark, rows)).collect()}
    assert fps["c0"] == fps["c1"]
    assert fps["c0"] != fps["c2"]  # turn order matters
    assert fps["c0"] != fps["c3"]  # prefix is not the whole conversation


def test_conv_fingerprint_partition_invariant(spark):
    rows = [(f"c{i:03d}", j, f"turn {j} of conv {i % 5}") for i in range(40) for j in range(4)]
    a = {r["conv_id"]: r["fp"] for r in conversation_fingerprint(_tx(spark, rows)).collect()}
    b = {
        r["conv_id"]: r["fp"]
        for r in conversation_fingerprint(_tx(spark, rows).repartition(7)).collect()
    }
    assert a == b
    # convs with i % 5 equal replay identical text -> identical fp
    assert a["c000"] == a["c005"]
    assert a["c000"] != a["c001"]


def test_conv_dup_groups(spark):
    rows = [
        ("c0", 0, "same text"), ("c0", 1, "more text"),
        ("c1", 0, "same text"), ("c1", 1, "more text"),
        ("c2", 0, "unique here"),
    ]
    got = {r["conv_id"]: r for r in conversation_dup_groups(_tx(spark, rows)).collect()}
    assert got["c0"]["keep_id"] == "c0" and got["c0"]["n_dups"] == 2
    assert got["c1"]["keep_id"] == "c0"
    assert got["c2"]["keep_id"] == "c2" and got["c2"]["n_dups"] == 1
