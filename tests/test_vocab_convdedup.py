"""vocab_coverage vs a pure-Python oracle; conversation-level fingerprint
dedup semantics (order sensitivity, per-turn-dedup blindness)."""

from __future__ import annotations

from collections import Counter

import pytest

from tsidx.build import build_index
from tsidx.dedup import (
    conversation_dup_groups,
    conversation_fingerprint,
    conversation_minhash,
    conversation_text,
)
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


def test_conversation_text_order(spark):
    rows = [
        ("c0", 1, "world"), ("c0", 0, "hello"), ("c0", 2, "again"),
        ("c1", 0, "solo"),
    ]
    got = {
        r["conv_id"]: r["text"]
        for r in conversation_text(_tx(spark, rows)).collect()
    }
    assert got == {"c0": "hello world again", "c1": "solo"}


def test_conversation_minhash_near_dup(spark):
    # c0 and c1 replay the same long dialogue with one edited token near
    # the end; c2 is unrelated. Near-dup: most minhashes agree for c0/c1.
    base = [
        "the merge window starts after the third batch completes",
        "we should sort the table by key before the join runs",
        "stream the output into a new partition every minute",
    ]
    rows = []
    for i, t in enumerate(base):
        rows.append(("c0", i, t))
        rows.append(("c1", i, t if i < 2 else t.replace("minute", "hour")))
        rows.append(("c2", i, f"totally different content line {i} zz qq"))
    sigs = {
        r["conv_id"]: list(r["sig"])
        for r in conversation_minhash(_tx(spark, rows), num_hashes=32).collect()
    }
    agree01 = sum(a == b for a, b in zip(sigs["c0"], sigs["c1"]))
    agree02 = sum(a == b for a, b in zip(sigs["c0"], sigs["c2"]))
    assert agree01 >= 20      # near-dup: high signature agreement
    assert agree02 <= 5       # unrelated: near-zero agreement
    # exact fingerprint misses this near-dup (the edit changes the hash)
    fps = {
        r["conv_id"]: r["fp"]
        for r in conversation_fingerprint(_tx(spark, rows)).collect()
    }
    assert fps["c0"] != fps["c1"]


def test_conversation_minhash_matches_doc_minhash_on_concat(spark):
    """conv-level MinHash == document MinHash of the concatenated text."""
    from tsidx.dedup import minhash_signatures

    rows = [("c0", 0, "one two three four"), ("c0", 1, "five six seven"),
            ("c1", 0, "alpha beta gamma delta epsilon")]
    conv_sigs = {
        r["conv_id"]: list(r["sig"])
        for r in conversation_minhash(_tx(spark, rows), num_hashes=8).collect()
    }
    concat = spark.createDataFrame(
        [("c0", "one two three four five six seven"),
         ("c1", "alpha beta gamma delta epsilon")],
        "conv_id string, text string",
    )
    doc_sigs = {
        r["doc_id"]: list(r["sig"])
        for r in minhash_signatures(concat, num_hashes=8, id_col="conv_id").collect()
    }
    assert conv_sigs == doc_sigs


def test_trending_terms(spark):
    import datetime

    from tsidx.sessions import trending_terms

    UTC = datetime.timezone.utc
    t0 = datetime.datetime(2026, 1, 1, tzinfo=UTC)

    def at(minutes):
        return t0 + datetime.timedelta(minutes=minutes)

    rows = [
        ("c0", 0, "u", "alpha beta alpha", "", at(0)),     # hour 0
        ("c0", 1, "u", "alpha gamma", "", at(10)),          # hour 0
        ("c1", 0, "u", "beta beta delta", "", at(20)),      # hour 0
        ("c2", 0, "u", "delta delta delta", "", at(70)),    # hour 1
        ("c2", 1, "u", "epsilon", "", at(80)),              # hour 1
    ]
    tx = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    got = [
        (r["bucket_epoch"], r["rank"], r["term"], r["n_docs"])
        for r in trending_terms(tx, "hour", top_n=2)
        .orderBy("bucket_epoch", "rank")
        .collect()
    ]
    e0 = int(t0.timestamp())
    # hour 0: alpha in 2 turns, beta in 2 turns (tie -> alphabetical)
    assert got[0] == (e0, 1, "alpha", 2)
    assert got[1] == (e0, 2, "beta", 2)
    # hour 1: delta and epsilon 1 turn each (array_distinct: counts turns)
    assert got[2] == (e0 + 3600, 1, "delta", 1)
    assert got[3] == (e0 + 3600, 2, "epsilon", 1)
