"""docID assignment: the scale path (range partitions + prefix-sum offsets)
must realize exactly the same total order as the global window."""

from pyspark.sql import functions as F

from tsidx.docids import assign_doc_ids, check_unique_keys

import pytest


def test_prefix_sum_equals_window(spark, sonnets_transcripts):
    a = assign_doc_ids(sonnets_transcripts, method="prefix_sum", num_partitions=7)
    b = assign_doc_ids(sonnets_transcripts, method="window")
    ar = {(r["conv_id"], r["turn_idx"]): r["doc_id"] for r in a.collect()}
    br = {(r["conv_id"], r["turn_idx"]): r["doc_id"] for r in b.collect()}
    assert ar == br
    assert sorted(ar.values()) == list(range(154))


def test_prefix_sum_dense_and_deterministic(spark, sonnets_transcripts):
    a1 = assign_doc_ids(sonnets_transcripts, method="prefix_sum", num_partitions=5)
    a2 = assign_doc_ids(sonnets_transcripts, method="prefix_sum", num_partitions=11)
    r1 = sorted((r["conv_id"], r["turn_idx"], r["doc_id"]) for r in a1.collect())
    r2 = sorted((r["conv_id"], r["turn_idx"], r["doc_id"]) for r in a2.collect())
    # docIDs are a pure function of the input table, not of the partitioning
    assert r1 == r2


def test_duplicate_keys_rejected(spark):
    df = spark.createDataFrame(
        [("c1", 0, "x"), ("c1", 0, "y")], "conv_id string, turn_idx int, text string"
    )
    with pytest.raises(ValueError, match="duplicate"):
        check_unique_keys(df, ("conv_id", "turn_idx"))


def test_conv_offset_equals_window(spark, sonnets_transcripts):
    a = assign_doc_ids(sonnets_transcripts, method="conv_offset", num_partitions=7)
    b = assign_doc_ids(sonnets_transcripts, method="window")
    ar = {(r["conv_id"], r["turn_idx"]): r["doc_id"] for r in a.collect()}
    br = {(r["conv_id"], r["turn_idx"]): r["doc_id"] for r in b.collect()}
    assert ar == br


def test_conv_offset_return_count(spark, sonnets_transcripts):
    df, n = assign_doc_ids(
        sonnets_transcripts, method="conv_offset", return_count=True
    )
    assert n == 154
    assert sorted(r["doc_id"] for r in df.collect()) == list(range(154))


def test_conv_offset_falls_back_when_not_dense(spark):
    # turn_idx gaps (0, 2) -> density check fails -> prefix_sum fallback,
    # which realizes lexicographic (conv_id, turn_idx) order regardless
    rows = [("a", 0, "x"), ("a", 2, "y"), ("b", 0, "z")]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    got = {
        (r["conv_id"], r["turn_idx"]): r["doc_id"]
        for r in assign_doc_ids(df, method="conv_offset").collect()
    }
    assert got == {("a", 0): 0, ("a", 2): 1, ("b", 0): 2}


def test_conv_offset_broadcast_cutoff_both_ways(spark, sonnets_transcripts, monkeypatch):
    """The broadcast decision is byte-estimated; both sides of the cutoff
    (broadcast join vs shuffle join) must assign identical ids."""
    import tsidx.docids as d

    want = {
        (r["conv_id"], r["turn_idx"]): r["doc_id"]
        for r in assign_doc_ids(sonnets_transcripts, method="window").collect()
    }
    for cutoff in (0, 64 << 20):  # 0 bytes -> never broadcast; big -> always
        monkeypatch.setattr(d, "BROADCAST_OFFSETS_MAX_BYTES", cutoff)
        got = {
            (r["conv_id"], r["turn_idx"]): r["doc_id"]
            for r in assign_doc_ids(
                sonnets_transcripts, method="conv_offset", num_partitions=7
            ).collect()
        }
        assert got == want, f"cutoff={cutoff}"
