"""Shard packing vs brute-force prefix sums on the sonnets corpus."""

import pytest

from tsidx.pack import pack_shards


@pytest.fixture(scope="module")
def docs(spark, sonnets):
    return spark.createDataFrame(
        list(enumerate(sonnets)), "doc_id long, text string"
    )


def _brute(sonnets, budget):
    out, run = {}, 0
    for d, text in enumerate(sonnets):
        n = len(text.strip().split())
        out[d] = (n, run // budget)
        run += n
    return out


@pytest.mark.parametrize("budget", [50, 500, 10_000, 10_000_000])
def test_pack_matches_bruteforce(docs, sonnets, budget):
    got = {
        r["doc_id"]: (r["n_tokens"], r["shard_id"])
        for r in pack_shards(docs, budget).collect()
    }
    assert got == _brute(sonnets, budget)


def test_pack_deterministic_across_partitioning(docs, sonnets):
    a = {
        r["doc_id"]: r["shard_id"]
        for r in pack_shards(docs, 300, num_partitions=1).collect()
    }
    b = {
        r["doc_id"]: r["shard_id"]
        for r in pack_shards(docs, 300, num_partitions=7).collect()
    }
    assert a == b == {d: s for d, (_n, s) in _brute(sonnets, 300).items()}


def test_pack_shard_invariants(docs, sonnets):
    budget = 400
    rows = sorted(
        pack_shards(docs, budget).collect(), key=lambda r: r["doc_id"]
    )
    max_doc = max(r["n_tokens"] for r in rows)
    totals: dict[int, int] = {}
    last = 0
    for r in rows:
        assert r["shard_id"] >= last  # contiguous, non-decreasing
        last = r["shard_id"]
        totals[r["shard_id"]] = totals.get(r["shard_id"], 0) + r["n_tokens"]
    for sid, tot in totals.items():
        assert tot < budget + max_doc, sid


def test_pack_bad_budget(docs):
    with pytest.raises(ValueError):
        pack_shards(docs, 0)


def test_shuffled_positions_matches_single_node(docs, sonnets):
    import hashlib

    from tsidx.pack import shuffled_positions

    keys = {
        d: hashlib.md5(f"42:{d}".encode()).hexdigest()
        for d in range(len(sonnets))
    }
    expected = {
        d: pos for pos, d in enumerate(sorted(keys, key=keys.get))
    }
    got = {
        r["doc_id"]: (r["position"], r["shuffle_key"])
        for r in shuffled_positions(docs, 42).collect()
    }
    assert len(got) == len(sonnets)
    for d, (pos, key) in got.items():
        assert key == keys[d]
        assert pos == expected[d], (d, pos, expected[d])


def test_shuffled_positions_partitioning_invariant(docs):
    from tsidx.pack import shuffled_positions

    a = {
        r["doc_id"]: r["position"]
        for r in shuffled_positions(docs, 7, num_partitions=3).collect()
    }
    b = {
        r["doc_id"]: r["position"]
        for r in shuffled_positions(
            docs.repartition(11), 7, num_partitions=13
        ).collect()
    }
    assert a == b
    assert sorted(a.values()) == list(range(len(a)))


# ---------------------------------------------------------------------------
# length_bucketed_batches
# ---------------------------------------------------------------------------


def _brute_bucketed(texts_by_id, budget):
    bands = {}
    for d in sorted(texts_by_id):
        n = len(texts_by_id[d].strip().split())
        band = max(n, 1).bit_length() - 1
        bands.setdefault(band, []).append((d, n))
    out = {}
    for band, rows in bands.items():
        run = 0
        for d, n in rows:  # doc_id order within band
            out[d] = (n, band, band * (1 << 40) + run // budget)
            run += n
    return out


@pytest.mark.parametrize("budget", [30, 200, 10_000])
def test_length_bucketed_matches_bruteforce(docs, sonnets, budget):
    from tsidx.pack import length_bucketed_batches

    got = {
        r["doc_id"]: (r["n_tokens"], r["band"], r["batch_id"])
        for r in length_bucketed_batches(docs, budget).collect()
    }
    assert got == _brute_bucketed(dict(enumerate(sonnets)), budget)


def test_length_bucketed_bounds_padding(spark):
    """The point of banding: within any batch, max/min doc length < 2x,
    so padding waste is bounded by construction."""
    import random

    from tsidx.pack import length_bucketed_batches

    rng = random.Random(13)
    docs = [
        (i, " ".join("w" for _ in range(rng.randint(1, 300))))
        for i in range(400)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = length_bucketed_batches(df, 256).collect()
    by_batch = {}
    for r in rows:
        by_batch.setdefault(r["batch_id"], []).append(r["n_tokens"])
    assert len(rows) == 400
    for b, lens in by_batch.items():
        assert max(lens) < 2 * max(min(lens), 1), (b, lens)


def test_length_bucketed_partitioning_invariant(docs, spark):
    from tsidx.pack import length_bucketed_batches

    a = {
        (r["doc_id"], r["batch_id"])
        for r in length_bucketed_batches(docs, 100, num_partitions=2).collect()
    }
    b = {
        (r["doc_id"], r["batch_id"])
        for r in length_bucketed_batches(
            docs.repartition(13), 100, num_partitions=7
        ).collect()
    }
    assert a == b


def test_length_bucketed_bad_budget(docs):
    from tsidx.pack import length_bucketed_batches

    with pytest.raises(ValueError):
        length_bucketed_batches(docs, 0)
