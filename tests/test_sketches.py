"""Heavy hitters (tsidx/sketches.py): the MG superset guarantee and the
exactness of the two-pass plan vs a brute-force count, across
partitionings."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from tsidx.sketches import heavy_hitters, mg_candidates


def _rows():
    # Zipf-ish: 'a' 300x, 'b' 120x, 'c' 60x, then a 400-item long tail
    out = ["a"] * 300 + ["b"] * 120 + ["c"] * 60
    out += [f"t{i}" for i in range(400)]
    # deterministic interleave so partitions see mixed traffic
    out = [out[(i * 37) % len(out)] for i in range(len(out))]
    return [(i, v) for i, v in enumerate(out)]


def _brute(phi):
    c = Counter(v for _, v in _rows())
    n = sum(c.values())
    th = math.ceil(phi * n)
    return {v: cnt for v, cnt in c.items() if cnt >= th}


@pytest.mark.parametrize("parts", [1, 3, 16])
@pytest.mark.parametrize("phi", [0.05, 0.1, 0.3])
def test_heavy_hitters_exact_any_partitioning(spark, parts, phi):
    df = spark.createDataFrame(_rows(), "id long, v string").repartition(parts)
    got = {r["value"]: r["cnt"] for r in heavy_hitters(df, "v", phi).collect()}
    assert got == _brute(phi), (parts, phi)


def test_mg_candidates_superset_guarantee(spark):
    df = spark.createDataFrame(_rows(), "id long, v string").repartition(8)
    phi = 0.05
    k = math.ceil(1 / phi)
    cand = {r["value"] for r in mg_candidates(df, "v", k).collect()}
    assert set(_brute(phi)) <= cand
    # and the candidate set stays small: <= k per partition
    assert len(cand) <= k * 8


def test_heavy_hitters_nulls_ignored(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, None), (3, "x"), (4, "y")], "id long, v string"
    )
    got = {r["value"]: r["cnt"] for r in heavy_hitters(df, "v", 0.5).collect()}
    assert got == {"x": 2}  # N = 3 non-null, threshold = 2


def test_heavy_hitters_phi_one(spark):
    df = spark.createDataFrame([(1, "z"), (2, "z")], "id long, v string")
    got = {r["value"]: r["cnt"] for r in heavy_hitters(df, "v", 1.0).collect()}
    assert got == {"z": 2}


# ------------------------------------------------------------ Count-Min


def test_cms_never_undercounts_and_is_tight_when_wide(spark):
    from tsidx.sketches import cms_counts, cms_estimates

    rows = [(i, v) for i, v in enumerate(
        ["a"] * 50 + ["b"] * 20 + [f"t{i}" for i in range(30)]
    )]
    df = spark.createDataFrame(rows, "id long, v string")
    true = {"a": 50, "b": 20, "t0": 1, "absent": 0}
    # narrow sketch: one-sided guarantee only
    sk = cms_counts(df, "v", depth=3, width=8)
    est = {
        r["value"]: r["est"]
        for r in cms_estimates(sk, list(true), depth=3, width=8).collect()
    }
    for v, t in true.items():
        assert est[v] >= t, v
    # wide sketch: collisions vanish, estimates exact
    skw = cms_counts(df, "v", depth=4, width=4096)
    estw = {
        r["value"]: r["est"]
        for r in cms_estimates(skw, list(true), depth=4, width=4096).collect()
    }
    assert estw == true


def test_cms_sketches_merge_cellwise(spark):
    """CMS(a ∪ b) == cell-wise sum of CMS(a) and CMS(b) — the mergeable
    property that makes incremental batches fold in."""
    from pyspark.sql import functions as F

    from tsidx.sketches import cms_counts

    a = spark.createDataFrame(
        [(i, f"x{i % 7}") for i in range(40)], "id long, v string"
    )
    b = spark.createDataFrame(
        [(i, f"x{i % 5}") for i in range(30)], "id long, v string"
    )
    whole = {
        (r["d"], r["bucket"]): r["cnt"]
        for r in cms_counts(a.unionByName(b), "v", depth=3, width=16).collect()
    }
    merged = (
        cms_counts(a, "v", depth=3, width=16)
        .unionByName(cms_counts(b, "v", depth=3, width=16))
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    got = {(r["d"], r["bucket"]): r["cnt"] for r in merged.collect()}
    assert got == whole


# ------------------------------------------------- sampled fast path


def test_heavy_hitters_fast_matches_brute(spark):
    from tsidx.sketches import heavy_hitters_fast

    df = spark.createDataFrame(_rows(), "id long, v string")
    for phi in (0.05, 0.1, 0.3):
        got = {
            r["value"]: r["cnt"]
            for r in heavy_hitters_fast(
                df, "v", phi, ["id"], mod=2, safety=4
            ).collect()
        }
        assert got == _brute(phi), phi


@pytest.mark.parametrize("parts", [1, 3, 16])
def test_heavy_hitters_fast_partitioning_invariant(spark, parts):
    """The sample is a pure hash of (id_cols, value) — candidates and
    output are identical for every physical partitioning."""
    from tsidx.sketches import heavy_hitters_fast, sampled_candidates

    df = spark.createDataFrame(_rows(), "id long, v string").repartition(parts)
    cand = sorted(
        r["value"]
        for r in sampled_candidates(df, "v", 0.1, ["id"], mod=2).collect()
    )
    base = spark.createDataFrame(_rows(), "id long, v string").coalesce(1)
    cand1 = sorted(
        r["value"]
        for r in sampled_candidates(base, "v", 0.1, ["id"], mod=2).collect()
    )
    assert cand == cand1  # not just the output — the intermediate too
    got = {
        r["value"]: r["cnt"]
        for r in heavy_hitters_fast(df, "v", 0.1, ["id"], mod=2).collect()
    }
    assert got == _brute(0.1)


def test_sampled_candidates_bounded(spark):
    """The candidate count can never exceed ~safety/phi + slack, no
    matter the distinct cardinality (here: every value unique)."""
    from tsidx.sketches import sampled_candidates

    rows = [(i, f"u{i}") for i in range(5000)]
    df = spark.createDataFrame(rows, "id long, v string")
    phi, mod, safety = 0.01, 4, 4
    n = sampled_candidates(df, "v", phi, ["id"], mod=mod, safety=safety).count()
    # t_s = floor(phi*N/(mod*safety)) = floor(50/16) = 3; sampled rows
    # ~N/mod = 1250; hard bound = 1250/3
    assert n <= (5000 / mod) / max(1, int(phi * 5000 / (mod * safety)))


def test_heavy_hitters_fast_no_false_positives(spark):
    """Even with a degenerate sample (mod so large nothing samples),
    the exact-recount filter admits nothing below ceil(phi*N)."""
    from tsidx.sketches import heavy_hitters_fast

    df = spark.createDataFrame(_rows(), "id long, v string")
    got = {
        r["value"]: r["cnt"]
        for r in heavy_hitters_fast(df, "v", 0.05, ["id"], mod=1).collect()
    }
    assert got == _brute(0.05)  # mod=1 samples everything -> exact
