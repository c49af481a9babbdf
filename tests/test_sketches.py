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
