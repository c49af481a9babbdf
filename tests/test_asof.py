"""As-of join tests: hand-computed cases plus a randomized differential
test against pandas.merge_asof (the single-node reference semantics)."""

import datetime

import numpy as np
import pandas as pd
import pytest

from tsidx.asof import asof_join

L_SCHEMA = "k long, ts timestamp, lv string"
R_SCHEMA = "k long, ts timestamp, rv string"


def _t(s):
    return datetime.datetime(2026, 5, 1, 0, 0, s, tzinfo=datetime.timezone.utc)


@pytest.fixture
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, _t(10), "a"),
            (1, _t(20), "b"),
            (1, _t(5), "c"),  # before any right row
            (2, _t(10), "d"),  # key with no right rows at all
        ],
        L_SCHEMA,
    )
    right = spark.createDataFrame(
        [
            (1, _t(8), "r8"),
            (1, _t(10), "r10"),  # exactly equal ts -> visible to left@10
            (1, _t(15), "r15"),
        ],
        R_SCHEMA,
    )
    return left, right


def test_backward_hand_computed(frames):
    left, right = frames
    got = {
        r["lv"]: (r["rv_r"], r["ts_r"] and r["ts_r"].second)
        for r in asof_join(left, right, "k").collect()
    }
    assert got == {
        "a": ("r10", 10),  # equal ts matches
        "b": ("r15", 15),
        "c": (None, None),
        "d": (None, None),
    }


def test_forward_hand_computed(frames):
    left, right = frames
    got = {
        r["lv"]: r["rv_r"]
        for r in asof_join(left, right, "k", direction="forward").collect()
    }
    assert got == {"a": "r10", "b": None, "c": "r8", "d": None}


def test_tolerance_nulls_distant_matches(frames):
    left, right = frames
    got = {
        r["lv"]: r["rv_r"]
        for r in asof_join(left, right, "k", tolerance_s=4).collect()
    }
    # b@20 matched r15 (gap 5 s) -> nulled; a@10 matched r10 (gap 0) kept
    assert got == {"a": "r10", "b": None, "c": None, "d": None}


def test_differential_vs_pandas_merge_asof(spark):
    rng = np.random.default_rng(7)
    n_l, n_r, n_keys = 400, 300, 9
    # unique timestamps per side avoid tie-resolution ambiguity
    lts = rng.choice(200_000, size=n_l, replace=False)
    rts = rng.choice(200_000, size=n_r, replace=False)
    base = 1_767_225_600
    lpd = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_l),
            "ts": pd.to_datetime(base + lts, unit="s", utc=True),
            "lv": np.arange(n_l),
        }
    )
    rpd = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_r),
            "ts": pd.to_datetime(base + rts, unit="s", utc=True),
            "rv": np.arange(n_r),
        }
    )
    exp = pd.merge_asof(
        lpd.sort_values("ts"),
        rpd.sort_values("ts"),
        on="ts",
        by="k",
        direction="backward",
    )
    expected = dict(zip(exp["lv"], exp["rv"]))

    left = spark.createDataFrame(lpd, "k long, ts timestamp, lv long")
    right = spark.createDataFrame(rpd, "k long, ts timestamp, rv long")
    got = {
        r["lv"]: r["rv_r"] for r in asof_join(left, right, "k").collect()
    }
    assert len(got) == n_l
    for lv, rv in expected.items():
        want = None if pd.isna(rv) else int(rv)
        assert got[lv] == want, (lv, got[lv], want)


def test_equal_ts_right_ties_resolve_to_greatest_payload(spark):
    left = spark.createDataFrame([(1, _t(10), "a")], L_SCHEMA)
    right = spark.createDataFrame(
        [(1, _t(8), "x"), (1, _t(8), "y")], R_SCHEMA
    )
    (row,) = asof_join(left, right, "k").collect()
    assert row["rv_r"] == "y"  # deterministic: greatest struct wins


def test_interval_join_hand_computed(spark):
    points = spark.createDataFrame(
        [
            (1, _t(10), "p10"),
            (1, _t(30), "p30"),
            (1, _t(59), "p59"),
            (2, _t(30), "q30"),  # right key, interval only on key 1
        ],
        "k long, ts timestamp, pv string",
    )
    intervals = spark.createDataFrame(
        [
            (1, _t(10), _t(30), "i1"),  # [10, 30): p10 in, p30 out
            (1, _t(25), _t(59), "i2"),  # [25, 59): p30 in, p59 out
        ],
        "k long, start timestamp, end timestamp, iv string",
    )
    from tsidx.asof import interval_join

    got = {
        (r["pv"], r["iv"])
        for r in interval_join(points, intervals, "k", bucket_s=7).collect()
    }
    assert got == {("p10", "i1"), ("p30", "i2")}
    # closed end includes the boundary points
    got_inc = {
        (r["pv"], r["iv"])
        for r in interval_join(
            points, intervals, "k", bucket_s=7, inclusive_end=True
        ).collect()
    }
    assert got_inc == {("p10", "i1"), ("p30", "i1"), ("p30", "i2"), ("p59", "i2")}


def test_interval_join_differential_vs_brute_force(spark):
    rng = np.random.default_rng(11)
    n_p, n_i, n_keys = 300, 60, 5
    base = 1_767_225_600
    utc = datetime.timezone.utc

    def _dt(sec):
        return datetime.datetime.fromtimestamp(base + int(sec), tz=utc)

    pts = [
        (int(k), _dt(t), i)
        for i, (k, t) in enumerate(
            zip(rng.integers(0, n_keys, n_p), rng.integers(0, 5000, n_p))
        )
    ]
    ivs = []
    for j in range(n_i):
        s = int(rng.integers(0, 5000))
        e = s + int(rng.integers(1, 900))
        ivs.append((int(rng.integers(0, n_keys)), _dt(s), _dt(e), j))
    expected = {
        (pid, j)
        for (pk, pt, pid) in pts
        for (ik, s, e, j) in ivs
        if pk == ik and s <= pt < e
    }
    from tsidx.asof import interval_join

    points = spark.createDataFrame(pts, "k long, ts timestamp, pid long")
    intervals = spark.createDataFrame(
        ivs, "k long, start timestamp, end timestamp, j long"
    )
    got = {
        (r["pid"], r["j"])
        for r in interval_join(points, intervals, "k", bucket_s=120).collect()
    }
    assert got == expected


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("bucket_s", [1, 7, 1000, 10_000_000])
def test_bucketed_plan_bit_identical(spark, direction, bucket_s):
    """The hot-key split plan must equal the single-window plan exactly,
    for any bucket size (1 s buckets exercise the carry path heavily;
    the huge bucket collapses to one bucket per key)."""
    rng = np.random.default_rng(13)
    n_l, n_r, n_keys = 250, 200, 5
    base = 1_767_225_600
    lpd = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_l),
            "ts": pd.to_datetime(
                base + rng.integers(0, 3000, n_l), unit="s", utc=True
            ),
            "lv": np.arange(n_l),
        }
    )
    rpd = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_r),
            "ts": pd.to_datetime(
                base + rng.integers(0, 3000, n_r), unit="s", utc=True
            ),
            "rv": np.arange(n_r),
        }
    )
    left = spark.createDataFrame(lpd, "k long, ts timestamp, lv long")
    right = spark.createDataFrame(rpd, "k long, ts timestamp, rv long")
    plain = {
        r["lv"]: (r["rv_r"], r["ts_r"])
        for r in asof_join(left, right, "k", direction=direction).collect()
    }
    split = {
        r["lv"]: (r["rv_r"], r["ts_r"])
        for r in asof_join(
            left, right, "k", direction=direction, split_bucket_s=bucket_s
        ).collect()
    }
    assert split == plain


def test_bucketed_tolerance_and_ties(spark):
    left = spark.createDataFrame([(1, _t(10), "a")], L_SCHEMA)
    right = spark.createDataFrame(
        [(1, _t(8), "x"), (1, _t(8), "y"), (1, _t(2), "z")], R_SCHEMA
    )
    (row,) = asof_join(left, right, "k", split_bucket_s=3).collect()
    assert row["rv_r"] == "y"  # same greatest-payload tie rule
    (row,) = asof_join(
        left, right, "k", split_bucket_s=3, tolerance_s=1
    ).collect()
    assert row["rv_r"] is None
