"""profile_columns: hand-computed profile plus null/distinct edge cases."""

import pytest

from tsidx.profile import profile_columns


@pytest.fixture
def frame(spark):
    return spark.createDataFrame(
        [
            (1, "aa", None),
            (2, "b", 1.5),
            (3, "aa", 2.5),
            (4, None, None),
        ],
        "id long, s string, x double",
    )


def test_profile_hand_computed(frame):
    rows = {r["column"]: r for r in profile_columns(frame).collect()}
    assert set(rows) == {"id", "s", "x"}
    for r in rows.values():
        assert r["n_rows"] == 4

    rid = rows["id"]
    assert (rid["n_null"], rid["n_distinct"]) == (0, 4)
    assert (rid["min_val"], rid["max_val"]) == ("1", "4")
    assert rid["avg_len"] == 1.0

    rs = rows["s"]
    assert (rs["n_null"], rs["n_distinct"]) == (1, 2)
    assert (rs["min_val"], rs["max_val"]) == ("aa", "b")
    assert rs["avg_len"] == pytest.approx((2 + 1 + 2) / 3, abs=1e-4)

    rx = rows["x"]
    assert (rx["n_null"], rx["n_distinct"]) == (2, 2)
    assert (rx["min_val"], rx["max_val"]) == ("1.5", "2.5")


def test_profile_subset_and_approx(frame):
    out = profile_columns(frame, ["s"], exact_distinct=False).collect()
    assert len(out) == 1 and out[0]["column"] == "s"
    # HLL over 2 values is exact
    assert out[0]["n_distinct"] == 2


def test_profile_all_null_column(spark):
    df = spark.createDataFrame([(1, None), (2, None)], "id long, v string")
    (r,) = [x for x in profile_columns(df).collect() if x["column"] == "v"]
    assert (r["n_null"], r["n_distinct"]) == (2, 0)
    assert r["min_val"] is None and r["max_val"] is None and r["avg_len"] is None


def test_profile_unknown_column_raises(frame):
    with pytest.raises(ValueError):
        profile_columns(frame, ["nope"])


def test_numeric_histogram(spark):
    from tsidx.profile import numeric_histogram

    df = spark.createDataFrame(
        [(0,), (1,), (9,), (10,), (25,), (None,)], "x int"
    )
    got = {
        r["bin"]: (r["lo"], r["hi"], r["n"])
        for r in numeric_histogram(df, "x", 10).collect()
    }
    assert got == {
        0: (0.0, 10.0, 3),
        1: (10.0, 20.0, 1),
        2: (20.0, 30.0, 1),
    }
    # negative values and a shifted origin
    df2 = spark.createDataFrame([(-5,), (-1,), (4,)], "x int")
    got2 = {
        r["bin"]: r["n"] for r in numeric_histogram(df2, "x", 5, origin=-5).collect()
    }
    assert got2 == {0: 2, 1: 1}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        numeric_histogram(df, "x", 0)
