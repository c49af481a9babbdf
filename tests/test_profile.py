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
