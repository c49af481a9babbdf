"""Repeated-span detection / removal (substring dedup, Lee et al. 2021)."""

from __future__ import annotations

import pytest

from tsidx.spans import gram_positions, repeated_spans, strip_repeated_spans

# docs 0 and 1 share the 4-token run "p q r s"; doc 2 repeats its own
# trigram "u v w" twice (within-doc duplication counts); doc 3 is clean;
# doc 4 is shorter than the window.
CORPUS = [
    (0, "a b p q r s c d"),
    (1, "x p q r s y z w2"),
    (2, "u v w k u v w m n"),
    (3, "one two three four five six seven"),
    (4, "ti ny"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string").cache()


def test_gram_positions_multiplicity(docs):
    rows = gram_positions(docs.where("doc_id = 2"), n=3).collect()
    assert len(rows) == 7  # 9 tokens -> 7 windows, repeats kept
    assert sorted(r["pos"] for r in rows) == [1, 2, 3, 4, 5, 6, 7]


def test_gram_positions_short_doc(docs):
    assert gram_positions(docs.where("doc_id = 4"), n=3).count() == 0


def test_repeated_spans_cross_doc(docs):
    got = {
        (r["doc_id"], r["span_start"]): (r["span_end"], r["n_grams"])
        for r in repeated_spans(docs, n=3, min_count=2).collect()
    }
    # "p q r s" in doc 0 at tokens 3-6: windows start at 3 and 4 -> one span
    assert got[(0, 3)] == (6, 2)
    # same run in doc 1 at tokens 2-5
    assert got[(1, 2)] == (5, 2)
    # doc 2: "u v w" at 1-3 and 5-7 — non-contiguous (gap at 4) -> two spans
    assert got[(2, 1)] == (3, 1)
    assert got[(2, 5)] == (7, 1)
    assert not any(d in (3, 4) for d, _ in got)


def test_strip_repeated_spans(docs):
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in strip_repeated_spans(docs, n=3, min_count=2).collect()
    }
    assert got[0] == ("a b c d", 4)
    assert got[1] == ("x y z w2", 4)
    assert got[2] == ("k m n", 6)
    assert got[3] == ("one two three four five six seven", 0)
    assert got[4] == ("ti ny", 0)


def test_whole_doc_removed(spark):
    # two identical docs shorter than 2 windows: everything stripped
    docs = spark.createDataFrame(
        [(0, "s1 s2 s3"), (1, "s1 s2 s3")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in strip_repeated_spans(docs, n=3, min_count=2).collect()
    }
    assert got[0] == ("", 3) and got[1] == ("", 3)


def test_min_count_three(docs):
    # raising min_count to 3 drops the cross-doc pair (2 occurrences)
    spans = repeated_spans(docs, n=3, min_count=3).collect()
    assert spans == []


def test_no_cartesian_and_exchange_reuse(docs):
    plan = (
        repeated_spans(docs, n=3, min_count=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_strategies_bit_identical(docs):
    """window and rejoin flagging produce identical span tables."""
    from tsidx.spans import repeated_spans

    a = sorted(
        tuple(r)
        for r in repeated_spans(docs, n=3, min_count=2, strategy="window").collect()
    )
    b = sorted(
        tuple(r)
        for r in repeated_spans(docs, n=3, min_count=2, strategy="rejoin").collect()
    )
    assert a == b and len(a) > 0


def test_unknown_strategy_rejected(docs):
    import pytest as _pytest

    from tsidx.spans import repeated_spans

    with _pytest.raises(ValueError):
        repeated_spans(docs, n=3, strategy="nope")


def test_chain_expr_matches_per_step_pmod(spark):
    """The deferred-modulo element_at chain is congruent to the per-step
    pmod fold for every n (including past the 6-step deferral boundary)
    and for both multipliers."""
    import random

    from tsidx.spans import _P31, _chain_expr

    rng = random.Random(7)
    toks = [rng.randrange(_P31) for _ in range(40)]
    df = spark.createDataFrame([(toks,)], "_th1 array<bigint>")
    for n in (1, 2, 5, 6, 7, 12, 13, 20):
        for mult in (31, 37):
            got = df.selectExpr(
                f"transform(sequence(1, {len(toks) - n + 1}),"
                f" i -> {_chain_expr('_th1', n, mult)}) AS h"
            ).collect()[0]["h"]
            want = []
            for i in range(len(toks) - n + 1):
                acc = 0
                for j in range(n):
                    acc = (acc * mult + toks[i + j]) % _P31
                want.append(acc)
            assert got == want, (n, mult)
