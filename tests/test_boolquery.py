"""Boolean query trees + prefix + filtered BM25 vs a pure-Python oracle
over the sonnets corpus (reference tokenization semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tsidx.boolquery import And, Not, Or, Term, parse_bool_query
from tsidx.build import build_index
from tsidx.porter2 import stem
from tsidx.query import QueryEngine


@pytest.fixture(scope="module")
def built(spark, sonnets_transcripts):
    return build_index(sonnets_transcripts, block_size=64, num_partitions=4)


@pytest.fixture(scope="module")
def engine(built):
    return QueryEngine(built)


@pytest.fixture(scope="module")
def doc_stems(sonnets):
    return [set(stem(t) for t in s.split()) for s in sonnets]


def py_eval(node, doc_stems):
    universe = set(range(len(doc_stems)))
    if isinstance(node, Term):
        s = stem(node.word)
        return {i for i, ts in enumerate(doc_stems) if s in ts}
    if isinstance(node, Or):
        out = set()
        for c in node.children:
            out |= py_eval(c, doc_stems)
        return out
    if isinstance(node, And):
        out = universe
        for c in node.children:
            out &= py_eval(c, doc_stems)
        return out
    if isinstance(node, Not):
        return universe - py_eval(node.child, doc_stems)
    raise TypeError(node)


# ---------------------------------------------------------------- parser


def test_parser_shapes():
    assert parse_bool_query("fire") == Term("fire")
    assert parse_bool_query("fire heat") == And((Term("fire"), Term("heat")))
    assert parse_bool_query("fire AND heat") == And((Term("fire"), Term("heat")))
    assert parse_bool_query("fire OR heat") == Or((Term("fire"), Term("heat")))
    assert parse_bool_query("fire -heat") == And((Term("fire"), Not(Term("heat"))))
    assert parse_bool_query("NOT fire") == Not(Term("fire"))
    assert parse_bool_query("a AND (b OR c) NOT d") == And(
        (Term("a"), Or((Term("b"), Term("c"))), Not(Term("d")))
    )
    # OR binds looser than adjacency-AND
    assert parse_bool_query("a b OR c") == Or((And((Term("a"), Term("b"))), Term("c")))


@pytest.mark.parametrize("bad", ["(fire", "fire)", "AND", "fire AND", "fire AND)"])
def test_parser_rejects(bad):
    with pytest.raises(ValueError):
        parse_bool_query(bad)


# ---------------------------------------------------------------- evaluator


BOOL_QUERIES = [
    "fire",
    "fire heat",
    "fire OR heat",
    "fire -heat",
    "love AND (fire OR heat)",
    "love NOT (fire OR heat)",
    "(thrall OR quench) AND sonnet",
    "NOT love",
    "NOT (love OR time OR sonnet)",
    "love OR NOT love",
    "zzzunknown OR fire",
    "zzzunknown AND fire",
]


@pytest.mark.parametrize("query", BOOL_QUERIES)
def test_boolean_vs_python_oracle(engine, doc_stems, query):
    node = parse_bool_query(query)
    exp = sorted(py_eval(node, doc_stems))
    got = [r["doc_id"] for r in engine.search(query).collect()]
    assert got == exp, query


@pytest.mark.parametrize(
    "query", ["fire -heat", "love AND (fire OR heat)", "(a OR fire) AND NOT heat"]
)
def test_anchored_and_join_evaluators_agree(engine, query):
    from tsidx.boolquery import BooleanEngine, _anchored, parse_bool_query

    node = parse_bool_query(query)
    assert _anchored(node)
    be = BooleanEngine(engine)
    fast = [r["doc_id"] for r in be._search_anchored(node).orderBy("doc_id").collect()]
    slow = [r["doc_id"] for r in be._eval(node).orderBy("doc_id").collect()]
    assert fast == slow


def test_or_matches_reference_match(engine, doc_stems):
    """A pure-OR tree must agree with the reference-semantics match()."""
    got = [r["doc_id"] for r in engine.search("fire OR heat").collect()]
    ref = [r["doc_id"] for r in engine.match("fire heat").collect()]
    assert got == ref


# ---------------------------------------------------------------- prefix


def test_match_prefix(engine, sonnets):
    got = [r["doc_id"] for r in engine.match_prefix("quench").collect()]
    exp = sorted(
        i
        for i, s in enumerate(sonnets)
        if any(stem(t).startswith("quench") for t in s.split())
    )
    assert got == exp
    assert engine.match_prefix("zzz").count() == 0


# ---------------------------------------------------------------- filtered


def test_bm25_topk_per_group(engine, built):
    """Per-group top-k == a pure-Python window over the exact scores."""
    q = "fire heat love"
    k = 2
    groups = {
        r["doc_id"]: r["conv_id"] for r in built.docs.select("doc_id", "conv_id").collect()
    }
    all_scores = {
        r["doc_id"]: r["score"] for r in engine.bm25_scores(q).collect()
    }
    by_group: dict = {}
    for d, s in all_scores.items():
        by_group.setdefault(groups[d], []).append((d, s))
    exp = set()
    for g, ds in by_group.items():
        for d, s in sorted(ds, key=lambda x: (-x[1], x[0]))[:k]:
            exp.add((g, d, s))
    got = {
        (r["conv_id"], r["doc_id"], r["score"])
        for r in engine.bm25_topk_per_group(q, k, "conv_id").collect()
    }
    assert got == exp


def test_bm25_topk_where(engine, built):
    """Filtered top-k == unfiltered scores restricted to qualifying docs."""
    pred = F.col("doc_id") % 2 == 0
    got = engine.bm25_topk_where("fire heat love", 10, pred).collect()
    all_scores = {
        r["doc_id"]: r["score"] for r in engine.bm25_scores("fire heat love").collect()
    }
    exp = sorted(
        ((d, s) for d, s in all_scores.items() if d % 2 == 0),
        key=lambda x: (-x[1], x[0]),
    )[:10]
    assert [(r["doc_id"], r["score"]) for r in got] == exp


def test_match_latest_orders_by_ts(spark, sonnets_transcripts):
    """match_latest returns the highest-ts matching turns, newest first."""
    from pyspark.sql import functions as F

    from tsidx.build import build_index
    from tsidx.query import QueryEngine

    with_ts = sonnets_transcripts.withColumn(
        "ts",
        F.to_timestamp(F.lit("2026-01-01 00:00:00"))
        + F.make_interval(mins=F.col("turn_idx")),
    )
    eng = QueryEngine(build_index(with_ts, block_size=64))
    got = [
        (r["doc_id"], r["ts"]) for r in eng.match_latest("fire heat", 3).collect()
    ]
    matches = {r["doc_id"] for r in eng.match("fire heat").collect()}
    ts_of = {
        r["doc_id"]: r["ts"]
        for r in eng.index.docs.select("doc_id", "ts").collect()
    }
    want = sorted(
        ((d, ts_of[d]) for d in matches),
        key=lambda x: (x[1], x[0]),
        reverse=True,
    )[:3]
    assert got == want and len(got) == 3
