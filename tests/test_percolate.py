"""Percolate (reverse search) vs an independent Python reference, plus the
full-scan fallback path and edge cases."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from tsidx.build import build_index
from tsidx.percolate import percolate
from tsidx.query import QueryEngine
from tsidx.tokenize import stem_tokens

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)
REG_SCHEMA = "query_id string, terms array<string>, min_match int"

TEXTS = [
    "merge the customer table",
    "customer query planner",
    "query merge merge conflict",
    "scan the stream for errors",
    "customer service desk",
    "the planner picks a scan plan",
    "merge window stream",
    "query the query planner twice",
]

REGISTRY = [
    ("all3", stem_tokens("customer query merge"), 3),
    ("any", stem_tokens("stream scan"), 1),
    ("two", stem_tokens("query planner merge"), 2),
    ("impossible", stem_tokens("customer"), 5),  # min_match > len(terms)
    ("dupes", stem_tokens("merge merge merge"), 1),  # duplicate stored terms
]


def _ts(i):
    return datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc) + datetime.timedelta(minutes=i)


@pytest.fixture(scope="module")
def engine(spark):
    rows = [(f"c{i//4}", i % 4, "user", t, "", _ts(i)) for i, t in enumerate(TEXTS)]
    idx = build_index(spark.createDataFrame(rows, TRANSCRIPT_SCHEMA), block_size=4)
    return QueryEngine(idx)


def _reference():
    docs = [set(stem_tokens(t)) for t in TEXTS]
    out = set()
    for qid, terms, mm in REGISTRY:
        tset = set(terms)
        for doc_id, d in enumerate(docs):
            n = len(tset & d)
            if n >= mm:
                out.add((qid, doc_id, n))
    return out


def test_percolate_matches_reference(spark, engine):
    reg = spark.createDataFrame(REGISTRY, REG_SCHEMA)
    got = {tuple(r) for r in percolate(engine, reg).collect()}
    assert got == _reference()
    assert not any(r[0] == "impossible" for r in got)


def test_percolate_fallback_scan_identical(spark, engine):
    """Registry vocabulary above max_pushdown_terms: the full-scan branch
    must return the identical result set."""
    reg = spark.createDataFrame(REGISTRY, REG_SCHEMA)
    fast = {tuple(r) for r in percolate(engine, reg).collect()}
    full = {tuple(r) for r in percolate(engine, reg, max_pushdown_terms=1).collect()}
    assert fast == full == _reference()


def test_percolate_empty_registry(spark, engine):
    reg = spark.createDataFrame([], REG_SCHEMA)
    assert percolate(engine, reg).count() == 0


def test_percolate_respects_tombstones(spark, engine):
    """Deleted docs never match stored queries."""
    from tsidx.deletes import delete_docs

    idx2 = delete_docs(engine.index, [0, 3])
    eng2 = QueryEngine(idx2)
    reg = spark.createDataFrame(REGISTRY, REG_SCHEMA)
    got = {tuple(r) for r in percolate(eng2, reg).collect()}
    assert got == {t for t in _reference() if t[1] not in (0, 3)}


def test_percolate_docs_matches_index_percolate(spark, engine):
    """Index-free doc percolation agrees with the index-backed path."""
    from tsidx.percolate import percolate_docs

    reg = spark.createDataFrame(REGISTRY, REG_SCHEMA)
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    got = {tuple(r) for r in
           percolate_docs(docs, reg).select("query_id", "doc_id", "n_matched").collect()}
    assert got == _reference()


def test_percolate_docs_streaming(spark, tmp_path):
    """The identical expression runs under Structured Streaming (append
    mode, no state) and emits the same matches as the batch plan."""
    from pyspark.sql import functions as F

    from tsidx.percolate import percolate_docs

    in_dir, out_dir, ck = (str(tmp_path / d) for d in ("in", "out", "ck"))
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    docs.coalesce(1).write.parquet(in_dir)
    reg = spark.createDataFrame(REGISTRY, REG_SCHEMA)
    stream = spark.readStream.schema("doc_id long, text string").parquet(in_dir)
    q = (
        percolate_docs(stream, reg)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in
           spark.read.parquet(out_dir).select("query_id", "doc_id", "n_matched").collect()}
    assert got == _reference()


def test_percolate_wide_registry_no_broadcast(spark, engine):
    """A registry past the broadcast byte bound must take the shuffle-join
    path (zero forced BroadcastExchange carrying the registry pairs) and
    return identical results; a synthetic wide registry plus the real one
    exercises both the plan shape and the semantics."""
    import contextlib
    import io

    # 2,000 synthetic stored queries over unindexed terms + the real five
    wide = [
        (f"syn{i:05d}", [f"zzterm{i}a", f"zzterm{i}b"], 1) for i in range(2000)
    ] + REGISTRY
    reg = spark.createDataFrame(wide, REG_SCHEMA)
    got_wide = {
        tuple(r)
        for r in percolate(engine, reg, broadcast_max_bytes=0).collect()
    }
    got_small = {tuple(r) for r in percolate(engine, reg).collect()}
    assert got_wide == got_small == _reference()
    # plan shape: with the gate forcing the non-broadcast path, no
    # BroadcastExchange detail block may carry the registry columns
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = percolate(engine, reg, broadcast_max_bytes=0)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    import re

    for block in re.split(r"\n(?=\(\d+\) )", plan):
        if block.startswith("(") and "BroadcastExchange" in block.splitlines()[0]:
            assert "query_id" not in block, block
