"""One-shot build-and-drive verification (the .claude/skills/verify recipe).

Drives the two real surfaces end-to-end:
1. single-node oracle over the reference sonnets corpus vs the documented
   goldens (154/4034/13044, df head, three match queries);
2. the Spark engine via ``__spark_entry__.entry(spark)`` plus BM25
   rank-identity (same doc_ids, bit-identical scores) against the oracle
   at sf0.001.

Exit 0 = all green. Run: ``python tools/verify_drive.py``.
"""

from __future__ import annotations

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SONNETS = "/root/reference/samples/inverted_index/sonnets.py"


def check_goldens() -> None:
    spec = importlib.util.spec_from_file_location("_sonnets", SONNETS)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from tsidx.oracle import OracleIndex

    idx = OracleIndex()
    idx.add_corpus(list(mod.sonnets))
    st = idx.statistics()
    assert st == {
        "num_documents": 154,
        "num_unique_terms": 4034,
        "num_postings": 13044,
    }, st
    head = idx.document_frequencies()[:11]
    assert head == [
        ("sonnet", 154), ("and", 148), ("to", 146), ("in", 139),
        ("the", 135), ("of", 134), ("that", 130), ("my", 117),
        ("i", 110), ("but", 108), ("with", 98),
    ], head
    assert idx.match("same") == [4, 49, 68]
    assert idx.match("thrall quench") == [123, 153]
    assert idx.match("fire heat") == [11, 44, 54, 143, 152, 153]
    print("[verify] sonnets goldens OK")


def check_spark() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as se

    rows = se.entry(spark).collect()
    assert len(rows) > 0, "entry() returned no rows"
    print(f"[verify] entry() OK ({len(rows)} rows)")

    eng = se.get_engine(spark, "/root/testdata/sf0.001")
    got = [
        (r["doc_id"], r["score"])
        for r in eng.bm25_topk(se.Q_BM25, 10).collect()
    ]
    docs = sorted(
        (r["doc_id"], r["text"])
        for r in se.load_documents(spark, "/root/testdata/sf0.001").collect()
    )
    from tsidx.oracle import OracleIndex

    oi = OracleIndex()
    for d, t in docs:
        oi.add(d, t)
    want = oi.bm25_topk(se.Q_BM25, 10)
    assert [d for d, _ in got] == [d for d, _ in want], (got, want)
    assert all(a == b for (_, a), (_, b) in zip(got, want)), (got, want)
    print("[verify] BM25 rank identity OK (doc_ids + bit-identical scores)")
    spark.stop()


if __name__ == "__main__":
    check_goldens()
    check_spark()
    print("[verify] ALL OK")
