"""spark-submit entry point: index statistics + lineage metrics.

Analog of the reference's stats CLI (``stats.sh`` ->
``samples/inverted_index/stats.py`` -> ``Index.statistics``,
``ts_type_filter/inverted_index.py:131-153``): document/term/posting
counts and the document-frequency head, plus (for checkpointed indexes)
the per-shard lineage manifest the north rule mandates.

    python jobs/index_stats.py --index /tmp/idx [--top 20] [--parallelism 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from build_index import make_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--parallelism", type=int, default=None)
    args = ap.parse_args()

    spark = make_spark(args.parallelism, "tsidx-stats")
    from tsidx.index import InvertedIndex

    idx = InvertedIndex.read(spark, args.index)
    out = {
        "job": "index_stats",
        "statistics": idx.statistics(),
        "meta": {
            k: idx.meta[k]
            for k in ("n_docs", "total_tokens", "avgdl", "block_size", "codec")
        },
        "df_head": [
            {"term": r["term"], "df": r["df"]}
            for r in idx.document_frequencies().limit(args.top).collect()
        ],
    }
    if idx.manifest is not None:
        rows = [r.asDict() for r in idx.manifest.collect()]
        out["manifest"] = {
            "shards": len(rows),
            "doc_count": sum(r["doc_count"] for r in rows),
            "token_count": sum(r["token_count"] for r in rows),
            "posting_bytes": sum(r["posting_bytes"] for r in rows),
            "max_block_df": max((r["max_block_df"] for r in rows), default=0),
            "hot_terms": sorted(
                {r["hot_term"] for r in rows if r["hot_term"]}
            ),
            "per_shard": rows,
        }
    print(json.dumps(out, default=str))
    spark.stop()


if __name__ == "__main__":
    main()
