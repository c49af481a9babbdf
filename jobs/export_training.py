"""spark-submit entry point: training-data exports from a built index.

    # sparse tf-idf vectors (COO parquet; --normalized for unit L2 norm)
    python jobs/export_training.py tfidf --index /tmp/idx --output /tmp/vecs

    # contiguous token-budget shard assignment
    python jobs/export_training.py pack --index /tmp/idx \
        --output /tmp/shards --budget 1000000

    # reranker pairs: BM25 positives + hard negatives for a query
    python jobs/export_training.py pairs --index /tmp/idx \
        --output /tmp/pairs --query customer query merge --k-pos 50 --k-neg 50

    # context windows around matching turns (training-example extraction)
    python jobs/export_training.py context --index /tmp/idx \
        --output /tmp/ctx --query vector stream --window 2

    # C4/Gopher-style quality verdicts (or --keep-only for surviving text)
    python jobs/export_training.py quality --index /tmp/idx \
        --output /tmp/qual --min-tokens 20 --max-top-frac 0.12

    # deterministic uniform corpus sample (reproducible across runs)
    python jobs/export_training.py sample --index /tmp/idx \
        --output /tmp/sampled --rate 0.1 --seed 0

    # PII-style redaction (email/phone/number placeholders + counts)
    python jobs/export_training.py redact --index /tmp/idx --output /tmp/red

    # BPE merge table learned from the corpus (subword vocabulary)
    python jobs/export_training.py bpe --index /tmp/idx \
        --output /tmp/merges --merges 64

    # CCNet head/middle/tail perplexity partition (bigram-LM terciles)
    python jobs/export_training.py pplbuckets --index /tmp/idx \
        --output /tmp/ppl --buckets 3

    # DSIR importance weights vs a target slice (--frac also resamples)
    python jobs/export_training.py dsir --index /tmp/idx \
        --output /tmp/dsir --target /data/target_docs [--frac 0.25]

    # leakage-safe conversation-level train/valid/test split
    python jobs/export_training.py split --index /tmp/idx \
        --output /tmp/splits --weights train=0.8,valid=0.1,test=0.1

    # water-filled domain-mixture sample (exact target token mixture)
    python jobs/export_training.py mixture --index /tmp/idx \
        --output /tmp/mix --strata-col role --weights user=0.5,assistant=0.5

Each action writes a parquet table through the tsidx.io format seam (so
`spark.tsidx.format=iceberg` redirects on clusters) and prints one JSON
line with row counts and wall time.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from build_index import make_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "action",
        choices=[
            "tfidf", "pack", "pairs", "context", "quality", "sample", "redact",
            "bpe", "pplbuckets", "dsir", "mixture", "split", "render",
            "keywords",
        ],
    )
    ap.add_argument("--index", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--parallelism", type=int, default=None)
    ap.add_argument("--normalized", action="store_true", help="tfidf: L2")
    ap.add_argument("--budget", type=int, default=1_000_000, help="pack")
    ap.add_argument("--query", nargs="+", default=[], help="pairs/context")
    ap.add_argument("--k-pos", type=int, default=50, help="pairs")
    ap.add_argument("--k-neg", type=int, default=50, help="pairs")
    ap.add_argument("--window", type=int, default=1, help="context")
    ap.add_argument(
        "--min-tokens", type=int, default=3, help="quality: r_len floor"
    )
    ap.add_argument(
        "--max-top-frac", type=float, default=0.5,
        help="quality: Gopher repetition cap",
    )
    ap.add_argument(
        "--keep-only", action="store_true",
        help="quality: write only keep=true rows (joined back to text)",
    )
    ap.add_argument(
        "--rate", type=float, default=0.1,
        help="sample: uniform keep probability over the corpus",
    )
    ap.add_argument("--seed", type=int, default=0, help="sample/dsir/mixture")
    ap.add_argument(
        "--top-m", type=int, default=5, help="keywords: terms per doc"
    )
    ap.add_argument("--merges", type=int, default=64, help="bpe")
    ap.add_argument("--buckets", type=int, default=3, help="pplbuckets")
    ap.add_argument(
        "--target", default=None,
        help="dsir: parquet/iceberg path of target-domain docs (doc_id, text)",
    )
    ap.add_argument(
        "--target-mod", type=int, default=None,
        help="dsir: deterministic target slice doc_id %% N == 0 (no --target)",
    )
    ap.add_argument(
        "--frac", type=float, default=None,
        help="dsir: also resample, keeping the top FRAC by Gumbel-perturbed weight",
    )
    ap.add_argument("--strata-col", default="role", help="mixture")
    ap.add_argument("--group-col", default="conv_id", help="split")
    ap.add_argument(
        "--weights", default=None,
        help="mixture/split: proportions, e.g. user=0.5,assistant=0.5 "
        "or train=0.8,valid=0.1,test=0.1",
    )
    args = ap.parse_args()

    spark = make_spark(args.parallelism, f"tsidx-export-{args.action}")
    t0 = time.time()

    from tsidx.index import InvertedIndex
    from tsidx.io import read_table, write_table
    from tsidx.query import QueryEngine

    idx = InvertedIndex.read(spark, args.index)
    eng = QueryEngine(idx)
    if args.action == "tfidf":
        from tsidx.vectors import tfidf_rows

        out_df = tfidf_rows(eng, normalized=args.normalized)
    elif args.action == "keywords":
        from tsidx.vectors import top_terms_per_doc

        out_df = top_terms_per_doc(
            eng, m=args.top_m, normalized=args.normalized
        )
    elif args.action == "pack":
        from tsidx.pack import pack_shards

        out_df = pack_shards(idx.docs, args.budget)
    elif args.action == "pairs":
        if not args.query:
            raise SystemExit("pairs requires --query")
        out_df = eng.bm25_training_pairs(
            " ".join(args.query), args.k_pos, args.k_neg
        )
    elif args.action == "context":
        if not args.query:
            raise SystemExit("context requires --query")
        out_df = eng.match_with_context(" ".join(args.query), args.window)
    elif args.action == "quality":
        from pyspark.sql import functions as F

        from tsidx.textstats import quality_filter

        verdicts = quality_filter(
            idx.docs,
            min_tokens=args.min_tokens,
            max_top_tok_frac=args.max_top_frac,
        )
        if args.keep_only:
            out_df = (
                verdicts.filter(F.col("keep"))
                .select("doc_id")
                .join(idx.docs.select("doc_id", "text"), "doc_id")
            )
        else:
            out_df = verdicts
    elif args.action == "redact":
        from tsidx.textstats import redact_text

        out_df = redact_text(idx.docs.select("doc_id", "text"))
    elif args.action == "bpe":
        from tsidx.bpe import train_bpe

        merges = train_bpe(idx.docs, args.merges)
        out_df = spark.createDataFrame(
            [(i, a, b, c) for i, (a, b, c) in enumerate(merges)],
            "merge_idx long, left string, right string, cnt long",
        )
    elif args.action == "pplbuckets":
        from tsidx.lmquality import ppl_buckets

        out_df = ppl_buckets(idx.docs.select("doc_id", "text"), args.buckets)
    elif args.action == "dsir":
        from pyspark.sql import functions as F

        from tsidx.lmquality import dsir_log_weights, dsir_resample

        docs = idx.docs.select("doc_id", "text")
        if args.target:
            target = read_table(spark, args.target).select("doc_id", "text")
        elif args.target_mod:
            target = docs.where(F.col("doc_id") % args.target_mod == 0)
        else:
            raise SystemExit("dsir requires --target or --target-mod")
        if args.frac is not None:
            out_df = dsir_resample(docs, target, args.frac, seed=args.seed)
        else:
            out_df = dsir_log_weights(docs, target)
    elif args.action == "render":
        from tsidx.dialog import render_conversations

        out_df = render_conversations(idx.docs)
    elif args.action == "split":
        from tsidx.textstats import group_split

        if not args.weights:
            raise SystemExit("split requires --weights, e.g. train=0.8,valid=0.1,test=0.1")
        fracs = {
            k: float(v)
            for k, v in (kv.split("=", 1) for kv in args.weights.split(","))
        }
        out_df = group_split(
            idx.docs, fracs, group_col=args.group_col, seed=args.seed
        )
    elif args.action == "mixture":
        from tsidx.textstats import mixture_sample

        if not args.weights:
            raise SystemExit("mixture requires --weights k=v[,k=v...]")
        weights = {
            k: float(v)
            for k, v in (kv.split("=", 1) for kv in args.weights.split(","))
        }
        out_df = mixture_sample(
            idx.docs, weights, strata_col=args.strata_col, seed=args.seed
        )
    else:
        from pyspark.sql import functions as F

        from tsidx.textstats import sample_mix

        # uniform corpus sample = one stratum covering every row
        out_df = sample_mix(
            idx.docs.select("doc_id", "text", F.lit("all").alias("_s")),
            {"all": args.rate},
            strata_col="_s",
            seed=args.seed,
        ).drop("_s")

    write_table(out_df, args.output)
    n = read_table(spark, args.output).count()
    print(
        json.dumps(
            {
                "job": f"export-{args.action}",
                "rows": int(n),
                "output": args.output,
                "sec": round(time.time() - t0, 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
