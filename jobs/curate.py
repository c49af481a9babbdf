"""spark-submit entry point: the composed training-data curation pipeline.

One command runs the standard pretraining curation chain end to end —
each stage is an existing tsidx operator, composed in the order the
published pipelines (C4, Gopher, RefinedWeb, Dolma) run them:

    quality filter  ->  exact dedup (keep min id)
                    ->  near-dup clustering (shingle Jaccard pairs ->
                        connected components, keep representative)
                    ->  benchmark decontamination      [--benchmark]
                    ->  domain-mixture resampling      [--mix-weights]
                    ->  token-budget shard packing

    python jobs/curate.py --input /root/testdata/sf0.01 \
        --output /tmp/curated --jaccard-tau 0.8 --max-key-df 64 \
        --budget 100000

Writes the surviving docs (doc_id, text, source, n_tokens, shard_id)
through the tsidx.io format seam and prints ONE JSON line with the
per-stage survivor counts — the curation audit trail.

Every stage is deterministic (hash-based sampling, min-id
representatives, seeded mixtures), so re-running the pipeline on the
same input reproduces the same dataset byte for byte.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from jobs.build_index import make_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="sf dir or parquet path")
    ap.add_argument("--output", required=True)
    ap.add_argument("--parallelism", type=int, default=None)
    ap.add_argument("--min-tokens", type=int, default=3)
    ap.add_argument("--max-top-frac", type=float, default=0.5)
    ap.add_argument("--jaccard-tau", type=float, default=0.8)
    ap.add_argument("--ngram", type=int, default=3)
    ap.add_argument("--max-key-df", type=int, default=64)
    ap.add_argument("--benchmark", help="parquet of benchmark docs to scrub")
    ap.add_argument("--decontam-n", type=int, default=5)
    ap.add_argument("--decontam-tau", type=float, default=0.5)
    ap.add_argument(
        "--mix-weights",
        help="stratum=weight,... over --strata-col (water-filled mixture)",
    )
    ap.add_argument("--strata-col", default="source")
    ap.add_argument("--budget", type=int, default=1_000_000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    spark = make_spark(args.parallelism, "tsidx-curate")
    from pyspark.sql import functions as F

    from tsidx.dedup import (
        connected_components,
        exact_dedup_groups,
        ngram_jaccard_pairs,
    )
    from tsidx.io import write_table
    from tsidx.pack import pack_shards
    from tsidx.textstats import mixture_sample, quality_filter

    t0 = time.time()
    path = args.input
    if os.path.isdir(path) and os.path.exists(
        os.path.join(path, "documents.parquet")
    ):
        path = os.path.join(path, "documents.parquet")
    docs = spark.read.parquet(path)
    stages: dict[str, int] = {"input": docs.count()}

    # 1. quality filter (C4/Gopher rules; verdicts are map-only)
    verdicts = quality_filter(
        docs,
        min_tokens=args.min_tokens,
        max_top_tok_frac=args.max_top_frac,
    ).select("doc_id", "keep")
    docs = docs.join(verdicts.filter(F.col("keep")), "doc_id").drop("keep")
    docs = docs.localCheckpoint(eager=False)
    stages["quality"] = docs.count()

    # 2. exact dedup: keep each distinct text's minimum doc_id
    keep_ids = exact_dedup_groups(docs).select(
        F.col("keep_id").alias("doc_id")
    )
    docs = docs.join(keep_ids, "doc_id")
    docs = docs.localCheckpoint(eager=False)
    stages["exact_dedup"] = docs.count()

    # 3. near-dup clustering: capped shingle-Jaccard pairs -> connected
    #    components -> keep the minimum-id representative per cluster
    pairs = ngram_jaccard_pairs(
        docs,
        n=args.ngram,
        tau=args.jaccard_tau,
        max_key_df=args.max_key_df,
    )
    comp = connected_components(pairs)
    drop = comp.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    docs = docs.join(drop, "doc_id", "anti")
    docs = docs.localCheckpoint(eager=False)
    stages["near_dedup"] = docs.count()

    # 4. optional benchmark decontamination
    if args.benchmark:
        from tsidx.decontam import decontaminate

        bench = spark.read.parquet(args.benchmark)
        docs = decontaminate(
            docs, bench, n=args.decontam_n, tau=args.decontam_tau
        )
        docs = docs.localCheckpoint(eager=False)
        stages["decontam"] = docs.count()

    # 5. optional water-filled domain mixture
    if args.mix_weights:
        weights = {
            k: float(v)
            for k, v in (p.split("=") for p in args.mix_weights.split(","))
        }
        docs = mixture_sample(
            docs, weights, strata_col=args.strata_col, seed=args.seed
        )
        docs = docs.localCheckpoint(eager=False)
        stages["mixture"] = docs.count()

    # 6. token-budget shard packing over the survivors
    shards = pack_shards(docs, args.budget)
    out = docs.join(shards.select("doc_id", "n_tokens", "shard_id"), "doc_id")
    write_table(out, args.output)
    stages["packed"] = out.count()

    print(
        json.dumps(
            {
                "job": "curate",
                "stages": stages,
                "n_shards": out.agg(
                    (F.max("shard_id") + 1).cast("long").alias("n")
                ).collect()[0]["n"],
                "output": args.output,
                "wall_sec": round(time.time() - t0, 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
