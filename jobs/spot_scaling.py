"""Operator-level scaling spot-check: sf0.1-equivalent vs sf1.0.

Round-3 flagged two at-scale weaknesses (BENCH/BASELINE.md round-3
table): backoff_lm scaled 17.8x on 10x data under the pinned 32 shuffle
partitions, and the Misra-Gries heavy-hitter sweep was floored by the
Arrow export of the full token stream (~0.5M tokens/s). This job
re-measures both under the round-4 fixes — volume-derived shuffle
partitions (tsidx/tuning.py) and the all-JVM sampled heavy-hitter path
(tsidx/sketches.py heavy_hitters_fast) — by running the same operators
at 128x and 1280x replica expansion in one session:

    python jobs/spot_scaling.py [--cpus 32] [--ops backoff_lm,hh]

Prints one JSON line with per-op wall seconds at both scales, the
scaling ratio, the partition counts used, and host canaries.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--input", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--ops", default="backoff_lm,hh,rake")
    ap.add_argument("--scales", default="128,1280")
    args = ap.parse_args()
    ops = set(args.ops.split(","))
    scales = [int(s) for s in args.scales.split(",")]

    from bench import expand_transcripts, host_canary

    canary_pre = host_canary(args.cpus)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    local_dir = os.environ.get("SPARK_LOCAL_DIRS")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/tsidx_spot_spark"
        os.makedirs(local_dir, exist_ok=True)
    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("tsidx-spot-scaling")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "64g")
        .config("spark.local.dir", local_dir)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from tsidx.lmquality import backoff_lm_score
    from tsidx.sketches import heavy_hitters, heavy_hitters_fast
    from tsidx.tuning import TOKEN_EXPANSION, tune_shuffle

    out: dict = {
        "job": "spot_scaling",
        "cpus": args.cpus,
        "host_canary_pre": canary_pre,
        "scales": {},
    }

    for reps in scales:
        n_shuffle = tune_shuffle(
            spark, os.path.join(args.input, "documents.parquet"),
            cpus=args.cpus, replicas=reps, expansion=TOKEN_EXPANSION,
        )
        docs_flat = (
            expand_transcripts(spark, args.input, reps)
            .select(F.xxhash64("conv_id", "turn_idx").alias("doc_id"), "text")
            .persist()
        )
        n_docs = docs_flat.count()
        entry: dict = {"replicas": reps, "docs": n_docs,
                       "shuffle_partitions": n_shuffle}

        if "backoff_lm" in ops:
            t0 = time.time()
            backoff_lm_score(docs_flat).agg(F.sum("xent")).collect()
            entry["backoff_lm"] = round(time.time() - t0, 2)

        if "rake" in ops:
            from tsidx.keywords import rake_keywords

            t0 = time.time()
            rake_keywords(docs_flat, top_m=3).count()
            entry["rake_keywords"] = round(time.time() - t0, 2)

        if "hh" in ops:
            # persist the exploded token table so the timings isolate the
            # SWEEPS — otherwise the shared tokenize+explode scan (~30 s
            # at 346M tokens) floors both paths identically
            toks = (
                docs_flat.filter(F.trim("text") != "")
                .select(
                    "doc_id",
                    F.posexplode(F.split(F.trim("text"), r"\s+")).alias(
                        "pos", "tok"
                    ),
                )
                .persist()
            )
            n_toks = toks.count()
            entry["tokens"] = n_toks
            t0 = time.time()
            fast = heavy_hitters_fast(
                toks, "tok", 0.02, ["doc_id", "pos"], mod=4
            ).collect()
            entry["heavy_hitters_fast"] = round(time.time() - t0, 2)
            t0 = time.time()
            mg = heavy_hitters(toks, "tok", 0.02).collect()
            entry["heavy_hitters_mg"] = round(time.time() - t0, 2)
            entry["hh_agree"] = sorted(
                (r["value"], r["cnt"]) for r in fast
            ) == sorted((r["value"], r["cnt"]) for r in mg)
            entry["hh_speedup"] = round(
                entry["heavy_hitters_mg"] / entry["heavy_hitters_fast"], 2
            )

        out["scales"][str(reps)] = entry
        docs_flat.unpersist()
        if "hh" in ops:
            toks.unpersist()

    if len(scales) == 2 and "backoff_lm" in ops:
        a, b = (out["scales"][str(s)] for s in scales)
        out["backoff_lm_scaling"] = round(
            b["backoff_lm"] / a["backoff_lm"], 2
        )
    out["host_canary_post"] = host_canary(args.cpus)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
