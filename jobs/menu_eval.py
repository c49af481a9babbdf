"""spark-submit entry point: the 4-stage menu-eval pipeline
(tsidx/tsfilter/pipeline.py) over a cases file.

    python jobs/menu_eval.py --cases cases.json --menu menu.ts \
        [--no-prune] [--no-linked-turns] [--parallelism 8]

Prints one JSON summary line (turn counts, perfect/valid rates, pruning
ratio) plus per-case rows with --verbose. The infer stage uses the
deterministic oracle stand-in unless a real model client is wired in via
run_menu_eval(model_fn=...).
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
    ap.add_argument("--cases", required=True)
    ap.add_argument("--menu", required=True)
    ap.add_argument("--root", default="Cart")
    ap.add_argument("--no-prune", action="store_true")
    ap.add_argument("--no-linked-turns", action="store_true")
    ap.add_argument("--parallelism", type=int, default=None)
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from tsidx.tsfilter.pipeline import load_cases, run_menu_eval

    spark = make_spark(args.parallelism, "tsidx-menu-eval")
    t0 = time.time()
    with open(args.menu) as f:
        menu_src = f.read()
    cases = load_cases(spark, args.cases)
    res = run_menu_eval(
        cases,
        menu_src,
        root=args.root,
        prune=not args.no_prune,
        linked_turns=not args.no_linked_turns,
    ).cache()
    agg = res.agg(
        F.count("*").alias("n_turns"),
        F.count_distinct("uuid").alias("n_cases"),
        F.sum(F.col("perfect").cast("int")).alias("n_perfect"),
        F.sum(F.col("valid").cast("int")).alias("n_valid"),
        F.sum(F.col("extract_ok").cast("int")).alias("n_extract_ok"),
        F.avg("cost").alias("mean_cost"),
        F.avg(F.col("n_types_pruned") / F.col("n_types_full")).alias(
            "prune_ratio"
        ),
    ).collect()[0]
    if args.verbose:
        for r in res.orderBy("uuid", "turn_idx").collect():
            print(json.dumps(r.asDict()))
    print(
        json.dumps(
            {
                "job": "menu_eval",
                **{k: (round(v, 4) if isinstance(v, float) else int(v))
                   for k, v in agg.asDict().items()},
                "sec": round(time.time() - t0, 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
