"""Heavy hitters at scale: Misra-Gries candidate generation + exact
recount — EXACT phi-heavy-hitters without a full-vocabulary groupBy.

The naive plan (``groupBy(col).count().filter(cnt >= phi*N)``) shuffles
EVERY distinct value — at 10^12 rows with a long-tail key column that is
a shuffle of the whole distinct universe to find a handful of items.
The classic fix (Misra & Gries 1982; the mergeable-summaries framing of
Agarwal et al. PODS 2012) is a two-pass plan whose shuffle is bounded by
``k * n_partitions`` CANDIDATES instead:

1. **Candidates** — each partition streams its rows through a k-counter
   Misra-Gries summary (``k = ceil(1/phi)``). MG guarantees any item
   with partition frequency ``> n_p / (k+1)`` survives its partition's
   summary; by pigeonhole, any item with GLOBAL frequency ``>= phi * N
   > N / (k+1)`` must exceed the threshold in at least one partition,
   so the union of partition summaries is a SUPERSET of the true heavy
   hitters — for every partitioning of the data.
2. **Exact recount** — one scan counts ONLY the candidate values
   (AQE broadcasts the tiny candidate set into a semi-join), and the
   ``count >= ceil(phi * N)`` filter makes the output exact — identical
   to the naive plan's answer, which is what the DuckDB twin computes.

State per task is O(k); shuffle volume is O(k * partitions). The
output does NOT depend on the partitioning (only the intermediate
candidate set does — pytest pins this invariance).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["mg_candidates", "heavy_hitters"]


def mg_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """One column ``(value)``: the distinct union of each partition's
    k-counter Misra-Gries survivors — a guaranteed superset of every
    item with global frequency > N/(k+1). Arrow-batched; O(k) state
    per task."""
    k = int(k)
    if k < 1:
        raise ValueError("k must be >= 1")

    def _mg(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            for v in pdf[col]:
                if v is None:
                    continue
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    # decrement-all step; drop zeros
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame({"value": pd.Series(list(counters), dtype="object")})

    return (
        df.select(F.col(col).cast("string").alias(col))
        .mapInPandas(_mg, schema="value string")
        .distinct()
    )


def heavy_hitters(df: DataFrame, col: str, phi: float) -> DataFrame:
    """``(value, cnt)`` — EXACTLY the values occurring in at least
    ``ceil(phi * N)`` of the non-null rows (0 < phi <= 1), by the
    two-pass MG-candidates + exact-recount plan. Equal to the naive
    full groupBy's answer for every input and partitioning."""
    phi = float(phi)
    if not (0.0 < phi <= 1.0):
        raise ValueError("phi must be in (0, 1]")
    k = math.ceil(1.0 / phi)
    vals = df.select(F.col(col).cast("string").alias(col)).filter(
        F.col(col).isNotNull()
    )
    # the candidate superset feeds the recount join; materialize once
    cand = mg_candidates(vals, col, k).localCheckpoint(eager=False)
    counted = (
        vals.join(cand.withColumnRenamed("value", col), col)
        .groupBy(col)
        .agg(F.count("*").alias("cnt"))
    )
    n_rows = vals.count()
    threshold = math.ceil(phi * n_rows)
    return counted.filter(F.col("cnt") >= threshold).select(
        F.col(col).alias("value"), "cnt"
    )
