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

__all__ = [
    "mg_candidates",
    "heavy_hitters",
    "sampled_candidates",
    "heavy_hitters_fast",
    "cms_counts",
    "cms_estimates",
]


def mg_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """One column ``(value)``: the distinct union of each partition's
    k-counter Misra-Gries survivors — a guaranteed superset of every
    item with global frequency > N/(k+1). Arrow-batched; O(k) state
    per task."""
    k = int(k)
    if k < 1:
        raise ValueError("k must be >= 1")

    def _mg(batches):
        """Vectorized MERGED Misra-Gries (the mergeable-summaries form,
        Agarwal et al. PODS 2012): each Arrow batch folds in via ONE
        pandas value_counts (no per-row Python), then the summary
        reduces back to <= k entries by subtracting the (k+1)-th
        largest count and dropping non-positives. The cumulative
        subtraction is bounded by n_p/(k+1) exactly like row-at-a-time
        MG, so the superset guarantee heavy_hitters relies on is
        unchanged — per-partition cost drops from O(rows) dict ops to
        O(distinct per batch)."""
        import numpy as np
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            vc = pdf[col].value_counts(dropna=True)
            for v, c in vc.items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > k:
                cnts = np.fromiter(counters.values(), dtype=np.int64)
                t = int(np.partition(cnts, -(k + 1))[-(k + 1)])
                counters = {
                    v: c - t for v, c in counters.items() if c - t > 0
                }
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


def sampled_candidates(
    df: DataFrame,
    col: str,
    phi: float,
    id_cols: list[str],
    *,
    mod: int = 8,
    safety: int = 4,
    n_rows: int | None = None,
) -> DataFrame:
    """One column ``(value)``: heavy-hitter candidates from a
    DETERMINISTIC 1/mod occurrence sample — the all-JVM alternative to
    the :func:`mg_candidates` Python sweep (round-3 verdict task #5: the
    mapInPandas hop's Arrow transfer of the full token stream floors the
    MG path at ~0.5M tokens/s regardless of sweep vectorization).

    An occurrence is sampled iff ``xxhash64(*id_cols, col) % mod == 0``.
    *id_cols* must identify the occurrence (e.g. ``(doc_id, pos)`` for a
    token stream): hashing the occurrence identity — never the value
    alone — samples each value's occurrences independently, and hashing
    instead of ``rand()`` makes the sample a pure function of the data,
    so the candidate set is identical for every partitioning, executor
    count, and retry (no RDD-seed partitioning dependence).

    A value survives if its sampled count reaches ``max(1, floor(phi *
    N / (mod * safety)))`` — ``safety``x under the 1/mod-scaled
    expectation. Guarantees:

    - **Bounded**: sampled rows sum to ~N/mod, so at most ``~safety /
      phi`` values can clear the threshold — a hard candidate bound
      independent of the distinct-value cardinality (phi=0.001,
      safety=4 -> <= ~4000 candidates from any corpus).
    - **Recall** (probabilistic-by-construction, like the LSH entries):
      treating xxhash64 as uniform, a true phi-heavy item is missed only
      when its sampled count lands ``safety``x below expectation —
      Chernoff ``P <= exp(-(1 - 1/safety)^2 * phi*N / (2*mod))``,
      vanishing for any corpus where phi*N >> mod. Per corpus the
      outcome is FIXED (hash, not randomness): it either recalls or it
      doesn't, so a gate over a given corpus can never flake.

    The shuffle is the sampled groupBy: ~N/mod rows, all JVM, versus the
    MG path's full-stream Arrow export. The exact-recount second pass
    (:func:`heavy_hitters_fast`) keeps the no-false-positive guarantee
    unconditionally.
    """
    phi = float(phi)
    mod, safety = int(mod), int(safety)
    if not (0.0 < phi <= 1.0):
        raise ValueError("phi must be in (0, 1]")
    if mod < 1 or safety < 1:
        raise ValueError("mod and safety must be >= 1")
    vals = df.select(
        F.col(col).cast("string").alias(col), *[F.col(c) for c in id_cols]
    ).filter(F.col(col).isNotNull())
    if n_rows is None:  # caller may pass the stream length to avoid a rescan
        n_rows = vals.count()
    t_s = max(1, int((phi * n_rows) / (mod * safety)))
    sampled = vals.filter(
        F.pmod(F.xxhash64(*[F.col(c) for c in id_cols], F.col(col)), mod) == 0
    )
    return (
        sampled.groupBy(col)
        .agg(F.count("*").alias("_sc"))
        .filter(F.col("_sc") >= t_s)
        .select(F.col(col).alias("value"))
    )


def heavy_hitters_fast(
    df: DataFrame,
    col: str,
    phi: float,
    id_cols: list[str],
    *,
    mod: int = 8,
    safety: int = 4,
) -> DataFrame:
    """``(value, cnt)`` — phi-heavy-hitters by the all-JVM two-pass
    plan: :func:`sampled_candidates` (deterministic occurrence-hash
    sample, ``<= ~safety/phi`` candidates) + the same exact recount as
    :func:`heavy_hitters`. Output counts are EXACT and the ``>=
    ceil(phi*N)`` filter admits no false positives ever; completeness
    inherits the candidate pass's hash-deterministic recall (see
    :func:`sampled_candidates` — use the MG path when a deterministic
    superset proof is required and the Arrow-export cost is acceptable).
    """
    phi = float(phi)
    vals = df.select(
        F.col(col).cast("string").alias(col), *[F.col(c) for c in id_cols]
    ).filter(F.col(col).isNotNull())
    # count the stream ONCE and share it with the candidate pass — the
    # sampled threshold and the exact ceil(phi*N) filter use the same N
    # (ADVICE r4: the previous code scanned the full stream twice).
    n_rows = vals.count()
    cand = sampled_candidates(
        df, col, phi, id_cols, mod=mod, safety=safety, n_rows=n_rows
    ).localCheckpoint(eager=False)
    counted = (
        vals.select(col)
        .join(cand.withColumnRenamed("value", col), col)
        .groupBy(col)
        .agg(F.count("*").alias("cnt"))
    )
    threshold = math.ceil(phi * n_rows)
    return counted.filter(F.col("cnt") >= threshold).select(
        F.col(col).alias("value"), "cnt"
    )


def cms_counts(
    df: DataFrame, col: str, *, depth: int = 4, width: int = 256
) -> DataFrame:
    """``(d, bucket, cnt)`` — a Count-Min sketch (Cormode & Muthukrishnan,
    J. Algorithms 2005) of the column's value frequencies: *depth*
    independent hash rows of *width* counters each. The mergeable
    frequency summary: sketches of two corpora ADD cell-wise, so
    incremental batches fold in without re-scanning history.

    The row-d hash is the engine-reproducible md5 convention shared with
    ``group_split``/``cdc_chunks`` (``conv(substr(md5(d || ':' || v),
    1, 15), 16, 10) % width``) — deterministic, so the sketch (and every
    estimate from it) replays exactly on any engine, which is what makes
    the DuckDB twin a VALUE check rather than a bounds check.

    Plan: one corpus scan exploding each value into its *depth* cells
    (map-only expression), then ONE partial-aggregated groupBy over the
    ``depth x width``-bounded cell space. At 10^12 rows the shuffle is
    still <= depth·width rows per partition.
    """
    depth, width = int(depth), int(width)
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    cells = F.expr(
        f"transform(sequence(0, {depth - 1}), d -> struct(d AS d,"
        f" cast(conv(substring(md5(concat(cast(d AS string), ':', _v)),"
        f" 1, 15), 16, 10) as bigint) % {width} AS bucket))"
    )
    return (
        df.select(F.col(col).cast("string").alias("_v"))
        .filter(F.col("_v").isNotNull())
        .select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.d").alias("d"), F.col("c.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimates(
    sketch: DataFrame, probes: list[str], *, depth: int = 4, width: int = 256
) -> DataFrame:
    """``(value, est)`` — Count-Min frequency estimates for the *probes*
    from a :func:`cms_counts` sketch: ``min`` over the depth rows of the
    probed cell. Estimates NEVER undercount (each cell is a sum that
    includes the value's own hits — the CMS one-sided guarantee, pinned
    in pytest) and overcount by at most the collisions in the lightest
    row. Driver-side: the sketch is depth·width rows (collected once,
    bounded); probes are a caller-bounded list."""
    import hashlib

    depth, width = int(depth), int(width)
    spark = sketch.sparkSession
    cells = {
        (r["d"], r["bucket"]): int(r["cnt"]) for r in sketch.collect()
    }  # <= depth * width rows

    def bucket(d: int, v: str) -> int:
        h = hashlib.md5(f"{d}:{v}".encode()).hexdigest()[:15]
        return int(h, 16) % width

    rows = []
    for v in probes:
        est = min(cells.get((d, bucket(d, v)), 0) for d in range(depth))
        rows.append((v, est))
    return spark.createDataFrame(rows, "value string, est long")
