"""Corpus/table profiling: per-column statistics in one aggregation pass.

Before any 100 TB curation run, the first job is always "what is in this
table" — null fractions, cardinalities, value ranges, string lengths.
This module computes them for every requested column in a SINGLE
aggregate over one scan (no per-column jobs, no driver loops over data):

    profile_columns(df)  ->  one row per column:
        (column, n_rows, n_null, n_distinct, min_val, max_val, avg_len)

Values are compared as their canonical string casts so one schema covers
heterogeneous column types (the min/max of a numeric column is therefore
lexicographic on the cast — documented, deterministic, and cheap; pass
numeric columns through ``summary()``/``approxQuantile`` when numeric
order matters).

Scale notes:
- ``exact_distinct=True`` uses ``count(DISTINCT col)``; several exact
  distincts in one aggregate make Catalyst plan an Expand (input rows
  duplicated x ncols before the shuffle). Fine up to ~10^9 rows x a few
  columns; at full 100 TB scale set ``exact_distinct=False`` to use
  ``approx_count_distinct`` (HyperLogLog++, one pass, no Expand, ~2%
  relative error).
- The reshape from the single wide aggregate row to the long per-column
  output uses ``stack`` inside the plan — nothing is collected to the
  driver.

The reference repo has no profiling surface; this is one of the
training-data-pipeline extensions the build brief names as first-class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_columns", "numeric_histogram"]


def numeric_histogram(
    df: DataFrame,
    col: str,
    bin_width: float,
    *,
    origin: float = 0.0,
) -> DataFrame:
    """Equi-width histogram of a numeric column: one map-side-combinable
    aggregation (``bin = floor((x - origin) / bin_width)``), returning
    ``(bin, lo, hi, n)`` with nulls excluded. Shuffle volume is
    O(partitions x bins) — the distribution diagnostic that sizes length
    filters, shard budgets, and skew caps before a full curation run.
    """
    if bin_width <= 0:
        raise ValueError("numeric_histogram: bin_width must be positive")
    b = F.floor((F.col(col) - F.lit(origin)) / F.lit(bin_width))
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bin",
            (F.lit(origin) + F.col("bin") * F.lit(bin_width)).alias("lo"),
            (F.lit(origin) + (F.col("bin") + 1) * F.lit(bin_width)).alias("hi"),
            "n",
        )
    )


def profile_columns(
    df: DataFrame,
    columns: list[str] | None = None,
    *,
    exact_distinct: bool = True,
    avg_len_decimals: int = 4,
) -> DataFrame:
    """Profile ``columns`` (default: all) of ``df`` in one aggregation.

    Output schema: ``column string, n_rows long, n_null long,
    n_distinct long, min_val string, max_val string, avg_len double``.
    ``n_distinct`` excludes nulls; ``avg_len`` is the mean length of the
    canonical string cast over non-null values, rounded to
    ``avg_len_decimals``.
    """
    cols = list(columns) if columns is not None else list(df.columns)
    if not cols:
        raise ValueError("no columns to profile")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in frame: {missing}")

    distinct = (
        (lambda c: F.count_distinct(F.col(c)))
        if exact_distinct
        else (lambda c: F.approx_count_distinct(F.col(c)))
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        s = F.col(c).cast("string")
        aggs += [
            F.count(s).alias(f"__nn{i}"),
            distinct(c).cast("long").alias(f"__nd{i}"),
            F.min(s).alias(f"__mn{i}"),
            F.max(s).alias(f"__mx{i}"),
            F.round(F.avg(F.length(s)), avg_len_decimals).alias(f"__al{i}"),
        ]
    wide = df.agg(*aggs)

    # stack(n, name_0, ...cells_0, name_1, ...) reshapes wide -> long
    # entirely inside the plan (one output row per profiled column)
    parts = []
    for i, c in enumerate(cols):
        quoted = "'" + c.replace("'", "\\'") + "'"
        parts.append(
            f"{quoted}, __n - __nn{i}, __nd{i}, __mn{i}, __mx{i}, __al{i}"
        )
    stacked = F.expr(
        f"stack({len(cols)}, {', '.join(parts)}) AS "
        "(column, n_null, n_distinct, min_val, max_val, avg_len)"
    )
    return wide.select(F.col("__n").alias("n_rows"), stacked).select(
        "column", "n_rows", "n_null", "n_distinct", "min_val", "max_val", "avg_len"
    )
