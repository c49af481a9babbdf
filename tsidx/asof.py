"""As-of join: match each left row to the temporally nearest right row.

Spark has no built-in as-of join (pandas has ``merge_asof``; Flink and
kdb+ treat it as a primitive). The scalable formulation here is the
union-window ("merge") plan rather than an inequality join:

1. tag both inputs and union them on aligned schemas,
2. shuffle ONCE on the join key,
3. one window pass ordered by (ts, side) carrying the last-seen right
   payload forward (``last(..., ignoreNulls=True)``),
4. keep the left rows and unpack the carried payload.

Cost: one exchange of |left| + |right| rows and one sort — the same
shape as a sort-merge join, with NO row explosion (an inequality-join
formulation ``l.ts >= r.ts`` explodes to O(|l| x |r|) per key before
aggregation, which is quadratic on hot keys). Ties (several right rows
sharing one timestamp) resolve deterministically to the greatest payload
struct.

Skew note (100 TB): a hot join key serializes through one window
partition. For bounded keys (users, conversations) the single-pass plan
is optimal; for unbounded keys pass ``split_bucket_s=N`` — window
partitions become (key, N-second bucket) and the previous bucket's last
right row is carried through a bounded per-bucket table (bit-identical
results, differential-tested across bucket sizes).

Reference parity: the reference repo has no temporal layer; this is one
of the engine-extension operators the build brief names explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "interval_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: list[str] | None = None,
    suffix: str = "_r",
    tolerance_s: float | None = None,
    direction: str = "backward",
    split_bucket_s: int | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus the payload of the
    matching ``right`` row — the latest one with ``right_ts <= left_ts``
    (``direction="backward"``) or the earliest with ``right_ts >=
    left_ts`` (``"forward"``) per join key. Unmatched left rows keep
    null payloads (left-outer semantics).

    ``payload`` — right columns to carry (default: all but key + ts);
    each lands as ``<name><suffix>``, and the matched right timestamp as
    ``<right_ts><suffix>``. ``tolerance_s`` — maximum |left_ts -
    right_ts| in seconds; matches farther away are nulled out.

    ``split_bucket_s`` — the hot-key scale valve. The default plan's
    window partitions are whole join keys: a key with 10^9 rows
    serializes through one executor. With ``split_bucket_s=N`` the
    window partitions become (key, N-second time bucket) — uniform,
    bounded — plus one bounded carry pass: per (key, bucket) the
    bucket's extreme right payload is aggregated (map-side combinable),
    the previous non-empty bucket's payload is carried forward by a
    window over the SMALL per-bucket table (one row per non-empty
    bucket, not per row), and rows with no in-bucket match take the
    carried payload. Bit-identical to the default plan (differential
    test sweeps bucket sizes); same tie rule.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    pay = (
        list(payload)
        if payload is not None
        else [c for c in right.columns if c not in keys and c != right_ts]
    )

    r_struct = F.struct(
        F.col(right_ts).alias("__mts"), *[F.col(c) for c in pay]
    )
    r_type = right.select(r_struct.alias("x")).schema[0].dataType
    l_struct = F.struct(*[F.col(c) for c in left.columns])
    l_type = left.select(l_struct.alias("x")).schema[0].dataType

    # side 0 sorts before side 1 at equal ts, so an exactly-equal right
    # timestamp is visible to the left row (<= / >= semantics both ways)
    r_tagged = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        r_struct.alias("__r"),
        F.lit(None).cast(l_type).alias("__l"),
    )
    l_tagged = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r_type).alias("__r"),
        l_struct.alias("__l"),
    )

    t_ord = F.col("__t").asc() if direction == "backward" else F.col("__t").desc()
    u = r_tagged.unionByName(l_tagged)

    if split_bucket_s is None:
        w = (
            Window.partitionBy(*[F.col(k) for k in keys])
            # the trailing __r sort makes equal-timestamp right rows resolve
            # deterministically (last() takes the greatest payload struct)
            .orderBy(t_ord, F.col("__side").asc(), F.col("__r").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = u.withColumn("__m", F.last("__r", ignorenulls=True).over(w))
    else:
        us = F.unix_micros(F.col("__t").cast("timestamp"))
        u = u.withColumn(
            "__bucket", F.floor(us / (int(split_bucket_s) * 1_000_000))
        )
        wb = (
            Window.partitionBy(*[F.col(k) for k in keys], F.col("__bucket"))
            .orderBy(t_ord, F.col("__side").asc(), F.col("__r").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        in_bucket = F.last("__r", ignorenulls=True).over(wb)

        # the window's "last right row in order" equals max_by over this
        # ordinal: (t, payload) for backward, (-t, payload) for forward —
        # both resolve equal timestamps to the greatest payload struct,
        # matching the window tie rule exactly
        r_us = F.unix_micros(F.col("__t").cast("timestamp"))
        ordinal = F.when(
            F.col("__side") == 0,
            F.struct(
                (r_us if direction == "backward" else -r_us).alias("o1"),
                F.col("__r").alias("o2"),
            ),
        )
        per_bucket = u.groupBy(*keys, "__bucket").agg(
            F.max_by("__r", ordinal).alias("__b")
        )
        b_ord = (
            F.col("__bucket").asc()
            if direction == "backward"
            else F.col("__bucket").desc()
        )
        wc = (
            Window.partitionBy(*[F.col(k) for k in keys])
            .orderBy(b_ord)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry = per_bucket.select(
            *keys,
            "__bucket",
            F.last("__b", ignorenulls=True).over(wc).alias("__carry"),
        )
        out = (
            u.withColumn("__ib", in_bucket)
            .join(carry, keys + ["__bucket"], "left")
            .withColumn("__m", F.coalesce(F.col("__ib"), F.col("__carry")))
            .drop("__ib", "__carry", "__bucket")
        )

    out = out.filter(F.col("__side") == 1)
    if tolerance_s is not None:
        # cast handles TIMESTAMP_NTZ inputs (unix_micros requires TIMESTAMP;
        # both sides shift identically, so the difference is unaffected)
        gap = F.abs(
            F.unix_micros(F.col("__t").cast("timestamp"))
            - F.unix_micros(F.col("__m.__mts").cast("timestamp"))
        )
        out = out.withColumn(
            "__m",
            F.when(gap <= int(tolerance_s * 1_000_000), F.col("__m")),
        )
    cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    cols.append(F.col("__m.__mts").alias(right_ts + suffix))
    cols.extend(F.col(f"__m.{c}").alias(c + suffix) for c in pay)
    return out.select(*cols)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str | list[str] | None = None,
    *,
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_s: int = 3600,
    inclusive_end: bool = False,
) -> DataFrame:
    """Range join: each ``points`` row paired with every ``intervals`` row
    whose ``[start, end)`` contains its timestamp (``inclusive_end`` makes
    the interval closed), optionally also matching on key columns ``on``.

    Plan: plain Spark turns ``start <= ts < end`` into a broadcast
    nested-loop or a cartesian product — O(|points| x |intervals|) per
    key. Here both sides are bucketized on coarse time buckets of
    ``bucket_s`` seconds: a point lands in exactly ONE bucket, an
    interval explodes into the ceil(span / bucket_s) buckets it overlaps,
    and the containment predicate runs only on the (key, bucket)
    equi-join's survivors. One shuffle on uniform (key, bucket) keys; the
    explosion factor is span/bucket_s, so pick ``bucket_s`` near the
    typical interval span (amplification ~2x). Each (point, interval)
    pair meets in exactly one bucket, so no post-join dedup is needed.
    Column name collisions between the two inputs are the caller's to
    resolve (select/alias first), like DataFrame.join.
    """
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    us = int(bucket_s) * 1_000_000

    p_us = F.unix_micros(F.col(point_ts).cast("timestamp"))
    p = points.withColumn("__bucket", F.floor(p_us / us))
    s_us = F.unix_micros(F.col(start_col).cast("timestamp"))
    e_us = F.unix_micros(F.col(end_col).cast("timestamp"))
    iv = intervals.withColumn(
        "__bucket",
        F.explode(F.sequence(F.floor(s_us / us), F.floor(e_us / us))),
    )

    cond = (F.col(point_ts) >= F.col(start_col)) & (
        F.col(point_ts) <= F.col(end_col)
        if inclusive_end
        else F.col(point_ts) < F.col(end_col)
    )
    joined = p.join(iv, keys + ["__bucket"], "inner").filter(cond)
    return joined.drop("__bucket")
