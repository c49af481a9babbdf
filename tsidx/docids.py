"""Deterministic dense docID assignment under stable (conv_id, turn_idx) order.

The reference's docID space is document insertion order
(``/root/reference/ts_type_filter/inverted_index.py:42,53,99-101``); the Spark
analog is a total order on ``(conv_id, turn_idx)`` (FIXTURES.md §1). Two
implementations:

- ``window``: global ``row_number()`` — correct but single-partition; test
  scale only.
- ``conv_offset`` (default): exploits the input invariant that ``turn_idx``
  is dense 0..n-1 within each conversation (FIXTURES.md §1):
  ``doc_id = conv_offset(conv_id) + turn_idx`` where the offsets come from a
  per-conversation count (a map-side-combined shuffle of (conv_id, 1) pairs
  — ~avg-turns× smaller than the corpus), a distributed prefix sum over the
  tiny offsets table, and a join back (broadcast while the estimated
  offsets bytes stay under ``BROADCAST_OFFSETS_MAX_BYTES``). The corpus
  itself is NEVER exchanged: no sampling and no full-row shuffle of the
  raw turns. The offsets table's own prefix sum does depend on a sampled
  range partitioning of the (small) sizes table, so it is pinned by an
  eager ``localCheckpoint`` before anything consumes it (see
  ``_prefix_sum_offsets``); the intermediate caches are then freed. Falls
  back to ``prefix_sum`` automatically when density doesn't hold.
- ``prefix_sum``: range-repartition on the order columns, sort
  within partitions, count rows per partition, exclusive prefix sum on the
  driver, then ``doc_id = partition_offset + position_within_partition``.
  The in-partition position comes from ``monotonically_increasing_id()``,
  which is defined as ``partition_id << 33 + row position``: subtracting the
  shifted partition id recovers the position entirely JVM-side inside
  whole-stage codegen — no Python/Arrow round trip of the corpus (an earlier
  ``mapInPandas`` version of this step anti-scaled 8->32 cores). This is the
  scale-correct zipWithIndex pattern without RDDs: one extra count job, no
  global sort bottleneck. Because range partitions are globally ordered and
  rows are sorted within each partition, the resulting ids realize the same
  total order regardless of where the sampled range boundaries fall.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["assign_doc_ids", "check_unique_keys"]


def check_unique_keys(df: DataFrame, order_cols: tuple[str, ...]) -> None:
    """Reject duplicate documents — the distributed analog of the reference's
    duplicate-add check (``inverted_index.py:49-50``)."""
    dup = df.groupBy(*order_cols).count().filter(F.col("count") > 1).limit(1).collect()
    if dup:
        key = {c: dup[0][c] for c in order_cols}
        raise ValueError(f"duplicate document key: {key}")


#: broadcast the conv-offsets table only while its estimated serialized size
#: stays under this bound (row-count alone is the wrong proxy: 5M
#: (string, long) rows are already hundreds of MB on every executor)
BROADCAST_OFFSETS_MAX_BYTES = 64 << 20


def _prefix_sum_offsets(sizes: DataFrame, key: str, n: int) -> DataFrame:
    """(key, size) -> (key, offset, size): exclusive prefix sum in *key*
    order, computed distributed: range-partition the (small) sizes table,
    cumsum within each sorted partition, add driver-collected partition
    offsets. Deterministic regardless of sampled range boundaries.

    The result is eagerly ``localCheckpoint``-ed before returning: the
    collected per-partition totals are only valid for the *sampled* range
    boundaries, so a lazy recompute could re-sample and mis-assign offsets
    — the checkpoint pins the materialized rows (a lost executor fails the
    job instead of silently recomputing wrong) and lets the intermediate
    cache be freed immediately instead of leaking across builds."""
    ranged = sizes.repartitionByRange(n, key).sortWithinPartitions(key)
    ranged.persist(StorageLevel.MEMORY_AND_DISK)
    part_totals = {
        r["pid"]: r["total"]
        for r in ranged.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.sum("size").alias("total"))
        .collect()
    }
    part_offsets = []
    running = 0
    for pid in range(n):
        part_offsets.append(running)
        running += part_totals.get(pid, 0)
    bc = ranged.sparkSession.sparkContext.broadcast(part_offsets)
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in ranged.schema.fields)

    # running within-partition cumsum over the sorted sizes (a window with
    # partitionBy(spark_partition_id()) would trigger a reshuffle and
    # scramble partition ids — this pass stays pinned to the range layout)
    def _cumsum(batches):
        import numpy as np
        from pyspark import TaskContext

        run = bc.value[TaskContext.get().partitionId()]
        for pdf in batches:
            sizes = pdf["size"].to_numpy()
            pdf = pdf.copy()
            pdf["offset"] = run + np.concatenate(
                ([0], np.cumsum(sizes[:-1]))
            ) if len(sizes) else np.empty(0, dtype="int64")
            run += int(sizes.sum())
            yield pdf

    out = ranged.mapInPandas(_cumsum, schema=f"{fields}, offset long")
    out = out.localCheckpoint(eager=True)
    ranged.unpersist()
    return out


def assign_doc_ids(
    df: DataFrame,
    order_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    method: str = "conv_offset",
    num_partitions: int | None = None,
    return_count: bool = False,
):
    """Return *df* plus a dense ``doc_id`` column realizing the total order
    given by *order_cols* (0-based, no gaps).

    With ``return_count=True`` returns ``(df, n_rows)`` — the prefix-sum
    path already collects per-partition counts, so the total is free (saves
    callers a separate count job over the corpus).

    NOTE (prefix_sum): the returned frame reads from a *persisted* range
    partitioning. That cache is load-bearing for correctness, not just
    speed: range boundaries come from sampling, and the collected
    per-partition counts are only valid for the sampled boundaries — a
    recompute could re-sample and mis-assign ids against stale offsets.
    """
    if method == "window":
        w = Window.orderBy(*[F.col(c).asc() for c in order_cols])
        out = df.withColumn("doc_id", F.row_number().over(w) - F.lit(1))
        return (out, df.count()) if return_count else out

    spark = df.sparkSession
    if method == "conv_offset":
        if len(order_cols) != 2:
            method = "prefix_sum"
        else:
            group_col, idx_col = order_cols
            n = num_partitions or int(
                spark.conf.get("spark.sql.shuffle.partitions", "32")
            )
            n = max(1, min(n, 20000))
            sizes = df.groupBy(group_col).agg(
                F.count("*").alias("size"),
                F.min(idx_col).alias("_lo"),
                F.max(idx_col).alias("_hi"),
            )
            sizes.persist(StorageLevel.MEMORY_AND_DISK)
            bad = (
                sizes.filter(
                    (F.col("_lo") != 0) | (F.col("_hi") != F.col("size") - 1)
                )
                .limit(1)
                .count()
            )
            if bad:
                sizes.unpersist()
                method = "prefix_sum"  # turn_idx not dense — general path
            else:
                offsets = _prefix_sum_offsets(
                    sizes.select(group_col, "size"), group_col, n
                )
                sizes.unpersist()  # offsets is checkpointed; nothing else reads it
                stats = offsets.agg(
                    F.sum("size").alias("t"),
                    F.count("*").alias("n_convs"),
                    F.avg(F.length(group_col)).alias("key_len"),
                ).collect()[0]
                total = stats["t"] or 0
                off = offsets.select(group_col, "offset")
                # conversations are ~avg-turns× fewer than turns; broadcast
                # only while the estimated serialized table (key bytes +
                # 8-byte offset + per-row overhead) fits the byte bound —
                # row count alone undercounts long conv_ids; beyond it,
                # co-partitioned shuffle join (Catalyst/AQE picks SMJ)
                est_bytes = int(stats["n_convs"] or 0) * (
                    float(stats["key_len"] or 0.0) + 28.0
                )
                if est_bytes <= BROADCAST_OFFSETS_MAX_BYTES:
                    off = F.broadcast(off)
                out = df.join(off, group_col).withColumn(
                    "doc_id",
                    (F.col("offset") + F.col(idx_col).cast("long")).cast("long"),
                ).drop("offset")
                return (out, int(total)) if return_count else out

    if method != "prefix_sum":
        raise ValueError(f"unknown docid method: {method}")

    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    n = max(1, min(n, 20000))
    ranged = df.repartitionByRange(n, *order_cols).sortWithinPartitions(*order_cols)
    ranged.persist(StorageLevel.MEMORY_AND_DISK)
    counts = {
        row["pid"]: row["count"]
        for row in ranged.groupBy(F.spark_partition_id().alias("pid")).count().collect()
    }
    offsets = []
    running = 0
    for pid in range(n):
        offsets.append(running)
        running += counts.get(pid, 0)

    pid = F.spark_partition_id().cast("long")
    pos = F.monotonically_increasing_id() - F.shiftleft(pid, 33)
    offset = F.element_at(
        F.array(*[F.lit(o) for o in offsets]), (pid + 1).cast("int")
    )
    out = ranged.withColumn("doc_id", (offset + pos).cast("long"))
    return (out, running) if return_count else out
