"""Volume-derived shuffle sizing.

``spark.sql.shuffle.partitions`` is a runtime conf, so jobs can (and
should) derive it from the input actually being processed instead of
pinning it to the core count at session build time. AQE coalesces
oversized partition counts DOWN after each stage but never splits an
undersized count UP — so the static setting must be the ceiling sized
for the data volume, not the floor sized for the machine. Measured
consequence of pinning to ``max(cpus, 8)``: the sf1.0 backoff_lm trigram
aggregation (83M trigrams) ran 17.8x slower on 10x data because 32
partitions each carried ~2.6M groups (BENCH/BASELINE.md round-3 table).

The estimate is deliberately crude: on-disk parquet bytes times a fixed
decompression expansion, targeting ~128 MB of in-memory data per reduce
partition (the industry-standard sweet spot; Spark's own
``maxPartitionBytes`` default). Crude is fine — AQE trims the excess at
runtime, so only the order of magnitude matters, and the floor keeps
small inputs at full core utilization.
"""

from __future__ import annotations

import math
import os

__all__ = [
    "PARQUET_EXPANSION",
    "TOKEN_EXPANSION",
    "dir_input_bytes",
    "shuffle_partitions_for",
    "tune_shuffle",
]

#: assumed in-memory expansion of snappy-compressed parquet text columns
#: (measured 2.5-3.5x on the testdata transcript tables)
PARQUET_EXPANSION = 3.0

#: expansion for token-level workloads (index builds, n-gram LMs): a
#: ~6-byte token becomes a shuffled row of 1-3 short strings plus ids
#: (~50-80 B), on top of the parquet decompression — the sf1.0 trigram
#: frame is ~83M rows / ~5-6 GB of shuffle from ~750 MB of parquet.
#: Jobs whose dominant shuffle is per-token rows should size with this.
TOKEN_EXPANSION = 24.0

#: target in-memory bytes per reduce partition (~128 MB)
TARGET_PARTITION_BYTES = 128 << 20


def dir_input_bytes(path: str) -> int:
    """Total bytes of data files under *path* (recursive; skips hidden
    and _SUCCESS-style marker files). Local filesystems only — a real
    cluster reads the size from the table catalog / FileIndex instead."""
    if os.path.isfile(path):
        try:
            return os.path.getsize(path)
        except OSError:
            return 0
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.startswith((".", "_")):
                continue
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def shuffle_partitions_for(
    input_bytes: int,
    cpus: int,
    *,
    expansion: float = PARQUET_EXPANSION,
    target_bytes: int = TARGET_PARTITION_BYTES,
) -> int:
    """Reduce-partition count for a job over *input_bytes* of on-disk
    input: ceil(in-memory bytes / 128 MB), floored at the core count so
    small inputs still use every core. No upper cap on purpose — at
    100 TB the right answer IS hundreds of thousands of reduce
    partitions, and AQE coalesces whatever a given stage doesn't need."""
    est = max(0, input_bytes) * expansion
    return max(int(cpus), 8, math.ceil(est / float(target_bytes)))


def tune_shuffle(
    spark,
    *paths: str,
    cpus: int | None = None,
    replicas: float = 1.0,
    expansion: float = PARQUET_EXPANSION,
) -> int:
    """Set ``spark.sql.shuffle.partitions`` for the volume under *paths*
    (summed, times *replicas* for jobs that expand the input in memory).
    Returns the value set. Call after session creation, before the first
    shuffle; per-query overrides remain possible the same way."""
    if cpus is None:
        cpus = spark.sparkContext.defaultParallelism
    total = sum(dir_input_bytes(p) for p in paths)
    n = shuffle_partitions_for(int(total * replicas), cpus, expansion=expansion)
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    return n
