"""Token-budget shard packing — contiguous training-shard assignment.

Training pipelines cut a corpus into shards of ~B tokens each, in a
deterministic document order, so downstream loaders stream fixed-size
work units. The sequential formulation ("accumulate until the budget
overflows") looks inherently serial; the standard parallel equivalent is
``shard_id = exclusive_prefix_sum(tokens) DIV budget`` — identical
deterministic boundaries (a document straddling a budget edge belongs to
the shard where it starts), but expressible as a distributed prefix sum.

Scale shape: reuses the build's prefix-sum machinery
(``tsidx/docids.py::_prefix_sum_offsets``): range-partition the small
(doc_id, size) table, cumsum within sorted partitions, add
driver-collected per-partition totals — one bounded collect of
``num_partitions`` longs, never a data-scale window. A single-partition
``Window.orderBy(doc_id)`` would compute the same column through one
executor; this path keeps every partition busy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tsidx.docids import _prefix_sum_offsets
from tsidx.textstats import token_counts

__all__ = ["pack_shards", "shuffled_positions", "length_bucketed_batches"]


def shuffled_positions(
    docs: DataFrame,
    seed: int | str,
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic global training shuffle: every row gets a dense
    ``position`` (0..n-1) in the order of ``md5(seed ':' id)`` — the
    reproducible permutation training loaders need (same seed -> same
    order on any cluster size, any partitioning, any retry).

    Scale shape: a naive ``row_number() OVER (ORDER BY hash)`` funnels the
    corpus through ONE window partition; here the hash-ordered table goes
    through the same distributed prefix-sum as docID assignment
    (range-partition on the hash, in-partition cumsum, driver-collected
    per-partition totals — one bounded collect of num_partitions longs).
    Ties are broken by the id inside the hash preimage, so the order is a
    total one. Compose with :func:`pack_shards` semantics via
    ``position DIV docs_per_shard`` for shuffled fixed-size shards.
    """
    spark = docs.sparkSession
    n = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    n = max(1, min(n, 20000))
    key = F.md5(
        F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
    )
    sized = docs.select(
        key.alias("shuffle_key"),
        F.col(id_col),
        F.lit(1).cast("long").alias("size"),
    )
    off = _prefix_sum_offsets(sized, "shuffle_key", n)
    return off.select(
        id_col, "shuffle_key", F.col("offset").alias("position")
    )


def pack_shards(
    docs: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """(doc_id, n_tokens, shard_id): contiguous token-budget sharding in
    doc_id order — ``shard_id = (exclusive running token total) DIV
    budget``, whitespace token counts.
    """
    if budget <= 0:
        raise ValueError("pack_shards: budget must be positive")
    spark = docs.sparkSession
    n = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    n = max(1, min(n, 20000))
    sizes = token_counts(docs, text_col, id_col).select(
        F.col("doc_id"), F.col("n_ws_tokens").cast("long").alias("size")
    )
    off = _prefix_sum_offsets(sizes, "doc_id", n)
    return off.select(
        "doc_id",
        F.col("size").alias("n_tokens"),
        (F.col("offset") / F.lit(int(budget)))
        .cast("long")
        .alias("shard_id"),
    )


def length_bucketed_batches(
    docs: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """(doc_id, n_tokens, band, batch_id): padding-minimizing batch
    assignment — docs are grouped into power-of-two LENGTH BANDS
    (``band = floor(log2(n_tokens))``), and within each band packed into
    contiguous token-budget batches in doc_id order (same straddle rule
    as :func:`pack_shards`). Because a batch is padded to its longest
    member, banding bounds padding waste to < 2x by construction —
    the standard dynamic-batching prep for sequence-model training.

    ``batch_id`` is globally unique and deterministic:
    ``band * 2^40 + batch_in_band``.

    Scale shape: ONE distributed prefix sum over the composite
    ``(band, doc_id)`` range key (reusing the build's machinery —
    no data-scale window), then each band's running totals are rebased
    by the band's first offset via a **bounded** (≤ ~40 bands) aggregate
    joined back broadcast-size. Adding a band never re-shuffles the
    corpus; only the tiny rebase table changes.
    """
    if budget <= 0:
        raise ValueError("length_bucketed_batches: budget must be positive")
    spark = docs.sparkSession
    n = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    n = max(1, min(n, 20000))
    sizes = token_counts(docs, text_col, id_col).select(
        F.col("doc_id"),
        F.col("n_ws_tokens").cast("long").alias("size"),
    ).withColumn(
        # integer band = floor(log2(size)) computed WITHOUT floats
        # (bin-string length), so both engines band identically at
        # power-of-two boundaries where float log2 is off by one ulp
        "band",
        (
            F.length(F.expr("bin(greatest(size, 1))")) - F.lit(1)
        ).cast("long"),
    ).withColumn(
        # composite range key: band-major, doc_id-minor — one global
        # prefix sum whose per-band segments are contiguous
        "bkey",
        F.format_string("%02d:%020d", F.col("band"), F.col("doc_id")),
    )
    off = _prefix_sum_offsets(
        sizes.select("bkey", "doc_id", "band", "size"), "bkey", n
    )
    # rebase: the running total at each band's first doc (bounded agg)
    starts = off.groupBy("band").agg(F.min("offset").alias("_start"))
    return (
        off.join(starts, "band")
        .select(
            "doc_id",
            F.col("size").alias("n_tokens"),
            "band",
            (
                F.col("band") * F.lit(1 << 40)
                + ((F.col("offset") - F.col("_start")) / F.lit(int(budget)))
                .cast("long")
            ).alias("batch_id"),
        )
    )
