"""Checkpoint-resumable index build with per-shard lineage manifests.

North-rule capability (no reference counterpart — the reference rebuilds its
in-memory index from scratch every run, ``samples/inverted_index/query.py:
10-19``): a 10^12-turn build must survive preemption and resume at partition
granularity.

Layout under ``path`` (parquet in the sandbox; the same layout maps to
Iceberg tables + snapshot commits on a real cluster):

    config.json                 build parameters + corpus stats (written once)
    docs/                       docID-assigned corpus, range-partitioned —
                                the docID checkpoint (ids are a pure function
                                of the input, but persisting them makes every
                                shard job a partition-pruned scan)
    postings/shard=K/           posting blocks of docID range K (parquet)
    manifest/shard-K.json       lineage row, written AFTER shard K's data —
                                its presence is the commit marker
    terms/ + meta.json          finalize step (idempotent, recomputed on
                                resume if missing)

Shards are docID ranges aligned to the posting-block size, so every posting
block is wholly inside one shard: the global index is the plain union of
shard outputs — no cross-shard merge, concatenation in block_id order is
free (SURVEY §2.4 N5). Each manifest row records the north rule's required
lineage: doc count, token count, posting bytes, and skew metrics (max block
df + the hottest term). All content is a pure function of the input table —
no wall-clock or random fields (SURVEY §7.2 determinism bans).

Resume = set difference between planned shards and committed manifest
markers; a killed build redoes at most one shard. Writing data before the
marker makes the commit atomic-enough for object stores (orphan data from a
crashed shard is overwritten on retry with mode=overwrite).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tsidx.build import DEFAULT_BLOCK_SIZE, make_fused_block_builder
from tsidx.docids import assign_doc_ids, check_unique_keys
from tsidx.index import InvertedIndex
from tsidx.io import read_table, write_table
from tsidx.oracle import B, K1
from tsidx.ship import ensure_shipped

__all__ = ["build_index_resumable", "pending_shards", "read_manifest", "read_index_at"]


def _config_path(path: str) -> str:
    return os.path.join(path, "config.json")


def _manifest_dir(path: str) -> str:
    return os.path.join(path, "manifest")


def _shard_marker(path: str, shard: int) -> str:
    return os.path.join(_manifest_dir(path), f"shard-{shard}.json")


def read_manifest(path: str) -> list[dict]:
    """All committed shard lineage rows, in shard order."""
    mdir = _manifest_dir(path)
    if not os.path.isdir(mdir):
        return []
    rows = []
    for name in sorted(os.listdir(mdir)):
        if name.startswith("shard-") and name.endswith(".json"):
            with open(os.path.join(mdir, name)) as f:
                rows.append(json.load(f))
    return sorted(rows, key=lambda r: r["shard_id"])


def pending_shards(path: str) -> list[int]:
    with open(_config_path(path)) as f:
        cfg = json.load(f)
    done = {r["shard_id"] for r in read_manifest(path)}
    return [s for s in range(cfg["n_shards"]) if s not in done]


def _dir_bytes(d: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(d):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def _prepare(
    spark: SparkSession,
    transcripts: DataFrame,
    path: str,
    order_cols: tuple[str, ...],
    block_size: int,
    shard_size: int,
    codec: str,
    check_unique: bool,
    num_partitions: int | None,
) -> dict:
    """First-run setup: docID checkpoint + config. Idempotent."""
    cfg_path = _config_path(path)
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            return json.load(f)
    if check_unique:
        check_unique_keys(transcripts, order_cols)
    os.makedirs(path, exist_ok=True)
    docs = assign_doc_ids(transcripts, order_cols, num_partitions=num_partitions)
    n_parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    write_table(
        docs.repartitionByRange(n_parts, "doc_id").sortWithinPartitions("doc_id"),
        os.path.join(path, "docs"),
    )
    n_docs = read_table(spark, os.path.join(path, "docs")).count()
    cfg = {
        "order_cols": list(order_cols),
        "block_size": int(block_size),
        "shard_size": int(shard_size),
        "codec": codec,
        "n_docs": int(n_docs),
        "n_shards": (n_docs + shard_size - 1) // shard_size if n_docs else 0,
        "k1": K1,
        "b": B,
        "version": 1,
    }
    with open(cfg_path, "w") as f:
        json.dump(cfg, f, indent=2, sort_keys=True)
    return cfg


def _build_shard(spark: SparkSession, path: str, cfg: dict, shard: int) -> None:
    lo, hi = shard * cfg["shard_size"], (shard + 1) * cfg["shard_size"]
    docs = read_table(spark, os.path.join(path, "docs"))
    # doc_id range predicate prunes the range-partitioned docs scan
    shard_docs = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
    from tsidx.index import POSTINGS_ARRAY_SCHEMA, POSTINGS_VARBYTE_SCHEMA

    schema = (
        POSTINGS_VARBYTE_SCHEMA
        if cfg["codec"] == "varbyte"
        else POSTINGS_ARRAY_SCHEMA
    )
    postings = (
        shard_docs.select(
            "doc_id", "text",
            F.expr(f"doc_id DIV {int(cfg['block_size'])}").alias("block_id"),
        )
        .groupBy("block_id")
        .applyInPandas(make_fused_block_builder(cfg["codec"]), schema=schema)
    )
    out_dir = os.path.join(path, "postings", f"shard={shard}")
    write_table(postings, out_dir)

    built = read_table(spark, out_dir)
    stats = built.agg(
        F.count("*").alias("n_blocks"),
        F.sum("block_df").alias("n_postings"),
        F.count_distinct("term").alias("n_terms"),
        F.max("block_df").alias("max_block_df"),
        F.sum("sum_tf").alias("token_count"),
    ).collect()[0]
    hot = (
        built.groupBy("term")
        .agg(F.sum("block_df").alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(1)
        .collect()
    )
    doc_count = shard_docs.count()
    row = {
        "shard_id": shard,
        "doc_lo": lo,
        "doc_hi": min(hi, cfg["n_docs"]),
        "doc_count": int(doc_count),
        "token_count": int(stats["token_count"] or 0),
        "n_blocks": int(stats["n_blocks"] or 0),
        "n_postings": int(stats["n_postings"] or 0),
        "n_terms": int(stats["n_terms"] or 0),
        "max_block_df": int(stats["max_block_df"] or 0),
        "hot_term": hot[0]["term"] if hot else None,
        "hot_term_df": int(hot[0]["df"]) if hot else 0,
        "posting_bytes": _dir_bytes(out_dir),
    }
    os.makedirs(_manifest_dir(path), exist_ok=True)
    marker = _shard_marker(path, shard)
    with open(marker + ".tmp", "w") as f:
        json.dump(row, f, indent=2, sort_keys=True)
    os.replace(marker + ".tmp", marker)  # commit point


def _finalize(spark: SparkSession, path: str, cfg: dict) -> InvertedIndex:
    postings = read_table(
        spark, os.path.join(path, "postings"),
        base_path=os.path.join(path, "postings"),
    ).drop("shard")
    terms_dir = os.path.join(path, "terms")
    meta_path = os.path.join(path, "meta.json")
    if not os.path.exists(meta_path):
        terms = postings.groupBy("term").agg(F.sum("block_df").alias("df"))
        write_table(
            terms.repartitionByRange(4, "term").sortWithinPartitions("term"),
            terms_dir,
        )
        manifest = read_manifest(path)
        total_tokens = sum(r["token_count"] for r in manifest)
        meta = {
            "n_docs": cfg["n_docs"],
            "total_tokens": total_tokens,
            "avgdl": (total_tokens / cfg["n_docs"]) if cfg["n_docs"] else 0.0,
            "k1": cfg["k1"],
            "b": cfg["b"],
            "block_size": cfg["block_size"],
            "codec": cfg["codec"],
            "order_cols": cfg["order_cols"],
            "pinned": [],
            "version": cfg["version"],
        }
        with open(meta_path + ".tmp", "w") as f:
            json.dump(meta, f, indent=2, sort_keys=True)
        os.replace(meta_path + ".tmp", meta_path)
    with open(meta_path) as f:
        meta = json.load(f)
    pinned = set(meta.pop("pinned", []))
    manifest_rows = read_manifest(path)
    manifest_df = (
        spark.createDataFrame(manifest_rows) if manifest_rows else None
    )
    return InvertedIndex(
        docs=read_table(spark, os.path.join(path, "docs")),
        postings=postings,
        terms=read_table(spark, terms_dir),
        meta=meta,
        manifest=manifest_df,
        pinned=pinned,
    )


def build_index_resumable(
    transcripts: DataFrame,
    path: str,
    *,
    order_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    block_size: int = DEFAULT_BLOCK_SIZE,
    shard_size: int | None = None,
    codec: str = "varbyte",
    check_unique: bool = True,
    num_partitions: int | None = None,
    max_shards: int | None = None,
) -> InvertedIndex | None:
    """Build (or resume building) a persistent index at *path*.

    ``max_shards`` limits how many shards this invocation builds (used by
    tests to simulate preemption and by operators to budget a run); when
    shards remain, returns ``None`` — call again to continue. On completion
    returns the loaded :class:`InvertedIndex`.
    """
    spark = transcripts.sparkSession
    ensure_shipped(spark)
    if shard_size is None:
        shard_size = 8 * block_size
    if shard_size % block_size != 0:
        raise ValueError("shard_size must be a multiple of block_size")
    cfg = _prepare(
        spark, transcripts, path, order_cols, block_size, shard_size, codec,
        check_unique, num_partitions,
    )
    todo = pending_shards(path)
    if max_shards is not None:
        todo = todo[:max_shards]
    for shard in todo:
        _build_shard(spark, path, cfg, shard)
    if pending_shards(path):
        return None
    return _finalize(spark, path, cfg)


def read_index_at(
    spark: SparkSession, path: str, through_shard: int
) -> InvertedIndex:
    """Time-travel read: the index exactly as it stood at shard
    *through_shard*'s commit marker — the lineage manifests double as a
    snapshot log (the parquet analog of Iceberg snapshot reads; on a real
    cluster the same call maps to a snapshot-id table read).

    Reconstruction: postings are partition-pruned to ``shard <=
    through_shard`` (the ``shard=K`` directory layout makes this a
    scan-level prune, not a post-scan filter), docs are cut at the
    manifest's committed ``doc_hi``, the (term, df) dictionary is
    re-aggregated over the surviving postings (a vocabulary-sized agg —
    the price of not having per-snapshot dictionaries), and the BM25
    stats (n_docs, total_tokens, avgdl) are summed from the committed
    lineage rows. Scores over the snapshot are therefore identical to a
    fresh build over the truncated corpus — asserted in
    tests/test_resume.py.

    Raises ``ValueError`` if any shard ``<= through_shard`` has no commit
    marker (snapshots exist only at committed prefixes: shards commit in
    doc_id order, so a prefix of markers is the only consistent cut).
    """
    cfg_path = _config_path(path)
    if not os.path.exists(cfg_path):
        raise ValueError(
            f"{path} is not a resumable-layout index (no config.json): "
            "snapshots exist only for build_index_resumable outputs"
        )
    with open(cfg_path) as f:
        cfg = json.load(f)
    if not 0 <= through_shard < cfg["n_shards"]:
        raise ValueError(
            f"through_shard {through_shard} outside [0, {cfg['n_shards']})"
        )
    manifest = [
        r for r in read_manifest(path) if r["shard_id"] <= through_shard
    ]
    if len(manifest) != through_shard + 1:
        have = {r["shard_id"] for r in manifest}
        missing = sorted(set(range(through_shard + 1)) - have)
        raise ValueError(f"uncommitted shards in snapshot prefix: {missing}")
    doc_hi = manifest[-1]["doc_hi"]
    postings = (
        read_table(
            spark, os.path.join(path, "postings"),
            base_path=os.path.join(path, "postings"),
        )
        .filter(F.col("shard") <= through_shard)
        .drop("shard")
    )
    docs = read_table(spark, os.path.join(path, "docs")).filter(
        F.col("doc_id") < doc_hi
    )
    terms = postings.groupBy("term").agg(F.sum("block_df").alias("df"))
    n_docs = sum(r["doc_count"] for r in manifest)
    total_tokens = sum(r["token_count"] for r in manifest)
    meta = {
        "n_docs": n_docs,
        "total_tokens": total_tokens,
        "avgdl": (total_tokens / n_docs) if n_docs else 0.0,
        "k1": cfg["k1"],
        "b": cfg["b"],
        "block_size": cfg["block_size"],
        "codec": cfg["codec"],
        "order_cols": cfg["order_cols"],
        "version": cfg["version"],
    }
    return InvertedIndex(
        docs=docs,
        postings=postings,
        terms=terms,
        meta=meta,
        manifest=spark.createDataFrame(manifest),
        pinned=set(),
    )
