"""Distributed BPE (byte-pair-encoding) vocabulary induction.

Training-data-pipeline extension (no reference counterpart): learn a
subword merge table from the corpus, the Sennrich et al. 2016 algorithm
re-expressed for Spark's execution model.

Scale design — the one that survives 100 TB:

- The CORPUS-scale work is a single aggregation: ``text -> words ->
  (word, count)``. Classic BPE trains on the word-frequency dictionary,
  not the raw token stream, so everything after that first agg operates
  on a DICTIONARY-bounded table (~10^6-10^7 rows even at web scale).
- Each merge round is one small job over the dictionary: adjacent-pair
  counts weighted by word frequency (JVM ``transform`` + explode + one
  partial-agg'd groupBy), a 1-row TakeOrdered for the best pair
  (deterministic tie-break: count desc, pair asc), and an Arrow-batched
  re-segmentation of the words that contain the pair (only those rows
  are rewritten; the pandas loop runs over dictionary rows, never corpus
  rows).
- ``n_merges`` rounds = ``n_merges`` bounded jobs; the driver holds one
  (pair, count) row per round. Nothing data-scale is ever collected.

The result is deterministic, so it is pytest-verified against an
independent single-node reference implementation; the iterative loop is
not SQL-expressible, so its driver-gate entry is rows-only (the word
count table that feeds it IS oracle-checked).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["word_counts", "train_bpe", "bpe_segment"]

_EOW = "</w>"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n): corpus word-frequency dictionary — the single
    corpus-scale aggregation of BPE training (whitespace-run splitting,
    identical to the index tokenizer's word breaking, case preserved)."""
    return (
        docs.select(
            F.explode(
                F.split(F.trim(F.col(text_col)), r"\s+")
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("n"))
    )


def _initial_symbols():
    """word -> [c1, c2, ..., cn</w>] (end-of-word marker fused to the last
    character, as in the original algorithm)."""
    chars = F.split(F.col("word"), "")
    n = F.size(chars)
    return F.transform(
        chars,
        lambda c, i: F.when(i == n - 1, F.concat(c, F.lit(_EOW))).otherwise(c),
    )


def _merge_batch_fn(a: str, b: str):
    """Arrow-batched re-segmentation: replace adjacent (a, b) with a+b in
    each symbol array. Runs only over dictionary rows containing the pair."""

    def fn(batches):
        merged = a + b
        for pdf in batches:
            out = []
            for syms in pdf["syms"]:
                syms = list(syms)
                res = []
                i = 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        res.append(merged)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                out.append(res)
            pdf = pdf.copy()
            pdf["syms"] = out
            yield pdf

    return fn


def train_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_pair: int = 2,
) -> list[tuple[str, str, int]]:
    """Learn *n_merges* BPE merges from the corpus; returns
    ``[(left, right, count), ...]`` in merge order. Stops early when no
    adjacent pair reaches *min_pair* weighted occurrences.
    """
    words = word_counts(docs, text_col).withColumn("syms", _initial_symbols())
    # the dictionary is the working set for every round: materialize it
    # once so no round recomputes the corpus-scale aggregation
    words = words.select("n", "syms").persist()
    words.count()
    n_parts = words.rdd.getNumPartitions()

    merges: list[tuple[str, str, int]] = []
    try:
        for _ in range(int(n_merges)):
            pairs = words.select(
                "n",
                F.explode(
                    F.expr(
                        "transform(slice(syms, 1, size(syms) - 1), "
                        "(s, i) -> struct(s as a, syms[i + 1] as b))"
                    )
                ).alias("p"),
            )
            top = (
                pairs.groupBy("p.a", "p.b")
                .agg(F.sum("n").alias("cnt"))
                .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
                .limit(1)
                .collect()
            )
            if not top or top[0]["cnt"] < min_pair:
                break
            a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
            merges.append((a, b, cnt))
            has_pair = F.exists(
                F.expr(
                    "transform(slice(syms, 1, size(syms) - 1), "
                    "(s, i) -> struct(s as a, syms[i + 1] as b))"
                ),
                lambda p: (p["a"] == F.lit(a)) & (p["b"] == F.lit(b)),
            )
            touched = (
                words.filter(has_pair)
                .mapInPandas(_merge_batch_fn(a, b), schema="n long, syms array<string>")
            )
            # Two per-round growth traps, both measured fatal by merge
            # ~10: (a) the union references the previous round's plan
            # twice, so the LOGICAL PLAN doubles per merge without
            # truncation; (b) the union CONCATENATES partitions, so the
            # PARTITION COUNT doubles per merge (8 -> 2048 by round 8 =
            # thousands of empty tasks/round). Coalesce pins the
            # partition count; the eager localCheckpoint flattens the
            # plan (a real cluster would configure a checkpoint dir).
            new_words = (
                words.filter(~has_pair)
                .unionByName(touched)
                .coalesce(n_parts)
                .localCheckpoint(eager=True)
            )
            words.unpersist()
            words = new_words
    finally:
        words.unpersist()
    return merges


def bpe_segment(
    docs: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_words, n_pieces): apply a learned merge table to each doc —
    the tokenizer-side use of the vocabulary. Map-only (one Arrow pass,
    merge table broadcast via closure); the per-word segmentation is
    memoized per batch, so the Python cost is bounded by the batch's
    distinct-word count, not its token count."""
    ranks = {(m[0], m[1]): i for i, m in enumerate(merges)}

    def seg_word(word: str, cache: dict) -> int:
        got = cache.get(word)
        if got is not None:
            return got
        syms = list(word)
        if syms:
            syms[-1] = syms[-1] + _EOW
        while len(syms) > 1:
            best, best_rank = None, None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = i, r
            if best is None:
                break
            syms[best : best + 2] = [syms[best] + syms[best + 1]]
        cache[word] = len(syms)
        return len(syms)

    def fn(batches):
        cache: dict = {}
        for pdf in batches:
            n_words, n_pieces = [], []
            for text in pdf[text_col]:
                ws = str(text).split()
                n_words.append(len(ws))
                n_pieces.append(sum(seg_word(w, cache) for w in ws))
            pdf = pdf[[id_col]].copy()
            pdf["n_words"] = n_words
            pdf["n_pieces"] = n_pieces
            yield pdf

    return docs.select(id_col, text_col).mapInPandas(
        fn, schema=f"{id_col} long, n_words long, n_pieces long"
    )
