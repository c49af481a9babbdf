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
- The merge loop itself runs IN-PROCESS on the driver whenever the
  dictionary's estimated bytes fit a size gate (incremental pair stats +
  lazy heap — 30k merges in seconds), because ``n_merges`` distributed
  rounds = ``2·n_merges`` sequential bounded jobs, which is hours of pure
  scheduler overhead at real vocabulary sizes. The distributed per-round
  loop remains as the giant-dictionary fallback. Either way nothing
  CORPUS-scale is ever collected — the gate bounds the driver copy.

The result is deterministic, so it is pytest-verified against an
independent single-node reference implementation AND (since r5)
hash-checked by the driver gate: training applies each round's best pair
everywhere before the next round, so the loop unrolls into an n_merges-
stage SQL replay (see ``_bpe_chain_cte`` in ``__spark_entry__.py``).
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


#: collect the word dictionary to the driver and run the merge loop
#: in-process while its estimated serialized size fits this bound (same
#: size-gate pattern as tsidx/docids.py's offsets broadcast). A 30k-merge
#: vocabulary over the distributed loop means ~60k sequential bounded
#: Spark jobs — hours of scheduler overhead — while the dictionary itself
#: is usually a few hundred MB even at web scale.
DRIVER_DICT_MAX_BYTES = 512 << 20


def _train_bpe_driver(
    vocab: list, n_merges: int, min_pair: int
) -> list[tuple[str, str, int]]:
    """In-process merge loop over the collected ``[(syms, n), ...]``
    dictionary: incremental pair statistics (only words containing the
    merged pair are touched, as in Sennrich et al.'s reference trainer)
    plus a lazy max-heap, so 30k merges cost seconds, not 60k Spark jobs.

    Byte-identical to the distributed loop by construction: the same
    (count desc, pair asc) tie-break, and incremental stat updates that
    reproduce a full per-round recount (asserted by the path-equality
    tests in tests/test_bpe.py).
    """
    import heapq

    stats: dict = {}
    indices: dict = {}  # pair -> set of word indexes containing it
    for wi, (syms, freq) in enumerate(vocab):
        for pair in zip(syms, syms[1:]):
            stats[pair] = stats.get(pair, 0) + freq
            indices.setdefault(pair, set()).add(wi)
    heap = [(-c, p) for p, c in stats.items()]
    heapq.heapify(heap)

    merges: list[tuple[str, str, int]] = []
    for _ in range(int(n_merges)):
        best = None
        while heap:
            negc, pair = heapq.heappop(heap)
            cur = stats.get(pair, 0)
            if cur == -negc:
                best, best_cnt = pair, cur
                break
            if cur > 0:
                # stale entry: re-queue at the current count (lazy decrease)
                heapq.heappush(heap, (-cur, pair))
        if best is None or best_cnt < min_pair:
            break
        a, b = best
        merges.append((a, b, int(best_cnt)))
        merged = a + b
        for wi in sorted(indices.get(best, ())):
            syms, freq = vocab[wi]
            if best not in zip(syms, syms[1:]):
                continue  # stale index entry from an earlier rewrite
            res = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(merged)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            changed: dict = {}
            for p in zip(syms, syms[1:]):
                changed[p] = changed.get(p, 0) - freq
            for p in zip(res, res[1:]):
                changed[p] = changed.get(p, 0) + freq
            for p, d in changed.items():
                if d == 0:
                    continue
                cur = stats.get(p, 0) + d
                if cur <= 0:
                    stats.pop(p, None)
                else:
                    stats[p] = cur
                    if d > 0:
                        indices.setdefault(p, set()).add(wi)
                        heapq.heappush(heap, (-cur, p))
                # decreases stay lazy in the heap; pops self-correct
            vocab[wi] = (res, freq)
        stats.pop(best, None)
        indices.pop(best, None)
    return merges


def train_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_pair: int = 2,
    driver_dict_max_bytes: int = DRIVER_DICT_MAX_BYTES,
) -> list[tuple[str, str, int]]:
    """Learn *n_merges* BPE merges from the corpus; returns
    ``[(left, right, count), ...]`` in merge order. Stops early when no
    adjacent pair reaches *min_pair* weighted occurrences.

    The corpus-scale work is always the one ``word_counts`` aggregation.
    The merge loop then runs on the driver when the dictionary's
    estimated bytes fit *driver_dict_max_bytes* (the common case — and
    the only practical one for real 30k-merge vocabularies), falling
    back to the per-round distributed loop for giant dictionaries.
    """
    wc = word_counts(docs, text_col)
    est = wc.agg(
        F.count("*").alias("rows"),
        F.sum(F.length("word")).alias("chars"),
    ).collect()[0]
    # chars dominate (each becomes a ~60-byte Python str symbol); row
    # overhead covers the tuple + freq + per-word list
    est_bytes = int(est["chars"] or 0) * 64 + int(est["rows"] or 0) * 120
    if est_bytes <= driver_dict_max_bytes:
        rows = wc.collect()
        vocab = []
        for r in rows:
            w = r["word"]
            syms = list(w)
            syms[-1] = syms[-1] + _EOW
            vocab.append((syms, int(r["n"])))
        # deterministic input order (collect order is partition-dependent);
        # the algorithm itself is order-independent, but sorted input makes
        # failures reproducible
        vocab.sort(key=lambda t: t[0])
        return _train_bpe_driver(vocab, n_merges, min_pair)

    words = wc.withColumn("syms", _initial_symbols())
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
