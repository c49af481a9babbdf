"""CCNet-style language-model quality scoring: per-document cross-entropy
under an add-alpha-smoothed bigram LM.

CCNet (Wenzek et al., 2020) ranks web documents by the perplexity of a
reference LM and keeps the low-perplexity head/middle as training data.
This module reproduces that signal with a bigram model the engine can
both *train* and *apply* as pure DataFrame plans:

  p(w2 | w1) = (c(w1 w2) + alpha) / (c(w1 .) + alpha * V)

where ``c(w1 w2)`` is the corpus bigram count, ``c(w1 .)`` the count of
``w1`` as a bigram left-context, and ``V`` the unigram vocabulary size.
A document's score is its token-averaged negative log-probability
(cross-entropy, nats); perplexity is ``exp`` of it. Lower = more fluent
under the reference corpus.

Scale design:
- Training is two partial-aggregated groupBys over the exploded bigram
  stream (map-side combine collapses each partition to its distinct
  bigrams before the shuffle, so shuffle volume is bounded by distinct
  bigrams per partition, not token count). Vocabulary V is bounded by
  distinct tokens, so the model table is O(distinct bigrams) — for web
  text ~10^8-10^9 rows at worst, still ~10^-4 of a 100 TB corpus.
- Scoring joins the corpus bigram stream to the model on (w1, w2). The
  model is broadcast when it fits (`broadcast_model=True`, correct for
  curated reference LMs a la CCNet); otherwise it is a shuffle
  hash-join on the composite key, which AQE will convert to broadcast
  at runtime when the built model turns out small.
- Unseen bigrams (scoring corpus != training corpus) still get a
  nonzero smoothed probability; they only need the left-context count,
  joined from the much smaller unigram table.

No reference-repo equivalent; training-data-pipeline operator per the
build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "doc_bigrams",
    "train_bigram_lm",
    "bigram_lm_score",
    "ppl_buckets",
    "dsir_log_weights",
    "dsir_resample",
    "doc_trigrams",
    "train_backoff_lm",
    "backoff_lm_score",
]


def doc_bigrams(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(id_col, w1, w2)`` — one row per adjacent token pair, in-doc
    multiplicity preserved. Docs with < 2 tokens emit no rows.

    The token array is materialized as its own projection BEFORE the
    transform lambda references it. Inlining ``split(...)`` into the
    lambda body instead makes the split re-evaluate per element —
    O(tokens²) per doc — and Catalyst's CollapseProject will NOT undo
    the explicit projection (it refuses to duplicate non-cheap
    expressions). Measured 16x on 80k transcript turns (19.0s -> 1.2s,
    identical 4.25M-row output)."""
    with_t = docs.select(
        F.col(id_col), F.split(F.trim(F.col(text_col)), r"\s+").alias("_t")
    )
    pairs = F.expr(
        "transform(sequence(1, greatest(size(_t) - 1, 1)),"
        " i -> struct(element_at(_t, i) AS w1, element_at(_t, i + 1) AS w2))"
    )
    guarded = F.when(F.size("_t") >= 2, pairs).otherwise(
        F.array().cast("array<struct<w1:string,w2:string>>")
    )
    return with_t.select(
        F.col(id_col), F.explode(guarded).alias("bg")
    ).select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))


def train_bigram_lm(
    corpus: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame, int]:
    """Train the LM: returns ``(bigram_counts, context_counts, V)``.

    ``bigram_counts`` = (w1, w2, c12); ``context_counts`` = (w1, c1)
    where c1 counts w1 as a bigram left-context; ``V`` = unigram
    vocabulary size over ALL tokens (a driver-side scalar — one count
    per job, not per row).
    """
    bg = doc_bigrams(corpus, id_col=id_col, text_col=text_col)
    bigram_counts = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    # c1 (w1's total bigram count) re-aggregates the vocabulary^2-bounded
    # c12 table instead of the corpus-scale bigram stream: one fewer full
    # evaluation of the doc_bigrams pipeline, identical counts.
    context_counts = bigram_counts.groupBy("w1").agg(
        F.sum("c12").alias("c1")
    )
    vocab = (
        corpus.select(
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w")
        )
        .agg(F.countDistinct("w").alias("v"))
        .collect()[0]["v"]
    )
    return bigram_counts, context_counts, int(vocab)


def bigram_lm_score(
    docs: DataFrame,
    *,
    model: tuple[DataFrame, DataFrame, int] | None = None,
    alpha: float = 0.1,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-doc ``(id_col, n_bigrams, xent, ppl)``.

    ``xent`` = mean over the doc's bigrams of ``-ln p(w2|w1)`` (nats);
    ``ppl = exp(xent)``. Docs with < 2 tokens get ``n_bigrams = 0`` and
    NULL xent/ppl. When ``model`` is None the LM is trained on ``docs``
    itself (self-scoring, the deterministic small-scale mode); pass a
    model trained on a curated reference corpus for the CCNet setup.
    """
    if model is None:
        model = train_bigram_lm(docs, id_col=id_col, text_col=text_col)
    bigram_counts, context_counts, vocab = model
    if broadcast_model:
        bigram_counts = F.broadcast(bigram_counts)
        context_counts = F.broadcast(context_counts)

    bg = doc_bigrams(docs, id_col=id_col, text_col=text_col)
    scored = (
        bg.join(context_counts, on="w1", how="left")
        .join(bigram_counts, on=["w1", "w2"], how="left")
        .select(
            id_col,
            (
                -F.log(
                    (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(alpha))
                    / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(alpha) * vocab)
                )
            ).alias("nll"),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.avg("nll").alias("xent"),
    )
    # Re-attach zero-bigram docs (explode dropped them).
    all_ids = docs.select(id_col)
    return (
        all_ids.join(agg, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            F.col("xent"),
            F.exp("xent").alias("ppl"),
        )
    )


def ppl_buckets(
    docs: DataFrame,
    n_buckets: int = 3,
    *,
    model: tuple[DataFrame, DataFrame, int] | None = None,
    alpha: float = 0.1,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    """CCNet's head/middle/tail partition: per-doc ``(id_col, n_bigrams,
    xent_r, bucket)`` where ``bucket`` in [0, n_buckets) is assigned by
    exact cross-entropy quantile thresholds (bucket 0 = lowest
    perplexity = "head"). Docs with < 2 tokens get bucket NULL.

    Scale note: thresholds here use the exact ``percentile`` aggregate
    (a sort of the xent column — fine up to ~10^9 docs on a cluster,
    and what makes the operator oracle-checkable); at the extreme scale
    swap in ``percentile_approx``, which changes thresholds by the
    sketch error only. Bucketing compares ROUNDED xent (`round_digits`)
    against thresholds computed from the same rounded values, so a
    1-ulp ``ln`` difference between engines cannot flip a bucket unless
    a value sits exactly on a rounding boundary.
    """
    scored = bigram_lm_score(
        docs, model=model, alpha=alpha, id_col=id_col, text_col=text_col
    ).select(
        id_col, "n_bigrams", F.round("xent", round_digits).alias("xent_r")
    )
    # The scored frame feeds BOTH the threshold aggregate and the output
    # join; a lazy localCheckpoint materializes the scoring pipeline once
    # (narrow per-doc rows) instead of re-running the LM train+join for
    # each branch — measured 13.3s -> 1.0s on 640k turns, identical sums.
    scored = scored.localCheckpoint(eager=False)
    qs = [i / n_buckets for i in range(1, n_buckets)]
    th_row = scored.where(F.col("xent_r").isNotNull()).agg(
        F.percentile("xent_r", F.lit(qs)).alias("th")
    )
    bucket = F.when(F.col("xent_r").isNull(), F.lit(None).cast("int")).otherwise(
        F.aggregate(
            F.col("th"),
            F.lit(0),
            lambda acc, t: acc
            + F.when(F.col("xent_r") > t, F.lit(1)).otherwise(F.lit(0)),
        )
    )
    return (
        scored.crossJoin(F.broadcast(th_row))
        .select(id_col, "n_bigrams", "xent_r", bucket.alias("bucket"))
    )


def doc_trigrams(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(id_col, w1, w2, w3)`` — one row per adjacent token triple,
    in-doc multiplicity preserved. Docs with < 3 tokens emit no rows.
    Same materialized-projection discipline as :func:`doc_bigrams` (the
    token array is its own projection so the transform lambda never
    re-splits per element)."""
    with_t = docs.select(
        F.col(id_col), F.split(F.trim(F.col(text_col)), r"\s+").alias("_t")
    )
    triples = F.expr(
        "transform(sequence(1, greatest(size(_t) - 2, 1)),"
        " i -> struct(element_at(_t, i) AS w1, element_at(_t, i + 1) AS w2,"
        " element_at(_t, i + 2) AS w3))"
    )
    guarded = F.when(F.size("_t") >= 3, triples).otherwise(
        F.array().cast("array<struct<w1:string,w2:string,w3:string>>")
    )
    return with_t.select(
        F.col(id_col), F.explode(guarded).alias("tg")
    ).select(
        id_col,
        F.col("tg.w1").alias("w1"),
        F.col("tg.w2").alias("w2"),
        F.col("tg.w3").alias("w3"),
    )


def train_backoff_lm(
    corpus: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame, int]:
    """Count tables for a stupid-backoff trigram LM (Brants et al., EMNLP
    2007 — "Large Language Models in Machine Translation", the web-scale
    LM recipe: no discounting, a fixed backoff penalty, so training is
    pure counting and parallelizes perfectly).

    Returns ``(tri_counts, bi_counts, uni_counts, n_tokens)``:
    ``tri_counts`` = (w1, w2, w3, c123); ``bi_counts`` = (w1, w2, c12);
    ``uni_counts`` = (w1, c1); ``n_tokens`` = corpus token count (1-row
    driver scalar).

    Scale: three partial-aggregated groupBys over the token stream — the
    exact shape Brants et al. ran at 2e12 tokens. The trigram table is
    the big one (O(distinct trigrams)); it never joins to itself, only
    to the scoring stream on the (w1, w2, w3) key, where AQE picks the
    strategy. Bigram counts re-aggregate the trigram table only where
    that is NOT count-correct (the last bigram of every doc has no
    trigram continuation), so each table is counted from its own stream.

    Each count table is materialized (lazy localCheckpoint): every one
    has at least two downstream consumers in the scoring plan, and
    without the fence each consumer re-runs the table's corpus-scale
    aggregation from scratch (~7 corpus passes instead of 3 — the
    dominant cost at bench scale). ``n_tokens`` re-aggregates the
    vocabulary-bounded unigram table instead of re-counting the corpus.
    """
    tri = doc_trigrams(corpus, id_col=id_col, text_col=text_col)
    tri_counts = tri.groupBy("w1", "w2", "w3").agg(
        F.count("*").alias("c123")
    ).localCheckpoint(eager=False)
    bi = doc_bigrams(corpus, id_col=id_col, text_col=text_col)
    bi_counts = bi.groupBy("w1", "w2").agg(
        F.count("*").alias("c12")
    ).localCheckpoint(eager=False)
    toks = corpus.select(
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w1")
    )
    uni_counts = toks.groupBy("w1").agg(
        F.count("*").alias("c1")
    ).localCheckpoint(eager=False)
    n_tokens = int(uni_counts.agg(F.sum("c1")).collect()[0][0] or 0)
    return tri_counts, bi_counts, uni_counts, n_tokens


def backoff_lm_score(
    docs: DataFrame,
    *,
    model: tuple[DataFrame, DataFrame, DataFrame, int] | None = None,
    lam: float = 0.4,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_model: bool = False,
) -> DataFrame:
    """Per-doc ``(id_col, n_trigrams, xent, ppl)`` under a stupid-backoff
    trigram LM::

        S(w3 | w1 w2) = c123 / c12                    if c123 > 0
                      = lam * c23 / c2                elif c23 > 0
                      = lam^2 * max(c3, 1) / N        otherwise

    ``xent`` = mean over the doc's trigrams of ``-ln S`` (nats); ``ppl``
    = ``exp(xent)``. The ``max(c3, 1)`` floor only engages when scoring
    against an external model whose vocabulary misses ``w3`` (self-
    scoring always has ``c3 >= 1``); it keeps S > 0 without changing any
    seen count. Docs with < 3 tokens get ``n_trigrams = 0`` and NULL
    xent/ppl.

    Plan shape: the backoff arithmetic is folded into the MODEL before
    any corpus-scale work — two vocabulary-bounded joins produce
    conditional-probability tables ``(w1, w2, w3, s3 = c123/c12)`` and
    ``(w2, w3, s2 = lam*c23/c2)`` — so the scoring pass is THREE
    corpus-scale left joins (trigram key, backoff bigram key, unigram
    floor key) instead of the naive five. Together with the model-table
    materialization in :func:`train_backoff_lm` this took the 640k-turn
    bench entry from 29.3 s to 12.6 s steady-state, identical sums (AQE
    broadcasts the model tables while they fit;
    ``broadcast_model=True`` forces it for curated external models).
    ``lam`` is Brants' 0.4.
    """
    if model is None:
        model = train_backoff_lm(docs, id_col=id_col, text_col=text_col)
    tri_counts, bi_counts, uni_counts, n_tokens = model
    lam = float(lam)
    # model-sized precomputes: probabilities ride the model keys
    tri_probs = tri_counts.join(bi_counts, on=["w1", "w2"]).select(
        "w1",
        "w2",
        "w3",
        (F.col("c123").cast("double") / F.col("c12").cast("double")).alias(
            "_s3"
        ),
    )
    bi_probs = (
        bi_counts.select(
            F.col("w1").alias("w2"),
            F.col("w2").alias("w3"),
            F.col("c12").alias("c23"),
        )
        .join(
            uni_counts.select(F.col("w1").alias("w2"), F.col("c1").alias("c2")),
            on="w2",
        )
        .select(
            "w2",
            "w3",
            (
                F.lit(lam) * F.col("c23").cast("double")
                / F.col("c2").cast("double")
            ).alias("_s2"),
        )
    )
    uni_floor = uni_counts.select(
        F.col("w1").alias("w3"), F.col("c1").alias("c3")
    )
    if broadcast_model:
        tri_probs = F.broadcast(tri_probs)
        bi_probs = F.broadcast(bi_probs)
        uni_floor = F.broadcast(uni_floor)

    tg = doc_trigrams(docs, id_col=id_col, text_col=text_col)
    joined = (
        tg.join(tri_probs, on=["w1", "w2", "w3"], how="left")
        .join(bi_probs, on=["w2", "w3"], how="left")
        .join(uni_floor, on="w3", how="left")
    )
    c3 = F.coalesce(F.col("c3"), F.lit(0)).cast("double")
    s = (
        F.when(F.col("_s3").isNotNull(), F.col("_s3"))
        .when(F.col("_s2").isNotNull(), F.col("_s2"))
        .otherwise(
            F.lit(lam * lam) * F.greatest(c3, F.lit(1.0)) / F.lit(float(n_tokens))
        )
    )
    scored = joined.select(id_col, (-F.log(s)).alias("nll"))
    agg = scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_trigrams"),
        F.avg("nll").alias("xent"),
    )
    return (
        docs.select(id_col)
        .join(agg, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce(F.col("n_trigrams"), F.lit(0)).alias("n_trigrams"),
            F.col("xent"),
            F.exp("xent").alias("ppl"),
        )
    )


def dsir_log_weights(
    docs: DataFrame,
    target: DataFrame,
    *,
    alpha: float = 0.1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR (Xie et al., 2023) importance log-weights: per-doc
    ``(id_col, n_bigrams, log_w)`` where ``log_w = sum over the doc's
    bigrams of ln p_target(w2|w1) - ln p_raw(w2|w1)`` — the
    log-likelihood ratio between a bigram LM of the *target* domain and
    one of the raw corpus. Resampling the corpus with probability
    proportional to ``exp(log_w)`` (or keeping the top quantile) yields
    a target-like training mix. Docs with < 2 tokens get log_w NULL.

    Both models are trained with the same add-alpha smoothing and the
    SAME vocabulary size (the raw corpus's V) so the ratio is not
    dominated by vocabulary mismatch. Plan shape: two LM trainings (two
    partial-agg groupBys each), one scoring pass over the corpus bigram
    stream with both models joined (target model broadcast — the target
    set is curated and small by construction; raw model joined on the
    shared (w1, w2) key).
    """
    raw_c12, raw_c1, vocab = train_bigram_lm(
        docs, id_col=id_col, text_col=text_col
    )
    tid = target.columns[0]
    tgt_bg = doc_bigrams(target, id_col=tid, text_col=text_col)
    tgt_c12 = F.broadcast(
        tgt_bg.groupBy("w1", "w2").agg(F.count("*").alias("t12"))
    )
    tgt_c1 = F.broadcast(tgt_bg.groupBy("w1").agg(F.count("*").alias("t1")))

    bg = doc_bigrams(docs, id_col=id_col, text_col=text_col)
    av = F.lit(alpha) * vocab
    p_raw = (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(alpha)) / (
        F.coalesce(F.col("c1"), F.lit(0)) + av
    )
    p_tgt = (F.coalesce(F.col("t12"), F.lit(0)) + F.lit(alpha)) / (
        F.coalesce(F.col("t1"), F.lit(0)) + av
    )
    scored = (
        bg.join(raw_c1, on="w1", how="left")
        .join(raw_c12, on=["w1", "w2"], how="left")
        .join(tgt_c1, on="w1", how="left")
        .join(tgt_c12, on=["w1", "w2"], how="left")
        .select(id_col, (F.log(p_tgt) - F.log(p_raw)).alias("llr"))
    )
    agg = scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.sum("llr").alias("log_w"),
    )
    return docs.select(id_col).join(agg, on=id_col, how="left").select(
        id_col,
        F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
        F.col("log_w"),
    )


def dsir_resample(
    docs: DataFrame,
    target: DataFrame,
    frac: float,
    *,
    seed: int = 0,
    alpha: float = 0.1,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    """DSIR step 2 — the resampling action: per-doc ``(id_col, n_bigrams,
    key_r, keep)`` where ``keep`` marks the top *frac* of scoreable docs
    by ``log_w + Gumbel`` (Gumbel-top-k sampling without replacement,
    i.e. docs are drawn with probability proportional to ``exp(log_w)``,
    the DSIR importance weight). Docs with < 2 tokens are never kept —
    they carry no importance evidence.

    The Gumbel noise is NOT ``rand()`` (Spark's per-partition RNG changes
    with the split layout): it is derived from the same seed-perturbed
    affine id hash as ``sample_mix`` — ``u = (h(id) + 0.5) / M`` in
    (0, 1), ``g = -ln(-ln u)`` — so the sample is reproducible across
    runs, engines, and partitionings, and different seeds draw
    decorrelated samples. The keep threshold is the exact
    ``1 - frac`` percentile of the ROUNDED perturbed key (same
    engine-stability argument as :func:`ppl_buckets`; swap in
    ``percentile_approx`` past ~10^9 docs). Plan shape: the
    :func:`dsir_log_weights` scoring pass, a map-only key column, one
    tiny percentile agg broadcast back — no extra corpus shuffle.
    """
    from tsidx.textstats import SAMPLE_MOD, _SAMPLE_A, _SAMPLE_A2, _SAMPLE_B

    w = dsir_log_weights(
        docs, target, alpha=alpha, id_col=id_col, text_col=text_col
    )
    a_seed = (_SAMPLE_A + int(seed) * 99_991) % SAMPLE_MOD or 1
    a2_seed = (_SAMPLE_A2 + int(seed) * 99_991) % SAMPLE_MOD or 1
    m = F.lit(SAMPLE_MOD).cast("long")
    ident = F.col(id_col).cast("long")
    lo = F.pmod(ident, m)
    hi = F.pmod(F.expr(f"CAST(`{id_col}` AS BIGINT) DIV {SAMPLE_MOD}"), m)
    h = F.pmod(lo * F.lit(a_seed) + F.lit(_SAMPLE_B) + hi * F.lit(a2_seed), m)
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(SAMPLE_MOD))
    gumbel = -F.log(-F.log(u))
    keyed = w.withColumn(
        "key_r", F.round(F.col("log_w") + gumbel, round_digits)
    )
    # as in ppl_buckets: one materialization of the weights pipeline for
    # both the threshold aggregate and the output join
    keyed = keyed.localCheckpoint(eager=False)
    th_row = keyed.where(F.col("key_r").isNotNull()).agg(
        F.percentile("key_r", F.lit(1.0 - float(frac))).alias("th")
    )
    return keyed.crossJoin(F.broadcast(th_row)).select(
        id_col,
        "n_bigrams",
        "key_r",
        F.when(F.col("key_r").isNull(), F.lit(False))
        .otherwise(F.col("key_r") >= F.col("th"))
        .alias("keep"),
    )
