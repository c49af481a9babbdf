"""Text-analysis operators for corpus curation (training-data pipeline).

All pure DataFrame plans over built-in JVM functions (whole-stage codegen,
no Python in the hot path): language identification by stopword-profile
scoring, token counting (whitespace and a BPE-ish regex segmentation),
and quality-scoring signals. Each has a DuckDB-oracle twin in
``__spark_entry__.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "LANG_PROFILES",
    "lang_id_heuristic",
    "token_counts",
    "quality_signals",
    "entropy_signals",
    "quality_filter",
    "sample_mix",
    "sample_fixed_n",
    "mixture_rates",
    "alpha_mixture_rates",
    "mixture_sample",
    "group_split",
    "ngram_counts",
    "redact_text",
    "REDACT_RULES",
    "conversation_stats",
    "BPE_PIECE_RE",
    "SAMPLE_MOD",
]

# Minimal public stopword profiles (top function words per language). The
# heuristic scores a doc per language by profile-hit ratio; deterministic
# alphabetical tiebreak. "unk" when nothing matches.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en": ("the", "and", "of", "to", "in", "is", "that", "with"),
    "es": ("el", "la", "de", "que", "y", "en", "los", "un"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "est"),
}

# BPE-ish segmentation: letter runs, digit runs, single punctuation marks.
# Deliberately ASCII-class-based so Spark (Java regex) and DuckDB (RE2)
# agree exactly.
BPE_PIECE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def _tokens(text_col: str):
    return F.split(F.trim(F.col(text_col)), r"\s+")


#: every ASCII alphanumeric + space — the "not a symbol" alphabet
_ALNUM_SPACE = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789 "
)


def _symbol_count(text_col: str):
    """Count of non-alphanumeric-non-space characters via one
    ``translate`` pass (delete the 63-char alphabet, measure the rest).
    Java regex (``regexp_count(text, '[^A-Za-z0-9 ]')``) was the hottest
    expression in the quality pipeline: 19.7 s vs 1.5 s for the other
    rules on 640k ~300-char rows; translate is a plain char-table scan.
    Counts the complement of the ASCII alphabet, so any non-ASCII char
    counts as a symbol — same value the regex produced."""
    return F.length(
        F.translate(F.col(text_col), _ALNUM_SPACE, "")
    )


def lang_id_heuristic(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    profiles: dict[str, tuple[str, ...]] | None = None,
) -> DataFrame:
    """(id, lang_pred, best_hits): argmax over per-language stopword hit
    counts; ties break alphabetically; zero hits -> 'unk'."""
    profiles = profiles or LANG_PROFILES
    toks = _tokens(text_col)
    hit_cols = []
    for lang in sorted(profiles):
        words = F.array(*[F.lit(w) for w in profiles[lang]])
        hits = F.size(
            F.filter(toks, lambda t: F.array_contains(words, t))
        )
        hit_cols.append((lang, hits))
    best = F.greatest(*[h for _, h in hit_cols])
    pred = F.lit("unk")
    # alphabetical tiebreak: first language reaching the max wins — build
    # the conditional from last to first so earlier langs take precedence
    for lang, hits in reversed(hit_cols):
        pred = F.when((best > 0) & (hits == best), F.lit(lang)).otherwise(pred)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        pred.alias("lang_pred"),
        best.cast("long").alias("best_hits"),
    )


def token_counts(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_ws_tokens, n_bpe_pieces): whitespace tokens and BPE-ish
    regex pieces (letter runs / digit runs / single punctuation)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(_tokens(text_col)).cast("long").alias("n_ws_tokens"),
        F.regexp_count(F.col(text_col), F.lit(BPE_PIECE_RE))
        .cast("long")
        .alias("n_bpe_pieces"),
    )


def conversation_stats(
    transcripts: DataFrame,
    conv_col: str = "conv_id",
    text_col: str = "text",
    role_col: str = "role",
) -> DataFrame:
    """(conv_id, n_turns, total_tokens, avg_tokens_r, n_roles):
    conversation-level rollup of the transcripts table — the
    curation-side view (length filtering, role-mix checks, packing
    budgets) of the per-turn corpus the index is built over.

    One (conv_id) shuffle over JVM expressions; conversations are bounded
    (turn counts, not corpus size), so no key is data-scale hot.
    """
    n_tok = F.when(
        F.trim(F.col(text_col)) == "", F.lit(0)
    ).otherwise(F.size(_tokens(text_col)))
    return transcripts.groupBy(F.col(conv_col).alias("conv_id")).agg(
        F.count("*").cast("long").alias("n_turns"),
        F.sum(n_tok).cast("long").alias("total_tokens"),
        F.round(F.avg(n_tok), 4).alias("avg_tokens_r"),
        F.count_distinct(F.col(role_col)).cast("long").alias("n_roles"),
    )


def quality_signals(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    stopwords: tuple[str, ...] = LANG_PROFILES["en"],
) -> DataFrame:
    """Per-doc quality-scoring signals: token count, type-token ratio,
    mean token length, stopword ratio, punctuation ratio."""
    toks = _tokens(text_col)
    n = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    sw = F.array(*[F.lit(w) for w in stopwords])
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    n_chars = F.length(F.col(text_col))
    n_punct = _symbol_count(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n.cast("long").alias("n_tokens"),
        F.round(nd.cast("double") / n, 4).alias("ttr_r"),
        F.round(
            F.aggregate(
                toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
            ).cast("double")
            / n,
            4,
        ).alias("mean_tok_len_r"),
        F.round(n_sw.cast("double") / n, 4).alias("stopword_ratio_r"),
        F.round(n_punct.cast("double") / n_chars, 4).alias("punct_ratio_r"),
    )


def entropy_signals(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc Shannon-entropy quality signals (nats, rounded to 4):

    - ``char_entropy_r`` — entropy of the character distribution. Near
      zero flags degenerate pages (one repeated char, padding); very
      high flags binary/base64 junk. The standard cheap gibberish
      detector alongside :func:`quality_signals`'s ratios.
    - ``token_entropy_r`` — entropy of the token distribution; low
      values flag template/repetition pages whose TTR alone looks fine
      (e.g. two tokens alternating).

    Map-only, zero shuffles: per-row histogram terms via
    ``array_sort(array_distinct(...))`` + a fixed-order ``aggregate``
    fold, so the float accumulation order is the sorted symbol order —
    engine-reproducible (the DuckDB twin folds the identical sorted
    list). Per-row cost is O(len · distinct); characters are bounded by
    the alphabet, and tokens by doc length — for million-token docs
    pair this with :func:`chunk_docs` first (documented bound, not a
    hidden cap).
    """
    chars = F.split(F.col(text_col), "")
    toks = _tokens(text_col)

    def _entropy(arr):
        n = F.size(arr).cast("double")
        # fold in sorted-symbol order: -(Σ p ln p), p = count/n; the
        # trailing +0.0 canonicalizes -0.0 (single-symbol docs) so both
        # engines hash the same zero. Empty text splits to [''] on both
        # Spark and DuckDB (one empty symbol -> entropy 0); the size
        # guard only covers a hypothetical engine yielding a true empty
        # array
        fold = -F.aggregate(
            F.array_sort(F.array_distinct(arr)),
            F.lit(0.0),
            lambda acc, s: acc
            + (
                F.size(F.filter(arr, lambda x: x == s)).cast("double") / n
            )
            * F.log(
                F.size(F.filter(arr, lambda x: x == s)).cast("double") / n
            ),
        ) + F.lit(0.0)
        return F.when(F.size(arr) > 0, fold)

    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        F.round(_entropy(chars), 4).alias("char_entropy_r"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.round(_entropy(toks), 4).alias("token_entropy_r"),
    )


def quality_filter(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 3,
    max_tokens: int = 100_000,
    min_mean_tok_len: float = 2.0,
    max_mean_tok_len: float = 12.0,
    max_symbol_ratio: float = 0.4,
    max_top_tok_frac: float = 0.5,
    stopwords: tuple[str, ...] = LANG_PROFILES["en"],
    min_stopword_hits: int = 1,
) -> DataFrame:
    """C4/Gopher-style document quality filter: per-doc rule verdicts plus
    the combined ``keep`` flag. Rules (all from the published C4 /
    Gopher / RefinedWeb recipes, parameterized):

    - ``r_len``    — token count within ``[min_tokens, max_tokens]``
    - ``r_mean``   — mean token length within
      ``[min_mean_tok_len, max_mean_tok_len]``
    - ``r_symbol`` — non-alphanumeric character ratio ``<= max_symbol_ratio``
    - ``r_stop``   — at least ``min_stopword_hits`` stopword occurrences
    - ``r_repeat`` — most frequent token's share ``<= max_top_tok_frac``
      (the Gopher repetition rule)

    ``keep = AND`` of all five. Map-only: every rule is a JVM expression
    over the token array, zero shuffles — the plan a corpus-curation
    sweep over 100 TB wants, since it composes with the parquet scan and
    any downstream write without an exchange. The array folds
    (``r_mean``/``r_repeat``) are interpreted higher-order functions, not
    codegen, but stay O(n log n) per row: the repetition rule reads the
    longest equal-run of the sorted token array rather than the naive
    O(distinct·n) count-per-distinct form, and the symbol rule is a
    regex-free ``translate`` scan (see ``_symbol_count``). Measured on
    640k ~54-token turns: 13 s for the full five-rule verdict.
    """
    toks = _tokens(text_col)
    n = F.size(toks)
    nd = F.coalesce(F.nullif(n.cast("double"), F.lit(0.0)), F.lit(1.0))
    mean_len = (
        F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t))
        .cast("double")
        / nd
    )
    n_chars = F.coalesce(
        F.nullif(F.length(F.col(text_col)).cast("double"), F.lit(0.0)),
        F.lit(1.0),
    )
    n_sym = _symbol_count(text_col)
    sw = F.array(*[F.lit(w) for w in stopwords])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    # max token multiplicity as the longest equal-run of the SORTED token
    # array — one O(n log n) sort + one O(n) fold per row. The naive
    # distinct×filter form is O(distinct·n) string comparisons: measured
    # 55 s vs scan-speed on 640k ~54-token turns (≈1.5G comparisons).
    top_tf = F.aggregate(
        F.sort_array(toks),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    r_len = (n >= min_tokens) & (n <= max_tokens)
    r_mean = (mean_len >= min_mean_tok_len) & (mean_len <= max_mean_tok_len)
    r_symbol = (n_sym.cast("double") / n_chars) <= max_symbol_ratio
    r_stop = n_stop >= min_stopword_hits
    r_repeat = F.coalesce(
        top_tf.cast("double") / nd <= max_top_tok_frac, F.lit(True)
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n.cast("long").alias("n_tokens"),
        r_len.alias("r_len"),
        r_mean.alias("r_mean"),
        r_symbol.alias("r_symbol"),
        r_stop.alias("r_stop"),
        r_repeat.alias("r_repeat"),
        (r_len & r_mean & r_symbol & r_stop & r_repeat).alias("keep"),
    )


#: modulus of the deterministic sampling hash. Prime, ~1e6: the per-row
#: keep decision is ``lcg(id) < rate * SAMPLE_MOD`` — rate resolution 1e-6.
SAMPLE_MOD = 1_000_003
_SAMPLE_A = 1_103_515_245  # classic LCG multiplier (public domain constants)
_SAMPLE_A2 = 747_796_405   # second-digit multiplier (PCG-family constant)
_SAMPLE_B = 12_345


def sample_mix(
    docs: DataFrame,
    rates: dict[str, float],
    strata_col: str = "role",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic stratified Bernoulli sampling — the training-mix
    operator: keep each row of stratum *s* with probability ``rates[s]``
    (strata absent from *rates* are dropped), decided by an arithmetic
    hash of the row id so the sample is reproducible across runs,
    engines, and partitionings (no ``rand()``: Spark's per-partition RNG
    changes with the split layout).

    ``h = (lo·A_seed + B + hi·A2_seed) mod M;  keep ⇔ h < rate · M``

    where ``lo = id mod M``, ``hi = (id div M) mod M``, M =
    ``SAMPLE_MOD`` (prime), and ``A_seed``/``A2_seed`` are seed-perturbed
    multipliers (nonzero, so each seed selects a distinct affine map — a
    seed must change a multiplier, not add an offset: any additive
    perturbation shifts every h by the same constant and two
    "independent" samples would differ only at the threshold boundary).
    Mixing BOTH base-M digits matters at scale: a lo-only hash is
    periodic with period M ≈ 10^6, so on a 10^12-row corpus ids congruent
    mod M would receive identical verdicts under every seed (a periodic
    stripe, not a Bernoulli sample). With the hi digit folded in the
    period is M² ≈ 10^12 — beyond that, extend with the third digit.
    Reducing each digit mod M first keeps every intermediate below 2^63,
    and the whole decision is integer arithmetic any engine reproduces
    exactly (the DuckDB oracle runs the same formula). Map-only: zero
    shuffles, composes with the scan; changing the mix re-reads nothing.

    Different *seed* values draw decorrelated samples — e.g. train /
    validation splits via ``seed=0`` / ``seed=1`` (each stays an exact
    ``rate`` fraction of each stratum up to the 1/M quantization, since
    h is uniform on [0, M) for every seed).
    """
    a_seed = (_SAMPLE_A + int(seed) * 99_991) % SAMPLE_MOD or 1
    a2_seed = (_SAMPLE_A2 + int(seed) * 99_991) % SAMPLE_MOD or 1
    m = F.lit(SAMPLE_MOD).cast("long")
    ident = F.col(id_col).cast("long")
    lo = F.pmod(ident, m)
    # integer DIV, not `/`: long/long is double division in Spark and
    # doubles lose integer exactness past 2^53
    hi = F.pmod(F.expr(f"CAST(`{id_col}` AS BIGINT) DIV {SAMPLE_MOD}"), m)
    h = F.pmod(
        lo * F.lit(a_seed) + F.lit(_SAMPLE_B) + hi * F.lit(a2_seed),
        m,
    )
    rate_map = F.create_map(
        *[F.lit(x) for s in sorted(rates) for x in (s, float(rates[s]))]
    )
    rate = rate_map[F.col(strata_col)]
    return (
        docs.withColumn("_h", h)
        .filter(rate.isNotNull() & (F.col("_h") < rate * SAMPLE_MOD))
        .drop("_h")
    )


def sample_fixed_n(
    docs: DataFrame,
    n: int,
    strata_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic EXACT-size stratified sample: the *n* rows of each
    stratum with the smallest ``md5(seed ':' id)`` — the fixed-budget
    counterpart of :func:`sample_mix` (Bernoulli gives a binomial count;
    eval sets and per-domain caps need exactly n). Reproducible across
    runs, engines, and partitionings; strata with fewer than n rows keep
    everything. Adds ``sample_rank`` (1..n within the stratum).

    Scale shape: rank-per-group is one shuffle on the stratum key, and
    Spark's WindowGroupLimit pushes the ``rank <= n`` bound into a
    per-partition partial top-n BEFORE the exchange — shuffle volume is
    O(partitions x strata x n), not the corpus. A hot stratum therefore
    never funnels its full row count through one window partition.
    """
    if n <= 0:
        raise ValueError("sample_fixed_n: n must be positive")
    from pyspark.sql import Window

    key = F.md5(
        F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(strata_col).orderBy(key, F.col(id_col))
    return (
        docs.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n)
    )


def ngram_counts(
    docs: DataFrame,
    n: int = 2,
    text_col: str = "text",
    min_cf: int = 1,
) -> DataFrame:
    """Collection-frequency statistics of stemmed token *n*-grams:
    ``(gram, cf, df)`` for every n-gram occurring at least *min_cf* times
    — phrase-vocabulary induction (which multi-word units deserve a
    single token) and collocation mining, over the same stem stream the
    index is built from.

    One Arrow-batched stem pass (:func:`tsidx.tokenize.stem_array_udf`),
    then JVM-only n-gram assembly (``transform`` over a bounded index
    sequence — no self-join) and ONE (gram) aggregation. The gram key is
    content-uniform; *min_cf* bounds the output like a df cap. At corpus
    scale this is the exact shuffle shape of the index build itself
    (explode + one uniform-key aggregation).
    """
    from tsidx.tokenize import stem_array_udf

    # materialize the stem array before the higher-order transform:
    # Catalyst rejects a Python UDF referenced inside a lambda
    stemmed = docs.select(
        F.col("doc_id"), stem_array_udf()(F.col(text_col)).alias("st")
    ).filter(F.size("st") >= n)
    grams = F.transform(
        F.sequence(F.lit(1), F.size("st") - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(F.col("st"), i, n)),
    )
    exploded = stemmed.select("doc_id", F.explode(grams).alias("gram"))
    return (
        exploded.groupBy("gram")
        .agg(
            F.count("*").cast("long").alias("cf"),
            F.count_distinct("doc_id").cast("long").alias("df"),
        )
        .filter(F.col("cf") >= int(min_cf))
    )


#: default redaction rules: (name, java-and-RE2-compatible regex, token).
#: Patterns deliberately avoid lookarounds/backrefs so Spark (Java regex)
#: and any RE2-family engine (DuckDB oracle) agree byte-for-byte.
REDACT_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", "\\+?[0-9][0-9()\\- ]{7,}[0-9]", "<PHONE>"),
    ("number", "[0-9]{6,}", "<NUM>"),
)


def redact_text(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rules: tuple[tuple[str, str, str], ...] = REDACT_RULES,
) -> DataFrame:
    """PII-style redaction for transcript curation: replace every match of
    each rule's pattern with its placeholder token, in rule order (earlier
    rules win — an email is ``<EMAIL>``, not an ``<EMAIL>`` with a
    ``<NUM>`` inside). Returns ``(doc_id, text, n_redactions)`` where
    ``n_redactions`` counts replaced spans across all rules.

    Map-only chained ``regexp_replace`` — composes with the scan like the
    quality filter; rule patterns avoid constructs where regex dialects
    diverge, so the DuckDB oracle replays them exactly.
    """
    out = F.col(text_col)
    n_red = F.lit(0)
    for _, pattern, token in rules:
        n_red = n_red + F.regexp_count(out, F.lit(pattern))
        out = F.regexp_replace(out, pattern, token)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        out.alias("text"),
        n_red.cast("long").alias("n_redactions"),
    )


def mixture_rates(
    docs: DataFrame,
    weights: dict[str, float],
    strata_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Domain-mixture planning (Pile/Dolma-style data mixing): given
    target mixture *weights* (proportions of the output token budget per
    stratum), return per-stratum ``(strata_col, n_tokens, rate,
    expected_tokens)`` where ``rate`` is the Bernoulli keep probability
    that realizes the largest achievable corpus with EXACTLY the target
    mixture and no upsampling:

        T = min_s n_s / w_s        (the binding stratum is kept whole)
        rate_s = w_s * T / n_s     (<= 1 by construction)

    Strata absent from *weights* get rate 0 (dropped). A weighted
    stratum with NO corpus rows is treated as unavailable: the water
    fill runs over the strata actually present, so their RELATIVE
    proportions are exact while the missing stratum contributes
    nothing (it cannot be conjured). Plan shape: one
    token-count aggregation over the corpus (map-side combined, keyed by
    the bounded stratum column), then scalar arithmetic on the
    |strata|-row result — the corpus is scanned once and never shuffled
    on a data-scale key.

    No reference-repo equivalent; training-data-pipeline operator per
    the build brief (mixture weighting a la The Pile appendix / Dolma).
    """
    wmap = F.create_map(
        *[F.lit(x) for s in sorted(weights) for x in (s, float(weights[s]))]
    )
    counts = (
        docs.groupBy(strata_col)
        .agg(
            F.sum(
                F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
            ).cast("long").alias("n_tokens")
        )
        .withColumn("w", wmap[F.col(strata_col)])
    )
    # counts feeds both the min-aggregate and the output; materialize the
    # |strata|-row result once so the corpus token-count scan doesn't run
    # twice (same pattern as tsidx.lmquality.ppl_buckets)
    counts = counts.localCheckpoint(eager=False)
    t_row = counts.where(F.col("w").isNotNull()).agg(
        F.min(F.col("n_tokens") / F.col("w")).alias("t")
    )
    return counts.crossJoin(F.broadcast(t_row)).select(
        strata_col,
        "n_tokens",
        F.coalesce(
            F.col("w") * F.col("t") / F.col("n_tokens"), F.lit(0.0)
        ).alias("rate"),
        F.coalesce(
            F.round(F.col("w") * F.col("t"), 4), F.lit(0.0)
        ).alias("expected_tokens"),
    )


def alpha_mixture_rates(
    docs: DataFrame,
    alpha: float = 0.3,
    strata_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-smoothed mixture planning (mBERT/XLM-R-style
    alpha-sampling): target weights are DERIVED from the corpus itself,

        w_s = n_s^alpha / sum_t n_t^alpha

    (alpha < 1 up-weights small strata / down-weights dominant ones;
    alpha = 1 reproduces natural proportions, alpha = 0 is uniform),
    then the same no-upsampling water fill as :func:`mixture_rates`:
    ``T = min_s n_s / w_s`` and ``rate_s = w_s * T / n_s``.  With
    w ∝ n^alpha the binding (kept-whole) stratum is the SMALLEST one
    for alpha < 1.

    Returns ``(strata_col, n_tokens, weight, rate, expected_tokens)``.
    Plan: ONE corpus token-count aggregation (map-side combined on the
    bounded stratum key); everything after operates on the |strata|-row
    result — the corpus is never shuffled.
    """
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    counts = docs.groupBy(strata_col).agg(
        F.sum(
            F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
        ).cast("long").alias("n_tokens")
    )
    counts = counts.localCheckpoint(eager=False)
    pow_col = F.pow(F.col("n_tokens").cast("double"), F.lit(float(alpha)))
    with_pow = counts.withColumn("_p", pow_col)
    tot = with_pow.agg(F.sum("_p").alias("_tot"))
    weighted = with_pow.crossJoin(F.broadcast(tot)).withColumn(
        "weight", F.col("_p") / F.col("_tot")
    )
    weighted = weighted.localCheckpoint(eager=False)
    t_row = weighted.agg(
        F.min(F.col("n_tokens") / F.col("weight")).alias("t")
    )
    return weighted.crossJoin(F.broadcast(t_row)).select(
        strata_col,
        "n_tokens",
        "weight",
        (F.col("weight") * F.col("t") / F.col("n_tokens")).alias("rate"),
        F.round(F.col("weight") * F.col("t"), 4).alias("expected_tokens"),
    )


def mixture_sample(
    docs: DataFrame,
    weights: dict[str, float],
    strata_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Apply :func:`mixture_rates`: keep each doc of stratum *s* with the
    water-filled probability ``rate_s``, decided by the same
    seed-perturbed affine id hash as :func:`sample_mix` (reproducible
    across runs, engines, and partitionings; no ``rand()``). The binding
    stratum (rate 1) is kept whole; strata not in *weights* are dropped.
    The rates table is |strata|-sized and broadcast — the corpus itself
    is scanned once, map-only."""
    rates = F.broadcast(
        mixture_rates(docs, weights, strata_col, text_col).select(
            strata_col, "rate"
        )
    )
    a_seed = (_SAMPLE_A + int(seed) * 99_991) % SAMPLE_MOD or 1
    a2_seed = (_SAMPLE_A2 + int(seed) * 99_991) % SAMPLE_MOD or 1
    m = F.lit(SAMPLE_MOD).cast("long")
    ident = F.col(id_col).cast("long")
    lo = F.pmod(ident, m)
    hi = F.pmod(F.expr(f"CAST(`{id_col}` AS BIGINT) DIV {SAMPLE_MOD}"), m)
    h = F.pmod(lo * F.lit(a_seed) + F.lit(_SAMPLE_B) + hi * F.lit(a2_seed), m)
    return (
        docs.join(rates, on=strata_col, how="inner")
        .withColumn("_h", h)
        .filter(F.col("_h") < F.col("rate") * SAMPLE_MOD)
        .drop("_h", "rate")
    )


def group_split(
    docs: DataFrame,
    fracs: dict[str, float],
    group_col: str = "conv_id",
    seed: int = 0,
) -> DataFrame:
    """Leakage-safe dataset splitting: append a ``split`` column such
    that EVERY row of a group (conversation, document family, source
    shard) lands in the same split — the train/valid/test partition a
    training pipeline needs when rows of one group are near-duplicates
    of each other (per-row Bernoulli splits leak a conversation's turns
    across train and eval).

    Groups are assigned by hashing the group key ONCE: ``h =
    md5(group ':' seed)``'s top 60 bits mod ``SAMPLE_MOD``, mapped
    through the cumulative *fracs* intervals in sorted-label order.
    md5 (not xxhash64) so any engine reproduces the exact assignment —
    the DuckDB oracle twin runs the same bytes-in, bytes-out formula.
    Fractions must sum to ~1 (every group gets a split). Map-only: the
    hash is a per-row expression on the group key; no shuffle, no
    group materialization.
    """
    total = sum(fracs.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fracs must sum to 1, got {total}")
    h = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.col(group_col).cast("string"), F.lit(str(seed))
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % SAMPLE_MOD
    )
    cum = 0.0
    bounds = []
    for label in sorted(fracs):
        cum += float(fracs[label])
        bounds.append((label, cum))
    # intervals evaluate lowest-first (h < cum_1*M -> label_1, else
    # h < cum_2*M -> label_2, ...); the LAST interval is the open-ended
    # fallback so float rounding of the final cum cannot leave a sliver
    # of unassigned groups
    expr = F.lit(bounds[-1][0])
    for label, upper in reversed(bounds[:-1]):
        expr = F.when(h < upper * SAMPLE_MOD, F.lit(label)).otherwise(expr)
    return docs.withColumn("split", expr)
