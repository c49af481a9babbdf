"""Sessionization and event-time analytics over transcript streams.

The transcripts table carries event time (``ts``); two operators consume
it:

- :func:`sessionize` — gap-based session assignment per conversation via
  Spark's built-in ``session_window`` (the idiomatic choice over a custom
  ``applyInPandasWithState`` operator: whole-stage JVM aggregation in
  batch mode, and the exact same expression runs under Structured
  Streaming where the state store + watermark handle out-of-order
  arrival). A session is a maximal run of turns where consecutive events
  are less than *gap* apart; ``session_end`` is Spark's convention
  (last event + gap, exclusive).
- :func:`streaming_term_trend` — tumbling event-time windows of matching
  turn counts per term with a watermark: the streaming twin of
  ``QueryEngine.term_trend``, finalizing each window once the watermark
  passes (late rows beyond the watermark are dropped, the documented
  trade-off of append-mode streaming aggregation).

Scale shape: both are single-shuffle aggregations on bounded keys —
(conv_id) for sessions (conversations are bounded in turns), (window,
term) for trends (windows bound time, terms bound the dictionary). No
reference counterpart (the reference is batch-only, cited throughout
SURVEY §2); these extend the north rule's streaming-ingest surface
(tsidx/streaming.py) with query-side event-time semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "sessionize",
    "streaming_term_trend",
    "trending_terms",
    "term_burstiness",
    "event_window_stats",
]


def sessionize(
    transcripts: DataFrame,
    gap: str = "30 minutes",
    conv_col: str = "conv_id",
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """``(conv_id, session_start, session_end, n_turns, total_tokens)``
    with epoch-second session bounds — one session per maximal run of
    turns spaced < *gap* apart within a conversation.

    Works identically on a batch DataFrame and a watermarked stream (pass
    ``transcripts.withWatermark(ts_col, ...)`` and the aggregation
    finalizes sessions once the watermark passes ``session_end``).
    """
    n_tok = F.when(
        F.trim(F.col(text_col)) == "", F.lit(0)
    ).otherwise(F.size(F.split(F.trim(F.col(text_col)), r"\s+")))
    return (
        transcripts.groupBy(
            F.col(conv_col).alias("conv_id"),
            F.session_window(F.col(ts_col), gap).alias("w"),
        )
        .agg(
            F.count("*").cast("long").alias("n_turns"),
            F.sum(n_tok).cast("long").alias("total_tokens"),
        )
        .select(
            "conv_id",
            F.unix_timestamp(F.col("w.start")).alias("session_start"),
            F.unix_timestamp(F.col("w.end")).alias("session_end"),
            "n_turns",
            "total_tokens",
        )
    )


def streaming_term_trend(
    stream: DataFrame,
    terms: list[str],
    window: str = "10 minutes",
    watermark: str = "5 minutes",
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """Windowed matching-turn counts per term over an event-time stream:
    ``(window_start, term, n_docs)`` for tumbling *window*s, with a
    *watermark* bounding state and dropping too-late rows — the
    streaming twin of ``QueryEngine.term_trend``. *terms* are
    already-stemmed dictionary terms (pass them through
    :func:`tsidx.tokenize.query_terms` first, exactly like a query).

    Tokenization matches the index build: whitespace split + Porter2,
    applied via an Arrow-batched pandas UDF (a per-token JVM stemmer
    does not exist; the UDF memoizes stems per batch, the same
    Zipf-amortization the build relies on). The windowed count then
    stays JVM-side — per-doc term dedup + the term-set filter are array
    built-ins, and the aggregation shuffles once on (window, term),
    both bounded keys.
    """
    from tsidx.tokenize import stem_array_udf

    _stem_arr = stem_array_udf()

    term_arr = F.array(*[F.lit(t) for t in sorted(set(terms))])
    exploded = (
        stream.withWatermark(ts_col, watermark)
        .select(
            F.col(ts_col),
            F.explode(
                F.array_distinct(
                    F.filter(
                        _stem_arr(F.col(text_col)),
                        lambda t: F.array_contains(term_arr, t),
                    )
                )
            ).alias("term"),
        )
    )
    return (
        exploded.groupBy(
            F.window(F.col(ts_col), window).alias("w"), F.col("term")
        )
        .agg(F.count("*").cast("long").alias("n_docs"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "term",
            "n_docs",
        )
    )


def trending_terms(
    transcripts: DataFrame,
    bucket: str = "hour",
    top_n: int = 5,
    ts_col: str = "ts",
    text_col: str = "text",
    min_df: int = 1,
) -> DataFrame:
    """Top-*top_n* stems per event-time bucket by matching-turn count:
    ``(bucket_epoch, rank, term, n_docs)`` — the "what was this corpus
    talking about, hour by hour" analytics view (``QueryEngine.term_trend``
    answers the converse: one known term across buckets).

    One Arrow stem pass, per-turn term dedup JVM-side (``array_distinct``
    before the explode, so n_docs counts turns not occurrences), ONE
    (bucket, term) aggregation, then a window partitioned by bucket —
    buckets are bounded by the time range, so no window partition is
    data-scale wide after the aggregation (its input is ≤ |dictionary|
    rows per bucket, and ties break deterministically by term).
    """
    from pyspark.sql import Window

    from tsidx.tokenize import stem_array_udf

    ex = (
        transcripts.select(
            F.unix_timestamp(F.date_trunc(bucket, F.col(ts_col))).alias(
                "bucket_epoch"
            ),
            stem_array_udf()(F.col(text_col)).alias("st"),
        )
        .select("bucket_epoch", F.explode(F.array_distinct("st")).alias("term"))
    )
    counts = ex.groupBy("bucket_epoch", "term").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    if min_df > 1:
        counts = counts.filter(F.col("n_docs") >= int(min_df))
    w = Window.partitionBy("bucket_epoch").orderBy(
        F.desc("n_docs"), F.asc("term")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= int(top_n))
        .select("bucket_epoch", "rank", "term", "n_docs")
    )


def term_burstiness(
    transcripts: DataFrame,
    bucket: str = "hour",
    min_total: int = 5,
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """``(bucket_epoch, term, n_docs, z_r)`` — per-bucket stem counts
    z-scored against the term's own across-bucket distribution: ``z =
    (n - μ) / σ`` with μ, σ over ALL buckets in the corpus's time range
    that contain any data (absent (term, bucket) pairs count as zero via
    the moment identity — they are never materialized). The burst
    detector: ``z ≫ 0`` flags a term spiking in one window regardless of
    its base rate, where raw counts (:func:`trending_terms`) just
    resurface stopwords every bucket.

    Plan: the same one (bucket, term) aggregation as trending_terms,
    then per-term moments re-aggregated from that bounded table (exact
    LONG sums — engine-reproducible) joined back; the bucket count rides
    a 1-row cross join. No corpus re-shuffle, no windows.
    """
    from tsidx.tokenize import stem_array_udf

    ex = transcripts.select(
        F.unix_timestamp(F.date_trunc(bucket, F.col(ts_col))).alias(
            "bucket_epoch"
        ),
        stem_array_udf()(F.col(text_col)).alias("st"),
    ).select("bucket_epoch", F.explode(F.array_distinct("st")).alias("term"))
    counts = ex.groupBy("bucket_epoch", "term").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    nb = counts.select("bucket_epoch").distinct().agg(
        F.count("*").cast("long").alias("_B")
    )
    stats = counts.groupBy("term").agg(
        F.sum("n_docs").alias("_s1"),
        F.sum(F.col("n_docs") * F.col("n_docs")).alias("_s2"),
    )
    j = counts.join(stats, "term").crossJoin(nb)
    mean = F.col("_s1").cast("double") / F.col("_B").cast("double")
    var = F.col("_s2").cast("double") / F.col("_B").cast("double") - mean * mean
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    z = (F.col("n_docs").cast("double") - mean) / std
    return (
        j.filter(F.col("_s1") >= int(min_total))
        .select(
            "bucket_epoch",
            "term",
            "n_docs",
            F.round(F.when(std > 0, z), 4).alias("z_r"),
        )
    )


def event_window_stats(
    events: DataFrame,
    window: str = "1 hour",
    *,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    user_col: str = "user_id",
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling event-time rollup of an events stream table: per
    ``(window_start, event_type)`` the event count, value sum, and
    distinct-user count — the generic metrics feed (dashboards, alert
    baselines, percolation inputs) over the ``events`` schema
    ``(event_id, ts, user_id, event_type, value, props)``.

    Works identically in batch and Structured Streaming: the same
    ``window()`` aggregation runs under a watermark when ``watermark``
    is set (append mode finalizes a window once the watermark passes;
    late rows beyond it are dropped — the documented trade-off). One
    shuffle on bounded (window, type) keys; at 100 TB the map-side
    partial aggregation collapses each partition to its distinct
    (window, type) pairs before the exchange. Streaming mode swaps
    ``count_distinct`` for ``approx_count_distinct`` (Spark rejects exact
    distinct aggs on streams — they'd need unbounded per-key state);
    HLL++ is exact at small per-window cardinalities and ~2% rsd beyond.
    Batch mode stays exact so the DuckDB oracle can check it.
    """
    src = events.withWatermark(ts_col, watermark) if watermark else events
    n_users = (
        F.approx_count_distinct(F.col(user_col))
        if events.isStreaming
        else F.count_distinct(F.col(user_col))
    )
    return (
        src.groupBy(
            F.window(ts_col, window).alias("w"), F.col(type_col)
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum(value_col), 4).alias("sum_value_r"),
            n_users.cast("long").alias("n_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            type_col,
            "n_events",
            "sum_value_r",
            "n_users",
        )
    )
