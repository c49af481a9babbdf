"""Sessionization (session_window) and watermarked streaming term trends:
batch vs pure-Python oracle, stream vs batch parity, late-row drop."""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F

from tsidx.sessions import sessionize, streaming_term_trend
from tsidx.tokenize import query_terms

UTC = datetime.timezone.utc
T0 = datetime.datetime(2026, 1, 1, tzinfo=UTC)
SCHEMA = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"


def mk(conv, i, minutes, text="one two three"):
    return (conv, i, "user", text, "", T0 + datetime.timedelta(minutes=minutes))


ROWS = [
    # c0: turns at 0,5,10 then a 60-min gap, then 70,75 -> two sessions
    mk("c0", 0, 0), mk("c0", 1, 5), mk("c0", 2, 10),
    mk("c0", 3, 70, "four five"), mk("c0", 4, 75),
    # c1: single turn -> one session
    mk("c1", 0, 3),
    # c2: every turn 29 min apart with gap=30 -> still ONE session
    mk("c2", 0, 0), mk("c2", 1, 29), mk("c2", 2, 58),
]


def py_sessions(rows, gap_min=30):
    by_conv: dict = {}
    for c, _, _, text, _, ts in rows:
        by_conv.setdefault(c, []).append((ts, len(text.split())))
    out = []
    for c, turns in by_conv.items():
        turns.sort()
        cur = [turns[0]]
        for t in turns[1:]:
            if (t[0] - cur[-1][0]).total_seconds() < gap_min * 60:
                cur.append(t)
            else:
                out.append((c, cur))
                cur = [t]
        out.append((c, cur))
    return sorted(
        (
            c,
            int(sess[0][0].timestamp()),
            int(sess[-1][0].timestamp()) + gap_min * 60,
            len(sess),
            sum(n for _, n in sess),
        )
        for c, sess in out
    )


def test_sessionize_batch_vs_python(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = sorted(
        (r["conv_id"], r["session_start"], r["session_end"],
         r["n_turns"], r["total_tokens"])
        for r in sessionize(df, "30 minutes").collect()
    )
    assert got == py_sessions(ROWS, 30)
    # c0 split into two sessions; c2 chained into one
    convs = [g[0] for g in got]
    assert convs.count("c0") == 2
    assert convs.count("c2") == 1


def test_sessionize_partition_invariant(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    a = sorted(map(tuple, sessionize(df, "30 minutes").collect()))
    b = sorted(map(tuple, sessionize(df.repartition(7), "30 minutes").collect()))
    assert a == b


def test_sessionize_streaming_parity(spark, tmp_path):
    """The same aggregation under readStream+watermark finalizes the same
    sessions once the watermark passes (availableNow drain)."""
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    spark.createDataFrame(ROWS, SCHEMA).coalesce(1).write.parquet(in_dir)
    stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
    sess = sessionize(stream.withWatermark("ts", "0 seconds"), "30 minutes")
    q = (
        sess.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.read.parquet(out_dir).collect()))
    batch = sorted(
        map(tuple, sessionize(spark.createDataFrame(ROWS, SCHEMA), "30 minutes").collect())
    )
    # append mode emits only watermark-finalized sessions; with the file
    # source drained, the max event time closes every session except those
    # within gap of the final watermark
    assert set(got) <= set(batch)
    assert len(got) >= len(batch) - 2


def test_streaming_term_trend_counts_and_late_drop(spark, tmp_path):
    terms = query_terms("fire heat")
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    rows1 = [
        mk("c0", 0, 0, "fire burns bright"),
        mk("c0", 1, 2, "heat and fire"),
        mk("c0", 2, 12, "heated argument"),   # stems to 'heat' (porter2: heated->heat)
        mk("c0", 3, 200, "advance watermark far ahead"),
    ]
    late = [mk("c9", 0, 1, "fire again but too late")]
    os.makedirs(in_dir)
    spark.createDataFrame(rows1, SCHEMA).coalesce(1).write.mode("append").parquet(in_dir)
    stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
    trend = streaming_term_trend(
        stream, terms, window="10 minutes", watermark="5 minutes"
    )
    opts = dict(path=out_dir, checkpointLocation=ck)
    q = (
        trend.writeStream.outputMode("append").format("parquet")
        .options(**opts).trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    # second micro-batch: a row whose event time is far behind the
    # watermark (200min - 5min) must be dropped from the finalized window
    spark.createDataFrame(late, SCHEMA).coalesce(1).write.mode("append").parquet(in_dir)
    q2 = (
        streaming_term_trend(
            spark.readStream.schema(SCHEMA).parquet(in_dir),
            terms, window="10 minutes", watermark="5 minutes",
        )
        .writeStream.outputMode("append").format("parquet")
        .options(**opts).trigger(availableNow=True).start()
    )
    q2.awaitTermination(120)
    got = {
        (r["window_start"], r["term"]): r["n_docs"]
        for r in spark.read.parquet(out_dir).collect()
    }
    w0 = int(T0.timestamp())
    w1 = w0 + 600
    assert got[(w0, "fire")] == 2      # late 'fire' at minute 1 NOT counted
    assert got[(w0, "heat")] == 1
    assert got[(w1, "heat")] == 1      # 'heated' stems to 'heat'


EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _event_rows():
    import datetime

    base = datetime.datetime(2026, 3, 1, 10, 0, tzinfo=datetime.timezone.utc)
    rows = []
    for i in range(12):
        rows.append(
            (
                i,
                base + datetime.timedelta(minutes=20 * i),
                100 + i % 3,
                "click" if i % 2 == 0 else "view",
                float(i),
                "{}",
            )
        )
    return rows


def test_event_window_stats_hand_computed(spark):
    from tsidx.sessions import event_window_stats

    ev = spark.createDataFrame(_event_rows(), EVENTS_SCHEMA)
    got = {
        (r["window_start"].hour, r["event_type"]): r
        for r in event_window_stats(ev, "1 hour").collect()
    }
    # hour 10 holds events 0,1,2 (minutes 0/20/40): clicks {0,2}, view {1}
    assert got[(10, "click")]["n_events"] == 2
    assert got[(10, "click")]["sum_value_r"] == 2.0  # values 0 + 2
    assert got[(10, "click")]["n_users"] == 2  # users 100, 102
    assert got[(10, "view")]["n_events"] == 1
    # 12 events x 20 min span exactly 4 hours -> 8 (hour, type) groups
    assert len(got) == 8


def test_event_window_stats_streaming_parity(spark, tmp_path):
    from tsidx.sessions import event_window_stats

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    spark.createDataFrame(_event_rows(), EVENTS_SCHEMA).coalesce(1).write.parquet(in_dir)
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(in_dir)
    # streaming mode auto-swaps count_distinct -> approx_count_distinct;
    # exact at this cardinality (<=3 users/window), so parity still holds
    agg = event_window_stats(stream, "1 hour", watermark="0 seconds")
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.read.parquet(out_dir).collect()))
    batch = sorted(
        map(
            tuple,
            event_window_stats(
                spark.createDataFrame(_event_rows(), EVENTS_SCHEMA), "1 hour"
            ).collect(),
        )
    )
    # append mode finalizes all but the last (watermark-open) window
    assert set(got) <= set(batch)
    assert len(got) >= len(batch) - 2
