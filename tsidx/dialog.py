"""Conversation-structure analytics over transcript tables.

Operates on the north-rule transcript shape ``(conv_id, turn_idx, role,
text, tool, ts)``:

- :func:`role_transitions` mines turn-taking structure — who follows whom
  within a conversation, how often, and with what latency.
- :func:`tool_usage` profiles the ``tool`` column of tool-role turns
  (call counts, conversation reach, payload size).

The reference repo has no conversation layer (its index is per-document,
`/root/reference/ts_type_filter/inverted_index.py`); these extend the
engine for the transcript payload the north rule names.

Scale notes (100 TB): ``role_transitions`` needs conversation locality,
so it shuffles once on ``conv_id`` for the lead() window — conversations
are bounded (tens of turns), so window partitions cannot skew; the
follow-up groupBy runs on <= |roles|^2 keys with map-side partials, so
its exchange carries O(partitions x roles^2) rows. If the transcripts are
already bucketed by conv_id (the layout the index build preserves), the
window exchange is elided. ``tool_usage`` is a pushed-down not-empty
filter plus a groupBy on the bounded tool vocabulary — one scan, one
tiny-key shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["role_transitions", "tool_usage", "render_conversations"]


def _ws_token_count(text_col: str) -> F.Column:
    """Whitespace-run token count with empty-text -> 0 (matches the
    engine's tokenizer and the DuckDB oracle's CASE guard: DuckDB's
    regexp_split_to_array('') yields [''] just like Spark's split, so
    both sides need the explicit zero)."""
    t = F.trim(F.col(text_col))
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def role_transitions(
    transcripts: DataFrame,
    *,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    ts_col: str = "ts",
) -> DataFrame:
    """``(role, next_role, n, avg_gap_s_r)``: counts and mean inter-turn
    latency (seconds, rounded to 4) of each within-conversation role
    transition, ordered by ``turn_idx``. The last turn of a conversation
    has no successor and contributes no row.
    """
    w = Window.partitionBy(conv_col).orderBy(turn_col)
    pairs = transcripts.select(
        F.col(role_col).alias("role"),
        F.lead(role_col).over(w).alias("next_role"),
        (
            F.unix_timestamp(F.lead(ts_col).over(w))
            - F.unix_timestamp(F.col(ts_col))
        ).alias("gap_s"),
    ).filter(F.col("next_role").isNotNull())
    return pairs.groupBy("role", "next_role").agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.avg("gap_s"), 4).alias("avg_gap_s_r"),
    )


def tool_usage(
    transcripts: DataFrame,
    *,
    conv_col: str = "conv_id",
    tool_col: str = "tool",
    text_col: str = "text",
) -> DataFrame:
    """``(tool, n_calls, n_convs, avg_len_r)``: per non-empty tool name
    the call count, the number of distinct conversations that invoked it,
    and the mean whitespace-token length of its payloads (rounded to 4).
    """
    calls = transcripts.filter(
        F.col(tool_col).isNotNull() & (F.col(tool_col) != "")
    )
    return calls.groupBy(F.col(tool_col).alias("tool")).agg(
        F.count("*").cast("long").alias("n_calls"),
        F.count_distinct(F.col(conv_col)).cast("long").alias("n_convs"),
        F.round(F.avg(_ws_token_count(text_col)), 4).alias("avg_len_r"),
    )


def render_conversations(
    transcripts: DataFrame,
    *,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    turn_sep: str = "\n",
    role_open: str = "<|",
    role_close: str = "|>",
) -> DataFrame:
    """``(conv_col, rendered, n_turns)`` — each conversation rendered as
    one role-tagged training string in turn order::

        <|user|>first turn text
        <|assistant|>reply text
        ...

    The SFT-export shape: one row per conversation, ready for
    token-budget packing (:func:`tsidx.pack.pack_shards`), group-level
    splitting, and JSONL export. Tags are plain configurable delimiters,
    not a tokenizer-specific template — swap ``role_open``/``role_close``
    for a model's special tokens at export time.

    Scale shape: ONE bounded (conv_id) shuffle — collect_list gathers a
    conversation's turns (conversations are tens of turns, so rows stay
    small), array_sort restores turn order deterministically, and the
    join+render is a JVM transform. No window, no second exchange.
    """
    per_turn = transcripts.select(
        F.col(conv_col),
        F.struct(
            F.col(turn_col).alias("t"),
            F.concat(
                F.lit(role_open), F.col(role_col), F.lit(role_close),
                F.col(text_col),
            ).alias("s"),
        ).alias("ts"),
    )
    return (
        per_turn.groupBy(conv_col)
        .agg(F.array_sort(F.collect_list("ts")).alias("_a"))
        .select(
            conv_col,
            F.array_join(
                F.transform(F.col("_a"), lambda x: x["s"]), turn_sep
            ).alias("rendered"),
            F.size("_a").cast("long").alias("n_turns"),
        )
    )
