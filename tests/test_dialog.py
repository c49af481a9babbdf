"""Hand-computed tests for conversation-structure analytics
(tsidx/dialog.py): role transitions and tool-usage profiles."""

import datetime

import pytest

from tsidx.dialog import role_transitions, tool_usage

SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def _ts(minute, second=0):
    return datetime.datetime(
        2026, 4, 1, 9, minute, second, tzinfo=datetime.timezone.utc
    )


@pytest.fixture
def transcripts(spark):
    rows = [
        # conv A: user -> assistant -> user, gaps 60 s then 120 s
        ("a", 0, "user", "hi there", "", _ts(0)),
        ("a", 1, "assistant", "hello friend of mine", "", _ts(1)),
        ("a", 2, "user", "bye", "", _ts(3)),
        # conv B: user -> tool -> assistant, gaps 30 s then 90 s
        ("b", 0, "user", "run it", "", _ts(0)),
        ("b", 1, "tool", "ok done now", "search", _ts(0, 30)),
        ("b", 2, "assistant", "result ready", "", _ts(2)),
        # conv C: lone turn (no successor) + a second tool call
        ("c", 0, "tool", "", "search", _ts(5)),
        # conv D: tool call by a different tool
        ("d", 0, "tool", "four tokens right here", "calc", _ts(6)),
        ("d", 1, "user", "thanks", "", _ts(7)),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_role_transitions_hand_computed(transcripts):
    got = {
        (r["role"], r["next_role"]): (r["n"], r["avg_gap_s_r"])
        for r in role_transitions(transcripts).collect()
    }
    assert got[("user", "assistant")] == (1, 60.0)
    assert got[("assistant", "user")] == (1, 120.0)
    assert got[("user", "tool")] == (1, 30.0)
    assert got[("tool", "assistant")] == (1, 90.0)
    assert got[("tool", "user")] == (1, 60.0)
    # lone turn in conv C contributes nothing; 5 transition kinds total
    assert len(got) == 5


def test_role_transitions_orders_by_turn_idx_not_input_order(spark):
    rows = [
        ("x", 2, "assistant", "t", "", _ts(2)),
        ("x", 0, "user", "t", "", _ts(0)),
        ("x", 1, "tool", "t", "", _ts(1)),
    ]
    got = {
        (r["role"], r["next_role"])
        for r in role_transitions(spark.createDataFrame(rows, SCHEMA)).collect()
    }
    assert got == {("user", "tool"), ("tool", "assistant")}


def test_tool_usage_hand_computed(transcripts):
    got = {r["tool"]: r for r in tool_usage(transcripts).collect()}
    assert set(got) == {"search", "calc"}  # empty tool rows excluded
    s = got["search"]
    # two calls across convs b and c; payloads 3 tokens and 0 (empty text)
    assert (s["n_calls"], s["n_convs"], s["avg_len_r"]) == (2, 2, 1.5)
    c = got["calc"]
    assert (c["n_calls"], c["n_convs"], c["avg_len_r"]) == (1, 1, 4.0)


def test_render_conversations_order_and_tags(spark):
    """Turns render in turn_idx order regardless of input order; custom
    delimiters apply; n_turns counts rows."""
    from tsidx.dialog import render_conversations

    rows = [
        ("c1", 2, "user", "third"),
        ("c1", 0, "user", "first"),
        ("c1", 1, "assistant", "second"),
        ("c2", 0, "system", "solo"),
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    got = {r["conv_id"]: r for r in render_conversations(t).collect()}
    assert got["c1"]["rendered"] == (
        "<|user|>first\n<|assistant|>second\n<|user|>third"
    )
    assert got["c1"]["n_turns"] == 3
    assert got["c2"]["rendered"] == "<|system|>solo"
    custom = {
        r["conv_id"]: r["rendered"]
        for r in render_conversations(
            t, turn_sep=" ", role_open="[", role_close="] "
        ).collect()
    }
    assert custom["c2"] == "[system] solo"
