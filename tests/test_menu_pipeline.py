"""Menu-eval pipeline (4-stage DAG as one mapInPandas pass) over the
reference's own cases.json + menu.ts, loaded at runtime (never vendored),
plus pure-Python repair-cost semantics."""

from __future__ import annotations

import json
import os

import pytest

from tsidx.tsfilter.pipeline import leaf_count, repair_cost

MENU_PATH = "/root/reference/samples/menu/data/menu.ts"
CASES_PATH = "/root/reference/samples/menu/data/cases.json"

# the one golden case whose EXPECTED cart is itself invalid under the
# menu types (GenericWiseguy declares `options?: Veggies | Sauces`, a
# non-array, but the expected answer carries an options LIST)
INVALID_GOLDEN = "7ee4a8d5-6473-4864-a2c6-b8c221840411"


def test_leaf_count():
    assert leaf_count("x") == 1
    assert leaf_count({"a": 1, "b": {"c": 2, "d": 3}}) == 3
    assert leaf_count([]) == 1 and leaf_count({}) == 1
    assert leaf_count([{"a": 1}, "b"]) == 2


def test_repair_cost_scalars_and_dicts():
    assert repair_cost({"a": 1}, {"a": 1}) == 0
    assert repair_cost({"a": 1}, {"a": 2}) == 1
    assert repair_cost({"a": 1}, {"a": 1, "b": {"c": 2, "d": 3}}) == 2
    assert repair_cost({"a": "1"}, {"a": 1}) == 1  # type-strict
    # replacing a scalar with a subtree costs the subtree
    assert repair_cost({"a": 1}, {"a": {"b": 2, "c": 3}}) == 2


def test_repair_cost_list_matching():
    a = {"name": "Burger", "size": "Large"}
    b = {"name": "Fries", "size": "Large"}
    c = {"name": "Coke"}
    # identity in any order
    assert repair_cost([a, b], [b, a]) == 0
    # one item edited, one inserted
    assert repair_cost([a], [dict(a, size="Small"), c]) == 2
    # deletion costs the deleted subtree's leaves
    assert repair_cost([a, b], [a]) == 2


@pytest.fixture(scope="module")
def menu_src():
    if not os.path.exists(MENU_PATH):
        pytest.skip("reference menu sample not available")
    with open(MENU_PATH) as f:
        return f.read()


@pytest.fixture(scope="module")
def cases(spark):
    from tsidx.tsfilter.pipeline import load_cases

    if not os.path.exists(CASES_PATH):
        pytest.skip("reference cases sample not available")
    return load_cases(spark, CASES_PATH)


def test_oracle_model_all_perfect(spark, cases, menu_src):
    """With the deterministic oracle stand-in the pipeline must be
    lossless end-to-end: every turn extracts, diffs to cost 0, and every
    expected cart except the known-inconsistent golden validates."""
    from tsidx.tsfilter.pipeline import run_menu_eval

    rows = run_menu_eval(cases, menu_src).collect()
    assert len(rows) == sum(len(c["turns"]) for c in cases.collect())
    assert all(r["infer_ok"] and r["extract_ok"] for r in rows)
    assert all(r["perfect"] and r["cost"] == 0 for r in rows)
    invalid = {r["uuid"] for r in rows if not r["valid"]}
    assert invalid == {INVALID_GOLDEN}
    # pruning genuinely shrinks the menu on every turn
    assert all(0 < r["n_types_pruned"] < r["n_types_full"] for r in rows)
    unpruned = run_menu_eval(cases, menu_src, prune=False).collect()
    assert all(r["n_types_pruned"] == r["n_types_full"] for r in unpruned)
    assert all(r["perfect"] for r in unpruned)


def test_broken_model_is_scored_not_fatal(spark, cases, menu_src):
    """A model that answers garbage on some turns and wrong carts on
    others degrades scores without killing the job."""
    from tsidx.tsfilter.pipeline import run_menu_eval

    def flaky(messages, expected_json):
        expected = json.loads(expected_json)
        n_turn = sum(1 for m in messages if m["role"] == "user") - 1
        if n_turn % 2 == 0:  # garbage answer -> extract fails
            return "sorry, I can't help with that"
        # drop one item -> nonzero repair cost
        items = list(expected.get("items", []))
        return "```json\n" + json.dumps({"items": items[1:]}) + "\n```"

    rows = run_menu_eval(cases, menu_src, model_fn=flaky).collect()
    bad = [r for r in rows if not r["extract_ok"]]
    ok_rows = [r for r in rows if r["extract_ok"]]
    assert bad and ok_rows  # both failure modes exercised
    # failed extraction is charged the full expected cart
    assert all(r["cost"] >= 1 and not r["perfect"] for r in bad)
    # parsed-but-wrong carts carry a positive repair cost
    assert all(r["cost"] >= 1 and not r["perfect"] for r in ok_rows)


def test_linked_turns_thread_extraction(spark, menu_src):
    """Turn 1's pruning query must include string literals from turn 0's
    EXTRACTED cart when linked_turns=True: a model that answers with a
    distinctive literal in turn 0 changes turn 1's pruned-menu size."""
    from tsidx.tsfilter.pipeline import CASES_SCHEMA, run_menu_eval

    turns = [
        ("a coke", json.dumps({"items": [{"name": "Coca-Cola"}]})),
        ("and fries", json.dumps({"items": [{"name": "Coca-Cola"},
                                            {"name": "French Fries"}]})),
    ]
    cases = _spark_cases(spark, turns, CASES_SCHEMA)

    def model(messages, expected_json):
        # turn 0 answers a DIFFERENT item than expected
        if not any(m["role"] == "assistant" for m in messages[1:-2]):
            return '```json\n{"items": [{"name": "Wiseguy Meal"}]}\n```'
        return "```json\n" + expected_json + "\n```"

    linked = {r["turn_idx"]: r for r in run_menu_eval(
        cases, menu_src, model_fn=model, linked_turns=True).collect()}
    unlinked = {r["turn_idx"]: r for r in run_menu_eval(
        cases, menu_src, model_fn=model, linked_turns=False).collect()}
    # turn 0 is wrong either way
    assert linked[0]["cost"] > 0 and unlinked[0]["cost"] > 0
    # the threaded cart differs, so turn 1's prune query (cart literals)
    # differs -> different pruned menu size
    assert (linked[1]["n_types_pruned"] != unlinked[1]["n_types_pruned"]
            or linked[1]["pruned_chars"] != unlinked[1]["pruned_chars"])


def _spark_cases(spark, turns, schema):
    return spark.createDataFrame(
        [("case-0", ["t"], json.dumps({"items": []}), turns)], schema
    )
