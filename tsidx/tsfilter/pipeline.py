"""Menu-eval pipeline: the reference's four-stage LLM evaluation DAG
(``/root/reference/samples/menu/menu.py:185-295`` — prepare → infer →
extract → assess over gotaglio) re-expressed as ONE Spark map-only pass
over a cases table.

Shape: turn *t*'s cart context is turn *t-1*'s extraction, so the turn
loop is inherently sequential PER CASE — and embarrassingly parallel
ACROSS cases, which is exactly ``mapInPandas``' batch shape. A million
eval cases fan out over the cluster with zero shuffle; the menu SOURCE
is shipped once in the task closure and parsed once per executor
process (module-level cache), never per row.

Stages per (case, turn):

- **prepare** — prune the menu to the types reachable from the
  accumulated user queries plus the cart's string literals
  (``parse`` → ``build_type_index`` → ``build_filtered_types``, the
  ported reference filter), and assemble the message list.
- **infer** — pluggable ``model_fn(messages, expected_json) -> str``.
  The default is an honestly-labeled deterministic fake that answers
  with the expected cart fenced in ```` ```json ```` (no LLM client in
  this container); swap in a real client on a cluster.
- **extract** — strip code fences, ``json.loads``.
- **assess** — validate the extracted cart against the FULL menu (the
  ported closure validator, root ``Cart``) and compute the repair cost
  vs the expected cart (:func:`repair_cost` — our own edit-cost
  semantics, documented there; the reference uses gotaglio's ``Repair``
  tree-diff for the same purpose).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

__all__ = [
    "repair_cost",
    "leaf_count",
    "oracle_model_fn",
    "run_menu_eval",
    "load_cases",
]

CASES_SCHEMA = (
    "uuid string, keywords array<string>, cart string, "
    "turns array<struct<user: string, expected: string>>"
)

_RESULT_SCHEMA = (
    "uuid string, turn_idx int, n_types_full int, n_types_pruned int, "
    "pruned_chars long, infer_ok boolean, extract_ok boolean, "
    "valid boolean, cost long, perfect boolean"
)


def leaf_count(x) -> int:
    """Number of scalar leaves of a nested dict/list tree (an empty
    container still counts 1 — inserting it is one edit)."""
    if isinstance(x, dict):
        return max(1, sum(leaf_count(v) for v in x.values()))
    if isinstance(x, list):
        return max(1, sum(leaf_count(v) for v in x))
    return 1


def repair_cost(observed, expected) -> int:
    """Minimal edit cost turning *observed* into *expected* — the assess
    metric (0 = carts agree exactly; ``perfect`` in the output).

    Semantics (ours; same purpose as the reference's gotaglio ``Repair``
    diff, independently defined so the number is self-contained):

    - scalars: cost 1 when unequal (type-strict, so ``"1"`` != ``1``);
    - dicts: aligned keys recurse; a missing or extra key costs the
      subtree's :func:`leaf_count` (insert/delete the whole subtree);
    - lists: min-cost bipartite matching of elements — exact over all
      permutations when the smaller side has <= 6 elements (eval carts
      are small), greedy-by-cheapest-pair beyond; unmatched elements
      cost their leaf counts.
    """
    if isinstance(observed, dict) and isinstance(expected, dict):
        cost = 0
        for k in observed.keys() | expected.keys():
            if k not in observed:
                cost += leaf_count(expected[k])
            elif k not in expected:
                cost += leaf_count(observed[k])
            else:
                cost += repair_cost(observed[k], expected[k])
        return cost
    if isinstance(observed, list) and isinstance(expected, list):
        return _match_lists(observed, expected)
    if type(observed) is type(expected) and observed == expected:
        return 0
    # scalar vs scalar mismatch is 1; scalar vs tree = replace the tree
    return max(leaf_count(observed), leaf_count(expected))


def _match_lists(obs: list, exp: list) -> int:
    if not obs:
        return sum(leaf_count(e) for e in exp)
    if not exp:
        return sum(leaf_count(o) for o in obs)
    small, big, small_is_obs = (
        (obs, exp, True) if len(obs) <= len(exp) else (exp, obs, False)
    )
    pair = (
        (lambda s, b: repair_cost(s, b))
        if small_is_obs
        else (lambda s, b: repair_cost(b, s))
    )
    unmatched_big = sum(leaf_count(b) for b in big)
    if len(small) <= 6:
        import itertools

        best = None
        for perm in itertools.permutations(range(len(big)), len(small)):
            c = sum(pair(s, big[j]) for s, j in zip(small, perm))
            c += unmatched_big - sum(leaf_count(big[j]) for j in perm)
            if best is None or c < best:
                best = c
        return int(best)
    # greedy fallback for pathologically long lists: repeatedly take the
    # cheapest remaining (small, big) pair
    costs = sorted(
        (pair(s, b), i, j)
        for i, s in enumerate(small)
        for j, b in enumerate(big)
    )
    used_i: set = set()
    used_j: set = set()
    total = 0
    for c, i, j in costs:
        if i in used_i or j in used_j:
            continue
        used_i.add(i)
        used_j.add(j)
        total += c
    total += sum(leaf_count(b) for j, b in enumerate(big) if j not in used_j)
    return total


def oracle_model_fn(messages, expected_json: str) -> str:
    """Deterministic stand-in for the LLM: answers with the expected cart
    in a fenced block — exercises every other stage end-to-end (prune,
    message assembly, fence stripping, JSON parse, validation, diff)
    with a known-perfect answer. NOT a model; swap a real client in via
    ``model_fn`` on a cluster that has one."""
    return "```json\n" + expected_json + "\n```"


# per-executor parse cache: menu source -> (type_defs, symbols, indexer,
# validator). Parsing is ~ms but runs once per process, not per row.
_MENU_CACHE: dict = {}


def _menu_artifacts(menu_src: str, root: str):
    key = (hash(menu_src), root)
    got = _MENU_CACHE.get(key)
    if got is None:
        from tsidx.tsfilter.nodes import build_type_index
        from tsidx.tsfilter.parser import parse
        from tsidx.tsfilter.validate import create_validator2

        type_defs = parse(menu_src)
        symbols, indexer = build_type_index(type_defs)
        validator = create_validator2(type_defs, root)
        got = (type_defs, symbols, indexer, validator)
        _MENU_CACHE[key] = got
    return got


def _strip_fences(text: str) -> str:
    text = text.strip()
    if text.startswith("```json"):
        text = text[len("```json"):]
    return text.strip("`").strip()


def run_menu_eval(
    cases: DataFrame,
    menu_src: str,
    model_fn=None,
    root: str = "Cart",
    prune: bool = True,
    linked_turns: bool = True,
) -> DataFrame:
    """Run the 4-stage eval over a cases DataFrame (:data:`CASES_SCHEMA`);
    returns one row per (case, turn) with per-stage outcomes.

    ``linked_turns=True`` threads turn *t-1*'s EXTRACTION in as turn
    *t*'s cart context (falling back to the expected cart when the
    extraction failed), matching the reference's linked-turns replay;
    ``False`` always uses the previous turn's expected cart.
    """
    fn = model_fn or oracle_model_fn

    def _run(batches):
        import pandas as pd

        from tsidx.tsfilter.nodes import (
            build_filtered_types,
            collect_string_literals,
        )

        type_defs, symbols, indexer, validator = _menu_artifacts(
            menu_src, root
        )
        n_full = sum(1 for d in type_defs if not isinstance(d, str))
        full_menu = "\n".join(
            d.format() for d in type_defs if not isinstance(d, str)
        )
        for pdf in batches:
            out = {k: [] for k in (
                "uuid", "turn_idx", "n_types_full", "n_types_pruned",
                "pruned_chars", "infer_ok", "extract_ok", "valid", "cost",
                "perfect",
            )}
            for uuid, cart_json, turns in zip(
                pdf["uuid"], pdf["cart"], pdf["turns"]
            ):
                cart = json.loads(cart_json) if cart_json else {"items": []}
                history: list = []
                for ti, turn in enumerate(turns):
                    user = turn["user"]
                    expected = json.loads(turn["expected"])
                    # prepare: accumulated user queries + cart literals
                    user_queries = [
                        m["content"] for m in history if m["role"] == "user"
                    ] + [user]
                    full_query = user_queries + collect_string_literals(cart)
                    if prune:
                        reachable = build_filtered_types(
                            type_defs, symbols, indexer, full_query
                        )
                        pruned = "\n".join(d.format() for d in reachable)
                        n_pruned = len(reachable)
                    else:
                        pruned, n_pruned = full_menu, n_full
                    messages = (
                        [{"role": "system", "content": pruned}]
                        + history
                        + [
                            {"role": "assistant",
                             "content": json.dumps(cart)},
                            {"role": "user", "content": user},
                        ]
                    )
                    # infer
                    try:
                        answer = fn(messages, turn["expected"])
                        infer_ok = True
                    except Exception:
                        answer, infer_ok = "", False
                    # extract
                    observed = None
                    extract_ok = False
                    if infer_ok:
                        try:
                            observed = json.loads(_strip_fences(answer))
                            extract_ok = True
                        except Exception:
                            pass
                    # assess: validate against the FULL menu + diff cost
                    valid = bool(validator(observed)) if extract_ok else False
                    cost = (
                        repair_cost(
                            (observed or {}).get("items", []),
                            expected.get("items", []),
                        )
                        if extract_ok
                        else leaf_count(expected.get("items", []))
                    )
                    out["uuid"].append(uuid)
                    out["turn_idx"].append(ti)
                    out["n_types_full"].append(n_full)
                    out["n_types_pruned"].append(int(n_pruned))
                    out["pruned_chars"].append(len(pruned))
                    out["infer_ok"].append(infer_ok)
                    out["extract_ok"].append(extract_ok)
                    out["valid"].append(valid)
                    out["cost"].append(int(cost))
                    out["perfect"].append(extract_ok and cost == 0)
                    # thread context into the next turn
                    history = [
                        m for m in messages if m["role"] != "system"
                    ]
                    cart = (
                        observed
                        if (linked_turns and extract_ok)
                        else expected
                    )
            yield pd.DataFrame(out)

    return cases.mapInPandas(_run, schema=_RESULT_SCHEMA)


def load_cases(spark, path: str) -> DataFrame:
    """cases.json -> DataFrame (:data:`CASES_SCHEMA`); carts and expected
    answers stay JSON strings (their schema is the menu's business)."""
    with open(path) as f:
        raw = json.load(f)
    rows = [
        (
            c["uuid"],
            list(c.get("keywords", [])),
            json.dumps(c.get("cart", {"items": []})),
            [
                (t["user"], json.dumps(t["expected"]))
                for t in c.get("turns", [])
            ],
        )
        for c in raw
    ]
    return spark.createDataFrame(rows, CASES_SCHEMA)
