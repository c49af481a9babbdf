"""Validator parity — ported from the reference suite
(/root/reference/tests/test_validator.py:5-330): parse -> compile ->
boolean acceptance table, plus the full menu validation case."""

from __future__ import annotations

import os

import pytest

from tsidx.tsfilter import parse
from tsidx.tsfilter.validate import create_validator2

CASES = [
    ("type a = 'hello'", "a", [
        ("hello", True), ("other", False), (123, False),
    ], "string literal"),
    ("type a = 123", "a", [
        (123, True), (456, False), ("hello", False),
    ], "numeric literal"),
    ("type a = true", "a", [
        (True, True), (False, False), ("hello", False),
    ], "boolean literal"),
    ("type a = {x: 1, y?: 'hello'}", "a", [
        ({"x": 1, "y": "hello"}, True),
        ({"x": 1}, True),
        ({"y": "hello"}, False),
        ({"x": 1, "z": 1}, False),
        ({"x": 1, "y": "goodbye"}, False),
        ({"x": "what", "y": "hello"}, False),
        ({"x": True, "y": "hello"}, False),
        ({"x": [True], "y": "hello"}, False),
    ], "struct"),
    ("type a = {x: 1, y?: 'hello'}[]", "a", [
        ([{"x": 1, "y": "hello"}, {"x": 1}], True),
        ([], True),
        ([1], False),
    ], "array"),
    ("type a = 1 | 2 | 'hello'", "a", [
        (1, True), (2, True), ("hello", True), (123, False),
    ], "union"),
    ("type a = boolean", "a", [
        (True, True), (False, True), (1, False), (0, False),
    ], "bool"),
    ("type a = number", "a", [
        (123, True), (False, False), ("hello", False),
    ], "number"),
    ("type a = string", "a", [
        ("hello", True), (False, False), (123, False),
    ], "string"),
    ("type a = any", "a", [
        ("hello", True), (False, True), (123, True),
    ], "any"),
    ("type a = never", "a", [
        ("hello", False), (False, False), (123, False),
    ], "never"),
    ("type a = {x:B, y:C};type B=number;type C=string", "a", [
        ({"x": 123, "y": "hello"}, True),
        ({"x": True, "y": "hello"}, False),
    ], "typename"),
    ("type a = {x:B};type B=C;type C='hello'", "a", [
        ({"x": "hello"}, True),
        ({"x": True}, False),
    ], "typename chaining"),
    ("type A = B<C,D>;type B<X,Y>={x:X, y:Y};type C=number;type D=string", "A", [
        ({"x": 123, "y": "hello"}, True),
        ({"x": True, "y": "hello"}, False),
    ], "generics1"),
    ("type A = B<C,D>;type B<X,Y>={x:X, y:Y};type C=1;type D='hello'", "A", [
        ({"x": 1, "y": "hello"}, True),
        ({"x": True, "y": "hello"}, False),
    ], "generics2"),
]

FLAT = [
    (src, root, value, expected, f"{name}#{i}")
    for src, root, subs, name in CASES
    for i, (value, expected) in enumerate(subs)
]


@pytest.mark.parametrize(
    "source, root, value, expected, name", FLAT, ids=[c[4] for c in FLAT]
)
def test_validator_cases(source, root, value, expected, name):
    validator = create_validator2(parse(source), root)
    assert validator(value) is expected


def test_validator_errors():
    with pytest.raises(ValueError, match="not found"):
        create_validator2(parse("type a = 1"), "missing")
    with pytest.raises(ValueError, match="type parameters"):
        create_validator2(parse("type a<T> = T"), "a")
    with pytest.raises(ValueError, match="unknown type"):
        create_validator2(parse("type a = NotDefined"), "a")([])  # noqa


# --------------------------------------------------------------------------
# pydantic-model compiler (create_validator) — same reference acceptance
# tables (reference validator.py:50-260, tests/test_validator.py:5-330),
# exercised wherever pydantic is installed.
# --------------------------------------------------------------------------


def _pydantic_accepts(model, value) -> bool:
    import pydantic

    try:
        model.model_validate({"value": value})
        return True
    except pydantic.ValidationError:
        return False


@pytest.mark.parametrize(
    "source, root, value, expected, name", FLAT, ids=[c[4] for c in FLAT]
)
def test_pydantic_validator_cases(source, root, value, expected, name):
    pytest.importorskip("pydantic")
    from tsidx.tsfilter.validate import create_validator

    model = create_validator(parse(source), root)
    assert _pydantic_accepts(model, value) is expected


def test_pydantic_validator_errors():
    pytest.importorskip("pydantic")
    from tsidx.tsfilter.validate import create_validator

    with pytest.raises(ValueError, match="not found"):
        create_validator(parse("type a = 1"), "missing")
    with pytest.raises(ValueError, match="type parameters"):
        create_validator(parse("type a<T> = T"), "a")
    with pytest.raises(ValueError, match="unknown type"):
        create_validator(parse("type a = NotDefined"), "a")
    with pytest.raises(ValueError, match="recursive"):
        create_validator(parse("type a = {x: a}"), "a")


def test_pydantic_matches_closure_validator():
    """Both compilers must agree on every (source, value) pair — the
    pydantic path is an alternate backend, not an alternate semantics."""
    pytest.importorskip("pydantic")
    from tsidx.tsfilter.validate import create_validator

    for source, root, subs, _name in CASES:
        defs = parse(source)
        v2 = create_validator2(defs, root)
        model = create_validator(defs, root)
        for value, _expected in subs:
            assert _pydantic_accepts(model, value) is v2(value), (source, value)


MENU_TS = "/root/reference/samples/menu/data/menu.ts"


@pytest.mark.skipif(not os.path.exists(MENU_TS), reason="reference menu absent")
def test_menu_validation():
    """Full production menu compiles to a Cart validator and accepts /
    rejects realistic carts (reference test_validator.py:324-330)."""
    with open(MENU_TS) as f:
        type_defs = parse(f.read())
    validator = create_validator2(type_defs, "Cart")
    assert validator({"items": []}) is True
    assert validator(
        {"items": [{"name": "Grilled Chicken Sandwich"}]}
    ) is True
    assert validator({"items": [{"name": "Flux Capacitor"}]}) is False
    assert validator({"items": [{"name": "Grilled Chicken Sandwich",
                                 "warp_drive": True}]}) is False
    assert validator({"nope": []}) is False


@pytest.mark.skipif(not os.path.exists(MENU_TS), reason="reference menu absent")
def test_menu_validation_pydantic():
    """The full production menu compiles to a pydantic Cart model with the
    same accept/reject behavior as the closure validator."""
    pytest.importorskip("pydantic")
    from tsidx.tsfilter.validate import create_validator

    with open(MENU_TS) as f:
        type_defs = parse(f.read())
    model = create_validator(type_defs, "Cart")
    assert _pydantic_accepts(model, {"items": []}) is True
    assert _pydantic_accepts(
        model, {"items": [{"name": "Grilled Chicken Sandwich"}]}
    ) is True
    assert _pydantic_accepts(model, {"items": [{"name": "Flux Capacitor"}]}) is False
    assert _pydantic_accepts(
        model,
        {"items": [{"name": "Grilled Chicken Sandwich", "warp_drive": True}]},
    ) is False
    assert _pydantic_accepts(model, {"nope": []}) is False
