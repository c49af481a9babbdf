"""Normalizer-spec parity — ported from the reference suite
(/root/reference/tests/test_create_defaults.py) plus apply/merge behavior
from /root/reference/integration_test.py:12-157."""

from __future__ import annotations

from tsidx.tsfilter import Define, Literal, Struct, Type, Union
from tsidx.tsfilter.normalize import (
    create_normalizer,
    create_normalizer_spec,
    merge_normalizer_specs,
)


def test_basic_example():
    type_defs = [
        Define("Foo", [], Struct({
            "name": Union(Literal("a"), Literal("b")),
            "field1?": Literal(1),
            "field2?": Literal(3),
        })),
        Define("Bar", [], Struct({
            "name": Literal("c"),
            "field3": Literal("hello"),
            "field4?": Literal(123),
        })),
    ]
    result = create_normalizer_spec(type_defs)
    assert result["types"] == {"a": "Foo", "b": "Foo", "c": "Bar"}
    assert result["defaults"] == {
        "Foo": {"field1": None, "field2": None},
        "Bar": {"field4": None},
    }
    assert not result["duplicates"]


def test_type_references():
    type_defs = [
        Define("MyStruct", [], Struct({
            "name": Type("MyNames"),
            "optional_field?": Literal("value"),
        })),
        Define("MyNames", [], Union(Literal("name1"), Literal("name2"))),
    ]
    result = create_normalizer_spec(type_defs)
    assert result["types"] == {"name1": "MyStruct", "name2": "MyStruct"}
    assert result["defaults"] == {"MyStruct": {"optional_field": None}}
    assert not result["duplicates"]


def test_nested_type_references():
    type_defs = [
        Define("MainStruct", [], Struct({
            "name": Type("NameAlias"),
            "required_field": Literal("required"),
            "optional_field?": Literal("optional"),
        })),
        Define("NameAlias", [], Type("ActualNames")),
        Define("ActualNames", [], Union(Literal("deep1"), Literal("deep2"))),
    ]
    result = create_normalizer_spec(type_defs)
    assert result["types"] == {"deep1": "MainStruct", "deep2": "MainStruct"}
    assert result["defaults"] == {"MainStruct": {"optional_field": None}}
    assert not result["duplicates"]


def test_no_optional_fields():
    type_defs = [
        Define("SimpleStruct", [], Struct({
            "name": Literal("simple"),
            "required_field": Literal("required"),
        }))
    ]
    result = create_normalizer_spec(type_defs)
    assert result["types"] == {"simple": "SimpleStruct"}
    assert result["defaults"] == {}
    assert not result["duplicates"]


def test_no_name_field():
    type_defs = [
        Define("NoNameStruct", [], Struct({
            "other_field": Literal("value"),
            "optional_field?": Literal("optional"),
        }))
    ]
    result = create_normalizer_spec(type_defs)
    assert result["types"] == {}
    assert result["defaults"] == {}
    assert not result["duplicates"]


def test_non_struct_types():
    type_defs = [
        Define("SimpleType", [], Literal("just_a_literal")),
        Define("UnionType", [], Union(Literal("a"), Literal("b"))),
        Define("StructType", [], Struct({
            "name": Literal("struct_name"),
            "optional?": Literal("value"),
        })),
    ]
    result = create_normalizer_spec(type_defs)
    assert result["types"] == {"struct_name": "StructType"}
    assert result["defaults"] == {"StructType": {"optional": None}}
    assert not result["duplicates"]


def test_duplicate_names():
    type_defs = [
        Define("FirstStruct", [], Struct({
            "name": Literal("duplicate"),
            "optional_field?": Literal("value1"),
        })),
        Define("SecondStruct", [], Struct({
            "name": Literal("duplicate"),
            "another_field?": Literal("value2"),
        })),
    ]
    result = create_normalizer_spec(type_defs)
    assert result["duplicates"] == {"duplicate": ["FirstStruct", "SecondStruct"]}


def test_generic_type_expansion():
    """OPTION<NAME> struct instantiated through GROUP = OPTION<"a"|"b">
    (reference normalize.py:146-203 and its inline example)."""
    from tsidx.tsfilter.nodes import ParamDef

    type_defs = [
        Define("OPTION", [ParamDef("NAME")], Struct({
            "name": Type("NAME"),
            "field1?": Literal(0),
            "field2": Literal(""),
        })),
        Define("GROUP", [], Type("OPTION", [Union(Literal("a"), Literal("b"))])),
    ]
    result = create_normalizer_spec(type_defs)
    assert result["types"] == {"a": "GROUP", "b": "GROUP"}
    assert result["defaults"] == {"GROUP": {"field1": None}}
    assert not result["duplicates"]


SPEC = {
    "types": {"burger": "Burger", "fries": "Fries"},
    "defaults": {
        "Burger": {"cheese": None, "onions": None},
        "Fries": {"size": None},
    },
    "duplicates": {},
}

CART = {
    "items": [
        {"name": "burger", "cheese": "cheddar"},
        {"name": "fries"},
        {"name": "unknown", "extra": 1},
    ]
}


def test_normalizer_add_defaults():
    add = create_normalizer(SPEC, remove_defaults=False)
    got = add(CART)
    assert got == {
        "items": [
            {"cheese": "cheddar", "onions": None, "name": "burger"},
            {"size": None, "name": "fries"},
            {"name": "unknown", "extra": 1},
        ]
    }
    # input untouched (deep copy)
    assert "onions" not in CART["items"][0]


def test_normalizer_remove_defaults():
    add = create_normalizer(SPEC, remove_defaults=False)
    remove = create_normalizer(SPEC, remove_defaults=True)
    assert remove(add(CART)) == CART


def test_normalizer_round_trip_nested():
    add = create_normalizer(SPEC, remove_defaults=False)
    remove = create_normalizer(SPEC, remove_defaults=True)
    tree = {"name": "burger", "options": [{"name": "fries", "size": None}]}
    # size:None equals the default -> removed
    assert remove(tree) == {"name": "burger", "options": [{"name": "fries"}]}
    assert add(remove(tree)) == {
        "cheese": None, "onions": None, "name": "burger",
        "options": [{"size": None, "name": "fries"}],
    }


def test_merge_specs_rename_and_stale():
    original = {
        "types": {"a": "Old"},
        "defaults": {"Old": {"f": None}, "Gone": {"g": None}},
        "duplicates": {},
    }
    new = {
        "types": {"a": "New"},
        "defaults": {"New": {"f": None, "h": None}},
        "duplicates": {},
    }
    merged, warnings = merge_normalizer_specs(new, original, {"Old": "New"})
    assert merged["types"] == {"a": "New"}
    assert merged["defaults"]["New"] == {"f": None, "h": None}
    # stale non-empty entry kept with a warning
    assert merged["defaults"]["Gone"] == {"g": None}
    assert any("Gone" in w for w in warnings)


def test_merge_specs_collision_and_missing_warnings():
    merged, warnings = merge_normalizer_specs(
        {"types": {}, "defaults": {}, "duplicates": {}},
        {"types": {}, "defaults": {}, "duplicates": {}},
        {"A": "X", "B": "X"},
    )
    assert any("collision" in w.lower() for w in warnings)
    assert any("not found in original spec defaults" in w for w in warnings)


def test_merge_specs_drops_stale_empty_entries():
    original = {"types": {}, "defaults": {"Empty": {}}, "duplicates": {}}
    new = {"types": {}, "defaults": {}, "duplicates": {}}
    merged, warnings = merge_normalizer_specs(new, original, {})
    assert "Empty" not in merged["defaults"]
    assert any("Empty" in w for w in warnings)
