"""Type-graph pruning parity — ported from the reference suite
(/root/reference/tests/test_type_filter.py:30-175): 14-type shared graph,
8 query cases, set-of-formatted-lines equality."""

from __future__ import annotations

import pytest

from tsidx.tsfilter import (
    Array,
    Define,
    Literal,
    ParamDef,
    ParamRef,
    Struct,
    Type,
    Union,
    build_filtered_types,
    build_type_index,
    collect_string_literals,
)


def run_filter(type_defs, query):
    symbols, indexer = build_type_index(type_defs)
    reachable = build_filtered_types(type_defs, symbols, indexer, query)
    return {x.format() for x in reachable}


def expect(text):
    return {line.strip() for line in text.strip().split("\n") if line.strip()}


def make_graph():
    return [
        Define("Cart", [], Struct({"items": Array(Type("Item"))})),
        Define(
            "Item",
            [],
            Union(
                Type("J"),
                Type("P"),
                Type("Q", [ParamRef(Type("V"))]),
                Type("R", [ParamRef(Type("WXYZ"))]),
            ),
        ),
        Define(
            "P",
            [],
            Struct({"p1": Type("V"), "p2": Type("W"), "p3": Type("X"), "p4": Type("Y")}),
        ),
        Define("Q", [ParamDef("T")], Struct({"q1": Type("T")})),
        Define("R", [ParamDef("T", Type("WXYZ"))], Struct({"r1": Type("T")})),
        Define("WXYZ", [], Union(Type("W"), Type("X"), Type("Y"), Type("Z"))),
        Define("V", [], Literal("v")),
        Define("W", [], Literal("w")),
        Define("X", [], Literal("x")),
        Define("Y", [], Literal("y")),
        Define("Z", [], Literal("z")),
        Define("J", [], Type("K")),
        Define("K", [], Type("L")),
        Define("L", [], Union(Literal("l"), Literal("m"))),
    ]


CASES = [
    ("", "type Cart=never;", "no search term"),
    ("bad", "type Cart=never;", "unknown term"),
    (
        "v w x y z",
        """
          type Cart={items:Item[]};
          type Item=P|Q<V>|R<WXYZ>;
          type P={p1:V,p2:W,p3:X,p4:Y};
          type Q<T>={q1:T};
          type R<T extends WXYZ>={r1:T};
          type WXYZ=W|X|Y|Z;
          type V="v";
          type W="w";
          type X="x";
          type Y="y";
          type Z="z";
        """,
        "all terms",
    ),
    (
        "v",
        """
          type Cart={items:Item[]};
          type Item=Q<V>;
          type Q<T>={q1:T};
          type V="v";
        """,
        "union1",
    ),
    (
        "v w",
        """
            type Cart={items:Item[]};
            type Item=Q<V>|R<WXYZ>;
            type Q<T>={q1:T};
            type R<T extends WXYZ>={r1:T};
            type WXYZ="w";
            type V="v";
        """,
        "union2",
    ),
    (
        "w x y z",
        """
            type Cart={items:Item[]};
            type Item=R<WXYZ>;
            type R<T extends WXYZ>={r1:T};
            type WXYZ=W|X|Y|Z;
            type W="w";
            type X="x";
            type Y="y";
            type Z="z";
        """,
        "struct1",
    ),
    (
        "x y",
        """
            type Cart={items:Item[]};
            type Item=R<WXYZ>;
            type R<T extends WXYZ>={r1:T};
            type WXYZ=X|Y;
            type X="x";
            type Y="y";
        """,
        "struct2",
    ),
    (
        "l",
        """
            type Cart={items:Item[]};
            type Item="l";
        """,
        "path collapse 1",
    ),
    (
        "l m",
        """
            type Cart={items:Item[]};
            type Item="l"|"m";
        """,
        "path collapse 2",
    ),
]


@pytest.mark.parametrize("query, expected, name", CASES, ids=[c[2] for c in CASES])
def test_filter_case(query, expected, name):
    assert run_filter(make_graph(), query) == expect(expected)


def test_pinned_literal_always_survives():
    defs = [
        Define("Cart", [], Union(Type("A"), Type("B"))),
        Define("A", [], Literal("apple")),
        Define("B", [], Literal("banana", None, True)),  # pinned
    ]
    assert run_filter(defs, "apple") == expect(
        'type Cart=A|B;\ntype A="apple";\ntype B="banana";'
    )
    # with A pruned, the union collapses to a bare Type ref, which the
    # parameterless-define chain collapse inlines (reference behavior)
    assert run_filter(defs, "nothing") == expect('type Cart="banana";')


def test_alias_matching():
    defs = [
        Define("Cart", [], Type("A")),
        Define("A", [], Literal("Coca-Cola", ["coke", "pop"])),
    ]
    assert run_filter(defs, "coke") == expect('type Cart="Coca-Cola";')
    assert run_filter(defs, "pepsi") == expect("type Cart=never;")


def test_stemmed_matching():
    """Query terms and literal text meet through the shared stemmer."""
    defs = [
        Define("Cart", [], Type("A")),
        Define("A", [], Literal("running shoes")),
    ]
    assert run_filter(defs, "run shoe") == expect('type Cart="running shoes";')


def test_collect_string_literals():
    cart = {
        "items": [
            {"name": "burger", "options": [{"name": "cheese"}]},
            {"name": "fries", "size": "large"},
        ],
        "count": 2,
    }
    got = sorted(collect_string_literals(cart))
    assert got == ["burger", "cheese", "fries", "large"]
