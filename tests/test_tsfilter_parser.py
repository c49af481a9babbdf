"""Parser parity tests — ported from the reference suite
(/root/reference/tests/test_parser.py:5-219): parse -> format -> golden."""

from __future__ import annotations

import os

import pytest

from tsidx.tsfilter import Define, Literal, parse

CASES = [
    ("type a='Jalapeños';", 'type a="Jalapeños";', "escaped string"),
    ("type a=never;", "type a=never;", "never"),
    ("type a<A,B,C>=never;", "type a<A,B,C>=never;", "param def"),
    ("type a<A,B,C>={a:A, b:B, c:C};", "type a<A,B,C>={a:A,b:B,c:C};", "param ref"),
    (" type   a < A,B, C > = never ; ", "type a<A,B,C>=never;", "whitespace"),
    ('type a="hello";', 'type a="hello";', "double quotes"),
    ("type a='hello';", 'type a="hello";', "single quotes"),
    ("type a=123;", "type a=123;", "number"),
    ("// this is a comment\ntype a<A,B,C>=never;", "type a<A,B,C>=never;",
     "line comment"),
    ("// c1\n// c2\ntype a<A,B,C>=never;", "type a<A,B,C>=never;",
     "multiple line comments"),
    ("// Hint: this is a comment\ntype a<A,B,C>=never;",
     "// this is a comment\ntype a<A,B,C>=never;", "line hint"),
    ("// plain\n// Hint: kept\ntype a<A,B,C>=never;",
     "// kept\ntype a<A,B,C>=never;", "mixed comments"),
    ("/* comment */\ntype a<A,B,C>=never;", "type a<A,B,C>=never;",
     "block comment"),
    ("/* Hint: comment */\ntype a<A,B,C>=never;",
     "/* comment */\ntype a<A,B,C>=never;", "block hint"),
    ("type A = B\ntype C = D", "type A=B;\ntype C=D;", "no semicolons"),
    ("type D={a:1,b:'text'};", 'type D={a:1,b:"text"};', "struct1"),
    ("type D={a:1,b:'text',};", 'type D={a:1,b:"text"};', "struct trailing comma"),
    ("type D={a:1;b:'text';};", 'type D={a:1,b:"text"};', "struct semicolons"),
    ("type D={a:1,b:'text';};", 'type D={a:1,b:"text"};', "struct mixed seps"),
    ("type D={a?:1};", "type D={a?:1};", "optional field"),
    (" type  D = { a ? : 1 };", "type D={a?:1};", "optional field spaced"),
    ("type A=B[];", "type A=B[];", "array"),
    ("type A=B[][];", "type A=B[][];", "array2"),
    ("type A={a:1,b:2}[];", "type A={a:1,b:2}[];", "struct array"),
    ("type A=B|C;", "type A=B|C;", "union"),
    ("type A=|B|C;", "type A=B|C;", "leading pipe"),
    ("type a<A,B,C>=D;\ntype D={a:1};", "type a<A,B,C>=D;\ntype D={a:1};",
     "multiple defines"),
    ("type A=B|C[];", "type A=B|C[];", "precedence"),
    ("type A=(B|C)[];", "type A=(B|C)[];", "parenthesized union array"),
    ("type A<B extends C>={a:B};", "type A<B extends C>={a:B};", "extends"),
    ("type A = LITERAL<'Coca-Cola', [], true>", 'type A="Coca-Cola";', "LITERAL0"),
    ("type A = LITERAL<'Coca-Cola', ['coke'], true>", 'type A="Coca-Cola";',
     "LITERAL1"),
    ("type A = LITERAL<'Coca-Cola', ['coke', 'pop'], true>",
     'type A="Coca-Cola";', "LITERAL2"),
    ("type Optional=\"No\"|\"Regular\";\n"
     "// Hint: Use CHOOSE when customer doesn't specify an option\n"
     "type CHOOSE=\"CHOOSE\";",
     "type Optional=\"No\"|\"Regular\";\n"
     "// Use CHOOSE when customer doesn't specify an option\n"
     "type CHOOSE=\"CHOOSE\";", "hint between defines"),
    ("type Result<T extends string> = { status: 'ok' | 'fail', data: T[] };",
     'type Result<T extends string>={status:"ok"|"fail",data:T[]};',
     "complex generic"),
    ("type A = { a: number, b: string } | { c: boolean };",
     "type A={a:number,b:string}|{c:boolean};", "union of structs"),
    ("type A = Array<{ a: number, b: string }>; // Hint: comment",
     "type A=Array<{a:number,b:string}>;\n// comment", "Array generic + hint"),
    ("// Hint: comment\n// another comment\ntype A = 'hi' | 'bye'; // Hint: trailing comment",
     '// comment\ntype A="hi"|"bye";\n// trailing comment', "hints around define"),
]


@pytest.mark.parametrize(
    "source, expected, name", CASES, ids=[c[2] for c in CASES]
)
def test_parse_format_golden(source, expected, name):
    observed = "\n".join(node.format() for node in parse(source))
    assert observed == expected


def test_literal_aliases_and_pinned():
    (node,) = parse("type A = LITERAL<'Coca-Cola', ['coke', 'pop'], true>")
    assert isinstance(node, Define)
    lit = node.type
    assert isinstance(lit, Literal)
    assert lit.text == "Coca-Cola"
    assert lit.aliases == ["coke", "pop"]
    assert lit.pinned is True
    (node2,) = parse("type A = LITERAL<'x', [], false>")
    assert node2.type.aliases == [] and node2.type.pinned is False


def test_string_protection_in_comment_stripping():
    (node,) = parse("type A = 'has // not a comment';")
    assert node.type.text == "has // not a comment"
    (node2,) = parse('type A = "/* not a comment */";')
    assert node2.type.text == "/* not a comment */"


MENU_TS = "/root/reference/samples/menu/data/menu.ts"


@pytest.mark.skipif(not os.path.exists(MENU_TS), reason="reference menu absent")
def test_menu_ts_round_trip():
    """The full 45-type production menu parses, and format() is a fixed
    point (format -> parse -> format is stable)."""
    with open(MENU_TS) as f:
        src = f.read()
    nodes = parse(src)
    defines = [n for n in nodes if isinstance(n, Define)]
    assert len(defines) > 30
    assert defines[0].name == "Cart"
    # format -> parse loses hint comments (a formatted hint no longer
    # carries the "Hint:" marker — reference behavior), so the fixed point
    # starts after one round trip
    once = "\n".join(n.format() for n in nodes)
    twice = "\n".join(n.format() for n in parse(once))
    thrice = "\n".join(n.format() for n in parse(twice))
    assert twice == thrice
    hints = [n for n in nodes if isinstance(n, str)]
    assert len(hints) == 1 and hints[0].startswith("// Use CHOOSE")
