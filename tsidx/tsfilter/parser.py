"""Hand-written lexer + recursive-descent parser for the TS subset.

Grammar parity with the reference (``/root/reference/ts_type_filter/
parser.py:16-69``): ``type`` defines with generic params (``extends``
bounds), unions (optional leading ``|``), array suffixes, structs with
optional ``?`` fields and ``,``/``;`` separators, parentheses, string /
number / boolean literals, ``never``/``any`` keywords, the
``LITERAL<text, [aliases], pinned>`` extension, and hint comments
(``// Hint: ...`` and ``/* Hint: ... */`` survive as strings in the parse
result; all other comments are stripped, with string-literal protection —
reference ``parser.py:272-331``).

No Lark (not installed in this environment); a single-pass scanner strips
comments and the parser is ~200 lines of plain Python.
"""

from __future__ import annotations

import ast as _pyast
import re

from tsidx.tsfilter.nodes import (
    Any,
    Array,
    Define,
    Literal,
    Never,
    ParamDef,
    Struct,
    Type,
    Union,
)

__all__ = ["parse", "strip_ts_comments", "ParseError"]


class ParseError(ValueError):
    pass


def strip_ts_comments(text: str) -> str:
    """Remove comments except hints, protecting string literals.

    Single-pass scanner (the reference uses placeholder-substitution
    regexes; observable behavior is the same): inside ``"…"``/``'…'``/
    `` `…` `` nothing is a comment; ``// Hint: `` line comments and
    ``/*<ws>Hint:`` block comments are preserved verbatim; all other
    comments are dropped.
    """
    out = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c in "\"'`":
            j = i + 1
            while j < n:
                if text[j] == "\\":
                    j += 2
                    continue
                if text[j] == c:
                    j += 1
                    break
                j += 1
            out.append(text[i:j])
            i = j
        elif c == "/" and i + 1 < n and text[i + 1] == "/":
            j = text.find("\n", i)
            j = n if j == -1 else j
            if text.startswith("// Hint: ", i):
                out.append(text[i:j])
            i = j
        elif c == "/" and i + 1 < n and text[i + 1] == "*":
            j = text.find("*/", i + 2)
            j = n if j == -1 else j + 2
            if re.match(r"/\*\s*Hint:", text[i:j]):
                out.append(text[i:j])
            i = j
        else:
            out.append(c)
            i += 1
    return "".join(out)


_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<line_comment>//[^\n]*)
  | (?P<block_comment>/\*[\s\S]*?\*/)
  | (?P<number>[+-]?(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)
  | (?P<string>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
  | (?P<name>[A-Za-z_]\w*)
  | (?P<punct><|>|=|\||;|:|,|\?|\{|\}|\(|\)|\[|\])
    """,
    re.VERBOSE,
)


def _lex(text: str) -> list[tuple[str, str]]:
    tokens, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise ParseError(f"unexpected character {text[pos]!r} at {pos}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        tokens.append((kind, m.group()))
    tokens.append(("eof", ""))
    return tokens


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    # ------------------------------------------------------------- plumbing

    def peek(self):
        return self.toks[self.i]

    def next(self):
        tok = self.toks[self.i]
        self.i += 1
        return tok

    def at(self, kind: str, value: str | None = None) -> bool:
        k, v = self.toks[self.i]
        return k == kind and (value is None or v == value)

    def eat(self, kind: str, value: str | None = None) -> str:
        if not self.at(kind, value):
            k, v = self.peek()
            raise ParseError(f"expected {value or kind}, got {v!r}")
        return self.next()[1]

    def accept(self, kind: str, value: str | None = None) -> bool:
        if self.at(kind, value):
            self.next()
            return True
        return False

    # ------------------------------------------------------------ top level

    def program(self) -> list:
        items = []
        while not self.at("eof"):
            kind, value = self.peek()
            if kind == "line_comment":
                self.next()
                if value.startswith("// Hint: "):
                    items.append("//" + value[8:])
            elif kind == "block_comment":
                self.next()
                if value.startswith("/* Hint: "):
                    items.append("/*" + value[8:-2] + "*/")
            elif self.at("name", "type"):
                items.append(self.define())
            else:
                raise ParseError(f"expected 'type' or comment, got {value!r}")
        return items

    def define(self) -> Define:
        self.eat("name", "type")
        name = self.eat("name")
        params = self.param_defs() if self.at("punct", "<") else []
        self.eat("punct", "=")
        body = self.type_expr()
        self.accept("punct", ";")
        return Define(name, params, body)

    def param_defs(self) -> list[ParamDef]:
        self.eat("punct", "<")
        params = [self.param_def()]
        while self.accept("punct", ","):
            params.append(self.param_def())
        self.eat("punct", ">")
        return params

    def param_def(self) -> ParamDef:
        name = self.eat("name")
        extends = None
        if self.at("name", "extends"):
            self.next()
            extends = self.type_expr()
        return ParamDef(name, extends)

    # ----------------------------------------------------------- type exprs

    def type_expr(self):
        self.accept("punct", "|")  # optional leading |
        arms = [self.array_expr()]
        while self.accept("punct", "|"):
            arms.append(self.array_expr())
        return arms[0] if len(arms) == 1 else Union(*arms)

    def array_expr(self):
        node = self.primary()
        while self.at("punct", "["):
            save = self.i
            self.next()
            if self.accept("punct", "]"):
                node = Array(node)
            else:
                self.i = save
                break
        return node

    def primary(self):
        kind, value = self.peek()
        if kind == "string":
            return Literal(_pyast.literal_eval(self.next()[1]))
        if kind == "number":
            text = self.next()[1]
            try:
                return Literal(int(text))
            except ValueError:
                return Literal(float(text))
        if kind == "punct" and value == "{":
            return self.struct()
        if kind == "punct" and value == "(":
            self.next()
            inner = self.type_expr()
            self.eat("punct", ")")
            return inner
        if kind == "name":
            if value == "never":
                self.next()
                return Never()
            if value == "any":
                self.next()
                return Any
            if value in ("true", "false"):
                self.next()
                return Literal(value == "true")
            if value == "LITERAL":
                return self.literal_ex()
            return self.type_ref()
        raise ParseError(f"unexpected token {value!r}")

    def type_ref(self) -> Type:
        name = self.eat("name")
        args = None
        if self.at("punct", "<"):
            self.next()
            args = [self.type_expr()]
            while self.accept("punct", ","):
                args.append(self.type_expr())
            self.eat("punct", ">")
        return Type(name, args)

    def literal_ex(self) -> Literal:
        """``LITERAL<text, [aliases...], pinned>`` (reference
        ``parser.py:49-53,182-187``)."""
        self.eat("name", "LITERAL")
        self.eat("punct", "<")
        text = _pyast.literal_eval(self.eat("string"))
        self.eat("punct", ",")
        aliases = []
        if self.at("string"):
            # bare-string alias: appears in the reference's own menu.ts
            # (samples/menu/data/menu.ts:213) though its grammar requires a
            # bracketed list — accepted here as a compatible superset
            aliases.append(_pyast.literal_eval(self.next()[1]))
        else:
            self.eat("punct", "[")
            if self.at("string"):
                aliases.append(_pyast.literal_eval(self.next()[1]))
                while self.accept("punct", ","):
                    aliases.append(_pyast.literal_eval(self.eat("string")))
            self.eat("punct", "]")
        self.eat("punct", ",")
        flag = self.eat("name")
        if flag not in ("true", "false"):
            raise ParseError(f"expected true/false, got {flag!r}")
        self.eat("punct", ">")
        return Literal(text, aliases, flag == "true")

    def struct(self) -> Struct:
        self.eat("punct", "{")
        fields: dict = {}
        while not self.at("punct", "}"):
            name = self.eat("name")
            if self.accept("punct", "?"):
                name += "?"
            self.eat("punct", ":")
            fields[name] = self.type_expr()
            if not (self.accept("punct", ",") or self.accept("punct", ";")):
                break
        self.eat("punct", "}")
        return Struct(fields)


def parse(text: str) -> list:
    """TS source -> list of ``Define`` nodes and surviving hint-comment
    strings, in source order (reference ``parser.py:222-227``)."""
    clean = strip_ts_comments(text)
    return _Parser(_lex(clean)).program()
