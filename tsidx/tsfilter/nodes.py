"""TypeScript-subset type AST with index/filter/visit — reference parity.

Observable semantics match ``/root/reference/ts_type_filter/filter.py``
(cited per class below); the implementation is original. The pruning model:

1. every **string** ``Literal`` in the graph is indexed (text + aliases as
   separate streams);
2. a query selects the literal nodes whose stems intersect the query stems
   (plus pinned literals);
3. ``filter`` rewrites the graph keeping only selected literals,
   propagating ``never`` upward (union arms drop, required-never structs
   die, arrays of never die, defines whose generic bound is never die,
   chains of parameterless type references collapse);
4. the surviving ``Define`` nodes reachable from the root are emitted in
   traversal order.
"""

from __future__ import annotations

import json

from tsidx.tokenize import query_terms, stem_tokens

__all__ = [
    "Node", "AnyNode", "Any", "TrueValue", "FalseValue", "String", "Number",
    "Boolean", "Array", "ParamDef", "ParamRef", "Define", "Literal", "Never",
    "Struct", "Type", "Union", "SymbolTable", "NodeIndex", "FilterContext",
    "build_symbol_table", "build_type_index", "build_filtered_types",
    "collect_string_literals",
]


def _fmt_json(value) -> str:
    """Canonical TS literal text (reference uses gotaglio ``to_json_string``,
    ``filter.py:352-353``): JSON with non-ASCII preserved."""
    return json.dumps(value, ensure_ascii=False)


class Node:
    """AST node. Identity-hashed: the filter keep-set and the reachable
    ordered-set rely on object identity, as in the reference."""

    __slots__ = ()

    def format(self) -> str:
        raise NotImplementedError

    def index(self, symbols, indexer) -> None:  # default: nothing indexable
        return None

    def filter(self, ctx) -> "Node":  # default: survive unchanged
        return self

    def visit(self, ctx, visitor) -> None:
        visitor(self)


class _Atom(Node):
    """Built-in singleton type (``filter.py:124-247``)."""

    __slots__ = ("_text",)

    def __init__(self, text: str):
        self._text = text

    def format(self) -> str:
        return self._text


class AnyNode(_Atom):
    def __init__(self):
        super().__init__("any")


Any = AnyNode()
TrueValue = _Atom("true")
FalseValue = _Atom("false")
String = _Atom("string")
Number = _Atom("number")
Boolean = _Atom("boolean")


class Never(Node):
    """Bottom type (``filter.py:367-382``). Instances are interchangeable."""

    __slots__ = ()

    def format(self) -> str:
        return "never"


class Literal(Node):
    """String/number/bool literal with optional aliases + pinned flag
    (``filter.py:346-364``; the ``LITERAL<text, [aliases], pinned>``
    parser extension)."""

    __slots__ = ("text", "aliases", "pinned")

    def __init__(self, text, aliases=None, pinned: bool = False):
        self.text = text
        self.aliases = aliases
        self.pinned = pinned

    def format(self) -> str:
        return _fmt_json(self.text)

    def index(self, symbols, indexer) -> None:
        if isinstance(self.text, str):  # only string literals are indexed
            indexer.add(self)

    def filter(self, ctx) -> Node:
        return self if ctx.keep(self) else Never()


class Array(Node):
    """``T[]`` (``filter.py:250-269``)."""

    __slots__ = ("type",)

    def __init__(self, type):
        self.type = type

    def format(self) -> str:
        inner = self.type.format()
        return f"({inner})[]" if isinstance(self.type, Union) else inner + "[]"

    def index(self, symbols, indexer) -> None:
        self.type.index(symbols, indexer)

    def filter(self, ctx) -> Node:
        t = self.type.filter(ctx)
        return Never() if isinstance(t, Never) else Array(t)

    def visit(self, ctx, visitor) -> None:
        visitor(self)
        self.type.visit(ctx, visitor)


class Union(Node):
    """``A|B|...`` — never arms drop, singletons collapse
    (``filter.py:490-514``)."""

    __slots__ = ("types",)

    def __init__(self, *types):
        self.types = types

    def format(self) -> str:
        return "|".join(t.format() for t in self.types)

    def index(self, symbols, indexer) -> None:
        for t in self.types:
            t.index(symbols, indexer)

    def filter(self, ctx) -> Node:
        kept = [
            f for f in (t.filter(ctx) for t in self.types)
            if not isinstance(f, Never)
        ]
        if not kept:
            return Never()
        if len(kept) == 1:
            return kept[0]
        return Union(*kept)

    def visit(self, ctx, visitor) -> None:
        visitor(self)
        for t in self.types:
            t.visit(ctx, visitor)


class Struct(Node):
    """``{a: T, b?: U}``; optional fields carry a ``?`` key suffix. A
    required field of never kills the struct; optional never fields drop
    (``filter.py:409-435``)."""

    __slots__ = ("obj",)

    def __init__(self, obj: dict):
        self.obj = obj

    def format(self) -> str:
        return "{" + ",".join(f"{k}:{v.format()}" for k, v in self.obj.items()) + "}"

    def index(self, symbols, indexer) -> None:
        for v in self.obj.values():
            v.index(symbols, indexer)

    def filter(self, ctx) -> Node:
        kept = {}
        for k, v in self.obj.items():
            f = v.filter(ctx)
            if isinstance(f, Never):
                if not k.endswith("?"):
                    return Never()
            else:
                kept[k] = f
        return Struct(kept)

    def visit(self, ctx, visitor) -> None:
        visitor(self)
        for v in self.obj.values():
            v.visit(ctx, visitor)


class ParamDef(Node):
    """Generic parameter declaration ``T extends X`` (``filter.py:272-296``)."""

    __slots__ = ("name", "extends")

    def __init__(self, name: str, extends=None):
        self.name = name
        self.extends = extends

    def format(self) -> str:
        return self.name + (f" extends {self.extends.format()}" if self.extends else "")

    def index(self, symbols, indexer) -> None:
        if self.extends:
            self.extends.index(symbols, indexer)

    def filter(self, ctx) -> Node:
        if self.extends:
            t = self.extends.filter(ctx)
            return ParamDef(self.name, Never() if isinstance(t, Never) else t)
        return self

    def visit(self, ctx, visitor) -> None:
        visitor(self)
        if self.extends:
            self.extends.visit(ctx, visitor)


class ParamRef(Node):
    """Wrapper marking a generic argument position (``filter.py:385-406``)."""

    __slots__ = ("type",)

    def __init__(self, type):
        self.type = type

    def format(self) -> str:
        return self.type.format()

    def index(self, symbols, indexer) -> None:
        self.type.index(symbols, indexer)

    def filter(self, ctx) -> Node:
        t = self.type.filter(ctx)
        return Never() if isinstance(t, Never) else self

    def visit(self, ctx, visitor) -> None:
        visitor(self)
        if not isinstance(self.type, Never):
            self.type.visit(ctx, visitor)


class Define(Node):
    """``type Name<params> = body;`` with optional hint comment
    (``filter.py:299-343``)."""

    __slots__ = ("name", "params", "type", "hint")

    def __init__(self, name: str, params, type, hint: str | None = None):
        self.name = name
        self.params = params
        self.type = type
        self.hint = hint

    def format(self) -> str:
        hint = f"// {self.hint}\n" if self.hint else ""
        params = (
            "<" + ",".join(p.format() for p in self.params) + ">"
            if self.params
            else ""
        )
        return f"{hint}type {self.name}{params}={self.type.format()};"

    def index(self, symbols, indexer) -> None:
        for p in self.params:
            p.index(symbols, indexer)
        self.type.index(symbols, indexer)

    def filter(self, ctx) -> Node:
        params = [p.filter(ctx) for p in self.params]
        # a generic whose bound collapsed to never is itself never
        if any(p.extends and isinstance(p.extends, Never) for p in params):
            return Define(self.name, params, Never(), self.hint)

        locals_ = [p.name for p in self.params]
        if locals_:
            ctx.push_locals(locals_)
        body = self.type.filter(ctx)
        if not self.params:
            # parameterless alias chains collapse through filtered targets
            # (reference ``filter.py:329-334``: A -> B -> "l" becomes A="l")
            while body and isinstance(body, Type):
                if body.params:
                    break
                body = ctx.filtered(body.name).type
        if locals_:
            ctx.pop_locals()
        return Define(self.name, params, body, self.hint)

    def visit(self, ctx, visitor) -> None:
        visitor(self)
        for p in self.params:
            p.visit(ctx, visitor)
        self.type.visit(ctx, visitor)


class Type(Node):
    """Named type reference ``Name`` / ``Name<Args>`` (``filter.py:438-487``).

    Filtering resolves the referenced define through the context (filtering
    it on first touch) and dies if it died; generic arguments that filter to
    never also kill the reference. Names bound by an enclosing generic
    parameter are local and never resolved."""

    __slots__ = ("name", "params")

    def __init__(self, name: str, params=None):
        self.name = name
        self.params = params

    def format(self) -> str:
        args = (
            "<" + ",".join(p.format() for p in self.params) + ">"
            if self.params
            else ""
        )
        return self.name + args

    def index(self, symbols, indexer) -> None:
        if self.params:
            for p in self.params:
                p.index(symbols, indexer)

    def filter(self, ctx) -> Node:
        if not ctx.is_local(self.name):
            if self.params:
                args = [p.filter(ctx) for p in self.params]
                if any(
                    isinstance(a, Never)
                    or (isinstance(a, Define) and isinstance(a.type, Never))
                    for a in args
                ):
                    return Never()
            target = ctx.resolve(self.name)
            if isinstance(target, Define) and isinstance(target.type, Never):
                return Never()
        return self

    def visit(self, ctx, visitor) -> None:
        target = ctx.filtered(self.name)
        if target:
            target.visit(ctx, visitor)
        if self.params:
            for p in self.params:
                p.visit(ctx, visitor)


# ---------------------------------------------------------------------------
# symbol table / literal index / filter context
# ---------------------------------------------------------------------------


class SymbolTable:
    """name -> Define plus TS built-ins (``filter.py:37-54,520-535``)."""

    def __init__(self):
        self._defs: dict[str, Node] = {}

    def add(self, name: str, node: Node) -> None:
        if name in self._defs:
            raise ValueError(f"duplicate type name: {name}")
        self._defs[name] = node

    def get(self, name: str) -> Node:
        try:
            return self._defs[name]
        except KeyError:
            raise KeyError(f"unknown type name: {name}") from None

    def items(self):
        return self._defs.items()


class NodeIndex:
    """Inverted index over the graph's string literals — the driver-side
    counterpart of the distributed engine, with reference ``Index``/
    ``TypeIndex`` semantics (``inverted_index.py:35-101``, ``filter.py:
    10-34``): streams = literal text + aliases, per-node stem sets,
    disjunctive match in insertion order, pinned nodes always match."""

    def __init__(self):
        self._order: list[Node] = []
        self._stems: list[set[str]] = []
        self._pinned: list[bool] = []
        self._seen: set[int] = set()
        self._cache: dict = {}

    def add(self, node: Literal) -> None:
        if id(node) in self._seen:
            raise ValueError("duplicate node added to index")
        self._seen.add(id(node))
        streams = [node.text] + list(node.aliases or [])
        stems: set[str] = set()
        for stream in streams:
            stems.update(stem_tokens(stream, self._cache))
        self._order.append(node)
        self._stems.append(stems)
        self._pinned.append(bool(node.pinned))

    def match(self, query) -> list[Node]:
        q = set(query_terms(query, self._cache))
        return [
            node
            for node, stems, pinned in zip(self._order, self._stems, self._pinned)
            if pinned or (q & stems)
        ]


class FilterContext:
    """Filter-pass state (reference ``Subgraph``, ``filter.py:57-97``):
    the keep-set of matched literal nodes, the filtered-define memo, and
    the generic-parameter scope stack."""

    def __init__(self, symbols: SymbolTable, keep_nodes):
        self._symbols = symbols
        self._keep = {id(n) for n in keep_nodes}
        self._filtered: dict[str, Node] = {}
        self._scopes: list[list[str]] = []

    def keep(self, node: Node) -> bool:
        return id(node) in self._keep

    def is_local(self, name: str) -> bool:
        return any(name in scope for scope in self._scopes)

    def push_locals(self, names) -> None:
        self._scopes.append(list(names))

    def pop_locals(self) -> None:
        self._scopes.pop()

    def filtered(self, name: str):
        return self._filtered.get(name)

    def resolve(self, name: str) -> Node:
        """Filtered define for *name*, filtering on first touch (memoized —
        each define is filtered at most once per query)."""
        got = self._filtered.get(name)
        if got is None:
            got = self._symbols.get(name).filter(self)
            self._filtered[name] = got
        return got


# ---------------------------------------------------------------------------
# public builders (reference ``filter.py:520-616``)
# ---------------------------------------------------------------------------


def build_symbol_table(type_defs) -> SymbolTable:
    symbols = SymbolTable()
    for node in type_defs:
        if isinstance(node, Define):
            symbols.add(node.name, node)
    symbols.add("any", Any)
    symbols.add("false", FalseValue)
    symbols.add("true", TrueValue)
    symbols.add("string", String)
    symbols.add("number", Number)
    symbols.add("boolean", Boolean)
    symbols.add("never", Never())
    return symbols


def build_type_index(type_defs):
    """(symbols, indexer) over the graph's string literals."""
    symbols = build_symbol_table(type_defs)
    indexer = NodeIndex()
    for node in type_defs:
        if not isinstance(node, str):  # skip hint-comment items
            node.index(symbols, indexer)
    return symbols, indexer


def build_filtered_types(type_defs, symbols, indexer, query):
    """Prune the graph by *query*; returns the surviving ``Define`` nodes
    reachable from the root (``type_defs[0]``) in traversal order."""
    ctx = FilterContext(symbols, indexer.match(query))
    filtered = []
    for node in type_defs:
        if not isinstance(node, str):
            f = node.filter(ctx)
            if isinstance(node, Define):
                # memoize top-level results so Type references resolve to
                # the same filtered instance
                ctx._filtered.setdefault(node.name, f)
            filtered.append(f)
    reachable: dict[Node, None] = {}

    def visitor(node):
        if isinstance(node, Define):
            reachable[node] = None

    filtered[0].visit(ctx, visitor)
    return reachable


def collect_string_literals(data) -> list[str]:
    """All string leaves of a nested dict/list tree (cart JSON), dedup'd
    (``filter.py:593-616``)."""
    out: set[str] = set()

    def walk(x):
        if isinstance(x, dict):
            for v in x.values():
                walk(v)
        elif isinstance(x, list):
            for item in x:
                walk(item)
        elif isinstance(x, str):
            out.add(x)

    walk(data)
    return list(out)
