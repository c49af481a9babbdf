"""Boolean query trees: AND / OR / NOT retrieval over the inverted index.

The reference's ``Index.match`` is pure-disjunctive
(``/root/reference/ts_type_filter/inverted_index.py:71-101``); real fulltext
engines layer a boolean algebra on top. This module adds:

- a tiny AST (:class:`Term`, :class:`And`, :class:`Or`, :class:`Not`),
- a query-string parser (``"customer AND (query OR merge) NOT window"``;
  adjacency = AND, ``-term`` = NOT term, case-insensitive keywords),
- a Spark evaluator producing a distinct ``doc_id`` DataFrame.

Evaluation strategy (scale notes):

- ``Term`` reads only its own posting blocks — the ``term = ...`` predicate
  is pushed to the parquet/Iceberg scan like every other query.
- ``Or`` = union + distinct (one shuffle over the union's doc_ids).
- ``And`` intersects via doc_id equi-joins, smallest-input first so AQE can
  broadcast the rarest term's doc set; NOT-children become anti-joins
  against the running positive set — negation never scans the corpus when
  at least one positive conjunct exists.
- A *pure* negation (top-level ``Not`` / all-negative ``And``) needs the
  docID universe; that is a deliberate full-corpus complement and the only
  case that touches ``index.docs``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["Term", "And", "Or", "Not", "parse_bool_query", "BooleanEngine"]


@dataclass(frozen=True)
class Term:
    word: str


@dataclass(frozen=True)
class And:
    children: tuple


@dataclass(frozen=True)
class Or:
    children: tuple


@dataclass(frozen=True)
class Not:
    child: object


_TOKEN_RE = re.compile(r"\(|\)|-|[^\s()\-]+")


def parse_bool_query(query: str):
    """Parse ``"a AND (b OR c) NOT d"`` / ``"a (b OR c) -d"`` into an AST.

    Grammar (keywords case-insensitive, adjacency = AND)::

        or    := and ( OR and )*
        and   := unary ( [AND] unary )*     # NOT binds to the next unary
        unary := NOT unary | '-' unary | '(' or ')' | WORD
    """
    toks = _TOKEN_RE.findall(query)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def take():
        nonlocal pos
        t = toks[pos]
        pos += 1
        return t

    def parse_or():
        parts = [parse_and()]
        while peek() is not None and peek().upper() == "OR":
            take()
            parts.append(parse_and())
        return parts[0] if len(parts) == 1 else Or(tuple(parts))

    def parse_and():
        parts = [parse_unary()]
        while True:
            t = peek()
            if t is None or t == ")" or t.upper() == "OR":
                break
            if t.upper() == "AND":
                take()
                t = peek()
                if t is None or t == ")":
                    raise ValueError("dangling AND")
            parts.append(parse_unary())
        return parts[0] if len(parts) == 1 else And(tuple(parts))

    def parse_unary():
        t = peek()
        if t is None:
            raise ValueError("unexpected end of query")
        if t == "-" or t.upper() == "NOT":
            take()
            return Not(parse_unary())
        if t == "(":
            take()
            node = parse_or()
            if peek() != ")":
                raise ValueError("unbalanced parenthesis")
            take()
            return node
        if t == ")":
            raise ValueError("unbalanced parenthesis")
        if t.upper() in ("AND", "OR"):
            raise ValueError(f"misplaced keyword: {t}")
        return Term(take())

    node = parse_or()
    if pos != len(toks):
        raise ValueError(f"trailing tokens: {toks[pos:]}")
    return node


def _leaf_words(node) -> list[str]:
    if isinstance(node, Term):
        return [node.word]
    if isinstance(node, (And, Or)):
        out = []
        for c in node.children:
            out += _leaf_words(c)
        return out
    if isinstance(node, Not):
        return _leaf_words(node.child)
    raise TypeError(node)


def _anchored(node) -> bool:
    """True if every result doc provably contains >= 1 of the tree's terms:
    Term yes; And if any child is; Or if all children are; Not never.
    Anchored trees evaluate on the candidate set (docs with >= 1 leaf term)
    with full knowledge of each doc's leaf-term membership — so Not is
    correct *within* that set."""
    if isinstance(node, Term):
        return True
    if isinstance(node, And):
        return any(_anchored(c) for c in node.children)
    if isinstance(node, Or):
        return all(_anchored(c) for c in node.children)
    return False


class BooleanEngine:
    """Evaluates boolean ASTs against a :class:`tsidx.query.QueryEngine`.

    Anchored trees (see :func:`_anchored` — the overwhelmingly common case)
    run as ONE decode of all leaf terms' posting blocks + ONE shuffle
    (``groupBy(doc_id).agg(collect_set(term))``), then the whole tree folds
    into a boolean column over each doc's term set — no per-term joins.
    Unanchored trees (top-level negation) fall back to the recursive
    join/anti-join evaluator, which is the only case that may touch the
    docID universe.
    """

    def __init__(self, engine):
        self.engine = engine

    def _mask_eval(self, node, stems: dict):
        if isinstance(node, Term):
            return F.array_contains(F.col("_terms"), stems[node.word])
        if isinstance(node, And):
            out = self._mask_eval(node.children[0], stems)
            for c in node.children[1:]:
                out = out & self._mask_eval(c, stems)
            return out
        if isinstance(node, Or):
            out = self._mask_eval(node.children[0], stems)
            for c in node.children[1:]:
                out = out | self._mask_eval(c, stems)
            return out
        if isinstance(node, Not):
            return ~self._mask_eval(node.child, stems)
        raise TypeError(node)

    def _search_anchored(self, node) -> DataFrame:
        eng = self.engine
        words = sorted(set(_leaf_words(node)))
        stems = {w: eng.terms_of([w])[0] for w in words}
        blocks = eng._blocks_for(sorted(set(stems.values())))
        rows = eng.posting_doc_ids(blocks)
        cand = rows.groupBy("doc_id").agg(
            F.collect_set("term").alias("_terms")
        )
        return eng._live(
            cand.filter(self._mask_eval(node, stems)).select("doc_id")
        )

    def _universe(self) -> DataFrame:
        return self.engine._live(self.engine.index.docs.select("doc_id"))

    def _eval(self, node) -> DataFrame:
        if isinstance(node, Term):
            eng = self.engine
            blocks = eng._blocks_for(eng.terms_of([node.word]))
            return eng._live(
                eng.posting_doc_ids(blocks).select("doc_id").distinct()
            )
        if isinstance(node, Or):
            out = self._eval(node.children[0])
            for child in node.children[1:]:
                out = out.unionByName(self._eval(child))
            return out.distinct()
        if isinstance(node, Not):
            return self._universe().join(self._eval(node.child), "doc_id", "anti")
        if isinstance(node, And):
            positives = [c for c in node.children if not isinstance(c, Not)]
            negatives = [c.child for c in node.children if isinstance(c, Not)]
            if positives:
                out = self._eval(positives[0])
                for child in positives[1:]:
                    out = out.join(self._eval(child), "doc_id")
            else:
                out = self._universe()
            for child in negatives:
                out = out.join(self._eval(child), "doc_id", "anti")
            return out
        raise TypeError(f"unknown node: {node!r}")

    def search(self, query: str | object) -> DataFrame:
        """Evaluate a query string or AST -> ``doc_id`` rows in ascending
        (insertion) order, matching the reference's result ordering."""
        node = parse_bool_query(query) if isinstance(query, str) else query
        if _anchored(node):
            return self._search_anchored(node).orderBy("doc_id")
        return self._eval(node).orderBy("doc_id")
