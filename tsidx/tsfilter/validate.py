"""Validators compiled from the type AST — reference parity.

- :func:`create_validator2` — closure-combinator validator returning
  ``Callable[[Any], bool]`` (reference ``validator2.py:18-266``). This is
  the dependency-free path and the one the reference test suite exercises.
- :func:`create_validator` — pydantic-model compiler (reference
  ``validator.py:50-260``): returns a dynamic pydantic model class with a
  ``value`` field, ``strict`` + ``extra="forbid"``. Import-gated on
  pydantic; both validators share the semantics below and pass the same
  reference acceptance tables (tests/test_tsfilter_validate.py).

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
    """Compile the type graph into a dynamic **pydantic model** — the
    reference's ``create_validator`` API (``validator.py:50-73``): returns a
    model class ``Validator`` with a single ``value`` field;
    ``Validator.model_validate({"value": x})`` raises ``ValidationError``
    for non-conforming values.

    Semantics are identical to :func:`create_validator2` (the reference's
    own acceptance tables, ``tests/test_validator.py``): every leaf is an
    ``Annotated[Any, BeforeValidator]`` exact-type check (so ``1`` rejects
    ``True``/``1.0`` and ``number`` accepts int/float but not bool —
    stricter than the reference's ``number -> float`` shortcut, matching
    its validator2 and test tables instead), structs are nested
    ``create_model`` classes with ``extra="forbid"``, generic defines bind
    compiled argument types to parameter names positionally, and symbol
    names shadow generic parameter names on lookup. Recursive types raise
    ``ValueError`` (as in reference ``validator.py:231-233``).
    """
    try:
        from pydantic import BeforeValidator, ConfigDict, Field, create_model
    except ImportError as e:
        raise ImportError(
            "create_validator requires pydantic; use create_validator2 for "
            "the dependency-free closure validator"
        ) from e
    import itertools
    from typing import Annotated
    from typing import Any as TAny
    from typing import List as TList
    from typing import Union as TUnion

    symbols = {d.name: d for d in type_defs if isinstance(d, Define)}
    root = symbols.get(root_name)
    if root is None:
        raise ValueError(f"root type {root_name!r} not found")
    if root.params:
        raise ValueError("root type must not have type parameters")

    model_cache: dict[str, object] = {}
    compiling: set[str] = set()
    counter = itertools.count()

    def leaf(check, label: str):
        def validate(v):
            if not check(v):
                raise ValueError(f"value does not match {label}")
            return v

        return Annotated[TAny, BeforeValidator(validate)]

    builtins = {
        "string": lambda: leaf(lambda v: type(v) is str, "string"),
        "number": lambda: leaf(lambda v: type(v) in (int, float), "number"),
        "boolean": lambda: leaf(lambda v: type(v) is bool, "boolean"),
        "any": lambda: TAny,
        "never": lambda: leaf(lambda v: False, "never"),
    }

    def conv(node, bindings: dict):
        if isinstance(node, Define):
            return conv_define(node, [])
        if isinstance(node, Literal):
            text = node.text
            return leaf(lambda v: _strict_eq(v, text), repr(text))
        if isinstance(node, Array):
            return TList[conv(node.type, bindings)]
        if isinstance(node, Union):
            arms = tuple(conv(t, bindings) for t in node.types)
            return arms[0] if len(arms) == 1 else TUnion[arms]
        if isinstance(node, Struct):
            fields = {}
            for name, ftype in node.obj.items():
                optional = name.endswith("?")
                fields[name.rstrip("?")] = (
                    conv(ftype, bindings),
                    # absent-optional is allowed and its default is NOT
                    # validated; an explicitly-present None still runs the
                    # field validator (validator2 parity)
                    Field(default=None) if optional else Field(...),
                )
            return create_model(
                f"TsStruct_{next(counter)}",
                __config__=ConfigDict(strict=True, extra="forbid"),
                **fields,
            )
        if isinstance(node, Type):
            return conv_ref(node, bindings)
        if isinstance(node, AnyNode):
            return TAny
        if isinstance(node, Never):
            return leaf(lambda v: False, "never")
        raise ValueError(f"unsupported node in validator: {node!r}")

    def conv_define(d: Define, arg_types: list):
        if len(arg_types) != len(d.params):
            raise ValueError(
                f"expected {len(d.params)} type arguments, got {len(arg_types)}"
            )
        if not d.params:
            if d.name in compiling:
                raise ValueError(f"recursive type detected: {d.name}")
            if d.name not in model_cache:
                compiling.add(d.name)
                try:
                    model_cache[d.name] = conv(d.type, {})
                finally:
                    compiling.discard(d.name)
            return model_cache[d.name]
        return conv(d.type, {p.name: t for p, t in zip(d.params, arg_types)})

    def conv_ref(node: Type, bindings: dict):
        target = symbols.get(node.name)
        if target is not None:  # symbols shadow generic parameter names
            return conv_define(
                target, [conv(p, bindings) for p in (node.params or [])]
            )
        if node.name in bindings:
            return bindings[node.name]
        make = builtins.get(node.name)
        if make is not None:
            return make()
        raise ValueError(f"unknown type: {node.name}")

    root_type = conv_define(root, [])
    return create_model(
        "Validator",
        value=(root_type, Field(...)),
        __config__=ConfigDict(strict=True, extra="forbid"),
    )
