"""Cart-JSON normalizer: spec build / apply / merge — reference parity.

Observable behavior matches ``/root/reference/ts_type_filter/normalize.py``:

- :func:`create_normalizer_spec` scans struct-typed defines (expanding
  parameterless references to generic structs) for a ``name`` field; each
  string literal the name field can take maps to the define, and the
  define's optional (``?``) fields become a defaults template
  (``normalize.py:15-92``);
- :func:`create_normalizer` curries a spec into an add-defaults
  (``normalize1``) or remove-defaults (``normalize2``) tree rewriter
  (``normalize.py:247-370``);
- :func:`merge_normalizer_specs` merges a regenerated spec into an existing
  one under type renames, warning about collisions and stale entries
  (``normalize.py:373-455``).
"""

from __future__ import annotations

import copy

from tsidx.tsfilter.nodes import Define, Literal, Struct, Type, Union

__all__ = [
    "create_normalizer_spec",
    "create_normalizer",
    "normalize_add_defaults",
    "normalize_remove_defaults",
    "merge_normalizer_specs",
    "expand_generic_type",
]


def _find_define(type_defs, name: str):
    for d in type_defs:
        if isinstance(d, Define) and d.name == name:
            return d
    return None


def _substitute(node, bindings: dict):
    """Replace type-parameter references with bound argument types."""
    if isinstance(node, Type):
        if node.name in bindings:
            return bindings[node.name]
        args = (
            [_substitute(p, bindings) for p in node.params] if node.params else None
        )
        return Type(node.name, args)
    if isinstance(node, Struct):
        return Struct({k: _substitute(v, bindings) for k, v in node.obj.items()})
    if isinstance(node, Union):
        return Union(*[_substitute(t, bindings) for t in node.types])
    return node


def expand_generic_type(node, type_defs, _seen: set | None = None):
    """``Type`` reference to a generic struct define -> the instantiated
    ``Struct``, or ``None`` when not expandable."""
    if not isinstance(node, Type):
        return None
    seen = _seen or set()
    if node.name in seen:
        return None
    target = _find_define(type_defs, node.name)
    if (
        target is None
        or not target.params
        or not isinstance(target.type, Struct)
        or len(node.params or []) != len(target.params)
    ):
        return None
    bindings = {
        (p if isinstance(p, str) else p.name): arg
        for p, arg in zip(target.params, node.params or [])
    }
    return _substitute(target.type, bindings)


def _name_literals(node, type_defs, _seen: set | None = None) -> set:
    """All literal values a name-field type can take (unions and type
    references resolved, cycle-safe)."""
    seen = set() if _seen is None else _seen
    out: set = set()
    if isinstance(node, Literal):
        out.add(node.text)
    elif isinstance(node, Union):
        for t in node.types:
            out |= _name_literals(t, type_defs, seen)
    elif isinstance(node, Type) and node.name not in seen:
        seen.add(node.name)
        target = _find_define(type_defs, node.name)
        if target is not None:
            out |= _name_literals(target.type, type_defs, seen)
        seen.discard(node.name)
    return out


def create_normalizer_spec(type_defs) -> dict:
    """{"types": literal->type-name, "defaults": type-name->{field: None},
    "duplicates": literal->[type-names]} over the graph's named structs."""
    types: dict = {}
    defaults: dict = {}
    claims: dict = {}

    for d in type_defs:
        if not isinstance(d, Define):
            continue
        struct = d.type if isinstance(d.type, Struct) else expand_generic_type(
            d.type, type_defs
        )
        if not isinstance(struct, Struct):
            continue
        name_type = None
        optional = {}
        for field, ftype in struct.obj.items():
            if field == "name":
                name_type = ftype
            elif field.endswith("?"):
                optional[field[:-1]] = None
        if name_type is None:
            continue
        literals = _name_literals(name_type, type_defs)
        if literals and optional:
            defaults[d.name] = optional
        for lit in literals:
            claims.setdefault(lit, []).append(d.name)
            types[lit] = d.name

    return {
        "types": types,
        "defaults": defaults,
        "duplicates": {k: v for k, v in claims.items() if len(v) > 1},
    }


def _walk_named_dicts(tree, on_named):
    """Deep-copied tree rewrite: *on_named* transforms each dict carrying a
    ``name`` key; lists/dicts recursed, primitives untouched."""

    def rec(node):
        if isinstance(node, dict):
            if "name" in node:
                node = on_named(node)
            return {k: rec(v) for k, v in node.items()}
        if isinstance(node, list):
            return [rec(x) for x in node]
        return node

    return rec(copy.deepcopy(tree))


def normalize_add_defaults(tree, defaults: dict):
    """Merge the name-keyed default template under each named dict; the
    tree's own keys win (reference ``normalize1``)."""

    def on_named(node):
        template = defaults.get(node["name"])
        if template:
            merged = copy.deepcopy(template)
            merged.update(node)
            return merged
        return node

    return _walk_named_dicts(tree, on_named)


def normalize_remove_defaults(tree, defaults: dict):
    """Delete fields equal to their template default (reference
    ``normalize2``)."""

    def on_named(node):
        template = defaults.get(node["name"], {})
        return {
            k: v
            for k, v in node.items()
            if not (k in template and template[k] == v)
        }

    return _walk_named_dicts(tree, on_named)


def create_normalizer(spec: dict, remove_defaults: bool = True):
    """Curry *spec* into a tree normalizer (reference ``create_normalizer``).

    The spec's type-keyed defaults are re-keyed by name literal so the
    rewriters can look up templates from a dict's ``name`` value.
    """
    by_name = {
        name: spec["defaults"][type_name]
        for name, type_name in spec.get("types", {}).items()
        if type_name in spec.get("defaults", {})
    }

    def normalizer(tree):
        if remove_defaults:
            return normalize_remove_defaults(tree, by_name)
        return normalize_add_defaults(tree, by_name)

    return normalizer


def merge_normalizer_specs(new_spec: dict, original_spec: dict,
                           renamed_types: dict):
    """Merge *new_spec* over *original_spec* with *renamed_types* applied to
    the original's defaults; returns (merged_spec, warnings)."""
    warnings: list[str] = []

    targets: dict = {}
    for old, new in renamed_types.items():
        if new in targets:
            warnings.append(
                f"Name collision in renamedTypes: both '{targets[new]}' and "
                f"'{old}' map to '{new}'"
            )
        else:
            targets[new] = old

    original_defaults = original_spec.get("defaults", {})
    for old in renamed_types:
        if old not in original_defaults:
            warnings.append(
                f"Type '{old}' in renamedTypes not found in original spec defaults"
            )

    renamed = {
        renamed_types.get(name, name): copy.deepcopy(value)
        for name, value in original_defaults.items()
    }

    merged_defaults = dict(renamed)
    new_defaults = new_spec.get("defaults", {})
    for name, value in new_defaults.items():
        if name in merged_defaults:
            entry = copy.deepcopy(merged_defaults[name])
            entry.update(value)
            merged_defaults[name] = entry
        else:
            merged_defaults[name] = copy.deepcopy(value)

    for name in renamed:
        if name not in new_defaults:
            warnings.append(f"Type '{name}' from original spec not found in new spec")
            if renamed[name] is None or renamed[name] == {}:
                merged_defaults.pop(name, None)

    merged = {
        "types": copy.deepcopy(new_spec.get("types", {})),
        "duplicates": copy.deepcopy(new_spec.get("duplicates", {})),
        "defaults": merged_defaults,
    }
    return merged, warnings
