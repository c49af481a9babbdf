"""Driver-side TypeScript-type filtering layer — reference-parity surface.

Re-implements (from scratch, Spark-free: these are kilobyte-scale
prompt-engineering utilities, SURVEY §1.2) the reference library's public
API (``/root/reference/ts_type_filter/__init__.py:1-50``):

- TS-subset parser -> AST (`tsidx.tsfilter.parser`, reference
  ``parser.py:16-227`` — ours is a hand-written recursive-descent parser,
  no Lark dependency);
- type-graph pruning driven by an inverted index over string literals
  (`tsidx.tsfilter.nodes`, reference ``filter.py:100-590``);
- cart-JSON literal collection (reference ``filter.py:593-616``);
- normalizer-spec build/apply/merge (`tsidx.tsfilter.normalize`);
- closure validators (`tsidx.tsfilter.validate`).
"""

from tsidx.tsfilter.nodes import (  # noqa: F401
    Any,
    AnyNode,
    Array,
    Boolean,
    Define,
    FalseValue,
    Literal,
    Never,
    Number,
    ParamDef,
    ParamRef,
    String,
    Struct,
    TrueValue,
    Type,
    Union,
    build_filtered_types,
    build_symbol_table,
    build_type_index,
    collect_string_literals,
)
from tsidx.tsfilter.normalize import (  # noqa: F401
    create_normalizer,
    create_normalizer_spec,
    merge_normalizer_specs,
)
from tsidx.tsfilter.parser import parse, strip_ts_comments  # noqa: F401
from tsidx.tsfilter.validate import (  # noqa: F401
    create_validator,
    create_validator2,
)
