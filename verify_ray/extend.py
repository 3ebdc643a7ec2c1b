"""Extension surface: custom rules, span-format hooks, spec-from-dataclass.

Mirrors the reference's three extension points:

* **custom Validator impls** (D6 — reference lib.rs:191-206,221-324;
  derive options verify-macros/src/lib.rs:131-162): ``register_rule``
  installs a named vectorized rule builder; specs reference it via a
  column's ``custom`` list.  Builders return a violation mask fn, so
  custom rules run inside the same single narrow pass as built-ins.
* **Spans plug-in trait** (D5 — reference serde.rs:63-95, ``KeySpans``
  default): ``span_format`` hook customizes how violation spans are
  rendered; default is the reference's dotted-keys convention.
* **derive(Verify)** (D2 — verify-macros/src/lib.rs:352-389):
  ``spec_from_dataclass`` builds a ConstraintSpec from a Python
  dataclass, with constraints in ``field(metadata={"verify": {...}})``
  — the declarative analogue of ``#[verify(...)]`` attributes.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional


from .errors import SpecError
from .spec import ColumnSpec, ConstraintSpec

# rule name -> builder(column: str, params: dict) -> mask fn
# (pa.Table -> bool ndarray, True = violation)
_RULE_REGISTRY: dict[str, Callable] = {}


def register_rule(name: str, builder: Callable) -> None:
    """Install a custom vectorized rule.

    ``builder(column, params)`` must return ``fn(pa.Table) -> np.ndarray``
    (bool violation mask).  The rule is then usable from any spec:

        columns:
          n_tok: {custom: [{rule: my_rule, threshold: 3}]}
    """
    if not callable(builder):
        raise TypeError("builder must be callable")
    _RULE_REGISTRY[name] = builder


def get_rule(name: str) -> Optional[Callable]:
    return _RULE_REGISTRY.get(name)


def registered_rules() -> list[str]:
    return sorted(_RULE_REGISTRY)


def build_custom_rules(c: ColumnSpec) -> list:
    """Expand a ColumnSpec's ``custom`` entries into RowRules."""
    from .kernels import RowRule

    out = []
    for entry in getattr(c, "custom", None) or []:
        params = dict(entry)
        name = params.pop("rule")
        builder = _RULE_REGISTRY.get(name)
        if builder is None:
            raise SpecError([f'columns.{c.name}.custom: unknown rule "{name}" '
                             f"(registered: {registered_rules()})"])
        message = params.pop("message", f'custom rule "{name}" failed')
        mask_fn = builder(c.name, params)
        out.append(RowRule(rule_id=name, column=c.name, span=c.name,
                           message=message, mask_fn=mask_fn))
    return out


# ---------------------------------------------------------------------------
# D2: spec from dataclass


_DTYPE_BY_PYTYPE = {
    int: "int64",
    float: "float64",
    str: "string",
    bool: "bool",
    bytes: "binary",
}


def spec_from_dataclass(cls, key: Optional[str] = None) -> ConstraintSpec:
    """Build a ConstraintSpec from a dataclass.

    Column dtypes derive from field annotations (``list[int]`` →
    ``list<int64>``); constraints come from
    ``field(metadata={"verify": {...}})``.  The first field is the key
    unless ``key=`` names another.

        @dataclass
        class Sequence:
            doc_id: str = field(metadata={"verify": {"pattern": r"^doc-\\d+$",
                                                     "unique": True}})
            n_tok: int = field(metadata={"verify": {"minimum": 1}})
    """
    if not dataclasses.is_dataclass(cls):
        raise SpecError([f"{cls!r} is not a dataclass"])
    import typing

    hints = typing.get_type_hints(cls)
    columns: dict[str, dict] = {}
    for f in dataclasses.fields(cls):
        cdict = dict(f.metadata.get("verify", {}))
        if "dtype" not in cdict:
            t = hints.get(f.name, str)
            origin = typing.get_origin(t)
            if origin in (list, tuple):
                inner = typing.get_args(t)[0] if typing.get_args(t) else int
                cdict["dtype"] = f"list<{_DTYPE_BY_PYTYPE.get(inner, 'string')}>"
            elif typing.get_origin(t) is typing.Union:  # Optional[...]
                args = [a for a in typing.get_args(t) if a is not type(None)]
                cdict["dtype"] = _DTYPE_BY_PYTYPE.get(args[0] if args else str,
                                                      "string")
                cdict.setdefault("non_null", False)
            elif t in _DTYPE_BY_PYTYPE:
                cdict["dtype"] = _DTYPE_BY_PYTYPE[t]
        columns[f.name] = cdict
    key = key or dataclasses.fields(cls)[0].name
    return ConstraintSpec.from_dict(
        {"table": cls.__name__.lower(), "key": key, "columns": columns})


# ---------------------------------------------------------------------------
# D5: span-format hooks


def dotted_span(column: str, elem_idx=None) -> str:
    """The default KeySpans-style dotted renderer (reference
    span.rs:101-103): ``col`` or ``col.<i>``."""
    return column if elem_idx is None else f"{column}.{int(elem_idx)}"


def jsonpath_span(column: str, elem_idx=None) -> str:
    """Example alternative: JSONPath-style spans ``$.col[3]``."""
    return f"$.{column}" if elem_idx is None else f"$.{column}[{int(elem_idx)}]"
