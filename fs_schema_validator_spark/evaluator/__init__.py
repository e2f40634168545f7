"""Compile-time rule-parameterization engine.

``expand`` turns one templated string into its full Cartesian product of
concrete strings; ``evaluate`` evaluates an ``if:`` guard against bindings.
Both run on the driver during rule compilation — expansion counts are rule
counts (tiny and deterministic), never data-dependent, so the distributed
plan only ever contains already-concrete rules
(reference contract: /root/reference/fs_schema_validator/evaluator/__init__.py:8-28).
"""

from __future__ import annotations

import itertools
from typing import Iterator

from .errors import CoercionError, ParseError, UnboundSymbolError
from .parser import parse_assignment, parse_expression, parse_template
from .values import (
    Assignment,
    BindingRef,
    Bindings,
    BoolExpr,
    EnumVal,
    Expandable,
    Hole,
    RangeVal,
    Str,
    Template,
)

__all__ = [
    "expand",
    "evaluate",
    "parse_template",
    "parse_expression",
    "parse_assignment",
    "Assignment",
    "BindingRef",
    "Bindings",
    "BoolExpr",
    "CoercionError",
    "EnumVal",
    "Expandable",
    "Hole",
    "ParseError",
    "RangeVal",
    "Str",
    "Template",
    "UnboundSymbolError",
]


def expand(
    s: str,
    bindings: Bindings | None = None,
    leave_unbound_vars_in: bool = False,
    unbound: set | None = None,
) -> Iterator[str]:
    """Expand a template into every concrete string it denotes.

    Each hole contributes its expansion set (enums in sorted order, ranges
    ascending); the result is the Cartesian product joined in place. With
    ``leave_unbound_vars_in=True`` an unbound ``$name`` hole re-renders
    itself verbatim (first pass of the two-phase schema-level /
    validator-level binding expansion); pass a ``unbound`` set to collect
    the names of holes that were left in (escaped ``{{...}}`` literals are
    NOT reported — they were never holes).
    """
    bindings = bindings or {}
    fragments = parse_template(s)
    pools = [
        frag.expand(bindings, leave_unbound_vars_in, unbound=unbound)
        if isinstance(frag, Hole)
        else frag.expand(bindings, leave_unbound_vars_in)
        for frag in fragments
    ]
    return ("".join(parts) for parts in itertools.product(*pools))


def evaluate(s: str, bindings: Bindings | None = None) -> bool:
    """Evaluate an ``if:`` guard expression to a boolean."""
    return parse_expression(s).eval(bindings or {})
