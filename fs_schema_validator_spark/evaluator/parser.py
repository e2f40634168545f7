"""Hand-rolled scanner/parser for templates, guard expressions, assignments.

Grammar (semantics-compatible with the reference PEG at
/root/reference/fs_schema_validator/evaluator/parser.py:25-44, re-derived
here as a regex-driven scanner — no parser-combinator dependency):

    template   := ( string | hole | escaped )+  |  ""
    string     := [^{}]+
    hole       := "{" (binding | range | enum) (":" format)? "}"
    escaped    := "{{" [^{}]+ "}}"          # yields a literal "{...}"
    binding    := "$" symbol
    symbol     := [a-zA-Z][a-zA-Z-_0-9]+    # note: minimum two characters
    range      := int ".." int              # int := [-+]?\\d+
    enum       := variant ("|" variant)*    # variant := [^:|${}]* (stripped)
    format     := [^{}]+
    expression := binding ("=="|"!=") string
    assignment := symbol "=" (range | enum)

Resolution order inside a hole is binding, then range, then enum — so
``{0..5}`` is a range but ``{20..}`` falls through to a one-variant enum,
and ``{$0}`` is a hard parse error (bad symbol, and ``$`` is not legal in an
enum variant). ``{}`` is the empty-string enum. All of this matches the
reference's observable behavior pinned by its parser test corpus.
"""

from __future__ import annotations

import re

from .errors import ParseError
from .values import (
    Assignment,
    BindingRef,
    BoolExpr,
    CmpOp,
    EnumVal,
    Hole,
    RangeVal,
    Str,
    Template,
)

__all__ = [
    "ParseError",
    "parse_template",
    "parse_expression",
    "parse_assignment",
]

_SYMBOL = r"[a-zA-Z][a-zA-Z\-_0-9]+"
_BINDING_RE = re.compile(rf"\$({_SYMBOL})\Z")
_RANGE_RE = re.compile(r"([-+]?\d+)\.\.([-+]?\d+)\Z")
_ENUM_VARIANT_RE = re.compile(r"[^:|${}]*\Z")
_STRING_RE = re.compile(r"[^{}]+")
_HOLE_RE = re.compile(r"\{([^{}:]*)(?::([^{}]+))?\}")
_ESCAPED_RE = re.compile(r"\{\{([^{}]+)\}\}")
_EXPRESSION_RE = re.compile(rf"\s*\$({_SYMBOL})\s*(==|!=)\s*([^{{}}]+?)\s*\Z")
_ASSIGNMENT_RE = re.compile(rf"({_SYMBOL})=(.*)\Z", re.DOTALL)


def _parse_hole_body(body: str) -> BindingRef | RangeVal | EnumVal | None:
    """Parse the pre-``:`` part of a hole; None if it is not a valid hole."""
    m = _BINDING_RE.match(body)
    if m:
        return BindingRef(m.group(1))
    m = _RANGE_RE.match(body)
    if m:
        return RangeVal(int(m.group(1)), int(m.group(2)))
    variants = [v.strip() for v in body.split("|")]
    if all(_ENUM_VARIANT_RE.match(v) for v in variants):
        return EnumVal(variants)
    return None


def parse_template(s: str) -> Template:
    """Parse an interpolation string into literal/hole fragments."""
    if s == "":
        return [Str("")]

    out: Template = []
    pos = 0
    n = len(s)
    while pos < n:
        m = _STRING_RE.match(s, pos)
        if m:
            out.append(Str(m.group(0)))
            pos = m.end()
            continue
        # At a brace. Prefer a hole; fall back to the escaped form.
        m = _HOLE_RE.match(s, pos)
        if m:
            value = _parse_hole_body(m.group(1))
            if value is not None:
                out.append(Hole(value, fmt=m.group(2)))
                pos = m.end()
                continue
        m = _ESCAPED_RE.match(s, pos)
        if m:
            out.append(Str("{" + m.group(1) + "}"))
            pos = m.end()
            continue
        raise ParseError(f"cannot parse template at offset {pos}: {s!r}")
    return out


def parse_expression(s: str) -> BoolExpr:
    """Parse a guard expression ``$binding ==/!= literal``."""
    m = _EXPRESSION_RE.match(s)
    if not m:
        raise ParseError(f"cannot parse expression: {s!r}")
    return BoolExpr(BindingRef(m.group(1)), CmpOp(m.group(2)), Str(m.group(3)))


def parse_assignment(s: str) -> Assignment:
    """Parse a CLI-style override ``name=range|enum`` (e.g. ``-b idx=0..3``)."""
    m = _ASSIGNMENT_RE.match(s)
    if not m:
        raise ParseError(f"cannot parse assignment: {s!r}")
    name, rhs = m.group(1), m.group(2)
    rm = _RANGE_RE.match(rhs)
    if rm:
        return (name, RangeVal(int(rm.group(1)), int(rm.group(2))))
    variants = [v.strip() for v in rhs.split("|")]
    if all(_ENUM_VARIANT_RE.match(v) for v in variants):
        return (name, EnumVal(variants))
    raise ParseError(f"cannot parse assignment value: {rhs!r}")
