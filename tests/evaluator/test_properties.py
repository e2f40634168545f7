"""Property-based tests for the rule-parameterization language.

Hypothesis-driven invariants the golden corpus cannot pin exhaustively:
round-trips, product cardinality, ordering determinism, escape behavior.
"""

from __future__ import annotations

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

from fs_schema_validator_spark.evaluator import (  # noqa: E402
    EnumVal,
    Hole,
    RangeVal,
    Str,
    expand,
    parse_template,
)

SYMBOL = st.from_regex(r"[a-zA-Z][a-zA-Z0-9_\-]{1,8}", fullmatch=True)
VARIANT = st.from_regex(r"[a-zA-Z0-9_.\-]{0,6}", fullmatch=True)
LITERAL = st.from_regex(r"[a-zA-Z0-9_.\- ]{1,12}", fullmatch=True)


@given(st.lists(VARIANT, min_size=1, max_size=5))
@settings(max_examples=200, deadline=None)
def test_enum_expansion_is_sorted_unique(variants):
    got = list(EnumVal(variants).expand({}))
    assert got == sorted(set(variants))


@given(st.integers(-50, 50), st.integers(0, 60))
@settings(max_examples=100, deadline=None)
def test_range_expansion_is_inclusive_ascending(start, width):
    end = start + width
    got = list(RangeVal(start, end).expand({}))
    assert got == [str(n) for n in range(start, end + 1)]
    assert len(got) == width + 1


@given(st.lists(VARIANT, min_size=1, max_size=4), st.integers(0, 5), st.integers(0, 4))
@settings(max_examples=150, deadline=None)
def test_product_cardinality(variants, start, width):
    enum_part = "|".join(variants)
    template = f"x-{{{enum_part}}}-{{{start}..{start + width}}}"
    got = list(expand(template))
    distinct_variants = len(set(v.strip() for v in variants))
    assert len(got) == distinct_variants * (width + 1)
    assert got == list(expand(template))  # expansion order is deterministic


@given(LITERAL)
@settings(max_examples=150, deadline=None)
def test_plain_literals_expand_to_themselves(text):
    assert list(expand(text)) == [text]


@given(LITERAL)
@settings(max_examples=100, deadline=None)
def test_escaped_braces_round_trip(inner):
    assert list(expand("{{" + inner + "}}")) == ["{" + inner + "}"]


@given(SYMBOL, st.from_regex(r"[0-9a-zA-Z<>^=+\- ]{1,4}", fullmatch=True))
@settings(max_examples=100, deadline=None)
def test_unbound_hole_renders_verbatim(name, fmt):
    template = f"pre-{{${name}:{fmt}}}-post"
    # parse → str round-trip of the hole
    frags = parse_template(template)
    hole = [f for f in frags if isinstance(f, Hole)][0]
    assert str(hole) == f"{{${name}:{fmt}}}"
    # leave-unbound pass reproduces the template byte-for-byte
    assert list(expand(template, leave_unbound_vars_in=True)) == [template]


@given(SYMBOL, st.lists(VARIANT, min_size=1, max_size=4))
@settings(max_examples=100, deadline=None)
def test_bound_enum_equals_inline_enum(name, variants):
    inline = list(expand("{" + "|".join(variants) + "}"))
    bound = list(expand(f"{{${name}}}", {name: EnumVal(variants)}))
    assert bound == inline


@given(st.integers(0, 99), st.integers(2, 6))
@settings(max_examples=100, deadline=None)
def test_format_spec_matches_python_format(n, width):
    got = list(expand(f"{{{n}..{n}:0{width}}}"))
    assert got == [format(n, f"0{width}")]
