"""Golden tests for the rule-parameterization language.

The case tables pin the same observable semantics as the reference's
evaluator corpus (/root/reference/tests/evaluator/*.py) — parser shapes,
expansion products, guard evaluation, and the error taxonomy — expressed as
parametrized tables over our own AST.
"""

from __future__ import annotations

import pytest

from fs_schema_validator_spark.evaluator import (
    BindingRef,
    BoolExpr,
    CoercionError,
    EnumVal,
    Hole,
    ParseError,
    RangeVal,
    Str,
    UnboundSymbolError,
    evaluate,
    expand,
    parse_assignment,
    parse_expression,
    parse_template,
)
from fs_schema_validator_spark.evaluator.values import CmpOp

# ---------------------------------------------------------------------------
# parse_template


@pytest.mark.parametrize(
    ("text", "expected"),
    [
        # mixed literal/hole template
        (
            "foo-{bar|baz}-{0..10}.jpg",
            [
                Str("foo-"),
                Hole(EnumVal({"bar", "baz"})),
                Str("-"),
                Hole(RangeVal(0, 10)),
                Str(".jpg"),
            ],
        ),
        # double braces escape to a literal
        ("foo-{{6}}", [Str("foo-"), Str("{6}")]),
        # empty template is a single empty literal
        ("", [Str("")]),
        # single-variant enums, incl. punctuation-only variants
        ("{foo}", [Hole(EnumVal({"foo"}))]),
        ("{+}", [Hole(EnumVal({"+"}))]),
        ("{-}", [Hole(EnumVal({"-"}))]),
        ("{_}", [Hole(EnumVal({"_"}))]),
        ("{foo2}", [Hole(EnumVal({"foo2"}))]),
        # multi-variant enums; whitespace around variants is stripped
        ("{foo|bar}", [Hole(EnumVal({"foo", "bar"}))]),
        ("{ foo | bar }", [Hole(EnumVal({"foo", "bar"}))]),
        # empty variants are legal (and the fully-empty enum)
        ("{foo|}", [Hole(EnumVal({"foo", ""}))]),
        ("{ foo | }", [Hole(EnumVal({"foo", ""}))]),
        ("{ | }", [Hole(EnumVal({""}))]),
        ("{|}", [Hole(EnumVal({""}))]),
        ("{}", [Hole(EnumVal({""}))]),
        # half-open ".." is NOT a range — it degrades to an enum variant
        ("{20..}", [Hole(EnumVal({"20.."}))]),
        ("{..30}", [Hole(EnumVal({"..30"}))]),
        # ranges, negative bounds allowed
        ("{0..10}", [Hole(RangeVal(0, 10))]),
        ("{20..100}", [Hole(RangeVal(20, 100))]),
        ("{-4..100}", [Hole(RangeVal(-4, 100))]),
        # format specs attach to any hole kind
        ("{foo:>5}", [Hole(EnumVal({"foo"}), fmt=">5")]),
        ("{0..10:02}", [Hole(RangeVal(0, 10), fmt="02")]),
        ("{20..100:x}", [Hole(RangeVal(20, 100), fmt="x")]),
        ("{$foo}", [Hole(BindingRef("foo"))]),
        ("{$foo:02}", [Hole(BindingRef("foo"), fmt="02")]),
    ],
)
def test_parse_template(text: str, expected: list) -> None:
    assert parse_template(text) == expected


@pytest.mark.parametrize("bad", ["{$0}", "{$-}"])
def test_parse_template_rejects_bad_binding_symbols(bad: str) -> None:
    with pytest.raises(ParseError):
        parse_template(bad)


# ---------------------------------------------------------------------------
# parse_expression


@pytest.mark.parametrize(
    ("text", "op"),
    [
        ("$foo == bar", CmpOp.EQ),
        ("$foo==bar", CmpOp.EQ),
        ("$foo != bar", CmpOp.NEQ),
        ("$foo!=bar", CmpOp.NEQ),
    ],
)
def test_parse_expression(text: str, op: CmpOp) -> None:
    assert parse_expression(text) == BoolExpr(BindingRef("foo"), op, Str("bar"))


# ---------------------------------------------------------------------------
# parse_assignment


@pytest.mark.parametrize(
    ("text", "expected"),
    [
        ("foo=0..1", ("foo", RangeVal(0, 1))),
        ("foo=bar|baz", ("foo", EnumVal({"bar", "baz"}))),
        ("foo=.393123j", ("foo", EnumVal({".393123j"}))),
        ("foo=1234", ("foo", EnumVal({"1234"}))),
        ("foo=", ("foo", EnumVal({""}))),
    ],
)
def test_parse_assignment(text: str, expected: tuple) -> None:
    assert parse_assignment(text) == expected


@pytest.mark.parametrize("bad", ["foo", "foo={}"])
def test_parse_assignment_fail(bad: str) -> None:
    with pytest.raises(ParseError):
        parse_assignment(bad)


# ---------------------------------------------------------------------------
# expand


@pytest.mark.parametrize(
    ("template", "bindings", "expected"),
    [
        ("foo", None, {"foo"}),
        ("foo-{bar}", None, {"foo-bar"}),
        ("foo-{bar|baz}", None, {"foo-bar", "foo-baz"}),
        ("foo-{0|2|4}", None, {"foo-0", "foo-2", "foo-4"}),
        ("foo-{{6}}", None, {"foo-{6}"}),
        ("foo-{0..5}", None, {f"foo-{i}" for i in range(6)}),
        (
            "foo-{bar|baz}-{0..2}.jpg",
            None,
            {f"foo-{s}-{i}.jpg" for s in ("bar", "baz") for i in range(3)},
        ),
        (
            "foo-{$foo}-{$bar}.jpg",
            {"foo": EnumVal({"bar", "baz"}), "bar": RangeVal(0, 2)},
            {f"foo-{s}-{i}.jpg" for s in ("bar", "baz") for i in range(3)},
        ),
    ],
)
def test_expand(template: str, bindings, expected: set) -> None:
    assert set(expand(template, bindings)) == expected


def test_expand_is_in_deterministic_sorted_order() -> None:
    # Enum expansion is in sorted-variant order; ranges ascend. This ordering
    # feeds rule_seq ordinals, so it is part of the engine contract.
    assert list(expand("{c|a|b}-{8..10}")) == [
        "a-8", "a-9", "a-10",
        "b-8", "b-9", "b-10",
        "c-8", "c-9", "c-10",
    ]


def test_expand_applies_format_specs() -> None:
    assert list(expand("{0..2:02}")) == ["00", "01", "02"]
    assert list(expand("{bar|baz:>5}")) == ["  bar", "  baz"]
    assert list(expand("{10..11:x}")) == ["a", "b"]


def test_expand_unbound_raises() -> None:
    with pytest.raises(UnboundSymbolError):
        expand("foo-{$foo}-{$bar}.jpg")


def test_expand_can_leave_unbound_holes_in_place() -> None:
    assert set(expand("{foo|bar}-{$baz:02}.jpg", leave_unbound_vars_in=True)) == {
        "foo-{$baz:02}.jpg",
        "bar-{$baz:02}.jpg",
    }


# ---------------------------------------------------------------------------
# evaluate


@pytest.mark.parametrize(
    ("expr", "bindings", "expected"),
    [
        ("$foo == bar", {"foo": Str("bar")}, True),
        ("$foo == bar", {"foo": Str("foo")}, False),
        ("$foo != bar", {"foo": Str("bar")}, False),
        ("$foo != bar", {"foo": Str("foo")}, True),
        # single-variant enums coerce to their value
        ("$foo != bar", {"foo": EnumVal({"bar"})}, False),
        ("$foo != bar", {"foo": EnumVal({"foo"})}, True),
    ],
)
def test_evaluate(expr: str, bindings, expected: bool) -> None:
    assert evaluate(expr, bindings) is expected


def test_evaluate_unbound_raises() -> None:
    with pytest.raises(UnboundSymbolError):
        evaluate("$foo == bar")


def test_evaluate_range_is_not_coercible() -> None:
    with pytest.raises(CoercionError):
        evaluate("$foo == bar", {"foo": RangeVal(1, 10)})


def test_evaluate_multivariant_enum_is_not_coercible() -> None:
    with pytest.raises(CoercionError):
        evaluate("$foo == bar", {"foo": EnumVal({"foo", "bar"})})


# ---------------------------------------------------------------------------
# rendering round-trips (unbound holes re-render verbatim)


def test_hole_str_round_trip() -> None:
    assert str(Hole(RangeVal(0, 10), fmt="foo")) == "{0..10:foo}"
    assert str(Hole(BindingRef("foo"), fmt="bar")) == "{$foo:bar}"
    assert str(Hole(EnumVal({"foo", "bar"}), fmt="baz")) == "{bar|foo:baz}"
