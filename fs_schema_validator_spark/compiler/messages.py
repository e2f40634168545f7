"""Stable violation-message templates.

The engine's verdict contract requires byte-stable, human-readable reasons
(reference pins exact strings in its goldens, e.g.
/root/reference/tests/test_json.py:155-204). We standardize on the same
message phrasing so parity is directly checkable.
"""

from __future__ import annotations

from ..rules.spec import Number

REQUIRED = "Field required"


def fmt_num(v: Number) -> str:
    """Render a bound/literal the way the goldens do: 2.0 -> "2", 5.5 -> "5.5"."""
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    return str(v)


def not_valid(type_name: str) -> str:
    return f"Input should be a valid {type_name}"


def ge(v: Number) -> str:
    return f"Input should be greater than or equal to {fmt_num(v)}"


def gt(v: Number) -> str:
    return f"Input should be greater than {fmt_num(v)}"


def le(v: Number) -> str:
    return f"Input should be less than or equal to {fmt_num(v)}"


def lt(v: Number) -> str:
    return f"Input should be less than {fmt_num(v)}"


def multiple_of(v: Number) -> str:
    return f"Input should be a multiple of {fmt_num(v)}"


def str_min_length(n: int) -> str:
    return f"String should have at least {n} character{'s' if n != 1 else ''}"


def str_max_length(n: int) -> str:
    return f"String should have at most {n} character{'s' if n != 1 else ''}"


def str_pattern(pattern: str) -> str:
    return f"String should match pattern '{pattern}'"


def list_min_items_prefix(n: int) -> str:
    """Static prefix; the dynamic actual count is appended at runtime."""
    return f"List should have at least {n} item{'s' if n != 1 else ''} after validation, not "


def list_max_items_prefix(n: int) -> str:
    return f"List should have at most {n} item{'s' if n != 1 else ''} after validation, not "


def tuple_max_items(n: int) -> str:
    return f"Tuple should have at most {n} item{'s' if n != 1 else ''}"


def literal(value: str | int | float) -> str:
    if isinstance(value, str):
        return f"Input should be '{value}'"
    return f"Input should be {fmt_num(value)}"
