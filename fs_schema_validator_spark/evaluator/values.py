"""Value model for the rule-parameterization language.

The engine's rule specs are parameterized by *bindings* — named values that
templates interpolate and ``if:`` guards test. Semantics reproduce the
reference contract (/root/reference/fs_schema_validator/evaluator/values.py):

* ``Str``     — literal string; expands to itself.
* ``EnumVal`` — set of string variants; expansion iterates in **sorted**
  order (reference keeps a SortedSet: values.py:63-69) — ordering is part of
  the public semantics, rule expansion must be deterministic.
* ``RangeVal``— inclusive integer interval ``start..end`` (values.py:100).
* ``BindingRef`` — ``$name`` lookup; missing name raises
  ``UnboundSymbolError`` (values.py:49-53).
* ``Hole``    — a ``{value[:format]}`` template hole; the optional format is
  a Python format-spec applied per expanded item (values.py:134-138).
* ``BoolExpr``— ``$binding ==/!= literal``, the entire predicate language of
  ``if:`` guards (values.py:153-168).

Everything here is driver-side compile-time machinery: expansion products
are tiny (rule counts), so plain Python iteration is the right tool — the
distributed engine only ever sees the *expanded* rules.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum as PyEnum
from typing import Iterator, Union

from .errors import CoercionError, UnboundSymbolError


def _apply_format(value: object, fmt: str | None) -> str:
    """Apply an optional Python format-spec, e.g. ``02`` -> ``f"{v:02}"``."""
    if fmt is None:
        return f"{value}"
    return ("{0:" + fmt + "}").format(value)


@dataclass(frozen=True)
class Str:
    """A literal string fragment / binding value."""

    value: str

    def expand(
        self,
        bindings: "Bindings",
        leave_unbound: bool = False,
        fmt: str | None = None,
    ) -> Iterator[str]:
        yield _apply_format(self.value, fmt) if fmt is not None else self.value

    def coerce_to_string(self) -> "Str":
        return self

    def __str__(self) -> str:
        return self.value


@dataclass(frozen=True)
class EnumVal:
    """A set of string variants, iterated in sorted order."""

    variants: tuple[str, ...]

    def __init__(self, variants: object) -> None:
        # Normalize any iterable of strings into a sorted, de-duplicated tuple.
        object.__setattr__(self, "variants", tuple(sorted(set(variants))))  # type: ignore[arg-type]

    def expand(
        self,
        bindings: "Bindings",
        leave_unbound: bool = False,
        fmt: str | None = None,
    ) -> Iterator[str]:
        for v in self.variants:
            yield _apply_format(v, fmt)

    def coerce_to_string(self) -> Str:
        if len(self.variants) == 1:
            return Str(self.variants[0])
        raise CoercionError(f"cannot coerce enum {{{self}}} into String: variants > 1")

    def __str__(self) -> str:
        return "|".join(self.variants)


@dataclass(frozen=True)
class RangeVal:
    """An inclusive integer interval ``start..end``."""

    start: int
    end: int

    def expand(
        self,
        bindings: "Bindings",
        leave_unbound: bool = False,
        fmt: str | None = None,
    ) -> Iterator[str]:
        for n in range(self.start, self.end + 1):
            yield _apply_format(n, fmt)

    def coerce_to_string(self) -> Str:
        raise CoercionError(f"cannot coerce range {{{self}}} into String")

    def __str__(self) -> str:
        return f"{self.start}..{self.end}"


@dataclass(frozen=True)
class BindingRef:
    """A ``$name`` reference into the binding environment."""

    name: str

    def resolve(self, bindings: "Bindings") -> "Expandable":
        try:
            return bindings[self.name]
        except KeyError as ex:
            raise UnboundSymbolError(
                f"no value provided for binding `{self.name}`"
            ) from ex

    def expand(
        self,
        bindings: "Bindings",
        leave_unbound: bool = False,
        fmt: str | None = None,
    ) -> Iterator[str]:
        return self.resolve(bindings).expand(bindings, leave_unbound, fmt)

    def __str__(self) -> str:
        return f"${self.name}"


@dataclass(frozen=True)
class Hole:
    """A ``{value[:format]}`` template hole."""

    value: Union[BindingRef, RangeVal, EnumVal]
    fmt: str | None = None

    def expand(
        self,
        bindings: "Bindings",
        leave_unbound: bool = False,
        unbound: set | None = None,
    ) -> Iterator[str]:
        try:
            # Materialize eagerly so UnboundSymbolError surfaces here, not
            # lazily inside the consumer's product loop.
            return iter(list(self.value.expand(bindings, leave_unbound, self.fmt)))
        except UnboundSymbolError:
            if not leave_unbound:
                raise
            # Two-phase expansion: leave the hole in, verbatim, for a later
            # pass with validator-level inner bindings. Report the name to
            # the caller's collector so the second pass can distinguish a
            # genuinely-unbound hole from identical-looking literal text
            # produced by the {{...}} escape.
            if unbound is not None and isinstance(self.value, BindingRef):
                unbound.add(self.value.name)
            return iter([str(self)])

    def __str__(self) -> str:
        if self.fmt is None:
            return f"{{{self.value}}}"
        return f"{{{self.value}:{self.fmt}}}"


class CmpOp(PyEnum):
    EQ = "=="
    NEQ = "!="


@dataclass(frozen=True)
class BoolExpr:
    """``$binding ==/!= string-literal`` — the whole ``if:`` language."""

    left: BindingRef
    op: CmpOp
    right: Str

    def eval(self, bindings: "Bindings") -> bool:
        left = self.left.resolve(bindings).coerce_to_string()
        if self.op is CmpOp.EQ:
            return left == self.right
        return left != self.right


# A parsed template is an alternating sequence of literals and holes.
Template = list[Union[Str, Hole]]
Expandable = Union[Str, EnumVal, RangeVal]
Bindings = dict[str, Expandable]
Assignment = tuple[str, Expandable]
