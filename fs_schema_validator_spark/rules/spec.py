"""Value-constraint spec tree — the engine's column-level type system.

This is the analog of the reference's recursive JSON spec AST
(/root/reference/fs_schema_validator/schemas/json.py:22-222): a typed,
recursive constraint language over values. Here the subjects are Spark
columns (possibly nested structs/arrays/maps) instead of JSON documents, and
the tree compiles to Spark SQL ``Column`` expressions (see
``fs_schema_validator_spark.compiler.columns``), never per-row Python.

Strictness contract: a value must be of *exactly* the declared kind — the
compiler compares the column's declared Spark ``DataType`` at compile time
and never inserts casts (reference pins this via StrictInt/StrictStr/...:
schemas/json.py:12-15; "1" is not an int, 1 is not a bool).

Spec dicts use a ``type`` discriminator with the same aliases the reference
accepts (bool/boolean, int/integer, str/string, array/list,
fixed_array/tuple) and reject unknown keys (``extra="forbid"`` analog).
"""

from __future__ import annotations

from dataclasses import dataclass, field, fields
from typing import Any, Mapping, Union

Number = Union[int, float]


class SpecError(ValueError):
    """Raised when a spec dict cannot be parsed into a valid spec tree."""


@dataclass(frozen=True)
class BoolSpec:
    nullable: bool = False

    kind = "bool"
    type_name = "boolean"  # as rendered in "Input should be a valid {type_name}"


@dataclass(frozen=True)
class IntSpec:
    min: int | None = None
    exclusive_min: int | None = None
    max: int | None = None
    exclusive_max: int | None = None
    multiple_of: int | None = None
    nullable: bool = False

    kind = "int"
    type_name = "integer"


@dataclass(frozen=True)
class FloatSpec:
    min: Number | None = None
    exclusive_min: Number | None = None
    max: Number | None = None
    exclusive_max: Number | None = None
    multiple_of: Number | None = None
    nullable: bool = False

    kind = "float"
    type_name = "number"


@dataclass(frozen=True)
class StrSpec:
    min_length: int | None = None
    max_length: int | None = None
    regex: str | None = None
    nullable: bool = False

    kind = "str"
    type_name = "string"


@dataclass(frozen=True)
class ArraySpec:
    items: "Spec"
    min_items: int | None = None
    max_items: int | None = None
    nullable: bool = False

    kind = "array"
    type_name = "array"


@dataclass(frozen=True)
class FixedArraySpec:
    items: tuple["Spec", ...]
    nullable: bool = False

    kind = "fixed_array"
    type_name = "tuple"

    def __post_init__(self) -> None:
        if len(self.items) < 1:
            raise SpecError("fixed_array requires at least one item spec")


@dataclass(frozen=True)
class ObjectSpec:
    attrs: tuple[tuple[str, "Spec"], ...]  # ordered (name, spec) pairs
    nullable: bool = False

    kind = "object"
    type_name = "dictionary"


@dataclass(frozen=True)
class DictSpec:
    keys: "Spec"
    values: "Spec"
    nullable: bool = False

    kind = "dict"
    type_name = "dictionary"


@dataclass(frozen=True)
class EnumSpec:
    variants: tuple["Spec", ...]
    nullable: bool = False

    kind = "enum"
    type_name = "enum"

    def __post_init__(self) -> None:
        if len(self.variants) < 1:
            raise SpecError("enum requires at least one variant spec")


@dataclass(frozen=True)
class LiteralSpec:
    value: str | int | float
    nullable: bool = False

    kind = "literal"
    type_name = "literal"


Spec = Union[
    BoolSpec,
    IntSpec,
    FloatSpec,
    StrSpec,
    ArraySpec,
    FixedArraySpec,
    ObjectSpec,
    DictSpec,
    EnumSpec,
    LiteralSpec,
]

_KIND_ALIASES: dict[str, type] = {
    "bool": BoolSpec,
    "boolean": BoolSpec,
    "int": IntSpec,
    "integer": IntSpec,
    "float": FloatSpec,
    "str": StrSpec,
    "string": StrSpec,
    "array": ArraySpec,
    "list": ArraySpec,
    "fixed_array": FixedArraySpec,
    "tuple": FixedArraySpec,
    "object": ObjectSpec,
    "dict": DictSpec,
    "enum": EnumSpec,
    "literal": LiteralSpec,
}


def parse_spec(raw: Mapping[str, Any]) -> Spec:
    """Parse an untyped spec dict (from YAML) into the typed spec tree.

    Unknown ``type`` values and unknown keys are hard errors, mirroring the
    reference's discriminated union + ``extra="forbid"`` behavior.
    """
    if not isinstance(raw, Mapping):
        raise SpecError(f"spec must be a mapping, got {type(raw).__name__}")
    if "type" not in raw:
        raise SpecError("spec is missing required key `type`")
    kind = raw["type"]
    cls = _KIND_ALIASES.get(kind)
    if cls is None:
        raise SpecError(f"unknown spec type `{kind}`")

    kwargs: dict[str, Any] = {k: v for k, v in raw.items() if k != "type"}

    # Recurse into child specs.
    if cls is ArraySpec:
        if "items" not in kwargs:
            raise SpecError("array spec requires `items`")
        kwargs["items"] = parse_spec(kwargs["items"])
    elif cls is FixedArraySpec:
        if "items" not in kwargs or not isinstance(kwargs["items"], list):
            raise SpecError("fixed_array spec requires a list of `items`")
        kwargs["items"] = tuple(parse_spec(i) for i in kwargs["items"])
    elif cls is ObjectSpec:
        if "attrs" not in kwargs or not isinstance(kwargs["attrs"], Mapping):
            raise SpecError("object spec requires an `attrs` mapping")
        kwargs["attrs"] = tuple((k, parse_spec(v)) for k, v in kwargs["attrs"].items())
    elif cls is DictSpec:
        for key in ("keys", "values"):
            if key not in kwargs:
                raise SpecError(f"dict spec requires `{key}`")
            kwargs[key] = parse_spec(kwargs[key])
    elif cls is EnumSpec:
        if "variants" not in kwargs or not isinstance(kwargs["variants"], list):
            raise SpecError("enum spec requires a list of `variants`")
        kwargs["variants"] = tuple(parse_spec(v) for v in kwargs["variants"])

    allowed = {f.name for f in fields(cls)}
    extra = set(kwargs) - allowed
    if extra:
        raise SpecError(f"unknown keys for `{kind}` spec: {sorted(extra)}")
    kwargs = _coerce_scalar_fields(cls, kwargs)
    try:
        return cls(**kwargs)
    except TypeError as ex:
        raise SpecError(f"invalid `{kind}` spec: {ex}") from ex


_INT_FIELDS = {"min_length", "max_length", "min_items", "max_items"}
_NUM_FIELDS = {"min", "max", "exclusive_min", "exclusive_max", "multiple_of"}


def _coerce_scalar_fields(cls: type, kwargs: dict[str, Any]) -> dict[str, Any]:
    """Re-type scalar knobs that arrive as strings after template expansion
    (binding interpolation stringifies every expanded field — the reference
    relies on pydantic's lax coercion here, e.g. a binding-driven
    ``min_items`` at tests/test_json.py:58-84)."""
    out = dict(kwargs)
    for k, v in kwargs.items():
        if not isinstance(v, str):
            continue
        try:
            if k in _INT_FIELDS or (k in _NUM_FIELDS and cls is IntSpec):
                out[k] = int(v)
            elif k in _NUM_FIELDS:
                out[k] = float(v)
            elif k == "nullable":
                out[k] = v.lower() in ("1", "true", "yes")
        except ValueError as ex:
            raise SpecError(f"cannot coerce `{k}`={v!r} to a number") from ex
    return out
