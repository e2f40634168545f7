"""Strict JSON-document validation via Spark 4 VARIANT.

The reference's core validator checks JSON *documents* against a spec tree
with strict types — ``"1"`` is not an int, ``1`` is not a bool
(/root/reference/fs_schema_validator/schemas/json.py:240-265, strictness
pinned at tests/test_json.py:155-219). For table columns the engine checks
declared Spark types at compile time (compiler/columns.py); for columns
HOLDING JSON text the type lives per value — exactly the reference's
situation — and VARIANT preserves it: ``schema_of_variant`` distinguishes
BIGINT / STRING / DECIMAL / BOOLEAN / VOID per value, so the strictness
contract transfers without any per-row Python.

``compile_variant_checker(spec)(value, path)`` mirrors
``compile_checker`` but with runtime type tests:

* required: a missing key (SQL NULL variant) or JSON null (VOID /
  is_variant_null) → "Field required" unless nullable.
* scalar kinds: schema_of_variant string test, then constraint predicates
  over ``try_cast`` extractions.
* arrays/objects/dicts recurse through ``try_cast(... AS array<variant>)``
  / ``try_variant_get`` / ``map<string, variant>``.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..rules import spec as S
from . import messages as M
from .columns import empty_errors

Checker = Callable[[Column, Column], Column]


def _err(path: Column, msg: Column | str) -> Column:
    msg_col = F.lit(msg) if isinstance(msg, str) else msg
    return F.struct(path.alias("path"), msg_col.alias("msg"))


def _vtype(value: Column) -> Column:
    return F.schema_of_variant(value)


def _child_path(path: Column, seg: Column) -> Column:
    """Dotted child path; a ROOT child renders bare ('0', 'key', 'int'),
    not '.0' — the reference joins pydantic loc tuples with '.' so a
    root-level element has no leading dot (schemas/json.py:249-261), and
    the byte-stable message parity contract includes paths."""
    return F.when(path == "", seg).otherwise(F.concat(path, F.lit("."), seg))


def _is_missing_or_null(value: Column) -> Column:
    return value.isNull() | F.is_variant_null(value)


def _wrap_nullable(spec: S.Spec, inner: Checker) -> Checker:
    def check(value: Column, path: Column) -> Column:
        absent = _is_missing_or_null(value)
        if spec.nullable:
            return F.when(absent, empty_errors()).otherwise(inner(value, path))
        return F.when(absent, F.array(_err(path, M.REQUIRED))).otherwise(
            inner(value, path)
        )

    return check


def _typed_scalar(
    spec: S.Spec,
    type_pred: Callable[[Column], Column],
    extract: Callable[[Column], Column],
    conds: Callable[[Column], list[tuple[Column, Column | str]]],
) -> Checker:
    def check(value: Column, path: Column) -> Column:
        wrong_type = F.array(_err(path, M.not_valid(spec.type_name)))
        v = extract(value)
        items = [F.when(c, _err(path, msg)) for c, msg in conds(v)]
        ok_errs = (
            F.array_compact(F.array(*items)) if items else empty_errors()
        )
        return F.when(~type_pred(_vtype(value)), wrong_type).otherwise(ok_errs)

    return check


def _compile_bool(spec: S.BoolSpec) -> Checker:
    return _typed_scalar(
        spec,
        lambda t: t == "BOOLEAN",
        lambda v: v.try_cast("boolean"),
        lambda v: [],
    )


def _compile_int(spec: S.IntSpec) -> Checker:
    from .columns import _numeric_conds

    return _typed_scalar(
        spec,
        lambda t: t == "BIGINT",
        lambda v: v.try_cast("bigint"),
        lambda v: _numeric_conds(spec, v),
    )


def _compile_float(spec: S.FloatSpec) -> Checker:
    from .columns import _numeric_conds

    # JSON decimals parse as DECIMAL(p,s); big/scientific ones as DOUBLE.
    # Integers (BIGINT) are rejected — StrictFloat semantics.
    return _typed_scalar(
        spec,
        lambda t: t.startswith("DECIMAL") | (t == "DOUBLE") | (t == "FLOAT"),
        lambda v: v.try_cast("double"),
        lambda v: _numeric_conds(spec, v),
    )


def _compile_str(spec: S.StrSpec) -> Checker:
    def conds(v: Column) -> list[tuple[Column, Column | str]]:
        out: list[tuple[Column, Column | str]] = []
        if spec.min_length is not None:
            out.append((F.length(v) < spec.min_length, M.str_min_length(spec.min_length)))
        if spec.max_length is not None:
            out.append((F.length(v) > spec.max_length, M.str_max_length(spec.max_length)))
        if spec.regex is not None:
            out.append((~v.rlike(spec.regex), M.str_pattern(spec.regex)))
        return out

    return _typed_scalar(
        spec, lambda t: t == "STRING", lambda v: v.try_cast("string"), conds
    )


def _compile_literal(spec: S.LiteralSpec) -> Checker:
    v = spec.value
    if isinstance(v, str):
        type_ok = lambda t: t == "STRING"  # noqa: E731
        cast_to = "string"
    elif isinstance(v, bool):
        type_ok = lambda t: t == "BOOLEAN"  # noqa: E731
        cast_to = "boolean"
    elif isinstance(v, int):
        type_ok = lambda t: t == "BIGINT"  # noqa: E731
        cast_to = "bigint"
    else:
        type_ok = lambda t: t.startswith("DECIMAL") | (t == "DOUBLE")  # noqa: E731
        cast_to = "double"

    def check(value: Column, path: Column) -> Column:
        bad = F.array(_err(path, M.literal(v)))
        matches = type_ok(_vtype(value)) & (
            value.try_cast(cast_to) == F.lit(v)
        )
        return F.when(matches, empty_errors()).otherwise(bad)

    return check


def _compile_array(spec: S.ArraySpec) -> Checker:
    item_checker = compile_variant_checker(spec.items)

    def check(value: Column, path: Column) -> Column:
        wrong_type = F.array(_err(path, M.not_valid(spec.type_name)))
        elems = value.try_cast("array<variant>")
        n = F.size(elems)
        size_items = []
        if spec.min_items is not None:
            size_items.append(
                F.when(
                    n < spec.min_items,
                    _err(
                        path,
                        F.concat(
                            F.lit(M.list_min_items_prefix(spec.min_items)),
                            n.cast("string"),
                        ),
                    ),
                )
            )
        if spec.max_items is not None:
            size_items.append(
                F.when(
                    n > spec.max_items,
                    _err(
                        path,
                        F.concat(
                            F.lit(M.list_max_items_prefix(spec.max_items)),
                            n.cast("string"),
                        ),
                    ),
                )
            )
        size_errs = (
            F.array_compact(F.array(*size_items)) if size_items else empty_errors()
        )
        elem_errs = F.flatten(
            F.transform(
                elems,
                lambda e, i: item_checker(
                    e, _child_path(path, i.cast("string"))
                ),
            )
        )
        return F.when(~_vtype(value).startswith("ARRAY"), wrong_type).otherwise(
            F.concat(size_errs, elem_errs)
        )

    return check


def _compile_fixed_array(spec: S.FixedArraySpec) -> Checker:
    checkers = [compile_variant_checker(s) for s in spec.items]
    n = len(spec.items)

    def check(value: Column, path: Column) -> Column:
        wrong_type = F.array(_err(path, M.not_valid(spec.type_name)))
        elems = value.try_cast("array<variant>")
        size = F.size(elems)
        parts = []
        for i, chk in enumerate(checkers):
            ipath = _child_path(path, F.lit(str(i)))
            parts.append(
                F.when(size <= i, F.array(_err(ipath, M.REQUIRED))).otherwise(
                    chk(F.get(elems, i), ipath)
                )
            )
        parts.append(
            F.when(size > n, F.array(_err(path, M.tuple_max_items(n)))).otherwise(
                empty_errors()
            )
        )
        return F.when(
            ~_vtype(value).startswith("ARRAY"), wrong_type
        ).otherwise(F.concat(*parts))

    return check


def _compile_object(spec: S.ObjectSpec) -> Checker:
    compiled = [(name, compile_variant_checker(s)) for name, s in spec.attrs]

    def check(value: Column, path: Column) -> Column:
        wrong_type = F.array(_err(path, M.not_valid(spec.type_name)))
        parts = []
        for name, chk in compiled:
            apath = F.when(path == "", F.lit(name)).otherwise(
                F.concat(path, F.lit("."), F.lit(name))
            )
            child = F.try_variant_get(value, f"$.{name}", "variant")
            parts.append(chk(child, apath))
        body = F.concat(*parts) if parts else empty_errors()
        return F.when(~_vtype(value).startswith("OBJECT"), wrong_type).otherwise(body)

    return check


def _compile_dict(spec: S.DictSpec) -> Checker:
    value_checker = compile_variant_checker(spec.values)

    # JSON object keys are always strings: a string key-spec applies its
    # constraints to the raw key; any other key-spec kind is a per-key type
    # error (matches the reference's key-spec semantics where non-string
    # keys cannot occur in parsed JSON).
    def key_errs(key: Column, kpath: Column) -> Column:
        if isinstance(spec.keys, S.StrSpec):
            conds: list[tuple[Column, Column | str]] = []
            if spec.keys.min_length is not None:
                conds.append(
                    (F.length(key) < spec.keys.min_length,
                     M.str_min_length(spec.keys.min_length))
                )
            if spec.keys.max_length is not None:
                conds.append(
                    (F.length(key) > spec.keys.max_length,
                     M.str_max_length(spec.keys.max_length))
                )
            if spec.keys.regex is not None:
                conds.append((~key.rlike(spec.keys.regex), M.str_pattern(spec.keys.regex)))
            if not conds:
                return empty_errors()
            return F.array_compact(
                F.array(*[F.when(c, _err(kpath, msg)) for c, msg in conds])
            )
        return F.array(_err(kpath, M.not_valid(spec.keys.type_name)))

    def check(value: Column, path: Column) -> Column:
        wrong_type = F.array(_err(path, M.not_valid(spec.type_name)))
        entries = F.map_entries(value.try_cast("map<string, variant>"))
        per_entry = F.transform(
            entries,
            lambda e: F.concat(
                key_errs(
                    e.getField("key"),
                    _child_path(path, e.getField("key")),
                ),
                value_checker(
                    e.getField("value"),
                    _child_path(path, e.getField("key")),
                ),
            ),
        )
        return F.when(~_vtype(value).startswith("OBJECT"), wrong_type).otherwise(
            F.flatten(per_entry)
        )

    return check


def _compile_enum(spec: S.EnumSpec) -> Checker:
    variant_checkers = [(v, compile_variant_checker(v)) for v in spec.variants]

    def check(value: Column, path: Column) -> Column:
        errors_per_variant = []
        for vspec, chk in variant_checkers:
            vpath = (
                path
                if isinstance(vspec, S.LiteralSpec)
                else _child_path(path, F.lit(vspec.kind))
            )
            errors_per_variant.append(chk(value, vpath))
        matches_any = None
        for errs in errors_per_variant:
            ok = F.size(errs) == 0
            matches_any = ok if matches_any is None else (matches_any | ok)
        return F.when(matches_any, empty_errors()).otherwise(
            F.concat(*errors_per_variant)
        )

    return check


_COMPILERS = {
    S.BoolSpec: _compile_bool,
    S.IntSpec: _compile_int,
    S.FloatSpec: _compile_float,
    S.StrSpec: _compile_str,
    S.LiteralSpec: _compile_literal,
    S.ArraySpec: _compile_array,
    S.FixedArraySpec: _compile_fixed_array,
    S.ObjectSpec: _compile_object,
    S.DictSpec: _compile_dict,
    S.EnumSpec: _compile_enum,
}


def compile_variant_checker(spec: S.Spec) -> Checker:
    """Compile `spec` into a checker over VARIANT values.

    The returned callable maps ``(variant_column, path_column)`` to an
    ``array<struct<path,msg>>`` violations Column, including
    missing/JSON-null handling."""
    inner = _COMPILERS[type(spec)](spec)
    return _wrap_nullable(spec, inner)


def json_column_violations(json_col: Column, spec: S.Spec) -> Column:
    """Violations for a STRING column holding a JSON document.

    Unparseable text reports "Invalid JSON"; a SQL-null document reports
    "Field required" unless the top-level spec is nullable."""
    checker = compile_variant_checker(spec)
    v = F.try_parse_json(json_col)
    parse_failed = json_col.isNotNull() & v.isNull()
    return F.when(
        parse_failed, F.array(_err(F.lit(""), "Invalid JSON"))
    ).otherwise(checker(v, F.lit("")))
