"""Rule-set loading semantics: bindings, guards, expansion, overrides.

Pins the same compilation contract as the reference's schema tests
(/root/reference/tests/test_schema.py): `if:` gating both ways, Cartesian
expansion across fields, format-spec expansion, binding overrides winning,
and the escape hatch for literal braces."""

from __future__ import annotations

import pytest

from fs_schema_validator_spark.evaluator import EnumVal, Str, UnboundSymbolError
from fs_schema_validator_spark.rules.loader import RuleSet, RuleSetError
from fs_schema_validator_spark.rules.model import ColumnSpecRule, NotEmptyRule
from fs_schema_validator_spark.rules import spec as S


def test_empty_schema():
    assert len(RuleSet.from_yaml("schema: []")) == 0


def test_if_gate_drops_rule():
    rs = RuleSet.from_yaml(
        """
bindings: {foo: bar}
schema:
  - {type: not_empty, column: tokens, if: $foo == foo}
"""
    )
    assert len(rs) == 0


def test_if_gate_keeps_rule_and_strips_key():
    rs = RuleSet.from_yaml(
        """
bindings: {foo: bar}
schema:
  - {type: not_empty, column: tokens, if: $foo == bar}
"""
    )
    assert rs.rules == [NotEmptyRule("r000.not_empty", 0, column="tokens")]


def test_enum_expansion_multiplies_rules_in_sorted_order():
    rs = RuleSet.from_yaml("schema: [{type: not_empty, column: '{n_tok|tokens|doc_id}'}]")
    assert [r.column for r in rs.rules] == ["doc_id", "n_tok", "tokens"]
    assert [r.seq for r in rs.rules] == [0, 1, 2]


def test_range_expansion_with_format_spec():
    rs = RuleSet.from_yaml("schema: [{type: not_empty, column: 'col_{0..2:02}'}]")
    assert [r.column for r in rs.rules] == ["col_00", "col_01", "col_02"]


def test_binding_expansion_and_override():
    yaml_text = """
bindings: {col: tokens}
schema:
  - {type: not_empty, column: "{$col}"}
"""
    assert RuleSet.from_yaml(yaml_text).rules[0].column == "tokens"
    # caller-supplied bindings win (CLI -b analog)
    rs = RuleSet.from_yaml(yaml_text, {"col": Str("n_tok")})
    assert rs.rules[0].column == "n_tok"
    # an enum override multiplies the rule
    rs = RuleSet.from_yaml(yaml_text, {"col": EnumVal({"a", "b"})})
    assert [r.column for r in rs.rules] == ["a", "b"]


def test_unbound_binding_is_a_hard_error_after_both_phases():
    # Schema-level expansion leaves unbound holes in for the rule-level
    # (inner_bindings) pass (reference: leave_unbound_vars_in=True at
    # __init__.py:135 then _expand_path at 94-103); a hole NEITHER phase
    # binds must not silently become literal text — a misspelled binding
    # inside a regex would validate garbage.
    with pytest.raises(RuleSetError, match=r"\$nope.*still unbound"):
        RuleSet.from_yaml("schema: [{type: not_empty, column: '{$nope}'}]")
    with pytest.raises(UnboundSymbolError):
        RuleSet.from_yaml("schema: [{type: not_empty, column: a, if: $nope == x}]")


def test_rule_level_inner_bindings_second_phase():
    """Two-phase expansion: `$fmt` is not a schema-level binding, so phase 1
    leaves it in; the rule's own inner_bindings resolve it (the engine
    analog of ImageSchema.inner_bindings(), schemas/image.py:33-36)."""
    rs = RuleSet.from_yaml(
        """
bindings: {col: source}
schema:
  - type: column_spec
    id: fmt_check
    column: "{$col}"
    inner_bindings: {fmt: "src"}
    spec: {type: str, regex: "^{$fmt}\\\\d{{3}}$"}
"""
    )
    rule = rs.rules[0]
    assert rule.column == "source"
    assert rule.spec.regex == r"^src\d{3}$"


def test_rule_own_fields_are_implicit_inner_bindings():
    """A rule's hole-free scalar fields bind implicitly: reason text can
    reference {$id} / {$column} without declaring anything."""
    rs = RuleSet.from_yaml(
        """
schema:
  - type: expr
    id: r1
    assert: "n_tok > 0"
    reason: "'assertion {$id} failed'"
  - type: column_spec
    id: r2
    column: "{$id}_col"
    spec: {type: str}
"""
    )
    assert rs.rules[0].reason_sql == "'assertion r1 failed'"
    assert rs.rules[1].column == "r2_col"


def test_inner_binding_must_be_single_variant():
    with pytest.raises(RuleSetError, match="exactly one variant"):
        RuleSet.from_yaml(
            """
schema:
  - type: not_empty
    inner_bindings: {col: [a, b]}
    column: "{$col}"
"""
        )


def test_nested_spec_expands_through_yaml_roundtrip():
    rs = RuleSet.from_yaml(
        """
bindings: {lo: "5"}
schema:
  - type: column_spec
    column: n_tok
    spec: {type: int, min: "{$lo}"}
"""
    )
    rule = rs.rules[0]
    assert isinstance(rule, ColumnSpecRule)
    assert rule.spec == S.IntSpec(min=5)


def test_nested_multi_variant_expansion_is_rejected():
    with pytest.raises(RuleSetError):
        RuleSet.from_yaml(
            """
schema:
  - type: column_spec
    column: n_tok
    spec: {type: int, min: "{1|2}"}
"""
        )


def test_escaped_braces_survive_into_regex():
    rs = RuleSet.from_yaml(
        r"""
schema:
  - type: column_spec
    column: doc_id
    spec: {type: str, regex: "^doc-\\d{{8}}$"}
"""
    )
    assert rs.rules[0].spec == S.StrSpec(regex=r"^doc-\d{8}$")


def test_rule_ids_default_and_override():
    rs = RuleSet.from_yaml(
        """
schema:
  - {type: not_empty, column: a}
  - {type: not_empty, column: b, id: my_rule}
"""
    )
    assert [r.rule_id for r in rs.rules] == ["r000.not_empty", "my_rule"]


def test_row_vs_table_rule_split():
    rs = RuleSet.from_yaml(
        """
schema:
  - {type: not_empty, column: a}
  - {type: unique, keys: [doc_id]}
  - {type: expr, assert: "1=1"}
"""
    )
    assert len(rs.row_rules) == 2
    assert len(rs.table_rules) == 1


def test_missing_schema_key_rejected():
    with pytest.raises(RuleSetError):
        RuleSet.from_yaml("bindings: {}")


def test_bad_binding_type_rejected():
    with pytest.raises(RuleSetError):
        RuleSet.from_yaml("bindings: {x: 3.5}\nschema: []")


def test_example_rule_specs_run_end_to_end(spark):
    from pathlib import Path

    from fs_schema_validator_spark.engine import ValidationEngine
    from fs_schema_validator_spark.sources import synth

    root = Path(__file__).resolve().parent.parent / "examples"
    seq = synth.corrupt_sequences(synth.gen_sequences(spark, 200), every=50)
    tables = {
        "dim_sources": synth.gen_dim_sources(spark),
        "ref_distribution": synth.gen_ref_distribution(spark),
    }
    for name in ("simple-rules.yaml", "complex-rules.yaml"):
        res = ValidationEngine(subject_col="doc_id").validate(
            seq, (root / name).read_text(), tables
        )
        rows = res.violations.collect()
        assert rows, f"{name}: expected violations on corrupted input"
        assert not res.okay()


def test_escaped_braces_survive_both_phases():
    """{{...}} escapes render literal {$x} text; phase 2 must NOT re-parse
    it as a hole (phase 1's unbound-hole collector is the source of
    truth), so escaped placeholder text loads verbatim."""
    rs = RuleSet.from_yaml(
        """
schema:
  - type: expr
    id: r1
    assert: "n_tok > 0"
    reason: "'use {{$idx}} placeholders'"
"""
    )
    assert rs.rules[0].reason_sql == "'use {$idx} placeholders'"


def test_hole_injected_via_binding_value_is_still_resolved_or_rejected():
    """Hole text arriving through a bound binding VALUE (not the raw
    field) must still go through phase 2: resolved if a rule-level
    binding exists, hard error if not — never silent literal text."""
    ok = RuleSet.from_yaml(
        """
bindings: {tpl: "assertion {$id} failed"}
schema:
  - type: expr
    id: r9
    assert: "1=1"
    reason: "'{$tpl}'"
"""
    )
    assert ok.rules[0].reason_sql == "'assertion r9 failed'"
    with pytest.raises(RuleSetError, match=r"\$nmae.*still unbound"):
        RuleSet.from_yaml(
            """
bindings: {tpl: "bad {$nmae}"}
schema:
  - type: expr
    id: r9
    assert: "1=1"
    reason: "'{$tpl}'"
"""
        )


def test_hyphenated_unbound_binding_is_rejected():
    """The phase-2 hole grammar mirrors the evaluator's symbol grammar
    (hyphens allowed), so {$my-var} cannot ship as literal text."""
    with pytest.raises(RuleSetError, match=r"my-var.*still unbound"):
        RuleSet.from_yaml("schema: [{type: not_empty, column: '{$my-var}'}]")
