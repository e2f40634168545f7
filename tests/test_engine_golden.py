"""End-to-end engine goldens on the sequences table (FIXTURES.md §1).

n=10 rows; `corrupt_sequences(every=10)` gives row i corruption mode i for
i in 0..6, rows 7-9 pristine; row 7 is then duplicated. Every corruption
mode maps to an exact golden violation list, byte-stable, ordered by
(subject, rule_seq) — the engine analog of the reference's exact-golden
violation tests (tests/test_schema.py:25-133)."""

from __future__ import annotations

import pytest

from fs_schema_validator_spark.engine import ValidationEngine
from fs_schema_validator_spark.sources import synth

RULES = r"""
bindings:
  mode: strict
  max_len: "512"
schema:
  - type: column_spec
    id: doc_id_format
    column: doc_id
    spec: {type: str, regex: "^doc-\\d{{8}}$"}
  - type: column_spec
    id: tokens_spec
    column: tokens
    spec: {type: array, items: {type: int, min: 0}}
  - type: expr
    id: ntok_consistency
    assert: "n_tok = size(tokens)"
    reason: "concat('n_tok mismatch: declared ', n_tok, ' got ', size(tokens))"
    if: $mode == strict
  - type: not_empty
    id: tokens_not_empty
    column: tokens
  - type: column_spec
    id: ntok_bounds
    column: n_tok
    spec: {type: int, min: 1, max: "{$max_len}"}
  - type: unique
    id: doc_id_unique
    keys: [doc_id]
  - type: referential
    id: source_known
    column: source
    dim: dim_sources
    dim_key: source
  - type: completeness
    id: manifest_complete
    manifest: expected_manifest
    key: doc_id
  - type: token_range
    id: tokens_in_vocab
    column: tokens
    group_col: source
    dim: dim_sources
    dim_key: source
    vocab_col: vocab_size
  - type: array_equality
    id: tokens_match_reference
    column: tokens
    reference: reference_tokens
    key: doc_id
"""

GOLDEN = [
    ("DOC_5", "doc_id_format", "`doc_id`: String should match pattern '^doc-\\d{8}$'"),
    ("doc-00000000", "tokens_not_empty", "`tokens`: cannot be empty"),
    ("doc-00000000", "ntok_bounds", "`n_tok`: Input should be greater than or equal to 1"),
    ("doc-00000000", "tokens_match_reference", "token mismatch at index 0"),
    ("doc-00000001", "ntok_consistency", "n_tok mismatch: declared 3 got 2"),
    ("doc-00000002", "tokens_spec", "`tokens.0`: Input should be greater than or equal to 0"),
    ("doc-00000002", "tokens_in_vocab", "token out of range for code at index 0"),
    ("doc-00000002", "tokens_match_reference", "token mismatch at index 0"),
    ("doc-00000003", "tokens_spec", "`tokens`: Field required"),
    ("doc-00000003", "ntok_consistency", "assertion failed: ntok_consistency"),
    ("doc-00000003", "tokens_match_reference", "token mismatch at index 0"),
    ("doc-00000004", "source_known", "unknown source"),
    ("doc-00000005", "manifest_complete", "does not exist"),
    ("doc-00000006", "tokens_match_reference", "token mismatch at index 6"),
    ("doc-00000007", "doc_id_unique", "duplicate key"),
    ("doc-00000010", "manifest_complete", "does not exist"),
    ("doc-00000011", "manifest_complete", "does not exist"),
]


@pytest.fixture(scope="module")
def result(spark):
    n = 10
    seq = synth.with_duplicates(
        synth.corrupt_sequences(synth.gen_sequences(spark, n), every=10),
        every=101,
    )
    tables = {
        "dim_sources": synth.gen_dim_sources(spark),
        "reference_tokens": synth.gen_reference_tokens(spark, n),
        "expected_manifest": synth.gen_expected_manifest(spark, n, extra=2),
    }
    return ValidationEngine(subject_col="doc_id").validate(seq, RULES, tables)


def test_exact_violation_goldens(result):
    got = [
        (r.subject, r.rule_id, r.reason)
        for r in result.sorted_violations().collect()
    ]
    assert got == GOLDEN


def test_verdict(result):
    assert result.okay() is False
    assert result.exit_code() == 1


def test_ok_subjects(result):
    ok = [r.subject for r in result.ok_subjects().collect()]
    assert ok == ["doc-00000008", "doc-00000009"]


def test_grouped_by_subject(result):
    grouped = {r.subject: r.reasons for r in result.grouped_by_subject().collect()}
    assert grouped["doc-00000002"] == [
        "`tokens.0`: Input should be greater than or equal to 0",
        "token out of range for code at index 0",
        "token mismatch at index 0",
    ]


def test_pristine_table_passes(spark):
    n = 16
    seq = synth.gen_sequences(spark, n)
    tables = {
        "dim_sources": synth.gen_dim_sources(spark),
        "reference_tokens": synth.gen_reference_tokens(spark, n),
        "expected_manifest": synth.gen_expected_manifest(spark, n),
    }
    res = ValidationEngine(subject_col="doc_id").validate(seq, RULES, tables)
    assert res.okay() is True
    assert res.exit_code() == 0


def test_drift_flags_only_shifted_source(spark):
    from pyspark.sql import functions as F

    n = 4096
    seq = synth.gen_sequences(spark, n).withColumn(
        "n_tok",
        F.when(
            F.col("source") == "code",
            F.least(F.col("n_tok") + 128, F.lit(512)),
        ).otherwise(F.col("n_tok")),
    )
    rules = """
schema:
  - type: drift_psi
    id: ntok_drift
    column: n_tok
    group_col: source
    ref: ref_distribution
    buckets: 16
    lo: 0
    hi: 512
    threshold: 0.2
"""
    res = ValidationEngine(subject_col="doc_id").validate(
        seq, rules, {"ref_distribution": synth.gen_ref_distribution(spark)}
    )
    rows = res.violations.collect()
    assert [r.subject for r in rows] == ["code"]
    assert rows[0].reason.startswith("distribution drift: PSI ")


def test_empty_input_passes_all_rules(spark):
    from fs_schema_validator_spark.sources import synth

    seq = synth.gen_sequences(spark, 10).limit(0)
    rules = """
schema:
  - {type: not_empty, column: tokens}
  - {type: unique, keys: [doc_id]}
  - type: referential
    id: source_known
    column: source
    dim: dim_sources
    dim_key: source
"""
    res = ValidationEngine(subject_col="doc_id").validate(
        seq, rules, {"dim_sources": synth.gen_dim_sources(spark)}
    )
    assert res.violations.count() == 0
    assert res.okay() and res.exit_code() == 0


def test_all_null_column_splits_required_vs_empty(spark):
    """Null vs empty are DIFFERENT violations, as in the reference: a
    missing file is 'does not exist' (existence) while a zero-byte file is
    'cannot be empty' (/root/reference/fs_schema_validator/schemas/
    file.py:19-29). Here: null -> column_spec required ('Field required'),
    [] -> not_empty; not_empty alone ignores nulls."""
    from pyspark.sql import functions as F

    from fs_schema_validator_spark.sources import synth

    seq = synth.gen_sequences(spark, 20).withColumn(
        "tokens",
        F.when(F.col("doc_id").endswith("0"), F.array().cast("array<int>"))
        .when(F.col("doc_id").endswith("1"), F.lit(None).cast("array<int>")),
    )
    rules = """
schema:
  - {type: not_empty, column: tokens}
  - type: column_spec
    id: tokens_required
    column: tokens
    spec: {type: array, items: {type: int}}
"""
    res = ValidationEngine(subject_col="doc_id").validate(seq, rules)
    by_rule: dict[str, int] = {}
    for r in res.violations.collect():
        by_rule[r.rule_id] = by_rule.get(r.rule_id, 0) + 1
    # ids doc-00000000..19: 2 end in '0', 2 end in '1'
    assert by_rule["r000.not_empty"] == 2        # only the [] rows
    assert by_rule["tokens_required"] >= 2       # the null rows
    assert not res.okay() and res.exit_code() == 1


def test_scan_metrics_observed_without_second_pass(spark):
    from fs_schema_validator_spark.sources import synth

    seq = synth.corrupt_sequences(synth.gen_sequences(spark, 100), every=50)
    rules = """
schema:
  - {type: not_empty, column: tokens}
  - type: expr
    id: ntok_consistency
    assert: "n_tok = size(tokens)"
    reason: "'mismatch'"
"""
    res = ValidationEngine(subject_col="doc_id").validate(seq, rules)
    res.violations.count()  # materializes the fused pass
    m = res.scan_metrics()
    assert m["rows_scanned"] == 100
    # rows violating ANY row rule; corruption modes 0/1/3 of the every=50
    # cycle trip these rules -> 2 rows each... mode cycle: i%50 in {0,1,3}
    distinct_bad = (
        res.violations.select("subject").distinct().count()
    )
    assert m["rows_with_row_violations"] == distinct_bad > 0


def test_not_empty_and_json_spec_on_missing_column_are_violations(spark):
    """A typo'd column must emit 'does not exist' per subject, not crash
    the run (reference: missing-file reason, report.py:24-25)."""
    df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    rules = """
schema:
  - {type: not_empty, column: typo_col}
  - type: json_spec
    column: also_missing
    spec: {type: object, attrs: {k: {type: int}}}
"""
    res = ValidationEngine(subject_col="doc_id").validate(df, rules)
    reasons = sorted(r.reason for r in res.violations.collect())
    assert reasons == [
        "`also_missing`: does not exist",
        "`typo_col`: does not exist",
    ]


def test_reserved_subject_column_collision_fails_loud(spark):
    """A data column literally named 'subject' (that is not the subject
    key) would be silently shadowed by the engine's output alias — the
    compiler rejects it instead."""
    from fs_schema_validator_spark.rules.loader import RuleSetError

    df = spark.createDataFrame(
        [(1, "a")], "doc_id bigint, subject string"
    )
    with pytest.raises(RuleSetError, match="reserved"):
        ValidationEngine(subject_col="doc_id").validate(
            df, "schema: [{type: not_empty, column: doc_id}]"
        )


def test_token_range_dim_with_duplicate_keys_does_not_multiply_rows(spark):
    """A versioned dim (two rows per key) must not duplicate fused rows —
    the max vocab wins and every other rule's counts stay exact."""
    df = spark.createDataFrame(
        [("d1", [1, 5], "en"), ("d2", [99], "en")],
        "doc_id string, tokens array<int>, source string",
    )
    dim = spark.createDataFrame(
        [("en", 10), ("en", 50)], "source string, vocab_size int"
    )
    rules = """
schema:
  - type: token_range
    id: vocab_check
    column: tokens
    group_col: source
    dim: dim
    dim_key: source
    vocab_col: vocab_size
  - {type: unique, id: uniq, keys: [doc_id]}
"""
    res = ValidationEngine(subject_col="doc_id").validate(df, rules, {"dim": dim})
    rows = res.violations.collect()
    # max vocab (50) wins: token 99 violates once; NO phantom duplicate-key
    # violations from join multiplication
    assert [(r.subject, r.rule_id) for r in rows] == [("d2", "vocab_check")]


def test_scan_metrics_with_row_only_ruleset_uses_the_observed_pass(spark):
    df = spark.createDataFrame(
        [(i, "x" if i % 2 else "") for i in range(10)],
        "doc_id bigint, text string",
    )
    res = ValidationEngine(subject_col="doc_id").validate(
        df, "schema: [{type: not_empty, column: text}]"
    )
    assert res.violations.count() == 5
    m = res.scan_metrics()
    assert m["rows_scanned"] == 10
    assert m["rows_with_row_violations"] == 5
