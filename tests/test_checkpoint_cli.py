"""Checkpoint/resume + CLI contract tests."""

from __future__ import annotations

import pytest

from fs_schema_validator_spark.sources import synth
from fs_schema_validator_spark.engine import ValidationEngine
from fs_schema_validator_spark.streaming.checkpoint import (
    ParquetManifestStore,
    ResumableValidator,
    rules_fingerprint,
)

RULES = """
schema:
  - type: not_empty
    column: tokens
  - type: expr
    id: ntok_consistency
    assert: "n_tok = size(tokens)"
    reason: "'mismatch'"
"""


@pytest.fixture()
def validator(spark, tmp_path):
    store = ParquetManifestStore(spark, str(tmp_path / "manifest"))
    return ResumableValidator(
        ValidationEngine(subject_col="doc_id"), store, partition_col="source"
    )


def test_first_run_validates_all_partitions(spark, validator):
    seq = synth.corrupt_sequences(synth.gen_sequences(spark, 40), every=10)
    results = validator.run(seq, RULES, snapshot_id="snap1")
    # corruption mode 4 rewrites some sources to 'bogus' — a 5th partition
    assert sorted(results) == ["bogus", "books", "cc", "code", "wiki"]
    # corruption mode 0 (empty tokens) hits source cc (i=0); mode 1 wiki...
    assert results["cc"]["verdict"] == "FAIL"
    assert results["cc"]["n_violations"] > 0


def test_rerun_skips_validated_partitions(spark, validator):
    seq = synth.gen_sequences(spark, 40)
    first = validator.run(seq, RULES, snapshot_id="snapA")
    assert len(first) == 4
    second = validator.run(seq, RULES, snapshot_id="snapA")
    assert second == {}  # everything checkpointed
    assert validator.pending_partitions(seq, RULES, "snapA") == []


def test_new_snapshot_revalidates(spark, validator):
    seq = synth.gen_sequences(spark, 40)
    validator.run(seq, RULES, snapshot_id="snapA")
    pending = validator.pending_partitions(seq, RULES, snapshot_id="snapB")
    assert len(pending) == 4


def test_rule_change_revalidates(spark, validator):
    seq = synth.gen_sequences(spark, 40)
    validator.run(seq, RULES, snapshot_id="snapA")
    changed = RULES + "  - {type: not_empty, column: doc_id}\n"
    assert rules_fingerprint(changed) != rules_fingerprint(RULES)
    assert len(validator.pending_partitions(seq, changed, "snapA")) == 4


def test_manifest_records_lineage(spark, validator):
    seq = synth.gen_sequences(spark, 40)
    validator.run(seq, RULES, snapshot_id="snapZ")
    manifest = validator.store.read().collect()
    assert len(manifest) == 4
    row = manifest[0]
    assert row.rules_hash == rules_fingerprint(RULES)
    assert row.snapshot_id == "snapZ"
    assert row.input_rows == 10
    assert row.engine_version == "0.1.0"
    assert row.validated_at is not None


# ---------------------------------------------------------------------------
# CLI


def test_cli_exit_codes(spark, tmp_path, capsys):
    from fs_schema_validator_spark.plans.cli import main

    table = str(tmp_path / "seq")
    synth.corrupt_sequences(synth.gen_sequences(spark, 20), every=10).write.parquet(
        table
    )
    rules_ok = tmp_path / "ok.yaml"
    rules_ok.write_text("schema: [{type: not_empty, column: doc_id}]")
    rules_fail = tmp_path / "fail.yaml"
    rules_fail.write_text(RULES)
    rules_bad = tmp_path / "bad.yaml"
    rules_bad.write_text("schema: [{type: nonsense}]")

    assert main(["validate", "--rules", str(rules_ok), "--table", table]) == 0

    out_path = str(tmp_path / "violations")
    assert (
        main(
            [
                "validate",
                "--rules",
                str(rules_fail),
                "--table",
                table,
                "--output",
                out_path,
            ]
        )
        == 1
    )
    printed = capsys.readouterr().out
    assert "❗️ doc-" in printed and "cannot be empty" in printed
    written = spark.read.parquet(out_path)
    assert written.count() > 0

    assert main(["validate", "--rules", str(rules_bad), "--table", table]) == 127


def test_cli_binding_override(spark, tmp_path):
    from fs_schema_validator_spark.plans.cli import main

    table = str(tmp_path / "seq2")
    synth.gen_sequences(spark, 8).write.parquet(table)
    rules = tmp_path / "r.yaml"
    rules.write_text(
        """
bindings: {col: doc_id}
schema:
  - {type: not_empty, column: "{$col}"}
"""
    )
    # default binding passes; overriding to a column with empties would fail,
    # but here we just prove the -b path parses and applies
    assert (
        main(["validate", "--rules", str(rules), "--table", table, "-b", "col=doc_id"])
        == 0
    )
    assert (
        main(["validate", "--rules", str(rules), "--table", table, "-b", "col={}"])
        == 127
    )


def test_run_uses_constant_jobs_not_per_partition(spark, validator):
    """The single-pass run submits O(1) Spark jobs regardless of partition
    count (the old driver loop submitted 3+ per partition)."""
    seq = synth.gen_sequences(spark, 40)  # 4 source partitions
    sc = spark.sparkContext
    sc.setJobGroup("resumable-run", "single-pass checkpoint run")
    try:
        results = validator.run(seq, RULES, snapshot_id="snapJobs")
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert len(results) == 4
    jobs = sc.statusTracker().getJobIdsForGroup("resumable-run")
    assert 0 < len(jobs) <= 10, jobs


def test_cli_reference_output_contract(spark, tmp_path, capsys, monkeypatch):
    """Output shape mirrors the reference CLI
    (/root/reference/fs_schema_validator/__main__.py:76-96): verbose echo
    + inspected count, sorted ✅ valid subjects, ❗️ failures with indented
    reasons — and $VALIDATION_SCHEMA_PATH/$VALIDATION_ROOT_DIR supply the
    defaults like the reference's envvar options."""
    from fs_schema_validator_spark.plans.cli import main

    table = str(tmp_path / "seq3")
    synth.corrupt_sequences(synth.gen_sequences(spark, 20), every=10).write.parquet(
        table
    )
    rules = tmp_path / "r.yaml"
    rules.write_text(RULES)
    monkeypatch.setenv("VALIDATION_SCHEMA_PATH", str(rules))
    monkeypatch.setenv("VALIDATION_ROOT_DIR", table)

    assert main(["validate", "--verbose", "--show-valid"]) == 1
    out = capsys.readouterr().out
    assert f"Schema path: {rules}" in out
    assert f"Root dir: {table}" in out
    assert "Inspected 20 rows." in out
    valid_lines = [l for l in out.splitlines() if l.startswith("✅ ")]
    fail_lines = [l for l in out.splitlines() if l.startswith("❗️ ")]
    assert valid_lines == sorted(valid_lines) and len(valid_lines) > 0
    assert fail_lines and any("     - " in l for l in out.splitlines())
    # valid subjects print before the failure block (reference ordering)
    assert out.index("✅ ") < out.index("❗️ ")


def test_run_records_orphan_violations_under_global(spark, tmp_path):
    """Completeness-missing subjects don't exist in the input, so their
    violations can't map to a partition: they land under '(global)'."""
    store = ParquetManifestStore(spark, str(tmp_path / "manifest_g"))
    v = ResumableValidator(
        ValidationEngine(subject_col="doc_id"), store, partition_col="source"
    )
    seq = synth.gen_sequences(spark, 20)
    manifest = synth.gen_expected_manifest(spark, 20, extra=3)
    rules = """
schema:
  - type: not_empty
    column: tokens
  - type: completeness
    id: manifest_complete
    manifest: expected_manifest
    key: doc_id
"""
    results = v.run(
        seq, rules, tables={"expected_manifest": manifest}, snapshot_id="sG"
    )
    assert "(global)" in results
    assert results["(global)"]["n_violations"] == 3  # the 3 extra keys
    assert results["(global)"]["input_rows"] == 0
    # real partitions still get their own rows
    assert {p for p in results if p != "(global)"} == {
        "cc", "wiki", "code", "books"
    }


def test_cli_profile_subcommand(spark, tmp_path, capsys):
    from fs_schema_validator_spark.plans.cli import main

    table = str(tmp_path / "seqp")
    synth.gen_sequences(spark, 30).write.parquet(table)
    assert main(["profile", "--table", table, "--columns",
                 "doc_id,n_tok", "--exact"]) == 0
    out = capsys.readouterr().out
    assert "doc_id: rows=30 nulls=0 distinct=30" in out
    assert "n_tok: rows=30" in out


def test_run_counts_each_violation_exactly_once(spark, tmp_path):
    """A subject spanning partitions (itself an anomaly) must not inflate
    counts: per-partition n_violations sums to the true total, attributed
    to the subject's minimum partition."""
    from pyspark.sql import functions as F

    store = ParquetManifestStore(spark, str(tmp_path / "manifest_x"))
    v = ResumableValidator(
        ValidationEngine(subject_col="doc_id"), store, partition_col="source"
    )
    seq = synth.gen_sequences(spark, 20)
    # duplicate doc 3 into a different partition with an empty-tokens row
    spill = seq.filter(F.col("doc_id") == "doc-00000003").select(
        "doc_id",
        F.array().cast("array<int>").alias("tokens"),
        F.lit(0).alias("n_tok"),
        F.lit("wiki").alias("source"),
    )
    both = seq.select("doc_id", "tokens", "n_tok", "source").unionByName(spill)
    results = v.run(both, RULES, snapshot_id="sX")
    total = sum(r["n_violations"] for r in results.values())
    engine_total = (
        ValidationEngine(subject_col="doc_id").validate(both, RULES).violations.count()
    )
    assert total == engine_total


def test_null_subject_violations_attributed_to_their_partition(spark, tmp_path):
    """A partition whose ONLY violating rows have a NULL subject must
    still FAIL (ADVICE r2): the attribution join renders subjects
    '<null>' exactly like the engine's violation surface — a bare cast
    would send these to '(global)' and record the partition as PASS."""
    store = ParquetManifestStore(spark, str(tmp_path / "manifest"))
    v = ResumableValidator(
        ValidationEngine(subject_col="doc_id"), store, partition_col="source"
    )
    df = spark.createDataFrame(
        [("d1", "good", [1]), (None, "nullbad", []), ("d2", "nullbad", [2])],
        "doc_id string, source string, tokens array<int>",
    )
    rules = "schema:\n  - {type: not_empty, column: tokens}\n"
    res = v.run(df, rules, snapshot_id="s1")
    assert res["good"]["verdict"] == "PASS"
    assert res["nullbad"]["verdict"] == "FAIL"
    assert res["nullbad"]["n_violations"] == 1
    assert "(global)" not in res


def test_pyfiles_zip_imports_standalone(tmp_path):
    """The spark-submit --py-files artifact must be importable via
    zipimport with NO repo checkout on the path — exactly how executors
    load it. Builds the zip with the real packaging tool, then imports
    the package and compiles a rule spec from inside the zip in a clean
    subprocess."""
    import subprocess
    import sys

    build = subprocess.run(
        [sys.executable, "/root/repo/tools/package_pyfiles.py", str(tmp_path)],
        capture_output=True,
        text=True,
    )
    assert build.returncode == 0, build.stderr
    zip_path = tmp_path / "fs_schema_validator_spark.zip"
    assert zip_path.exists()
    probe = (
        "import sys\n"
        f"sys.path.insert(0, {str(zip_path)!r})\n"
        "from fs_schema_validator_spark.rules.loader import RuleSet\n"
        "import fs_schema_validator_spark as _pkg\n"
        # the package must resolve FROM THE ZIP, not a fallback path
        f"assert {str(zip_path)!r} in _pkg.__file__, _pkg.__file__\n"
        "rs = RuleSet.from_yaml('''\n"
        "schema:\n"
        "  - {type: not_empty, id: t, column: tokens}\n"
        "''')\n"
        "assert len(rs.rules) == 1, rs.rules\n"
        "print('ZIPIMPORT-OK')\n"
    )
    run = subprocess.run(
        [sys.executable, "-c", probe],
        capture_output=True,
        text=True,
        cwd="/tmp",
        env={"PATH": "/usr/bin:/bin", "PYTHONPATH": ""},
    )
    assert run.returncode == 0, run.stderr
    assert "ZIPIMPORT-OK" in run.stdout
