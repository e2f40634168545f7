"""Structured Streaming validation: file-source micro-batches through the
full rule pipeline via foreachBatch."""

from __future__ import annotations

from fs_schema_validator_spark.sources import synth
from fs_schema_validator_spark.streaming.stream import validate_stream

RULES = """
schema:
  - type: not_empty
    column: tokens
  - type: expr
    id: ntok_consistency
    assert: "n_tok = size(tokens)"
    reason: "concat('n_tok mismatch: declared ', n_tok, ' got ', size(tokens))"
"""


def test_stream_validation_available_now(spark, tmp_path):
    src = tmp_path / "incoming"
    sink = tmp_path / "violations"
    chk = tmp_path / "chk"

    batch1 = synth.corrupt_sequences(synth.gen_sequences(spark, 20), every=10)
    batch1.write.mode("append").parquet(str(src))

    schema = batch1.schema
    stream = spark.readStream.schema(schema).parquet(str(src))
    seen: list[tuple[int, int]] = []
    q = validate_stream(
        stream,
        RULES,
        violations_path=str(sink),
        checkpoint_location=str(chk),
        on_batch=lambda bid, df, n: seen.append((bid, n)),
    )
    q.awaitTermination(120)

    written = spark.read.parquet(str(sink))
    reasons = {r.reason for r in written.collect()}
    assert "`tokens`: cannot be empty" in reasons
    assert any(r.startswith("n_tok mismatch") for r in reasons)
    assert seen and seen[0][1] == written.count()

    # second batch arrives; restart picks up ONLY the new files (streaming
    # checkpoint = exactly-once over the file source)
    batch2 = synth.gen_sequences(spark, 10)  # pristine
    batch2.write.mode("append").parquet(str(src))
    n_before = written.count()
    q2 = validate_stream(
        stream,
        RULES,
        violations_path=str(sink),
        checkpoint_location=str(chk),
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(str(sink)).count() == n_before  # no new violations
