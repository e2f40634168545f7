"""Structured Streaming skin over the validation engine.

The reference is a one-shot batch CLI; the engine's incremental story is
the checkpoint manifest (checkpoint.py). This module adds the streaming
deployment shape on top: a ``readStream`` source validated per micro-batch
via ``foreachBatch``, violations appended to a sink, per-batch stats to the
manifest. ``foreachBatch`` is the right tool (vs continuous operators)
because validation needs multi-pass table rules (joins/aggs) that the
per-row streaming operators cannot express.

Late/duplicate data: the batch id is the snapshot handle; re-processing a
batch after failure is idempotent because the manifest keys on
(partition, rules_hash, snapshot_id=batch-{id}).
"""

from __future__ import annotations

from typing import Callable, Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..engine import ValidationEngine
from ..rules.loader import RuleSet


def validate_stream(
    stream_df: DataFrame,
    rules_yaml: str,
    tables: Mapping[str, DataFrame] | None = None,
    subject_col: str = "doc_id",
    violations_path: str | None = None,
    checkpoint_location: str | None = None,
    on_batch: Callable[[int, DataFrame, int], None] | None = None,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Attach the rule set to a streaming DataFrame.

    Each micro-batch runs the full (row + table) rule pipeline; violations
    are appended to `violations_path` (parquet) tagged with the batch id.
    `on_batch(batch_id, violations_df, n_violations)` observes each batch
    (manifest writes, alerting, kill-switches).
    """
    engine = ValidationEngine(subject_col=subject_col)
    ruleset = RuleSet.from_yaml(rules_yaml)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        result = engine.validate(batch_df, ruleset, tables)
        violations = result.sorted_violations().withColumn(
            "batch_id", F.lit(batch_id).cast("bigint")
        )
        if violations_path is not None:
            violations.write.mode("append").parquet(violations_path)
            n = None
            if on_batch is not None:
                n = batch_df.sparkSession.read.parquet(violations_path).filter(
                    F.col("batch_id") == batch_id
                ).count()
                on_batch(batch_id, violations, n)
        elif on_batch is not None:
            on_batch(batch_id, violations, violations.count())

    writer = stream_df.writeStream.foreachBatch(process).outputMode("append")
    if checkpoint_location is not None:
        writer = writer.option("checkpointLocation", checkpoint_location)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
