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

from typing import Callable, Iterator, Mapping

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..engine import ValidationEngine
from ..rules.loader import RuleSet


def _row_violation_count(df: DataFrame, ruleset: RuleSet) -> Column:
    """Per-row violation count from the ROW rules only — a stateless
    expression, legal inside native streaming operators (table rules need
    joins/aggs and run via foreachBatch instead)."""
    from ..compiler.plan import _ROW_ERR_TYPE, _compile_row_rule

    arrays = [_compile_row_rule(r, df.schema) for r in ruleset.row_rules]
    viols = (
        F.flatten(F.array(*arrays)) if arrays else F.array().cast(_ROW_ERR_TYPE)
    )
    return F.size(viols)


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
        try:
            if violations_path is not None:
                # Idempotent sink: foreachBatch is at-least-once, so a
                # replayed batch must not duplicate its rows — dynamic
                # partition overwrite on batch_id replaces exactly the
                # replayed batch's partition and nothing else.
                obs = None
                out = violations
                if on_batch is not None:
                    # Count DURING the sink write via the observe API —
                    # never re-read the accumulated sink (its cost grows
                    # with total history per micro-batch).
                    from pyspark.sql import Observation

                    obs = Observation()
                    out = violations.observe(
                        obs, F.count(F.lit(1)).alias("n")
                    )
                (
                    out.write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("batch_id")
                    .parquet(violations_path)
                )
                if on_batch is not None:
                    on_batch(batch_id, violations, int(obs.get["n"]))
            elif on_batch is not None:
                # Sink-less callers: cache-count-release so the batch
                # pipeline executes ONCE — a bare .count() would run the
                # whole validation again for anything the callback does
                # with `violations` (the cache is released after the
                # callback returns, so the DataFrame is only valid inside
                # it — same contract as the batch engine's release()).
                cached = violations.persist()
                try:
                    on_batch(batch_id, cached, cached.count())
                finally:
                    cached.unpersist()
        finally:
            # each micro-batch compiles its own plan with a persisted fused
            # projection; release it or a long-running stream accumulates
            # one cached DataFrame per batch
            result.release()

    writer = stream_df.writeStream.foreachBatch(process).outputMode("append")
    if checkpoint_location is not None:
        writer = writer.option("checkpointLocation", checkpoint_location)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def dedup_stream(
    stream_df: DataFrame,
    key_cols: list[str],
    ts_col: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact-dedup: drop rows whose key was already seen.

    With `ts_col`, uses `dropDuplicatesWithinWatermark` — state for a key
    is held only until the watermark passes it, so state size is bounded
    by (keys per watermark window), the production form for unbounded
    streams (re-deliveries and retries land within minutes, not days).
    Without `ts_col`, plain dropDuplicates keeps ALL keys in state —
    exact, but state grows with the key universe; only for bounded
    backfills. Returns the streaming DataFrame; caller attaches the sink."""
    if ts_col is None:
        return stream_df.dropDuplicates(key_cols)
    return stream_df.withWatermark(
        ts_col, watermark
    ).dropDuplicatesWithinWatermark(key_cols)


def windowed_violation_counts(
    stream_df: DataFrame,
    rules_yaml: str,
    ts_col: str,
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
    group_col: str | None = None,
) -> DataFrame:
    """Watermarked per-window violation counts — the late-data path.

    Row rules compile to stateless Column predicates, so the whole thing is
    a native streaming windowed aggregation: rows later than `watermark`
    past the max event time are dropped, windows emit once the watermark
    passes them, and state is bounded by (open windows × groups). Returns
    the streaming DataFrame; the caller attaches the sink."""
    ruleset = RuleSet.from_yaml(rules_yaml)
    nv = _row_violation_count(stream_df, ruleset)
    group = [F.col(group_col)] if group_col else []
    flagged = stream_df.select(
        F.col(ts_col).alias("_ts"), *group, nv.alias("_nv")
    )
    keys = [F.window(F.col("_ts"), window_duration).alias("window"), *group]
    return (
        flagged.withWatermark("_ts", watermark)
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("_nv")).alias("n_violations"),
            F.sum((F.col("_nv") > 0).cast("bigint")).alias("n_bad_rows"),
        )
    )


def stateful_violation_rate(
    stream_df: DataFrame,
    rules_yaml: str,
    group_col: str = "source",
    alert_rate: float = 0.1,
) -> DataFrame:
    """Running violation rate per group with an alert flag — a custom
    stateful operator via ``applyInPandasWithState``.

    State per group is two counters (rows seen, bad rows) carried across
    micro-batches; each batch updates them from Arrow-batched pandas
    frames and emits the cumulative rate. This is the shape for stateful
    checks the built-in windowed aggs can't express (cross-batch
    cumulative metrics, session-style logic, kill-switch thresholds)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ruleset = RuleSet.from_yaml(rules_yaml)
    nv = _row_violation_count(stream_df, ruleset)
    flagged = stream_df.select(F.col(group_col).alias("_g"), nv.alias("_nv"))
    out_schema = (
        f"{group_col} string, n_rows bigint, n_bad bigint, "
        "rate double, alert boolean"
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, bad = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            bad += int((pdf["_nv"] > 0).sum())
        state.update((n, bad))
        rate = (bad / n) if n else 0.0
        yield pd.DataFrame(
            {
                group_col: [key[0]],
                "n_rows": [n],
                "n_bad": [bad],
                "rate": [rate],
                "alert": [rate >= alert_rate],
            }
        )

    return flagged.groupBy("_g").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType="n bigint, bad bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
