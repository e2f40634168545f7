"""Table source abstraction: Iceberg when available, parquet otherwise.

The production deployment reads Iceberg tables (snapshot-isolated scans,
partition pruning against table metadata, snapshot ids for the checkpoint
manifest). This container has no Iceberg runtime jars, so the loader probes
for the catalog and falls back to plain parquet paths — all engine logic is
source-agnostic DataFrames either way.

Iceberg specifics that map onto this engine when the runtime is present:

* ``spark.read.format("iceberg").load(name)`` (or ``spark.table``) for the
  subject table; ``VERSION AS OF`` for reproducible re-validation.
* the current snapshot id (``SELECT snapshot_id FROM <t>.snapshots ORDER BY
  committed_at DESC LIMIT 1``) feeds ``ResumableValidator.run(snapshot_id=…)``.
* violations sink: ``df.writeTo("catalog.db.violations").append()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.Table  # type: ignore[union-attr]
        return True
    except Exception:  # noqa: BLE001
        return False


def load_table(spark: SparkSession, ref: str) -> DataFrame:
    """Load `ref` as a DataFrame.

    ``catalog.db.table`` references go through the session catalog (Iceberg
    or hive); anything that looks like a path reads parquet."""
    if "/" in ref or ref.endswith(".parquet"):
        return spark.read.parquet(ref)
    return spark.table(ref)


def current_snapshot_id(spark: SparkSession, ref: str) -> str:
    """Lineage handle for the checkpoint manifest: the Iceberg snapshot id
    when available, else "-" (caller should pass an ETL batch id)."""
    if "/" in ref or not iceberg_available(spark):
        return "-"
    row = spark.sql(
        f"SELECT snapshot_id FROM {ref}.snapshots ORDER BY committed_at DESC LIMIT 1"
    ).first()
    return str(row[0]) if row else "-"


def write_bucketed(
    df: DataFrame,
    name: str,
    keys: list[str],
    buckets: int = 64,
    sort: bool = True,
) -> None:
    """Write `df` as a bucketed (and bucket-sorted) managed table.

    Bucketing is the shuffle eliminator for the engine's recurring joins:
    when both `sequences` and `reference_tokens` are bucketed (and sorted)
    by `doc_id` with the same bucket count, the per-row equality join
    compiles to a sort-merge join with NO Exchange on either side — each
    task zips bucket i with bucket i. At 10^12 rows that converts the
    largest shuffle in the pipeline (one narrow record per row) into a
    co-located scan. The Iceberg equivalent is a `bucket(N, doc_id)`
    partition transform; this writer is the session-catalog form the
    sandbox can execute and test."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(name)
