"""Skew handling: salted two-stage aggregation.

Algebraic aggregates (count/sum/min/max) already combine map-side, so a hot
group key costs little. The aggregations that DO melt a reducer under skew
are holistic ones — collect_list/collect_set/percentile — where every row of
the hot key lands on one task. `salted_agg` splits each group into
`salt_buckets` subgroups (stage 1), then merges the partials (stage 2), so
the hot key's rows spread over `salt_buckets` tasks.

AQE's skew-join splitting (enabled in session.py) covers the join side of
the problem; this covers the groupBy side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_buckets: int, salt_col: str = "_salt") -> DataFrame:
    """Per-row salt from the row's physical position
    (monotonically_increasing_id), NOT a content hash: a content hash
    gives every byte-identical duplicate of a hot key the same salt —
    and the dup-heavy hot key is exactly the case salting exists for —
    and throws on unhashable column types (maps). Position salts spread
    every row regardless of content; the aggregates built on top
    (count-sum, sorted merged lists) are salt-invariant, so outputs stay
    deterministic even though the salt itself depends on partition
    layout."""
    return df.withColumn(
        salt_col,
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets)),
    )


def salted_collect_list(
    df: DataFrame,
    group_cols: list[str],
    value: str | Column,
    salt_buckets: int = 16,
    sort: bool = True,
) -> DataFrame:
    """collect_list(value) by group, skew-safe.

    Stage 1 collects per (group, salt); stage 2 flattens the partial lists.
    With `sort`, the merged list is sorted — deterministic output regardless
    of salting (holistic order is otherwise partition-dependent anyway)."""
    value_col = F.col(value) if isinstance(value, str) else value
    salted = with_salt(df.select(*group_cols, value_col.alias("_v")), salt_buckets)
    partial = salted.groupBy(*group_cols, "_salt").agg(
        F.collect_list("_v").alias("_part")
    )
    merged = partial.groupBy(*group_cols).agg(
        F.flatten(F.collect_list("_part")).alias("values")
    )
    if sort:
        merged = merged.withColumn("values", F.array_sort("values"))
    return merged


def salted_count(
    df: DataFrame, group_cols: list[str], salt_buckets: int = 16
) -> DataFrame:
    """Two-stage count by group (illustrative: counts partial-agg natively;
    this form is the template for aggregates that do not).

    The salt is per-row (position-based, see with_salt) — salting the
    group key alone would give every row of a hot key the same salt,
    leaving stage 1 exactly as skewed as a plain groupBy."""
    salted = with_salt(df, salt_buckets).select(*group_cols, "_salt")
    partial = salted.groupBy(*group_cols, "_salt").agg(
        F.count(F.lit(1)).alias("_n")
    )
    return partial.groupBy(*group_cols).agg(F.sum("_n").cast("bigint").alias("n"))
