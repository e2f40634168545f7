"""Deterministic dataset splitting and sampling for training pipelines.

``hash_split`` assigns every row to a named split (train/val/test) from a
hash of its id — reproducible across runs, partitionings, and engines (no
``rand()``, no zipWithIndex): the assignment is a pure function of the id,
so re-running the pipeline, appending data, or changing cluster size never
moves a document between splits (the property that prevents train/test
leakage across dataset versions).

The hash is the engine-portable md5-prefix (same family as
dedup.portable_word_hashes), so the driver's DuckDB oracle replays the
exact assignment.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def split_bucket(id_col: Column, total: int, salt: str = "split") -> Column:
    """Deterministic bucket in [0, total): 60-bit md5-prefix of
    salt||id, mod total — engine-portable (DuckDB mirrors it)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), id_col.cast("string"))), 1, 15),
        16,
        10,
    ).cast("bigint")
    return h % total


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, int] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Adds a ``split`` column: buckets [0, sum(weights)) are carved into
    named ranges in the dict's insertion order (e.g. {"train": 98,
    "val": 1, "test": 1} -> buckets 0-97, 98, 99)."""
    weights = weights or {"train": 98, "val": 1, "test": 1}
    total = sum(weights.values())
    bucket = split_bucket(F.col(id_col), total, salt)
    expr = None
    acc = 0
    for name, w in weights.items():
        cond = bucket < acc + w
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        acc += w
    return df.withColumn("split", expr)
