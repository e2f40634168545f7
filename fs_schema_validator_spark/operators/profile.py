"""Single-pass table profiling: the screen a validation run opens with.

One aggregation job computes, for every profiled column, the row count,
null count, distinct count, and string-rendered min/max — then unpivots the
single result row into one output row per column. Everything is built-in
aggregate expressions (whole-stage codegen, map-side partials, one
shuffle).

Scale note: multiple exact ``count(DISTINCT ...)`` aggregates compile to an
Expand that replicates each input row once per distinct aggregate — exact
mode on a 10-column 10^12-row table multiplies the shuffle by 10x. That is
what ``exact=False`` (default) is for: ``approx_count_distinct`` (HLL++)
keeps the pass single-width with ~2% relative error, which is the right
trade for profiling. The oracle-gated driver query pins ``exact=True`` so
DuckDB can value-check the whole profile.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_profile(
    df: DataFrame,
    columns: list[str] | None = None,
    exact: bool = False,
) -> DataFrame:
    """(col_name, n_rows, n_nulls, n_distinct, min_value, max_value) —
    one row per profiled column, computed in ONE aggregation pass."""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).cast("bigint").alias("_n_rows")]
    for c in cols:
        distinct = (
            F.countDistinct(F.col(c))
            if exact
            else F.approx_count_distinct(F.col(c))
        )
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).cast("bigint").alias(f"_nulls_{c}"),
            distinct.cast("bigint").alias(f"_dist_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
        ]
    row = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("_n_rows").alias("n_rows"),
                F.col(f"_nulls_{c}").alias("n_nulls"),
                F.col(f"_dist_{c}").alias("n_distinct"),
                F.col(f"_min_{c}").alias("min_value"),
                F.col(f"_max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return row.select(F.explode(per_col).alias("p")).select("p.*")
