"""Join-shape operators Spark lacks as built-ins: as-of join and
point-in-interval (range) join, in their scalable formulations.

Neither exists in the reference (it is single-table; SURVEY.md §2.3), but
both are staples of training-data assembly (align events to the latest
checkpoint; attach rows to config/epoch intervals). The implementations
avoid the naive theta-join (BroadcastNestedLoopJoin — O(n·m) comparisons
and a broadcast of one whole side):

* ``asof_join``: union the two tagged inputs and run ONE window pass per
  key carrying the last right-side row forward — the streaming-merge
  shape. Cost = one shuffle+sort of |left|+|right| records; no per-row
  range probe, no broadcast.
* ``bucketed_range_join``: quantize intervals to the fixed-width buckets
  they overlap (explode) and points to their single bucket, equi-join on
  the bucket id, then apply the exact bounds. Cost = an equi-join whose
  key cardinality the bucket width controls; each (point, interval) match
  is produced exactly once because a point lives in exactly one bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    tolerance_sec: int | None = None,
) -> DataFrame:
    """Backward as-of join: every left row gets the right row with the
    greatest ``right_ts`` <= its ``left_ts`` (per ``on`` key), or nulls.

    Equal timestamps match (the right row sorts before left rows at the
    same instant). If several right rows share (key, ts), the one with the
    greatest secondary ordering over its remaining columns wins — callers
    should deduplicate to one right row per (key, ts) for full
    determinism. With ``tolerance_sec``, matches older than the tolerance
    are nulled out (pandas merge_asof semantics).

    Returns all left columns plus the right's value columns (right_ts
    included, prefixed ``asof_``)."""
    rcols = [c for c in right.columns if c not in (on, right_ts)]
    # a null right timestamp would sort FIRST (nulls-first asc) and its
    # values would carry forward into left rows with no real match —
    # phantom matches with a null asof_ts; drop such rows up front
    right = right.filter(F.col(right_ts).isNotNull())
    tagged_r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        F.col(right_ts).alias("_asof_ts"),
        *[F.col(c).alias(f"_v_{c}") for c in rcols],
        *[
            F.lit(None).cast(dict(left.dtypes)[c]).alias(f"_l_{c}")
            for c in left.columns
        ],
    )
    tagged_l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(dict(right.dtypes)[right_ts]).alias("_asof_ts"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_v_{c}") for c in rcols],
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    u = tagged_r.unionByName(tagged_l)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "_tag",
        *[F.col(f"_l_{c}") for c in left.columns],
        F.last("_asof_ts", ignorenulls=True).over(w).alias("asof_ts"),
        *[
            F.last(f"_v_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in rcols
        ],
    )
    out = carried.filter(F.col("_tag") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in left.columns],
        "asof_ts",
        *[F.col(f"asof_{c}") for c in rcols],
    )
    if tolerance_sec is not None:
        stale = (
            F.unix_timestamp(F.col(left_ts))
            - F.unix_timestamp(F.col("asof_ts"))
        ) > tolerance_sec
        out = out.select(
            *left.columns,
            *[
                F.when(stale, F.lit(None)).otherwise(F.col(c)).alias(c)
                for c in ["asof_ts", *[f"asof_{c}" for c in rcols]]
            ],
        )
    return out


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    key: str | None = None,
) -> DataFrame:
    """Point-in-interval join (lo <= p <= hi, bounds inclusive) as an
    EQUI-join on fixed-width buckets.

    Each interval explodes to the buckets it overlaps
    (floor(lo/W)..floor(hi/W)); each point maps to its single bucket
    (floor(p/W)); the join key is (bucket [, key]) and the exact BETWEEN
    filter runs on the equi-matched pairs only. Choose ``bucket_width``
    near the typical interval length: explode factor ≈ len/W + 1 while
    false candidates per point ≈ intervals overlapping its bucket. No
    distinct needed — a point belongs to exactly one bucket, so each
    matching pair is produced exactly once. This replaces the
    BroadcastNestedLoopJoin Spark plans for inequality-only joins, which
    at 10^12 points is a non-starter."""
    w = float(bucket_width)
    ikeys = [key] if key else []
    iv = intervals.select(
        *ikeys,
        *[c for c in intervals.columns if c not in ikeys],
    ).withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("long"),
                F.floor(F.col(hi_col) / w).cast("long"),
            )
        ),
    )
    pt = points.withColumn("_bucket", F.floor(F.col(point_col) / w).cast("long"))
    join_keys = ["_bucket", *ikeys]
    return (
        pt.join(iv, join_keys)
        .filter(F.col(point_col).between(F.col(lo_col), F.col(hi_col)))
        .drop("_bucket")
    )
