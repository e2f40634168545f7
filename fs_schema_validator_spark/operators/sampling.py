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


def _group_enc(c: Column) -> Column:
    """Never-null, delimiter-free encoding of a hash-key part. Two traps
    in a naive concat_ws of raw values: (1) concat_ws silently SKIPS
    nulls, so a null part would hash as if absent while a SQL oracle's
    `||` yields NULL and excludes the row; (2) a '|' inside a value
    aliases distinct parts onto one hash input. 'n' (null) or
    'v'||md5(value) avoids both, and DuckDB replays it verbatim — the
    ONE encoding every deterministic-sampling operator and its oracle
    must share."""
    s = c.cast("string")
    return F.when(s.isNull(), F.lit("n")).otherwise(
        F.concat(F.lit("v"), F.md5(s))
    )


def stratified_sample(
    df: DataFrame,
    id_col: str,
    fraction_pct: int,
    group_cols: list[str] | None = None,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic ~fraction_pct% sample: keep rows whose portable hash
    bucket (of salt||group||id) falls under the percentage. With
    `group_cols` the hash is salted per group, so each stratum is sampled
    independently at the same rate (stratified sampling without a shuffle:
    the filter is row-local, unlike sampleBy which needs a fractions map
    collected up front). Re-runs, re-partitionings, and engine swaps keep
    the exact same rows. Null-id rows are excluded — a null subject is a
    validation finding, and concat_ws would silently drop the id from
    the hash key while a SQL replay's `||` nulls the whole key."""
    parts = [F.lit(salt)]
    for g in group_cols or []:
        parts.append(_group_enc(F.col(g)))
    parts.append(F.col(id_col).cast("string"))
    bucket = split_bucket(F.concat_ws("|", *parts), 100, salt="")
    return df.filter(F.col(id_col).isNotNull() & (bucket < fraction_pct))


def pack_offsets(
    df: DataFrame,
    length_col: str,
    capacity: int,
    group_cols: list[str],
    order_col: str,
) -> DataFrame:
    """Concat-and-chop sequence packing (the standard pretraining layout):
    within each group, documents are laid end-to-end in `order_col` order
    and sliced into fixed `capacity` windows; each document gets its
    placement (start_bin, start_offset, end_bin — end inclusive, so a
    document may straddle bins, exactly like GPT-style packing with
    cross-document attention masks).

    Pure window arithmetic — one exclusive running sum per group, no UDF,
    no sequential state — so it scales like any windowed aggregation and
    the DuckDB oracle replays it with the same SUM() OVER. (Greedy
    no-split bin packing is intentionally NOT offered as a distributed
    primitive: its bin boundaries depend on every prior decision, which
    serializes each group; concat-and-chop is what production pretraining
    pipelines run.)"""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*group_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(length_col).over(w), F.lit(0)).cast("bigint")
    end = start + F.col(length_col) - 1
    return df.select(
        *group_cols,
        order_col,
        F.col(length_col),
        F.floor(start / capacity).cast("bigint").alias("start_bin"),
        (start % capacity).cast("bigint").alias("start_offset"),
        F.floor(end / capacity).cast("bigint").alias("end_bin"),
    )


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


def temperature_sample(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    alpha: float = 0.7,
    target_frac: float = 0.5,
    id_col: str = "doc_id",
    salt: str = "temp",
    digits: int = 6,
) -> DataFrame:
    """Temperature-balanced source sampling — the data-mixing step of
    multi-source pretraining (Gopher / LLaMA style): source s is sampled
    with probability proportional to w_s^alpha; alpha < 1 flattens the
    distribution so small, high-quality sources are upweighted against a
    dominant crawl.

    With w_s the group's total weight, W = sum w, p_s = w_s^alpha /
    sum_t w_t^alpha, the per-row keep rate is
    q_s = min(1, target_frac * W * p_s / w_s): the expected sampled
    WEIGHT is target_frac*W apportioned across groups by p_s, capped at
    full inclusion of a group. Groups whose total weight is NULL or 0
    get rate 0.0 (they claim no budget; the naive formula would either
    abort with ANSI DIVIDE_BY_ZERO or silently keep the whole group via
    least(1.0, NULL)). Null-id rows are excluded, like
    stratified_sample. A row is kept iff its portable hash
    bucket (salt||group||id over 10^6 buckets — the stratified_sample
    null-safe 'n'/'v'+md5 group encoding) falls under round(q_s*10^6) —
    deterministic across runs, partitionings, and engines, so the DuckDB
    oracle replays the exact kept set. Returns kept rows with the
    group's keep_rate (rounded to `digits`).

    Scale shape: one tiny per-group aggregation (map-side partials) and
    one single-row grand total, broadcast back onto the corpus; the keep
    decision is a row-local filter — the corpus itself never shuffles.
    The only float boundary risk is a hash bucket landing within one ulp
    of round(q*10^6) across engines' pow(); with 10^6 buckets that is
    the same measure-zero class the rounded-output oracles accept."""
    from pyspark.sql import Window

    w = F.col(weight_col).cast("double")
    totals = df.groupBy(group_col).agg(F.sum(w).alias("w"))
    # grand totals via a global window over the group-count-sized totals
    # table — a separate .agg() would re-execute the corpus scan for a
    # second time just to sum a handful of rows
    t = totals.withColumn("pw", F.pow(F.col("w"), F.lit(float(alpha))))
    wall = Window.partitionBy()
    s_tot = F.sum("pw").over(wall)
    # a group with NULL or 0 total weight has no budget claim: rate 0.0
    # (not the NULL-swallowing least(1.0, NULL) = 1.0, and not an ANSI
    # DIVIDE_BY_ZERO abort); the s_tot > 0 leg covers an all-weightless
    # corpus
    rates = t.select(
        F.col(group_col).alias("_g"),
        F.when(
            (F.col("w") > 0) & (s_tot > 0),
            F.least(
                F.lit(1.0),
                F.lit(float(target_frac))
                * F.sum("w").over(wall)
                * (F.col("pw") / s_tot)
                / F.col("w"),
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("_q"),
    )
    joined = df.join(
        F.broadcast(rates), F.col(group_col).eqNullSafe(F.col("_g"))
    )
    key = F.concat_ws(
        "|",
        F.lit(salt),
        _group_enc(F.col(group_col)),
        F.col(id_col).cast("string"),
    )
    bucket = split_bucket(key, 1_000_000, salt="")
    thr = F.round(F.col("_q") * 1_000_000).cast("bigint")
    # null-id rows excluded like stratified_sample: concat_ws would drop
    # the id from the key (whole-group block keep/drop) while a SQL
    # replay's `||` nulls the key entirely
    return (
        joined.filter(F.col(id_col).isNotNull() & (bucket < thr))
        .select(
            id_col,
            group_col,
            F.round(F.col("_q"), digits).alias("keep_rate"),
        )
    )
