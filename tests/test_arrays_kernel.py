"""Unit tests for the zero-copy Arrow first-mismatch kernel + its Spark op."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from fs_schema_validator_spark.functions.arrays import (
    first_mismatch_index,
    first_mismatch_kernel,
)


def _k(a, b, dtype=pa.int32()):
    return first_mismatch_kernel(
        pa.array(a, type=pa.list_(dtype)), pa.array(b, type=pa.list_(dtype))
    ).tolist()


def test_equal_rows():
    assert _k([[1, 2, 3], [], [7]], [[1, 2, 3], [], [7]]) == [-1, -1, -1]


def test_first_mismatch_positions():
    assert _k([[1, 2, 3]], [[1, 9, 3]]) == [1]
    assert _k([[5]], [[4]]) == [0]
    assert _k([[1, 2, 3]], [[1, 2, 9]]) == [2]


def test_multiple_mismatches_reports_first():
    assert _k([[1, 2, 3]], [[9, 9, 9]]) == [0]


def test_length_mismatch_reports_boundary():
    assert _k([[1, 2]], [[1, 2, 3]]) == [2]
    assert _k([[1, 2, 3]], [[1]]) == [1]
    assert _k([[]], [[1]]) == [0]


def test_null_rows():
    assert _k([None, None], [None, [1]]) == [-1, 0]
    assert _k([[1]], [None]) == [0]


def test_mixed_batch():
    a = [[1, 2, 3], [4, 5], None, [], [9, 9]]
    b = [[1, 2, 3], [4, 6], None, [], [9]]
    assert _k(a, b) == [-1, 1, -1, -1, 1]


def test_float_nan_equality():
    a = pa.array([[1.0, float("nan")]], type=pa.list_(pa.float64()))
    b = pa.array([[1.0, float("nan")]], type=pa.list_(pa.float64()))
    assert first_mismatch_kernel(a, b).tolist() == [-1]


def test_large_random_agreement_with_naive():
    rng = np.random.default_rng(42)
    a_rows, b_rows = [], []
    for _ in range(500):
        n = int(rng.integers(0, 20))
        row = rng.integers(0, 50, n).tolist()
        if rng.random() < 0.5:
            other = list(row)
            if other and rng.random() < 0.7:
                j = int(rng.integers(0, len(other)))
                other[j] += 1
            elif rng.random() < 0.5:
                other.append(1)
        else:
            other = row
        a_rows.append(row)
        b_rows.append(other)

    def naive(x, y):
        for j in range(min(len(x), len(y))):
            if x[j] != y[j]:
                return j
        return -1 if len(x) == len(y) else min(len(x), len(y))

    expected = [naive(x, y) for x, y in zip(a_rows, b_rows)]
    assert _k(a_rows, b_rows) == expected


def test_spark_operator_screens_equal_rows(spark):
    df = spark.createDataFrame(
        [
            ("a", [1, 2, 3], [1, 2, 3]),
            ("b", [1, 2, 3], [1, 9, 3]),
            ("c", [], [7]),
            ("d", None, [1]),
        ],
        "k string, x array<int>, y array<int>",
    )
    got = {
        r.k: r.mismatch_idx
        for r in first_mismatch_index(df, "x", "y", key="k").collect()
    }
    # row "a" is screened out JVM-side (arrays equal) and never reaches Python
    assert got == {"b": 1, "c": 0, "d": 0}
