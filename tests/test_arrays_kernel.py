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


def test_hyperplane_band_chunks_match_numpy_reference(spark):
    from fs_schema_validator_spark.functions.arrays import (
        hyperplane_band_chunks_arrow,
    )
    from fs_schema_validator_spark.operators.similarity import (
        _projection_matrix,
    )

    rng = np.random.default_rng(7)
    dim, n_planes, bands = 12, 32, 4
    vecs = rng.normal(size=(50, dim))
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<double>",
    )
    planes = _projection_matrix(dim, n_planes, seed=9)
    got = {
        r.vec_id: list(r.chunks)
        for r in hyperplane_band_chunks_arrow(df, planes, bands).collect()
    }

    pl = np.asarray(planes).T
    bits = (vecs @ pl >= 0).astype(np.int64)
    w = 1 << np.arange(n_planes // bands, dtype=np.int64)
    want = bits.reshape(len(vecs), bands, -1) @ w
    for i in range(len(vecs)):
        assert got[i] == want[i].tolist(), i


def test_ivf_assign_matches_naive_argmax(spark):
    from fs_schema_validator_spark.functions.arrays import ivf_assign_arrow

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(80, 6))
    cents = rng.normal(size=(5, 6))
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<double>",
    )
    got = {r.vec_id: r.cell for r in ivf_assign_arrow(df, cents).collect()}
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    want = np.argmax(vn @ cn.T, axis=1)
    for i in range(len(vecs)):
        assert got[i] == want[i], i


def test_minhash_kernel_deterministic_and_monotone():
    from fs_schema_validator_spark.functions.arrays import minhash_mix_kernel

    rows = [[1, 2, 3, 4], [1, 2, 3, 4], [5, 6], [], [1, 2, 3, 4, 99]]
    arr = pa.array(rows, type=pa.list_(pa.int64()))
    s1 = minhash_mix_kernel(arr, 32)
    s2 = minhash_mix_kernel(arr, 32)
    assert (s1 == s2).all()          # deterministic
    assert (s1[0] == s1[1]).all()    # identical sets -> identical sigs
    # superset can only lower (or keep) each permutation's min — compare
    # in uint64 space (the int64 output is a bit-cast, not order-preserving)
    assert (s1[4].astype(np.uint64) <= s1[0].astype(np.uint64)).all()
    # empty row saturates to the uint64-max sentinel (-1 after int64 cast)
    assert (s1[3] == -1).all()


# ---------------------------------------------------------------------------
# rolling-hash kernel


def _naive_rolling(s: str, k: int = 8, base: int = 31, mod: int = 2147483647, seed: int = 7):
    def fold(codes):
        h = seed
        for c in codes:
            h = (h * base + c) % mod
        return h

    codes = [ord(c) for c in s]
    whole = fold(codes)
    if len(codes) < k:
        return whole, whole
    return whole, min(fold(codes[i : i + k]) for i in range(len(codes) - k + 1))


def test_rolling_hash_kernel_matches_naive_fold():
    from fs_schema_validator_spark.functions.arrays import rolling_hash_kernel

    texts = [
        "",
        "a",
        "abcdefg",          # exactly k-1
        "abcdefgh",         # exactly k
        "the quick brown fox jumps over the lazy dog",
        "aaaaaaaaaaaaaaaa",
        None,
        "x" * 300 + "y" + "x" * 300,
    ]
    whole, mink = rolling_hash_kernel(pa.array(texts, type=pa.string()), k=8)
    for i, t in enumerate(texts):
        if t is None:
            assert whole[i] == 7 and mink[i] == 7  # null ~ empty (seed)
            continue
        w, m = _naive_rolling(t)
        assert (whole[i], mink[i]) == (w, m), t


def test_rolling_hash_kernel_non_ascii_uses_codepoints():
    from fs_schema_validator_spark.functions.arrays import rolling_hash_kernel

    texts = ["héllo wörld, ça va? ééééééé", "plain ascii text here"]
    whole, mink = rolling_hash_kernel(pa.array(texts, type=pa.string()), k=8)
    for i, t in enumerate(texts):
        w, m = _naive_rolling(t)
        assert (whole[i], mink[i]) == (w, m), t


def test_simhash_kernel_matches_naive_votes():
    from fs_schema_validator_spark.functions.arrays import simhash_kernel

    rng = np.random.default_rng(7)
    rows = [
        [],
        None,
        [int(x) for x in rng.integers(0, 1 << 60, size=17)],
        [int(x) for x in rng.integers(0, 1 << 60, size=1)],
        [(1 << 60) - 1] * 3,
        [0, 0, (1 << 60) - 1],  # strict majority: ties -> 0
    ]
    got = simhash_kernel(pa.array(rows, type=pa.list_(pa.int64())), bits=60)
    for i, hs in enumerate(rows):
        if not hs:
            assert got[i] == 0
            continue
        want = 0
        for b in range(60):
            vote = sum(1 if (h >> b) & 1 else -1 for h in hs)
            if vote > 0:
                want |= 1 << b
        assert got[i] == want, i


def _naive_token_windows(toks, k=8, base=1000003, mod=2147483647, seed=7):
    if toks is None or any(t is None for t in toks):
        return None
    out = []
    for j in range(len(toks) - k + 1):
        h = seed
        for t in toks[j : j + k]:
            h = (h * base + (t % mod)) % mod
        out.append(h)
    return out


def test_token_window_hash_kernel_matches_naive_fold():
    from fs_schema_validator_spark.functions.arrays import (
        token_window_hash_kernel,
    )

    rows = [
        [],                       # empty -> empty window list
        [5],                      # shorter than k
        list(range(7)),           # exactly k-1
        list(range(8)),           # exactly k: one window
        [(i * 31 + 7) % 50304 for i in range(40)],
        [0] * 16,                 # constant run: identical windows
        None,                     # null list -> null row
        [1, None, 3, 4, 5, 6, 7, 8, 9],   # child null -> null row
        [65535, -1, 2, 3, 4, 5, 6, 7, 8], # negative token: floor-mod
    ]
    got = token_window_hash_kernel(
        pa.array(rows, type=pa.list_(pa.int32())), k=8
    ).to_pylist()
    for i, r in enumerate(rows):
        assert got[i] == _naive_token_windows(r), r
    # the constant run's windows are all identical
    assert len(set(got[5])) == 1 and len(got[5]) == 9


def test_token_window_hash_kernel_sliced_array():
    from fs_schema_validator_spark.functions.arrays import (
        token_window_hash_kernel,
    )

    rows = [list(range(j, j + 12)) for j in range(5)]
    full = pa.array(rows, type=pa.list_(pa.int32()))
    sliced = full.slice(2, 2)
    w_full = token_window_hash_kernel(full, k=4).to_pylist()
    w_sl = token_window_hash_kernel(sliced, k=4).to_pylist()
    assert w_sl == w_full[2:4]


def test_token_window_hashes_arrow_spark_roundtrip(spark):
    """The list-output Spark wrapper (the general form consumers use for
    position-attributed windows) must carry the kernel's per-row
    contract through mapInArrow: hashes for full rows, null for
    null/child-null rows, empty for short rows."""
    from fs_schema_validator_spark.functions.arrays import (
        token_window_hashes_arrow,
    )

    df = spark.createDataFrame(
        [
            ("a", list(range(9))),
            ("b", None),
            ("c", [1, 2]),
            ("d", [4, None, 6, 7, 8, 9, 10, 11, 12]),
        ],
        "doc_id string, tokens array<int>",
    )
    rows = {
        r.doc_id: r.wins
        for r in token_window_hashes_arrow(df, "tokens", k=8).collect()
    }
    assert rows["a"] == _naive_token_windows(list(range(9)), k=8)
    assert rows["b"] is None
    assert rows["c"] == []
    assert rows["d"] is None


def test_pairwise_cosine_arrow_matches_hof_and_masks(spark):
    """The Arrow pairwise-cosine kernel must agree with the HOF
    zip_with/aggregate expression it replaced on every eligible pair,
    and mirror Spark's NULL classes (null / wrong-dim vector on either
    side, zero norm product) rather than leaking IEEE nan/inf."""
    import math
    import random

    from pyspark.sql import functions as F

    from fs_schema_validator_spark.functions.arrays import (
        pairwise_cosine_arrow,
    )

    rng = random.Random(7)
    dim = 8
    rows = [
        (i, i + 100,
         [rng.uniform(-1, 1) for _ in range(dim)],
         [rng.uniform(-1, 1) for _ in range(dim)])
        for i in range(50)
    ]
    rows += [
        (900, 901, None, [1.0] * dim),          # null query vector
        (902, 903, [1.0] * dim, [1.0] * (dim - 1)),  # wrong dim corpus
        (904, 905, [0.0] * dim, [1.0] * dim),   # zero-norm query
    ]
    df = spark.createDataFrame(
        rows, "qid long, vid long, qv array<double>, cv array<double>"
    )
    got = {
        (r.qid, r.vid): r.cos
        for r in pairwise_cosine_arrow(df, dim, "qv", "cv", "qid", "vid")
        .collect()
    }
    assert got[(900, 901)] is None
    assert got[(902, 903)] is None
    assert got[(904, 905)] is None
    for qid, vid, qv, cv in rows[:50]:
        dot = sum(a * b for a, b in zip(qv, cv))
        ref = dot / (
            math.sqrt(sum(a * a for a in qv))
            * math.sqrt(sum(b * b for b in cv))
        )
        assert abs(got[(qid, vid)] - ref) < 1e-12
