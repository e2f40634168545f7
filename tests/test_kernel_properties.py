"""Hypothesis property tests for the round-2 Arrow kernels: each kernel is
checked against a direct Python re-implementation of its specification on
randomized inputs (no Spark session needed — pure pyarrow/NumPy)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from fs_schema_validator_spark.functions.arrays import (
    minhash_mix_mod_kernel,
    rolling_hash_kernel,
    simhash_kernel,
)
from fs_schema_validator_spark.operators.dedup import (
    MH31_MOD,
    minhash31_constants,
)

# printable-ish text incl. whitespace runs and BMP non-ASCII
_text = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x2FF),
    max_size=60,
)


def _naive_poly(codes, k=None, base=31, mod=2147483647, seed=7):
    h = seed
    for c in codes:
        h = (h * base + c) % mod
    return h


@settings(max_examples=60, deadline=None)
@given(st.lists(st.one_of(st.none(), _text), min_size=1, max_size=25))
def test_rolling_hash_kernel_property(texts):
    whole, mink = rolling_hash_kernel(pa.array(texts, type=pa.string()), k=4)
    for i, t in enumerate(texts):
        codes = [] if t is None else [ord(c) for c in t]
        w = _naive_poly(codes)
        assert whole[i] == w, (t, whole[i], w)
        if len(codes) < 4:
            assert mink[i] == w
        else:
            m = min(
                _naive_poly(codes[j : j + 4]) for j in range(len(codes) - 3)
            )
            assert mink[i] == m, t


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.lists(
                st.integers(min_value=0, max_value=(1 << 60) - 1), max_size=20
            ),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_simhash_kernel_property(rows):
    got = simhash_kernel(pa.array(rows, type=pa.list_(pa.int64())), bits=60)
    for i, hs in enumerate(rows):
        if not hs:
            assert got[i] == 0
            continue
        want = 0
        for b in range(60):
            if sum(1 if (h >> b) & 1 else -1 for h in hs) > 0:
                want |= 1 << b
        assert got[i] == want


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.lists(
                st.integers(min_value=0, max_value=MH31_MOD - 1), max_size=15
            ),
        ),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=1, max_value=6),
)
def test_minhash_mod_kernel_property(rows, num_perm):
    consts = minhash31_constants(num_perm)
    sig = minhash_mix_mod_kernel(
        pa.array(rows, type=pa.list_(pa.int64())), consts, MH31_MOD
    )
    for i, hs in enumerate(rows):
        for p, (a, b) in enumerate(consts):
            if not hs:
                assert sig[i][p] == MH31_MOD  # sentinel for empty rows
            else:
                assert sig[i][p] == min((a * x + b) % MH31_MOD for x in hs)


def test_minhash_constants_are_deterministic_and_valid():
    c1 = minhash31_constants(64)
    c2 = minhash31_constants(64)
    assert c1 == c2
    assert all(1 <= a < MH31_MOD and 0 <= b < MH31_MOD for a, b in c1)
    assert len({a for a, _ in c1}) > 60  # no degenerate repeats


def test_rolling_hash_kernel_sliced_array():
    """Kernels must honor pa.Array offsets (sliced record batches)."""
    texts = ["aaaa", "bbbb", "cccc", "dddd"]
    full = pa.array(texts, type=pa.string())
    sliced = full.slice(1, 2)
    w_full, m_full = rolling_hash_kernel(full, k=2)
    w_sl, m_sl = rolling_hash_kernel(sliced, k=2)
    assert list(w_sl) == list(w_full[1:3])
    assert list(m_sl) == list(m_full[1:3])


def test_list_kernels_honor_sliced_arrays():
    """Sliced ListArrays share the full child values buffer; every kernel
    must bound its segments to the slice (regression: the final reduceat
    segment absorbed values from rows past the slice)."""
    from fs_schema_validator_spark.functions.arrays import (
        first_mismatch_kernel,
    )
    from fs_schema_validator_spark.operators.dedup import (
        minhash31_constants,
    )

    consts = minhash31_constants(4)
    rows = [[1, 2, 3], [4, 5], [6, 7, 8], [9], [10, 11]]
    full = pa.array(rows, type=pa.list_(pa.int64()))
    sliced = full.slice(1, 3)

    mm_full = minhash_mix_mod_kernel(full, consts, MH31_MOD)
    mm_sl = minhash_mix_mod_kernel(sliced, consts, MH31_MOD)
    assert mm_sl.tolist() == mm_full[1:4].tolist()

    sh_full = simhash_kernel(full, bits=8)
    sh_sl = simhash_kernel(sliced, bits=8)
    assert sh_sl.tolist() == sh_full[1:4].tolist()

    # the reviewer's executed counterexamples, pinned
    a = pa.array([[1, 2, 3], [4, 5], [6, 7, 8], [0, 0]], type=pa.list_(pa.int64()))
    got = minhash_mix_mod_kernel(a.slice(1, 2), consts, MH31_MOD)
    want = minhash_mix_mod_kernel(
        pa.array([[4, 5], [6, 7, 8]], type=pa.list_(pa.int64())), consts, MH31_MOD
    )
    assert got.tolist() == want.tolist()
    b = pa.array([[3], [0], [1, 1, 1]], type=pa.list_(pa.int64()))
    assert simhash_kernel(b.slice(0, 2), bits=4).tolist() == [3, 0]

    # first_mismatch gathers (not reduceat) but must survive the rebase
    x = pa.array([[1, 2], [3, 4], [5, 6]], type=pa.list_(pa.int32()))
    y = pa.array([[1, 2], [3, 9], [5, 6]], type=pa.list_(pa.int32()))
    assert first_mismatch_kernel(x.slice(1, 2), y.slice(1, 2)).tolist() == [1, -1]


@settings(max_examples=40, deadline=None)
@given(
    rows=st.lists(
        st.one_of(
            st.none(),
            st.lists(
                st.floats(-10, 10, allow_nan=False), min_size=0, max_size=6
            ),
        ),
        min_size=1,
        max_size=24,
    ),
    offset=st.integers(0, 4),
)
def test_ivf_partial_sums_kernel_property(rows, offset):
    """The partial-sums k-means kernel must match a direct NumPy replay on
    arbitrary batches — including null rows, wrong-dimension vectors, zero
    vectors (INELIGIBLE: a directionless vector must not vote in a cosine
    quantizer — the pinned contract shared with ivf_assign_arrow and the
    SQL oracle), zero-norm CENTROIDS (guarded), and SLICED Arrow arrays
    (the offset-rebasing class that bit reduceat before)."""
    from fs_schema_validator_spark.functions.arrays import (
        _fixed_dim_matrix,
    )

    dim = 4
    cents = np.array(
        [[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 0, 0]]  # incl. zero centroid
    )
    arr = pa.array(rows, type=pa.list_(pa.float64()))
    arr = arr.slice(min(offset, len(arr) - 1))

    # replicate the kernel's contract directly
    mat, good = _fixed_dim_matrix(arr, dim)
    good = good & (np.linalg.norm(mat, axis=1) > 0.0)
    cn = cents.copy()
    norms = np.linalg.norm(cn, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    cn = cn / norms
    expect_cnt = np.zeros(3, dtype=np.int64)
    expect_sums = np.zeros((3, dim))
    if good.any():
        m = mat[good]
        mn = np.linalg.norm(m, axis=1, keepdims=True)
        mn[mn == 0] = 1.0
        cell = np.argmax((m / mn) @ cn.T, axis=1)
        expect_cnt = np.bincount(cell, minlength=3).astype(np.int64)
        np.add.at(expect_sums, cell, m)
        assert not np.isnan((m / mn) @ cn.T).any()  # zero-centroid guard

    # drive the REAL kernel
    from fs_schema_validator_spark.functions.arrays import (
        ivf_partial_sums_kernel,
    )

    cells, cnt, sums = ivf_partial_sums_kernel(arr, cents)
    got_cnt = np.zeros(3, dtype=np.int64)
    got_sums = np.zeros((3, dim))
    got_cnt[cells] = cnt
    got_sums[cells] = sums
    assert (got_cnt == expect_cnt).all()
    assert np.allclose(got_sums, expect_sums)


@settings(max_examples=40, deadline=None)
@given(
    rows=st.lists(
        st.one_of(
            st.none(),
            st.lists(st.integers(0, 2**40), min_size=0, max_size=8),
        ),
        min_size=1,
        max_size=24,
    ),
    offset=st.integers(0, 4),
)
def test_degenerate_rows_mask_property(rows, offset):
    """_degenerate_rows masks exactly the null/empty rows, also on SLICED
    arrays (a slice shifts offsets; a naive mask would misalign)."""
    from fs_schema_validator_spark.functions.arrays import _degenerate_rows

    arr = pa.array(rows, type=pa.list_(pa.int64()))
    off = min(offset, len(arr) - 1)
    sliced = arr.slice(off)
    got = _degenerate_rows(sliced)
    expect = np.array(
        [(r is None or len(r) == 0) for r in rows[off:]], dtype=bool
    )
    assert (got == expect).all()


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.lists(
                st.one_of(
                    st.none(),
                    st.integers(min_value=-(1 << 31), max_value=(1 << 31) - 1),
                ),
                max_size=24,
            ),
        ),
        min_size=1,
        max_size=20,
    ),
    st.integers(min_value=1, max_value=6),
)
def test_token_window_hash_kernel_property(rows, k):
    """Every k-window hash equals the direct fold; null rows and rows
    containing null tokens -> null output; short rows -> empty; negative
    tokens fold through Python floor-mod (the kernel's documented
    semantics)."""
    from fs_schema_validator_spark.functions.arrays import (
        token_window_hash_kernel,
    )

    mod, base, seed = 2147483647, 1000003, 7
    got = token_window_hash_kernel(
        pa.array(rows, type=pa.list_(pa.int32())), k=k
    ).to_pylist()
    for i, r in enumerate(rows):
        if r is None or any(t is None for t in r):
            assert got[i] is None, (i, r)
            continue
        want = []
        for j in range(len(r) - k + 1):
            h = seed
            for t in r[j : j + k]:
                h = (h * base + (t % mod)) % mod
            want.append(h)
        assert got[i] == want, (i, r, k)


@settings(max_examples=40, deadline=None)
@given(
    rows=st.lists(
        st.one_of(
            st.none(),
            st.lists(
                st.floats(-10, 10, allow_nan=False), min_size=0, max_size=6
            ),
        ),
        min_size=1,
        max_size=24,
    ),
    offset=st.integers(0, 4),
)
def test_training_and_query_assignment_agree(rows, offset):
    """ivf_partial_sums_kernel's per-cell counts must equal the bincount
    of the assignment the query path would produce on the same batch —
    if the Lloyd training pass and ivf_assign_arrow's math ever diverge
    (eligibility, tie-break, normalization), the pinned-kmeans oracle
    would break subtly rather than loudly."""
    from fs_schema_validator_spark.functions.arrays import (
        _fixed_dim_matrix,
        ivf_partial_sums_kernel,
    )

    dim = 4
    cents = np.array(
        [[1.0, 0, 0, 0], [0, 1.0, 0, 0], [1.0, 0, 0, 0]]  # dup centroid
    )
    arr = pa.array(rows, type=pa.list_(pa.float64()))
    arr = arr.slice(min(offset, len(arr) - 1))

    # replicate ivf_assign_arrow's compute() contract directly
    cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    mat, good = _fixed_dim_matrix(arr, dim)
    norms = np.linalg.norm(mat, axis=1)
    good = good & np.isfinite(norms) & (norms > 0.0)
    expect = np.zeros(3, dtype=np.int64)
    if good.any():
        m = mat[good] / norms[good][:, None]
        expect = np.bincount(
            np.argmax(m @ cn.T, axis=1), minlength=3
        ).astype(np.int64)

    cells, cnt, _ = ivf_partial_sums_kernel(arr, cents)
    got = np.zeros(3, dtype=np.int64)
    got[cells] = cnt
    assert (got == expect).all()


@settings(max_examples=40, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.one_of(
                st.none(),
                st.lists(
                    st.floats(-5, 5, allow_nan=False),
                    min_size=0,
                    max_size=6,
                ),
            ),
            st.one_of(
                st.none(), st.binary(min_size=0, max_size=3)
            ),
        ),
        min_size=1,
        max_size=16,
    ),
    offset=st.integers(0, 3),
)
def test_pq_adc_pairs_kernel_property(rows, offset):
    """pq_adc_pairs_arrow's inner math must match a direct NumPy replay
    on arbitrary (query vector, codes) pairs — null/wrong-dim/zero-norm
    queries and null/wrong-length codes get NULL adist; SLICED arrays
    honored (the binary-views offset class)."""
    from fs_schema_validator_spark.functions.arrays import (
        _binary_views,
        _unit_rows_masked,
    )

    dim, m, sub, ks = 4, 2, 2, 3
    cb = (
        np.arange(m * ks * sub, dtype=np.float64).reshape(m, ks, sub) / 10.0
    )
    qarr = pa.array([r[0] for r in rows], type=pa.list_(pa.float64()))
    # clamp code bytes into the ks range
    codes = [
        None if r[1] is None else bytes(b % ks for b in r[1]) for r in rows
    ]
    carr = pa.array(codes, type=pa.binary())
    off = min(offset, len(qarr) - 1)
    qarr, carr = qarr.slice(off), carr.slice(off)

    # direct replay of the kernel's contract
    un, qgood = _unit_rows_masked(qarr, dim)
    starts, lengths, values, validity = _binary_views(carr)
    good = qgood & validity & (lengths == m)
    expect = np.full(len(qarr), np.nan)
    for i in np.nonzero(good)[0]:
        cw = values[starts[i] : starts[i] + m]
        parts = [
            ((un[i, s * sub : (s + 1) * sub] - cb[s, cw[s]]) ** 2).sum()
            for s in range(m)
        ]
        expect[i] = np.sum(parts)

    # drive the kernel's compute path via its building blocks on the
    # same arrays (the mapInArrow wrapper is covered by the Spark tests)
    sub_idx = np.arange(m)
    adist = np.full(len(qarr), np.nan)
    if good.any():
        cw = values[starts[good][:, None] + sub_idx].astype(np.int64)
        u = un[good]
        parts = np.empty((len(u), m))
        for s in range(m):
            diff = u[:, s * sub : (s + 1) * sub] - cb[s, cw[:, s]]
            parts[:, s] = (diff * diff).sum(axis=1)
        adist[good] = parts.sum(axis=1)
    both_nan = np.isnan(adist) & np.isnan(expect)
    assert (both_nan | np.isclose(adist, expect, equal_nan=True)).all()
