"""Native C++ walker equivalence vs the NumPy fallback walkers."""

import numpy as np
import pytest

from seqalib_tpu import native
from seqalib_tpu.ops.wavefront_pallas import (
    _host_traceback_affine,
    _host_traceback_linear,
)
from seqalib_tpu.utils.cigar import OP_PAD, ops_to_cigar


def _random_pointer_matrix(rng, n, m, B, affine):
    """Random but walkable pointer field: every cell eventually reaches
    STOP because pointers always decrease i+j."""
    Kp = n + m + 1
    P = np.zeros((Kp, B, n + 1), np.int8)
    for k in range(Kp):
        for i in range(min(k, n) + 1):
            j = k - i
            if j > m:
                continue
            if i == 0 and j == 0:
                p = 0
            elif i == 0:
                p = 3
            elif j == 0:
                p = 2
            else:
                p = rng.integers(0, 4)
            byte = p
            if affine:
                byte |= int(rng.integers(0, 4)) << 2
            P[k, b_idx := slice(None), i] = byte  # same field for all pairs
    return P


@pytest.mark.parametrize("affine", [False, True])
def test_native_matches_numpy_walker(rng, affine):
    if not native.available():
        pytest.skip("no C++ toolchain")
    n = m = 24
    B = 5
    P = _random_pointer_matrix(rng, n, m, B, affine)
    si = rng.integers(1, n + 1, B).astype(np.int64)
    sj = rng.integers(1, m + 1, B).astype(np.int64)
    done0 = np.zeros(B, bool)
    done0[2] = True

    cigars, fi, fj = native.walk_to_cigars(P, si, sj, done0, affine)
    walk = _host_traceback_affine if affine else _host_traceback_linear
    ops_rev, ri, rj = walk(P, si.copy(), sj.copy(), done0.copy(), B)
    for b in range(B):
        row = ops_rev[b]
        row = row[row != OP_PAD]
        assert cigars[b] == ops_to_cigar(row[::-1]), b
    np.testing.assert_array_equal(fi, ri)
    np.testing.assert_array_equal(fj, rj)


def test_native_rle_matches_python(rng):
    if not native.available():
        pytest.skip("no C++ toolchain")
    ops = np.full((4, 30), OP_PAD, np.uint8)
    for b in range(4):
        L = int(rng.integers(0, 30))
        ops[b, :L] = rng.integers(0, 3, L)
    got = native.ops_rows_to_cigars(ops)
    want = [ops_to_cigar(row) for row in ops]
    assert got == want
