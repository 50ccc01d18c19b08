"""Sequence-parallel pipelined wavefront (one pair over the mesh) vs the
oracle's Gotoh score, on the conftest-faked 8-device CPU mesh.
"""

import numpy as np
import pytest

from seqalib_tpu.oracle import nw_affine
from seqalib_tpu.parallel.band_pipeline import make_band_mesh, nw_affine_score_sp
from seqalib_tpu.types import ScoringParams

SP = ScoringParams(match=2, mismatch=-3, gap_open=-5, gap_extend=-2)


@pytest.fixture(scope="module")
def mesh():
    return make_band_mesh()


@pytest.mark.parametrize(
    "n,m,C",
    [
        (300, 280, 64),  # rows not divisible by D, cols not by C
        (256, 256, 32),  # exact multiples
        (97, 203, 50),  # skewed shapes
        (5, 400, 64),  # fewer rows than devices * 1
        (40, 7, 16),  # target shorter than one tile
        (300, 100, 8),  # row-block R far exceeds tile width C
    ],
)
def test_sp_score_matches_oracle(mesh, n, m, C):
    rng = np.random.default_rng(n * 1000 + m)
    q = rng.integers(0, 4, n).astype(np.int32)
    t = rng.integers(0, 4, m).astype(np.int32)
    got = nw_affine_score_sp(q, t, SP, mesh, C=C)
    want = nw_affine(q, t, SP).score
    assert got == want


def test_sp_mutated_copy(mesh):
    """Realistic long-pair case: target = query with SNPs + indels."""
    rng = np.random.default_rng(11)
    n = 384
    q = rng.integers(0, 4, n).astype(np.int32)
    t = q.copy()
    idx = rng.choice(n, 20, replace=False)
    t[idx] = (t[idx] + 1 + rng.integers(0, 3, 20)) % 4
    t = np.delete(t, [100, 101])
    t = np.insert(t, 250, [1, 2, 3]).astype(np.int32)
    got = nw_affine_score_sp(q, t, SP, mesh, C=96)
    assert got == nw_affine(q, t, SP).score


def test_sp_degenerate(mesh):
    assert nw_affine_score_sp([], [], SP, mesh) == 0
    assert nw_affine_score_sp([1, 2], [], SP, mesh) == SP.gap_open + 2 * SP.gap_extend


def test_sp_rejects_matrix_scoring(mesh):
    sp = ScoringParams.blosum62()
    with pytest.raises(NotImplementedError):
        nw_affine_score_sp([1], [1], sp, mesh)
