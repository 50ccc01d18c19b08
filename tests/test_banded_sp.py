"""Banded sequence-parallel relay (parallel/banded_sp.py) vs the banded
oracle on the faked 8-device CPU mesh (SURVEY.md §4.4; VERDICT round-3
item 4: band-per-core for long pairs through the SP path).

The relay must be exact for every block-boundary shape: blocks taller
and shorter than the band, pairs whose (n, m) cell lands mid-block, on a
block boundary, and on devices that never see real rows; batches larger
than one relay group (cross-pair pipelining) and mixed per-pair deltas.
"""

import numpy as np
import pytest

from seqalib_tpu.oracle import nw_affine
from seqalib_tpu.parallel.banded_sp import (
    banded_nw_affine_score_sp,
    make_band_mesh,
)
from seqalib_tpu.types import ScoringParams

SP = ScoringParams(match=2, mismatch=-3, gap_open=-4, gap_extend=-2)


@pytest.fixture(scope="module")
def mesh():
    return make_band_mesh()


def _pairs(rng, qlens, tlens):
    qs = [rng.integers(0, 4, size=L).astype(np.int32) for L in qlens]
    ts = [rng.integers(0, 4, size=L).astype(np.int32) for L in tlens]
    return qs, ts


@pytest.mark.parametrize(
    "qlens,tlens,band",
    [
        # R = ceil(257/8) = 33 < Dband: every block shorter than the band
        ([257], [251], 16),
        # R > Dband; uneven lengths; (n, m) mid-block
        ([1000], [970], 24),
        # delta pushes the band asymmetric; end cell near a block boundary
        ([512], [600], 32),
        # batch of 3 with mixed deltas in one geometry bucket
        ([300, 280, 311], [300, 301, 280], 20),
        # two relay groups (cross-pair pipelining path): 9 pairs > GB=8
        ([64] * 9, [64] * 9, 8),
    ],
)
def test_banded_sp_oracle_parity(mesh, qlens, tlens, band):
    rng = np.random.default_rng(hash((tuple(qlens), band)) % 2**31)
    qs, ts = _pairs(rng, qlens, tlens)
    got = banded_nw_affine_score_sp(qs, ts, SP, band, mesh, CK=64)
    if not isinstance(got, list):
        got = [got]
    for b in range(len(qs)):
        ref = nw_affine(qs[b], ts[b], SP, band=band)
        assert got[b] == ref.score, (b, got[b], ref.score)


def test_banded_sp_single_pair_form(mesh):
    rng = np.random.default_rng(5)
    q = rng.integers(0, 4, size=400).astype(np.int32)
    t = rng.integers(0, 4, size=390).astype(np.int32)
    got = banded_nw_affine_score_sp(q, t, SP, 16, mesh, CK=64)
    assert isinstance(got, int)
    assert got == nw_affine(q, t, SP, band=16).score


def test_banded_sp_empty_and_tiny(mesh):
    rng = np.random.default_rng(6)
    qs = [np.zeros(0, np.int32), rng.integers(0, 4, 3).astype(np.int32)]
    ts = [rng.integers(0, 4, 5).astype(np.int32), np.zeros(0, np.int32)]
    got = banded_nw_affine_score_sp(qs, ts, SP, 8, mesh, CK=64)
    for b in range(2):
        ref = nw_affine(qs[b], ts[b], SP, band=8)
        assert got[b] == ref.score, b


def _mutated_pair(rng, L, rate=0.12):
    # a mutated copy keeps the optimal path near the diagonal (a real
    # long-read shape) without making the score trivial
    q = rng.integers(0, 4, size=L).astype(np.int32)
    t = q.copy()
    idx = rng.random(L) < rate
    t[idx] = (t[idx] + rng.integers(1, 4, int(idx.sum()))) % 4
    return q, t


@pytest.mark.slow
def test_banded_sp_8kb_true_oracle(mesh):
    """Longest shape the O(n*m)-memory oracle affords: 8kb, w=128."""
    from seqalib_tpu.oracle_fast import nw_affine as nw_affine_fast

    q, t = _mutated_pair(np.random.default_rng(7), 8_000)
    got = banded_nw_affine_score_sp(q, t, SP, 128, mesh, CK=256)
    assert got == nw_affine_fast(q, t, SP, band=128).score


@pytest.mark.slow
def test_banded_sp_100kb_w256(mesh):
    """The VERDICT round-3 item-4 'Done' shape: 100kb pair, w=256, fake
    8-device mesh, through the SP path.  The reference engine is the
    single-device banded Pallas kernel (an independent implementation,
    itself oracle-anchored at every size the O(n*m) oracle's memory
    affords — a true-oracle 100kb check needs a ~40GB DP matrix)."""
    from seqalib_tpu.models.banded import banded_align_batch

    q, t = _mutated_pair(np.random.default_rng(8), 100_000)
    got = banded_nw_affine_score_sp(q, t, SP, 256, mesh, CK=256)
    ref = banded_align_batch(
        q[None, :],
        t[None, :],
        np.array([len(q)]),
        np.array([len(t)]),
        SP,
        256,
        traceback=False,
    )[0]
    assert got == ref.score


@pytest.mark.parametrize(
    "n,m,band",
    [
        (257, 251, 16),  # blocks shorter than the band
        (1000, 970, 24),  # R > Dband, uneven lengths
        (512, 600, 32),  # asymmetric delta
    ],
)
def test_banded_sp_align_cigar_parity(mesh, n, m, band):
    """Full CIGAR from the banded-SP path (item-4 stretch): str-level
    oracle parity — score, coords, and the exact canonical CIGAR."""
    from seqalib_tpu.parallel.banded_sp import banded_nw_affine_align_sp

    rng = np.random.default_rng(n * 13 + m)
    q = rng.integers(0, 4, n).astype(np.int32)
    t = rng.integers(0, 4, m).astype(np.int32)
    got = banded_nw_affine_align_sp(q, t, SP, band, mesh, CK=64)
    ref = nw_affine(q, t, SP, band=band)
    assert str(got) == str(ref)


def test_banded_sp_align_mutated_long(mesh):
    """A realistic long-read shape: 3kb mutated copy, w=32."""
    from seqalib_tpu.parallel.banded_sp import banded_nw_affine_align_sp

    q, t = _mutated_pair(np.random.default_rng(11), 3000, rate=0.08)
    got = banded_nw_affine_align_sp(q, t, SP, 32, mesh, CK=128)
    ref = nw_affine(q, t, SP, band=32)
    assert str(got) == str(ref)


def test_banded_sp_align_empty(mesh):
    from seqalib_tpu.parallel.banded_sp import banded_nw_affine_align_sp

    got = banded_nw_affine_align_sp(
        np.zeros(0, np.int32), np.arange(4, dtype=np.int32) % 4, SP, 8, mesh
    )
    assert (got.score, got.cigar) == (SP.gap_open + 4 * SP.gap_extend, "4D")


def test_banded_sp_matrix_scoring(mesh):
    """Substitution-matrix scoring through the relay's packed-nibble
    profile windows (score + CIGAR vs the oracle)."""
    from seqalib_tpu.parallel.banded_sp import (
        banded_nw_affine_align_sp,
        banded_nw_affine_score_sp,
    )

    rng = np.random.default_rng(29)
    mat = rng.integers(-4, 6, size=(8, 8)).astype(np.int32)
    np.fill_diagonal(mat, rng.integers(4, 11, size=8))
    spm = ScoringParams(gap_open=-6, gap_extend=-1, matrix=mat)
    q = rng.integers(0, 8, 300).astype(np.int32)
    t = rng.integers(0, 8, 280).astype(np.int32)
    ref = nw_affine(q, t, spm, band=24)
    assert banded_nw_affine_score_sp(q, t, spm, 24, mesh, CK=64) == ref.score
    got = banded_nw_affine_align_sp(q, t, spm, 24, mesh, CK=64)
    assert str(got) == str(ref)


def test_banded_sp_wide_matrix_raises(mesh):
    from seqalib_tpu.parallel.banded_sp import banded_nw_affine_score_sp

    mat = np.full((4, 4), -30, np.int32)
    np.fill_diagonal(mat, 50)
    spm = ScoringParams(gap_open=-6, gap_extend=-1, matrix=mat)
    with pytest.raises(NotImplementedError):
        banded_nw_affine_score_sp(
            np.zeros(16, np.int32), np.zeros(16, np.int32), spm, 4, mesh
        )


def test_banded_sp_cross_engine_mixed_batch(mesh):
    """Cross-engine property: the relay must agree with the single-device
    banded kernel on a mixed batch (varying lengths AND deltas, both
    engines independently oracle-anchored)."""
    from seqalib_tpu.models.banded import banded_align_batch

    rng = np.random.default_rng(31)
    qlens = [200, 450, 133, 390, 512]
    tlens = [230, 440, 150, 360, 500]
    qs, ts = _pairs(rng, qlens, tlens)
    band = 40
    got = banded_nw_affine_score_sp(qs, ts, SP, band, mesh, CK=64)
    W = max(max(qlens), max(tlens))
    qm = np.zeros((5, W), np.int32)
    tm = np.zeros((5, W), np.int32)
    for i in range(5):
        qm[i, : qlens[i]] = qs[i]
        tm[i, : tlens[i]] = ts[i]
    ref = banded_align_batch(
        qm, tm, np.array(qlens), np.array(tlens), SP, band, traceback=False
    )
    for b in range(5):
        assert got[b] == ref[b].score, b


def test_banded_sp_align_batched(mesh):
    """Round-5 batched align (VERDICT round-4 item 4a): >1 pairs fill the
    GB walker slots of ONE sharded walk program — mixed lengths/deltas,
    an empty pair mid-batch, and a second relay group (B > GB), all
    str-level parity vs the banded oracle."""
    from seqalib_tpu.parallel.banded_sp import GB, banded_nw_affine_align_sp

    rng = np.random.default_rng(77)
    qlens = [257, 190, 301, 0, 244, 257, 130, 222, 260, 180]  # > GB pairs
    tlens = [251, 200, 280, 5, 260, 257, 150, 199, 255, 190]
    assert len(qlens) == GB + 2
    qs, ts = _pairs(rng, qlens, tlens)
    got = banded_nw_affine_align_sp(qs, ts, SP, 24, mesh, CK=64)
    for b in range(len(qs)):
        if qlens[b] == 0:
            assert got[b].cigar == (f"{tlens[b]}D" if tlens[b] else "")
            continue
        ref = nw_affine(qs[b], ts[b], SP, band=24)
        assert str(got[b]) == str(ref), (b, got[b], ref)
