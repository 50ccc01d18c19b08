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


@pytest.mark.parametrize(
    "n,m,C,sub",
    [
        (300, 280, 64, None),  # rows not divisible by D, cols not by C
        (97, 203, 50, None),  # skewed shapes
        (300, 100, 8, None),  # row-block R far exceeds tile width C
        (2100, 450, 128, 1),  # multi-strip blocks: R=384 -> 3 strips/dev
        (520, 260, 64, 2),  # SUB=2 flat rows span two sublane groups
    ],
)
def test_sp_score_pallas_tile(mesh, n, m, C, sub):
    """SP v2: the flat-diagonal Pallas tile body (ops.sp_tile_pallas)
    behind the same ppermute protocol (VERDICT.md round-1 item 5).
    sp_sub forces small strip heights so the inter-strip scratch handoff
    and the multi-sublane flat roll run at test scale."""
    rng = np.random.default_rng(n * 1000 + m + 7)
    q = rng.integers(0, 4, n).astype(np.int32)
    t = rng.integers(0, 4, m).astype(np.int32)
    got = nw_affine_score_sp(q, t, SP, mesh, C=C, backend="pallas", sp_sub=sub)
    want = nw_affine(q, t, SP).score
    assert got == want


def test_sp_matrix_scoring(mesh):
    """Substitution-matrix scoring on the xla tile body (per-cell gather):
    BLOSUM62 protein long-pair score matches the oracle exactly."""
    rng = np.random.default_rng(5)
    sp = ScoringParams.blosum62()
    q = rng.integers(0, 20, 150).astype(np.int32)
    t = rng.integers(0, 20, 190).astype(np.int32)
    got = nw_affine_score_sp(q, t, sp, mesh, C=48)
    assert got == nw_affine(q, t, sp).score


def test_sp_matrix_pallas_tile(mesh):
    """BLOSUM62 on the SP v2 Pallas tile: packed-nibble profile scoring
    keyed by the streamed target letter (sp_tile profile mode)."""
    rng = np.random.default_rng(9)
    sp = ScoringParams.blosum62()
    q = rng.integers(0, 20, 270).astype(np.int32)
    t = rng.integers(0, 20, 210).astype(np.int32)
    got = nw_affine_score_sp(q, t, sp, mesh, C=64, backend="pallas", sp_sub=1)
    assert got == nw_affine(q, t, sp).score


def test_sp_matrix_pallas_wide_table_raises(mesh):
    sp = ScoringParams(match=40, mismatch=-40, gap_open=-5, gap_extend=-2,
                       matrix=np.full((4, 4), -40, np.int32))
    with pytest.raises(NotImplementedError):
        nw_affine_score_sp(np.zeros(8, np.int32), np.zeros(8, np.int32),
                           sp, mesh, backend="pallas")


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


def test_sp_matrix_single_letter(mesh):
    """Degenerate 1x1 matrix-scoring pair (was the rejection case before
    the xla body grew gather-based matrix scoring)."""
    sp = ScoringParams.blosum62()
    got = nw_affine_score_sp([1], [1], sp, mesh)
    assert got == nw_affine(np.array([1]), np.array([1]), sp).score


# ---------------------------------------------------------------------------
# SP traceback (VERDICT.md round-2 item 10): score + CIGAR over the mesh
# ---------------------------------------------------------------------------

from seqalib_tpu.parallel.band_pipeline import nw_affine_align_sp  # noqa: E402


@pytest.mark.parametrize(
    "n,m,C",
    [
        (400, 520, 128),  # path crosses every device block
        (333, 290, 64),   # odd shapes, R not divisible by C
        (97, 203, 50),    # small
        (5, 400, 64),     # fewer rows than devices
        (40, 7, 16),      # target shorter than one tile
    ],
)
def test_sp_align_matches_oracle(mesh, n, m, C):
    """str-level parity: score, full-span coords AND canonical CIGAR."""
    rng = np.random.default_rng(n * 1000 + m)
    q = rng.integers(0, 4, n).astype(np.int32)
    t = rng.integers(0, 4, m).astype(np.int32)
    got = nw_affine_align_sp(q, t, SP, mesh, C=C)
    want = nw_affine(q, t, SP)
    assert str(got) == str(want)


def test_sp_align_mutated_copy(mesh):
    """Indel-rich realistic case: long gap runs cross tile boundaries in
    E/F state (the extend-bit handoff between pointer tiles)."""
    rng = np.random.default_rng(17)
    n = 384
    q = rng.integers(0, 4, n).astype(np.int32)
    t = q.copy()
    idx = rng.choice(n, 20, replace=False)
    t[idx] = (t[idx] + 1 + rng.integers(0, 3, 20)) % 4
    t = np.delete(t, np.arange(100, 112))  # 12-col gap: E-extend chain
    t = np.insert(t, 250, rng.integers(0, 4, 9)).astype(np.int32)
    got = nw_affine_align_sp(q, t, SP, mesh, C=96)
    want = nw_affine(q, t, SP)
    assert str(got) == str(want)


def test_sp_align_matrix_scoring(mesh):
    sp = ScoringParams.blosum62()
    rng = np.random.default_rng(29)
    q = rng.integers(0, 20, 200).astype(np.int32)
    t = rng.integers(0, 20, 240).astype(np.int32)
    got = nw_affine_align_sp(q, t, sp, mesh, C=64)
    want = nw_affine(q, t, sp)
    assert str(got) == str(want)


def test_sp_align_degenerate(mesh):
    got = nw_affine_align_sp([1, 2], [], SP, mesh)
    assert (got.score, got.cigar) == (SP.gap_open + 2 * SP.gap_extend, "2I")
    got = nw_affine_align_sp([], [3], SP, mesh)
    assert (got.score, got.cigar) == (SP.gap_open + SP.gap_extend, "1D")


def test_sp_align_10kb(mesh):
    """The VERDICT item-10 'one 10kb+ pair' case.  The oracle is O(n*m)
    Python loops (infeasible here), so correctness splits into (a) the
    fill score vs an independent engine (the XLA wavefront via the
    public API) and (b) the in-function rescore assert, which proves the
    returned CIGAR attains that optimal score — together a complete
    optimality proof for the traceback."""
    from seqalib_tpu.api import align

    rng = np.random.default_rng(41)
    n = 10240
    q = rng.integers(0, 4, n).astype(np.uint8)
    t = q[: n - 2048].copy()
    idx = rng.choice(len(t), 150, replace=False)
    t[idx] = (t[idx] + 1 + rng.integers(0, 3, 150)) % 4
    got = nw_affine_align_sp(
        q.astype(np.int32), t.astype(np.int32), SP, mesh, C=256
    )
    ref = align(q, t, scoring=SP, mode="global", backend="xla")
    assert got.score == ref.score
    assert (got.query_end, got.target_end) == (n, len(t))
    from seqalib_tpu.utils.cigar import cigar_consumed

    assert cigar_consumed(got.cigar) == (n, len(t))


@pytest.mark.parametrize(
    "n,m,C",
    [
        (300, 280, 64),
        (97, 203, 50),
        (40, 7, 16),
    ],
)
def test_sp_local_score_matches_oracle(mesh, n, m, C):
    """SW (local) mode on the SP path (VERDICT round-3 item 9)."""
    from seqalib_tpu.oracle import sw_affine
    from seqalib_tpu.parallel.band_pipeline import sw_affine_score_sp

    rng = np.random.default_rng(n * 7 + m)
    q = rng.integers(0, 4, n).astype(np.int32)
    t = rng.integers(0, 4, m).astype(np.int32)
    got = sw_affine_score_sp(q, t, SP, mesh, C=C)
    assert got == sw_affine(q, t, SP).score


def test_sp_local_empty_and_disjoint(mesh):
    from seqalib_tpu.parallel.band_pipeline import sw_affine_score_sp

    assert sw_affine_score_sp(np.zeros(0, np.int32), np.arange(3, dtype=np.int32) % 4, SP, mesh) == 0
    # disjoint alphabets: best local alignment is empty -> score 0
    q = np.zeros(40, np.int32)
    t = np.ones(35, np.int32)
    assert sw_affine_score_sp(q, t, SP, mesh, C=16) == 0


def test_sp_local_pallas_raises(mesh):
    from seqalib_tpu.parallel.band_pipeline import _sp_fill

    with pytest.raises(NotImplementedError):
        _sp_fill(
            np.zeros(8, np.int32), np.zeros(8, np.int32), SP, mesh, 8,
            "pallas", None, want_tb=False, local=True,
        )


def test_sp_align_pallas_fill_backend(mesh):
    """The traceback fill through the Pallas tile body (VERDICT round-3
    item 9 / weak 6): the checkpoints are step-level values, so the
    pointer-walk result must be identical to the xla-fill result and the
    oracle (interpret mode on this CPU mesh)."""
    from seqalib_tpu.parallel.band_pipeline import nw_affine_align_sp

    rng = np.random.default_rng(17)
    # R must be a 128 multiple for the tile kernel: keep n small so the
    # pallas path pads R to 128 with sp_sub=1
    n, m = 260, 245
    q = rng.integers(0, 4, n).astype(np.int32)
    t = rng.integers(0, 4, m).astype(np.int32)
    got = nw_affine_align_sp(q, t, SP, mesh, C=64, backend="pallas", sp_sub=1)
    ref = nw_affine(q, t, SP)
    assert str(got) == str(ref)
