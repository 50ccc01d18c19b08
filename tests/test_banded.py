"""Banded long-read path (config 4): Pallas banded kernel + checkpointed
traceback vs the oracle's banded Gotoh recurrence (SURVEY.md §2.2-4).

Runs in interpret mode on the conftest-forced CPU backend.
"""

import numpy as np
import pytest

from seqalib_tpu.models.banded import banded_align_batch
from seqalib_tpu.oracle import nw_affine
from seqalib_tpu.types import ScoringParams

SP = ScoringParams(match=2, mismatch=-3, gap_open=-5, gap_extend=-2)


def _random_bucket(rng, qlens, tlens):
    B, n, m = len(qlens), max(qlens), max(tlens)
    qs = np.zeros((B, n), np.int32)
    ts = np.zeros((B, m), np.int32)
    for b in range(B):
        qs[b, : qlens[b]] = rng.integers(0, 4, qlens[b])
        ts[b, : tlens[b]] = rng.integers(0, 4, tlens[b])
    return qs, ts, np.asarray(qlens), np.asarray(tlens)


def _check(rng, qlens, tlens, band, CK):
    qs, ts, qlen, tlen = _random_bucket(rng, qlens, tlens)
    res = banded_align_batch(qs, ts, qlen, tlen, SP, band, traceback=True, CK=CK)
    for b in range(len(qlens)):
        ref = nw_affine(qs[b][: qlens[b]], ts[b][: tlens[b]], SP, band=band)
        assert str(res[b]) == str(ref), (b, res[b], ref)


@pytest.mark.parametrize(
    "qlens,tlens,band,CK",
    [
        ([64, 64], [64, 64], 12, 32),  # square, delta 0
        ([50, 40, 30], [54, 44, 34], 6, 16),  # mixed lengths, uniform delta
        ([40], [30], 8, 16),  # negative delta (target shorter)
        ([33], [47], 16, 20),  # band wider than needed
        ([17], [19], 3, 8),  # tiny
    ],
)
def test_banded_parity(rng, qlens, tlens, band, CK):
    _check(rng, qlens, tlens, band, CK)


def test_banded_mutated_copy(rng):
    """Realistic long-read case: target = query with SNPs + indels."""
    n = 192
    q = rng.integers(0, 4, n).astype(np.int32)
    t = q.copy()
    idx = rng.choice(n, 16, replace=False)
    t[idx] = (t[idx] + 1 + rng.integers(0, 3, 16)) % 4
    t = np.delete(t, [50, 51, 52])
    t = np.insert(t, 120, [0, 1]).astype(np.int32)
    res = banded_align_batch(
        q[None, :],
        t[None, :],
        np.array([n]),
        np.array([len(t)]),
        SP,
        band=10,
        traceback=True,
        CK=48,
    )
    ref = nw_affine(q, t, SP, band=10)
    assert str(res[0]) == str(ref)


def test_banded_score_only(rng):
    qs, ts, qlen, tlen = _random_bucket(rng, [48, 48], [52, 52])
    res = banded_align_batch(qs, ts, qlen, tlen, SP, band=8, traceback=False, CK=32)
    for b in range(2):
        ref = nw_affine(qs[b], ts[b], SP, band=8)
        assert res[b].score == ref.score


def test_banded_matches_unbanded_when_wide(rng):
    """Property (SURVEY.md §4.3): banded(w >= max(n, m)) == full matrix."""
    qs, ts, qlen, tlen = _random_bucket(rng, [40], [44])
    res = banded_align_batch(qs, ts, qlen, tlen, SP, band=64, traceback=True, CK=32)
    ref = nw_affine(qs[0], ts[0], SP, band=None)
    assert res[0].score == ref.score
    assert res[0].cigar == ref.cigar


def test_banded_vmem_chunking_preserves_results(rng, monkeypatch):
    """The VMEM guard splits oversized batches; results must be identical
    to the unchunked call, in order."""
    qs, ts, qlen, tlen = _random_bucket(rng, [48] * 5, [52] * 5)
    full = banded_align_batch(qs, ts, qlen, tlen, SP, band=8, traceback=True, CK=32)
    monkeypatch.setenv("SEQALIB_BANDED_VMEM_CAP", "1")  # forces max_b == 1
    chunked = banded_align_batch(qs, ts, qlen, tlen, SP, band=8, traceback=True, CK=32)
    assert [str(r) for r in chunked] == [str(r) for r in full]


def test_banded_mixed_delta_bucket(rng):
    """One kernel call covering pairs with DIFFERENT tlen-qlen: per-pair
    in-kernel band bounds must reproduce each pair's own oracle band
    semantics (the round-1 driver recompiled per distinct delta)."""
    from seqalib_tpu.oracle import nw_affine

    w = 8
    lens = [(60, 60), (50, 64), (64, 48), (40, 40)]
    qs, ts, qlen, tlen = _random_bucket(
        rng, [a for a, _ in lens], [b for _, b in lens]
    )
    res = banded_align_batch(qs, ts, qlen, tlen, SP, band=w, traceback=True)
    for b, (lq, lt) in enumerate(lens):
        ref = nw_affine(qs[b, :lq], ts[b, :lt], SP, band=w)
        assert (res[b].score, res[b].cigar) == (ref.score, ref.cigar), b


@pytest.mark.parametrize(
    "qlens,tlens,band,CK",
    [
        ([48, 48], [48, 48], 10, 32),  # square protein bucket
        ([40, 56], [44, 50], 8, 16),  # mixed lengths + deltas
        ([17], [19], 4, 8),  # tiny
    ],
)
def test_banded_matrix_parity(rng, qlens, tlens, band, CK):
    """BLOSUM62 banded path (packed-nibble profile) vs the oracle's banded
    Gotoh — score + CIGAR, lifting round 1's scalar-only guard
    (VERDICT.md item 10)."""
    sp = ScoringParams.blosum62()
    B, n, m = len(qlens), max(qlens), max(tlens)
    qs = np.zeros((B, n), np.int32)
    ts = np.zeros((B, m), np.int32)
    for b in range(B):
        qs[b, : qlens[b]] = rng.integers(0, 20, qlens[b])
        ts[b, : tlens[b]] = rng.integers(0, 20, tlens[b])
    qlen, tlen = np.asarray(qlens), np.asarray(tlens)
    res = banded_align_batch(qs, ts, qlen, tlen, sp, band, traceback=True, CK=CK)
    for b in range(B):
        ref = nw_affine(qs[b][: qlen[b]], ts[b][: tlen[b]], sp, band=band)
        assert str(res[b]) == str(ref), (b, res[b], ref)


def test_banded_matrix_score_only(rng):
    sp = ScoringParams.blosum62()
    q = rng.integers(0, 20, 64).astype(np.int32)
    t = rng.integers(0, 20, 70).astype(np.int32)
    res = banded_align_batch(
        q[None], t[None], np.array([64]), np.array([70]), sp, band=12,
        traceback=False, CK=32,
    )
    ref = nw_affine(q, t, sp, band=12)
    assert res[0].score == ref.score


def test_banded_rejects_wide_range_matrix(rng):
    """Tables outside the packed-nibble score range still route to the
    full-matrix wavefront kernel (NotImplementedError here)."""
    wide = np.full((4, 4), -20, np.int32)
    np.fill_diagonal(wide, 20)
    sp = ScoringParams(gap_open=-5, gap_extend=-2, matrix=wide)
    qs, ts, qlen, tlen = _random_bucket(rng, [16], [16])
    with pytest.raises(NotImplementedError):
        banded_align_batch(qs, ts, qlen, tlen, sp, band=4)


def test_banded_matrix_routes_through_dispatch(rng, monkeypatch):
    """align_batch(band=, BLOSUM62) must reach the packed-profile banded
    kernel, not the full-matrix wavefront fallback (review finding: the
    dispatcher's `sp.matrix is None` guard made the feature unreachable
    from the public API)."""
    import seqalib_tpu.models.banded as mb
    from seqalib_tpu.api import align_batch
    from seqalib_tpu.oracle import nw_affine

    calls = []
    orig = mb.banded_align_batch

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(mb, "banded_align_batch", spy)
    sp = ScoringParams.blosum62()
    q = rng.integers(0, 20, 200).astype(np.uint8)
    t = rng.integers(0, 20, 210).astype(np.uint8)
    got = align_batch([q], [t], scoring=sp, mode="global", band=32,
                      backend="pallas")[0]
    ref = nw_affine(q.astype(np.int32), t.astype(np.int32), sp, band=32)
    assert calls, "banded kernel path was not taken"
    assert (got.score, got.cigar) == (ref.score, ref.cigar)


@pytest.mark.parametrize(
    "qlens,tlens,band,CK",
    [
        ([64, 64], [64, 64], 12, 32),
        ([50, 40, 30], [54, 44, 34], 6, 16),
        ([40], [30], 8, 16),
        ([200, 180], [190, 200], 20, 64),  # multiple super-blocks
    ],
)
def test_banded_device_walk_parity(rng, qlens, tlens, band, CK):
    """The on-device traceback walk kernel (band_walk_range) must be
    bit-identical to the host walkers: full str-level oracle parity with
    device_walk forced on (interpret mode here; the pointer blocks never
    leave the device on real hardware)."""
    qs, ts, qlen, tlen = _random_bucket(rng, qlens, tlens)
    res = banded_align_batch(
        qs, ts, qlen, tlen, SP, band, traceback=True, CK=CK, device_walk=True
    )
    for b in range(len(qlens)):
        ref = nw_affine(qs[b][: qlens[b]], ts[b][: tlens[b]], SP, band=band)
        assert str(res[b]) == str(ref), (b, res[b], ref)


def test_banded_device_walk_matrix_scoring(rng):
    sp = ScoringParams.blosum62()
    qs, ts, qlen, tlen = _random_bucket(rng, [90, 70], [84, 77])
    qs %= 20
    ts %= 20
    res = banded_align_batch(
        qs, ts, qlen, tlen, sp, 10, traceback=True, CK=32, device_walk=True
    )
    for b in range(2):
        ref = nw_affine(qs[b][: qlen[b]], ts[b][: tlen[b]], sp, band=10)
        assert str(res[b]) == str(ref), (b, res[b], ref)


@pytest.mark.parametrize(
    "band,CK",
    [
        (63, 64),  # dhi+1 == CK: the clamp chunk ends exactly at the
        #            steady boundary — no dyn transition chunk at all
        (64, 64),  # dhi+1 == CK+1: clamp + dyn + steady
        (7, 64),  # clamp zone smaller than one chunk: dyn + steady only
    ],
)
def test_banded_phase_boundary_geometries(rng, band, CK):
    """_phase_runs edge cases (round 4): the clamp/dyn/steady split must
    be exact when dhi+1 lands exactly on, just past, or well inside a
    chunk boundary."""
    from seqalib_tpu.models.banded import _phase_runs

    runs = _phase_runs(0, 512, CK, band)  # delta-0 bucket: dhi == band
    assert runs[0][0] == 0 and runs[-1][1] == 512
    for (a0, a1, _), (b0, b1, _) in zip(runs, runs[1:]):
        assert a1 == b0
    _check(rng, [150], [150], band, CK)
