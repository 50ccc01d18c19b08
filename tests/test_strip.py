"""Strip-tiled v2 kernel parity vs oracle (score + start/end coords,
local mode, linear + affine, DNA + BLOSUM62).  Interpret mode on the
conftest-forced CPU backend."""

import numpy as np
import pytest

from seqalib_tpu.ops.strip_pallas import strip_bucket
from seqalib_tpu.oracle import sw_affine, sw_linear
from seqalib_tpu.parallel.dispatch import sentinel_table
from seqalib_tpu.types import ScoringParams

DNA_AFF = ScoringParams(match=2, mismatch=-3, gap_open=-5, gap_extend=-2)
DNA_LIN = ScoringParams(match=2, mismatch=-3, gap_open=0, gap_extend=-2)
BLOS = ScoringParams.blosum62(gap_open=-10, gap_extend=-1)


def _run(rng, sp, B, n, m, qlen=None, tlen=None):
    alpha = 4 if sp.matrix is None else 20
    q = rng.integers(0, alpha, (B, n)).astype(np.int32)
    t = rng.integers(0, alpha, (B, m)).astype(np.int32)
    qlen = np.full(B, n, np.int32) if qlen is None else np.asarray(qlen, np.int32)
    tlen = np.full(B, m, np.int32) if tlen is None else np.asarray(tlen, np.int32)
    out = strip_bucket(
        q,
        t,
        qlen,
        tlen,
        sentinel_table(sp),
        mode="local",
        gap_open=sp.gap_open,
        gap_extend=sp.gap_extend,
    )
    for b in range(B):
        qq, tt = q[b][: qlen[b]], t[b][: tlen[b]]
        ref = sw_affine(qq, tt, sp) if sp.is_affine else sw_linear(qq, tt, sp)
        got = (
            out["score"][b],
            out["qs"][b],
            out["qe"][b],
            out["ts"][b],
            out["te"][b],
        )
        want = (
            ref.score,
            ref.query_start,
            ref.query_end,
            ref.target_start,
            ref.target_end,
        )
        assert got == want, (b, got, want)


@pytest.mark.parametrize(
    "sp,B,n,m",
    [
        (DNA_AFF, 4, 100, 120),
        (DNA_AFF, 2, 300, 260),  # multiple strips & target blocks
        (DNA_LIN, 4, 100, 120),
        (BLOS, 2, 150, 140),
        (DNA_AFF, 1, 10, 10),
        (BLOS, 1, 129, 257),  # just past strip/block boundaries
    ],
)
def test_strip_parity(rng, sp, B, n, m):
    _run(rng, sp, B, n, m)


def test_strip_ragged_lengths(rng):
    _run(rng, DNA_AFF, 3, 90, 110, qlen=[90, 40, 64], tlen=[110, 50, 20])


@pytest.mark.parametrize(
    "sp,B,n,m",
    [
        (DNA_AFF, 3, 100, 120),
        (DNA_LIN, 3, 100, 120),
        (BLOS, 2, 150, 140),
        (DNA_AFF, 2, 300, 260),  # multiple strips and blocks
    ],
)
def test_strip_traceback_parity(rng, sp, B, n, m):
    """want_tb: pointer stream + host walk must reproduce oracle CIGARs."""
    alpha = 4 if sp.matrix is None else 20
    q = rng.integers(0, alpha, (B, n)).astype(np.int32)
    t = rng.integers(0, alpha, (B, m)).astype(np.int32)
    qlen = np.full(B, n, np.int32)
    tlen = np.full(B, m, np.int32)
    out = strip_bucket(
        q,
        t,
        qlen,
        tlen,
        sentinel_table(sp),
        mode="local",
        gap_open=sp.gap_open,
        gap_extend=sp.gap_extend,
        want_tb=True,
    )
    for b in range(B):
        ref = (
            sw_affine(q[b], t[b], sp) if sp.is_affine else sw_linear(q[b], t[b], sp)
        )
        got = (
            out["score"][b],
            out["qs"][b],
            out["qe"][b],
            out["ts"][b],
            out["te"][b],
            out["cigars"][b],
        )
        want = (
            ref.score,
            ref.query_start,
            ref.query_end,
            ref.target_start,
            ref.target_end,
            ref.cigar,
        )
        assert got == want, (b, got, want)


@pytest.mark.parametrize(
    "sp,B,n,m,want_tb",
    [
        (DNA_AFF, 3, 60, 70, True),
        (DNA_LIN, 3, 60, 70, True),
        (BLOS, 2, 100, 90, True),
        (DNA_AFF, 2, 256, 256, True),  # config-1 shape
        (DNA_AFF, 2, 200, 180, False),
    ],
)
def test_strip_global_parity(rng, sp, B, n, m, want_tb):
    from seqalib_tpu.oracle import nw_affine, nw_linear

    alpha = 4 if sp.matrix is None else 20
    q = rng.integers(0, alpha, (B, n)).astype(np.int32)
    t = rng.integers(0, alpha, (B, m)).astype(np.int32)
    qlen = np.full(B, n, np.int32)
    tlen = np.full(B, m, np.int32)
    out = strip_bucket(
        q,
        t,
        qlen,
        tlen,
        sentinel_table(sp),
        mode="global",
        gap_open=sp.gap_open,
        gap_extend=sp.gap_extend,
        want_tb=want_tb,
    )
    for b in range(B):
        ref = nw_affine(q[b], t[b], sp) if sp.is_affine else nw_linear(q[b], t[b], sp)
        assert out["score"][b] == ref.score, b
        if want_tb:
            assert out["cigars"][b] == ref.cigar, b


def test_strip_global_padded_rows_past_capture_strip(rng):
    """Global score capture must survive strips past the final row: with
    dispatcher-style bucket padding (array rows >> qlen) the capture strip
    is not the last one, and the traceback kernel's per-strip state init
    must not wipe the carried score (regression: scores came back 0 for
    any qlen whose strip wasn't the padded array's last strip)."""
    from seqalib_tpu.oracle import nw_affine

    B, n, m = 2, 300, 280
    q = np.full((B, 512), 4, np.int32)  # sentinel-padded, 4 strips
    t = np.full((B, 512), 5, np.int32)
    q[:, :n] = rng.integers(0, 4, (B, n))
    t[:, :m] = rng.integers(0, 4, (B, m))
    qlen = np.full(B, n, np.int32)  # final row in strip 2 of 4
    tlen = np.full(B, m, np.int32)
    for want_tb in (True, False):
        out = strip_bucket(
            q,
            t,
            qlen,
            tlen,
            sentinel_table(DNA_AFF),
            mode="global",
            gap_open=DNA_AFF.gap_open,
            gap_extend=DNA_AFF.gap_extend,
            want_tb=want_tb,
        )
        for b in range(B):
            ref = nw_affine(q[b, :n], t[b, :m], DNA_AFF)
            assert out["score"][b] == ref.score, (want_tb, b)
            if want_tb:
                assert out["cigars"][b] == ref.cigar, b


def test_strip_global_degenerate(rng):
    from seqalib_tpu.oracle import nw_affine

    q = rng.integers(0, 4, (3, 50)).astype(np.int32)
    t = rng.integers(0, 4, (3, 60)).astype(np.int32)
    qlen = np.array([50, 30, 0], np.int32)
    tlen = np.array([60, 35, 20], np.int32)
    out = strip_bucket(
        q,
        t,
        qlen,
        tlen,
        sentinel_table(DNA_AFF),
        mode="global",
        gap_open=DNA_AFF.gap_open,
        gap_extend=DNA_AFF.gap_extend,
        want_tb=True,
    )
    for b in range(3):
        ref = nw_affine(q[b][: qlen[b]], t[b][: tlen[b]], DNA_AFF)
        assert (out["score"][b], out["cigars"][b]) == (ref.score, ref.cigar), b


def test_strip_all_mismatch(rng):
    """Empty local alignment: disjoint alphabets -> score 0, zero coords."""
    q = np.zeros((1, 40), np.int32)
    t = np.ones((1, 40), np.int32)
    out = strip_bucket(
        q,
        t,
        np.array([40], np.int32),
        np.array([40], np.int32),
        sentinel_table(DNA_AFF),
        mode="local",
        gap_open=DNA_AFF.gap_open,
        gap_extend=DNA_AFF.gap_extend,
    )
    assert out["score"][0] == 0 and out["qe"][0] == 0 and out["te"][0] == 0


def test_strip_banded_pass2_escalation(rng):
    """A local alignment whose net gap exceeds the banded pass-2 band
    (SEQALIB_FUSED_BW=64) must escalate to the host start-recovery path
    and still produce oracle-exact starts: target = query with a
    100-letter insertion (net gap 100 > 64)."""
    n = 160
    q = rng.integers(0, 4, n).astype(np.int32)
    ins = rng.integers(0, 4, 100).astype(np.int32)
    t = np.concatenate([q[:80], ins, q[80:]]).astype(np.int32)
    sp = ScoringParams(match=4, mismatch=-3, gap_open=-5, gap_extend=-1)
    out = strip_bucket(
        q[None, :],
        t[None, :],
        np.array([n], np.int32),
        np.array([len(t)], np.int32),
        sentinel_table(sp),
        mode="local",
        gap_open=sp.gap_open,
        gap_extend=sp.gap_extend,
    )
    ref = sw_affine(q, t, sp)
    got = (out["score"][0], out["qs"][0], out["qe"][0], out["ts"][0], out["te"][0])
    want = (ref.score, ref.query_start, ref.query_end, ref.target_start, ref.target_end)
    assert got == want, (got, want)
