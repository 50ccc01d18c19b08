"""Property tests promised by SURVEY.md §4.2-4.3 (VERDICT.md round-1 item 7):
banded(w >= n+m) == unbanded; affine(gap_open=0) == linear; the int16
DP-state bound logic at near-overflow lengths; and the two-pass start
escalation path (alignments taller than the fused pass-2 row window).
"""

import os

import numpy as np
import pytest

from seqalib_tpu.api import align_batch
from seqalib_tpu.oracle import align_oracle, nw_affine, sw_affine, sw_linear
from seqalib_tpu.types import ScoringParams

AFF = ScoringParams.affine(match=2, mismatch=-3, gap_open=-4, gap_extend=-1)


def _rand(rng, n, alpha=4):
    return rng.integers(0, alpha, size=n).astype(np.uint8)


def test_banded_wide_band_equals_full(rng):
    """A band wider than n+m can exclude nothing: banded == unbanded,
    score and CIGAR, oracle and xla backend."""
    for _ in range(4):
        q = _rand(rng, int(rng.integers(10, 40)))
        t = _rand(rng, int(rng.integers(10, 40)))
        w = len(q) + len(t)
        full_o = nw_affine(q, t, AFF)
        band_o = nw_affine(q, t, AFF, band=w)
        assert (full_o.score, full_o.cigar) == (band_o.score, band_o.cigar)
        got = align_batch([q], [t], scoring=AFF, mode="global", band=w,
                          backend="xla")[0]
        assert (got.score, got.cigar) == (full_o.score, full_o.cigar)


def test_affine_zero_open_equals_linear_score(rng):
    """gap_open=0 degrades Gotoh to the linear recurrence: scores equal."""
    sp_aff = ScoringParams(match=2, mismatch=-3, gap_open=0, gap_extend=-2)
    for mode in ("global", "local"):
        qs = [_rand(rng, int(rng.integers(5, 40))) for _ in range(6)]
        ts = [_rand(rng, int(rng.integers(5, 40))) for _ in range(6)]
        # oracle dispatches gap_open == 0 to the linear recurrence; force
        # the affine fill via the backend kernels and compare scores
        from seqalib_tpu.ops.wavefront_xla import wavefront_bucket
        from seqalib_tpu.parallel.dispatch import sentinel_table
        import jax.numpy as jnp

        L = max(max(len(q) for q in qs), max(len(t) for t in ts))
        qb = np.zeros((len(qs), L), np.int32)
        tb = np.zeros((len(ts), L), np.int32)
        for i, (q, t) in enumerate(zip(qs, ts)):
            qb[i, : len(q)] = q
            tb[i, : len(t)] = t
        qlen = np.array([len(q) for q in qs], np.int32)
        tlen = np.array([len(t) for t in ts], np.int32)
        table = jnp.asarray(sentinel_table(sp_aff))
        aff = wavefront_bucket(
            jnp.asarray(qb), jnp.asarray(tb), jnp.asarray(qlen),
            jnp.asarray(tlen), table, mode=mode, gap_open=0, gap_extend=-2,
            band=None, affine=True, want_tb=False,
        )
        lin = wavefront_bucket(
            jnp.asarray(qb), jnp.asarray(tb), jnp.asarray(qlen),
            jnp.asarray(tlen), table, mode=mode, gap_open=0, gap_extend=-2,
            band=None, affine=False, want_tb=False,
        )
        assert np.array_equal(np.asarray(aff["score"]), np.asarray(lin["score"]))


def test_int16_bound_logic_near_overflow(rng):
    """The dt16 eligibility bound |o| + (n+m)*max(|e|,|s|) must gate the
    int16 DP state off for lengths that could overflow, and interpret-mode
    parity must hold when it is force-enabled within bounds."""
    from seqalib_tpu.ops.strip_pallas import NEG_INF16, strip_bucket
    from seqalib_tpu.parallel.dispatch import sentinel_table

    sp = ScoringParams.affine(match=2, mismatch=-3, gap_open=-4, gap_extend=-1)
    # n+m around the eligibility edge: bound < |NEG_INF16| - 2000 = 18000
    # with max(|e|,|s|) = 3, |o| = 4 -> edge at n+m ~ 5999
    n_ok, n_bad = 64, 3200
    bound_ok = 4 + (2 * n_ok) * 3
    bound_bad = 4 + (2 * n_bad) * 3
    assert bound_ok < abs(NEG_INF16) - 2000 < bound_bad

    os.environ["SEQALIB_STRIP_INT16"] = "1"
    try:
        q = rng.integers(0, 4, (2, n_ok)).astype(np.int32)
        t = rng.integers(0, 4, (2, n_ok)).astype(np.int32)
        qlen = np.full(2, n_ok, np.int32)
        out = strip_bucket(
            q, t, qlen, qlen, sentinel_table(sp), mode="local",
            gap_open=sp.gap_open, gap_extend=sp.gap_extend,
        )
        for b in range(2):
            ref = sw_affine(q[b], t[b], sp)
            assert (
                out["score"][b], out["qs"][b], out["qe"][b],
                out["ts"][b], out["te"][b],
            ) == (
                ref.score, ref.query_start, ref.query_end,
                ref.target_start, ref.target_end,
            )
    finally:
        os.environ.pop("SEQALIB_STRIP_INT16", None)
    # over-bound lengths must not select dt16 (checked via the prep hook)
    from seqalib_tpu.ops.strip_pallas import _prep_strip

    os.environ["SEQALIB_STRIP_INT16"] = "1"
    try:
        qb = np.zeros((1, n_bad), np.int32)
        _, _, kwc = _prep_strip(
            qb, qb, np.array([n_bad]), np.array([n_bad]),
            sentinel_table(sp).astype(np.int64),
            gap_open=sp.gap_open, gap_extend=sp.gap_extend, affine=True,
        )
        assert kwc["dt16"] is False
    finally:
        os.environ.pop("SEQALIB_STRIP_INT16", None)


def test_start_escalation_tall_alignment(rng, monkeypatch):
    """A local alignment spanning more rows than the fused pass-2 window
    must escalate to the host wide-rescan path and still produce canonical
    coords.  The window default grew 384 -> 512 in round 2, so the test
    pins it to 128 via env (now honored per-call: WR is resolved at the
    strip_bucket call site, not trace time) to keep the escalation path
    actually exercised."""
    from seqalib_tpu.ops.strip_pallas import strip_bucket
    from seqalib_tpu.parallel.dispatch import sentinel_table

    monkeypatch.setenv("SEQALIB_FUSED_WR", "128")
    sp = ScoringParams.affine(match=2, mismatch=-3, gap_open=-4, gap_extend=-1)
    n = 200
    base = rng.integers(0, 4, n).astype(np.int32)
    q = np.stack([base, base])
    t = q.copy()
    # a couple of mutations keep it interesting without breaking the run
    t[0, 50] = (t[0, 50] + 1) % 4
    qlen = np.full(2, n, np.int32)
    out = strip_bucket(
        q, t, qlen, qlen, sentinel_table(sp), mode="local",
        gap_open=sp.gap_open, gap_extend=sp.gap_extend,
    )
    for b in range(2):
        ref = sw_affine(q[b], t[b], sp)
        got = (out["score"][b], out["qs"][b], out["qe"][b],
               out["ts"][b], out["te"][b])
        want = (ref.score, ref.query_start, ref.query_end,
                ref.target_start, ref.target_end)
        assert got == want, (b, got, want)
        assert out["qe"][b] - out["qs"][b] > 128  # escalation actually hit


def test_local_coords_are_reverse_canonical(rng):
    """The canonical start maximizes (qs, ts) among optimal starts: build a
    tie case with two optimal hits of the same end-anchored score."""
    sp = ScoringParams.linear(match=2, mismatch=-3, gap=-2)
    # q = AC, t = ACxxAC: end tie-break picks the FIRST end (te=2);
    # the start of that alignment is (0, 0) — degenerate but explicit.
    from seqalib_tpu.types import encode_dna

    q = encode_dna("AC")
    t = encode_dna("ACGGAC")
    r = sw_linear(q, t, sp)
    assert (r.query_start, r.query_end, r.target_start, r.target_end) == (
        0, 2, 0, 2,
    )
    got = align_batch([q], [t], scoring=sp, mode="local", backend="xla")[0]
    assert str(got) == str(r)


def test_fused_pass2_never_overestimates(rng):
    """Pass-2 extension values must be exact-or-underestimates of the local
    score (the escalation gate's soundness).  Regression: dropping the
    emode mask once let pltpu.roll's CIRCULAR wraparound teleport a real
    neighbor value across the slot window and read score2 = score + 1.
    Truncated-row-window self-alignments (span > WR) stress the window
    edges."""
    import jax

    from seqalib_tpu.ops.strip_pallas import (
        LANES, TI, _ceil_to, _strip_local_fused,
    )
    from seqalib_tpu.parallel.dispatch import sentinel_table

    sp = ScoringParams.affine(match=2, mismatch=-3, gap_open=-4, gap_extend=-1)
    table_h = sentinel_table(sp)
    A1 = int(table_h.shape[0])
    B, L = 8, 384
    base = rng.integers(0, 4, L).astype(np.int32)
    q = np.stack([base] * B)
    t = q.copy()
    for b in range(B):  # a few mutations per pair
        idx = rng.choice(L, 6, replace=False)
        t[b, idx] = (t[b, idx] + 1) % 4
    n_pad = _ceil_to(L, TI)
    W2 = (_ceil_to(L, LANES) // LANES + 2) * LANES
    qpad = np.full((B, n_pad), A1, np.int32)
    qpad[:, :L] = q
    t2 = np.full((B, W2), A1 + 1, np.int32)
    t2[:, 1 : 1 + L] = t
    out = jax.jit(
        lambda *a: _strip_local_fused(
            *a, BSUB=8, mq=L, match=2, mismatch=-3, gap_open=-4,
            gap_extend=-1, affine=True, profile=False, packed=False, A1=A1,
            dt16=False, interpret=True, WR=128, pass2="banded", bw=64,
        )
    )(qpad, t2, np.full(B, L, np.int32), np.full(B, L, np.int32), table_h)
    score = np.asarray(out["score"])
    score2 = np.asarray(out["score2"])
    assert (score2 <= score).all(), (score2, score)
    # span ~L > WR=128: the truncated window must undershoot -> escalate
    assert (score2 < score).all()


def test_banded_local_raises_uniformly():
    """band= with mode="local" is out of contract; every backend raises
    the same API-level ValueError (the backends used to disagree:
    oracle ignored the band, xla ran full-matrix masked, pallas raised
    deep in the kernel — VERDICT.md round-3 weak 7)."""
    import pytest

    from seqalib_tpu import align, align_batch
    from seqalib_tpu.types import ScoringParams

    sp = ScoringParams.affine()
    q = np.array([0, 1, 2, 3], np.uint8)
    t = np.array([0, 1, 1, 3], np.uint8)
    for backend in ("oracle", "xla", "pallas"):
        with pytest.raises(ValueError, match="banded local"):
            align(q, t, sp, mode="local", band=4, backend=backend)
        with pytest.raises(ValueError, match="banded local"):
            align_batch([q], [t], sp, mode="local", band=4, backend=backend)
