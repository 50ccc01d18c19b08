"""NSUB-invariance of the fused pass-2 banded kernel.

`band_fill_range`'s substep-unroll factor (the `nsub` static arg, tuned
to 32 on-chip) must never change values — only schedule.  The CPU suite
otherwise exercises only the interpret-mode default (4), so this pins
the tuned factor's semantics without the chip (SURVEY.md §4.2 kernel
parity strategy).

The env knob is trace-time and NOT in the outer jit cache key, so the
sweep here calls the un-jitted `_strip_local_fused` directly: the env
read happens per call, and `nsub` IS a static key of the inner
`band_fill_range` jit.
"""

import numpy as np
import pytest

from seqalib_tpu import ScoringParams
from seqalib_tpu.ops.strip_pallas import (
    LANES,
    TI,
    _ceil_to,
    _strip_local_fused,
)
from seqalib_tpu.parallel.dispatch import sentinel_table


def _fused_args(rng, B=4, L=96):
    import jax.numpy as jnp

    sp = ScoringParams.blosum62()
    table_h = sentinel_table(sp)
    A1 = int(table_h.shape[0])
    q = rng.integers(0, 20, size=(B, L)).astype(np.int32)
    t = rng.integers(0, 20, size=(B, L)).astype(np.int32)
    n_pad = _ceil_to(L, TI)
    W2 = (_ceil_to(L, LANES) // LANES + 2) * LANES
    qpad = np.full((B, n_pad), A1, np.int32)
    qpad[:, :L] = q
    t2 = np.full((B, W2), A1 + 1, np.int32)
    t2[:, 1 : 1 + L] = t
    args = (
        jnp.asarray(qpad),
        jnp.asarray(t2),
        jnp.asarray(np.full(B, L, np.int32)),
        jnp.asarray(np.full(B, L, np.int32)),
        jnp.asarray(table_h),
    )
    kw = dict(
        BSUB=B,
        mq=L,
        match=int(table_h[0, 0]),
        mismatch=int(table_h[0, 1]),
        gap_open=sp.gap_open,
        gap_extend=sp.gap_extend,
        affine=True,
        profile=True,
        packed=True,
        A1=A1,
        dt16=False,
        interpret=True,
    )
    return args, kw


@pytest.mark.parametrize(
    "nsub,L",
    [
        (1, 96),
        (8, 96),
        (32, 96),
        # non-default geometries (VERDICT round-4 item 10): L=200 -> the
        # chunked steady path; L=328 -> n_pad=384 and WR clamped to 384,
        # a NON-power-of-two width (the Mosaic dynamic-negative-roll
        # regression class that silently miscompiled in round 3)
        (8, 200),
        (8, 328),
    ],
)
def test_fused_pass2_nsub_invariant(nsub, L):
    # nsub is passed as the EXPLICIT static arg, never via env: the env
    # form was read at trace time without entering the jit cache key, so
    # the second call below was a silent cache hit and the test vacuous
    rng = np.random.default_rng(11)
    args, kw = _fused_args(rng, L=L)
    ref = _strip_local_fused(*args, **kw, pass2="banded")
    out = _strip_local_fused(*args, **kw, pass2="banded", nsub=nsub)
    for key in ("score", "qe", "te", "qs", "ts", "score2"):
        np.testing.assert_array_equal(
            np.asarray(out[key]), np.asarray(ref[key]), err_msg=key
        )
