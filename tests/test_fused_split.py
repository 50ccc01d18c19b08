"""Split-steady invariance of the fused pass-2 banded kernel.

`_strip_local_fused` can split the pass-2 extension fill into a generic
chunk-0 call plus a `steady=True` remainder whose ihat deltas are STATIC
per unrolled substep (parity of k), letting half the `pltpu.roll`s fold
to no-ops and the redundant window top-ups drop out entirely
(banded_pallas._band_kernel substep).  That specialization must never
change values — only the schedule.  Round 2 shipped it default-off and
untested (ADVICE.md round-2 item 1); worse, the static negative roll
shifts crashed at real-TPU lowering ("shift must be non-negative") while
interpret mode accepted them, so this suite pins both the values and —
via test_tpu_smoke's fused coords path once SPLIT is default-on — the
lowering.
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


def _fused_args(rng, B=4, L=200, protein=True):
    import jax.numpy as jnp

    sp = (
        ScoringParams.blosum62()
        if protein
        else ScoringParams(match=2, mismatch=-3, gap_open=-5, gap_extend=-2)
    )
    table_h = sentinel_table(sp)
    A1 = int(table_h.shape[0])
    alpha = 20 if protein else 4
    q = rng.integers(0, alpha, size=(B, L)).astype(np.int32)
    t = rng.integers(0, alpha, size=(B, L)).astype(np.int32)
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
    profile = bool(A1 > 8)
    kw = dict(
        BSUB=B,
        mq=L,
        match=int(table_h[0, 0]),
        mismatch=int(table_h[0, 1]),
        gap_open=sp.gap_open,
        gap_extend=sp.gap_extend,
        affine=True,
        profile=profile,
        packed=profile,
        A1=A1,
        dt16=False,
        interpret=True,
    )
    return args, kw


@pytest.mark.parametrize(
    "protein,nsub,L",
    [
        (True, 2, 200),
        (True, 4, 200),
        (True, 8, 200),
        (False, 2, 200),
        (False, 4, 200),
        (False, 8, 200),
        # L=328: n_pad=384 / WR=384, a NON-power-of-two width — the
        # Mosaic dynamic-negative-roll regression class (VERDICT
        # round-4 item 10)
        (True, 4, 328),
        (False, 4, 328),
    ],
)
def test_fused_pass2_split_steady_invariant(protein, nsub, L):
    # L=200 makes Kp = 640 > CKb = 128: the split path covers 4 steady
    # chunks (both d1-parity skip branches execute many times).  split
    # and nsub are EXPLICIT static args, never env: the env form was
    # read at trace time without entering the jit cache key, so the
    # split=1 call was a silent cache hit and the test vacuous.
    rng = np.random.default_rng(23)
    args, kw = _fused_args(rng, protein=protein, L=L)
    ref = _strip_local_fused(*args, **kw, pass2="banded", nsub=nsub,
                             split=False)
    out = _strip_local_fused(*args, **kw, pass2="banded", nsub=nsub,
                             split=True)
    for key in ("score", "qe", "te", "qs", "ts", "score2"):
        np.testing.assert_array_equal(
            np.asarray(out[key]), np.asarray(ref[key]), err_msg=key
        )
    # the runs must have produced real local alignments (score > 0) or
    # the invariance proves nothing
    assert (np.asarray(ref["score"]) > 0).all()
