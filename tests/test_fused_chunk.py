"""Large-batch chunking of the fused pass-2 banded kernel.

`band_fill_range` holds its whole batch resident in VMEM (it has no
batch grid dimension), so an unchunked fused pass-2 at B=512 exceeded
the 16MB scoped-vmem limit on-chip (measured 16.89M — the config-5
at-scale blocker, VERDICT.md round-2 missing #2).  `_strip_local_fused`
now runs the pass-2 extension in <=128-pair slices via lax.map when
B > 128, padding the tail with empty pairs.  These tests pin that the
chunked path (including a non-multiple-of-128 batch, i.e. real tail
padding) returns bit-identical results to independent small-batch runs.
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


def _fused_args(rng, B, L, protein):
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
        BSUB=8,
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


KEYS = ("score", "qe", "te", "qs", "ts", "score2")


@pytest.mark.parametrize(
    "protein,B,L",
    [
        (True, 160, 72),
        (True, 256, 72),
        (False, 160, 72),
        (False, 256, 72),
        # L=328: n_pad=384 / WR clamped to 384, a NON-power-of-two width
        # (Mosaic negative-roll regression class, VERDICT round-4 item 10)
        (True, 160, 328),
    ],
)
def test_fused_pass2_chunked_batch_matches_small_batches(protein, B, L):
    # B=160 exercises the padded tail (Bp=256, 96 empty pad pairs);
    # B=256 the exact-multiple path.  L=72 keeps interpret mode fast.
    rng = np.random.default_rng(7)
    args, kw = _fused_args(rng, B=B, L=L, protein=protein)
    big = _strip_local_fused(*args, **kw, pass2="banded")
    halves = []
    H = B // 2  # 80 / 128: both <= 128, i.e. both take the unchunked path
    for lo in (0, H):
        sub = tuple(
            a[lo : lo + H] if a.ndim and a.shape[0] == B else a for a in args
        )
        halves.append(_strip_local_fused(*sub, **kw, pass2="banded"))
    for key in KEYS:
        ref = np.concatenate(
            [np.asarray(h[key]) for h in halves], axis=0
        )
        np.testing.assert_array_equal(np.asarray(big[key]), ref, err_msg=key)
    assert (np.asarray(big["score"]) > 0).any()
