"""Anti-diagonal wavefront DP in pure JAX (lax.scan) — the `xla` backend.

TPU-native re-design of the reference's row-major DP loops
(SeqALib ``NeedlemanWunschSA::buildMatrix`` etc., SURVEY.md §3.1): instead of
a sequential double loop, every cell of an anti-diagonal is computed at once
as a vector op, batched across pairs (SURVEY.md §1.2 layer 4 semantics, here
expressed in XLA; the Pallas kernels share this exact formulation).

Bit-exactness contract (vs seqalib_tpu.oracle):
  * identical max-cascade tie-breaks (DIAG > UP(F) > LEFT(E); extend >= open);
  * identical local-mode stop rule (candidate <= 0 -> 0/STOP) and argmax
    tie-break (smallest i, then smallest j);
  * banded: out-of-band lanes are forced to exactly NEG_INF each diagonal,
    reproducing the oracle's skipped-cell semantics.

Diagonal-index layout: diagonal k holds cells (i, j=k-i) in a dense vector
indexed by i in [0, Lq]; target letters for a diagonal are a contiguous
window of the reversed target (host pre-reversal trick, SURVEY.md §7).
Lanes beyond the wavefront hold ~NEG_INF junk whose drift is bounded by
(n+m)*max|score| << |NEG_INF|, so it can never win a max against any real
candidate (see SURVEY.md §7 "Dtype/overflow").
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..types import NEG_INF, PTR_DIAG, PTR_LEFT, PTR_STOP, PTR_UP
from ..utils.cigar import OP_D, OP_I, OP_M, OP_PAD

# Packed pointer byte: bits 0-1 = H provenance, bit 2 = E-extend, bit 3 = F-extend.
_EXT_E_BIT = 2
_EXT_F_BIT = 3


def _shift1(x, fill):
    """y[..., i] = x[..., i-1]; y[..., 0] = fill."""
    return jnp.concatenate(
        [jnp.full(x.shape[:-1] + (1,), fill, x.dtype), x[..., :-1]], axis=-1
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "mode",
        "gap_open",
        "gap_extend",
        "band",
        "affine",
        "want_tb",
    ),
)
def wavefront_bucket(
    q: jax.Array,  # (B, Lq) int32 codes, padded with any valid code
    t: jax.Array,  # (B, Lt) int32 codes
    qlen: jax.Array,  # (B,) int32 true lengths
    tlen: jax.Array,  # (B,) int32
    table: jax.Array,  # (A1, A1) int32 substitution, sentinel row/col = last
    *,
    mode: str,
    gap_open: int,
    gap_extend: int,
    band: Optional[int],
    affine: bool,
    want_tb: bool,
):
    """Run the wavefront DP over one padded bucket; returns result arrays.

    Returns dict with:
      score (B,) i32; qs/qe/ts/te (B,) i32;
      ops_rev (B, Lq+Lt) u8 traceback ops in end->start order, OP_PAD padded
      (only when want_tb).
    """
    B, Lq = q.shape
    Lt = t.shape[1]
    n, m = Lq, Lt
    N1 = n + 1
    K = n + m + 1
    o, e = gap_open, gap_extend
    g = gap_extend  # linear gap
    A1 = table.shape[0]
    SENT = A1 - 1
    local = mode == "local"
    table_flat = table.reshape(-1)

    NEG = jnp.int32(NEG_INF)
    iarr = jnp.arange(N1, dtype=jnp.int32)  # slot index i

    # Reversed-window target: REV[b, p] = t[b, n+m-p] (sentinel outside).
    REV = jnp.full((B, 2 * n + m + 2), SENT, dtype=jnp.int32)
    REV = jax.lax.dynamic_update_slice(
        REV, jnp.flip(t, axis=1).astype(jnp.int32), (0, n + 1)
    )
    # check: slice starts at n+m-Lt+1 = n+1 since Lt == m.
    qpad = jnp.concatenate(
        [jnp.full((B, 1), SENT, jnp.int32), q.astype(jnp.int32)], axis=1
    )  # qpad[i] = q[i-1]

    if band is not None:
        delta = tlen - qlen
        dlo = jnp.minimum(0, delta) - band  # (B,)
        dhi = jnp.maximum(0, delta) + band

    def band_mask_apply(k, *arrs):
        """Force out-of-band slots to exactly NEG_INF (oracle semantics)."""
        if band is None:
            return arrs
        dkj = k - 2 * iarr[None, :]  # j - i per slot, (1, N1) vs (B, 1)
        out = (dkj < dlo[:, None]) | (dkj > dhi[:, None])
        return tuple(jnp.where(out, NEG, a) for a in arrs)

    def subst_diag(k):
        """s_vec[b, i] = subst(q[i-1], t[k-i-1]) via the reversed window."""
        W = jax.lax.dynamic_slice(REV, (0, n + m + 1 - k), (B, N1))
        idx = qpad * A1 + W
        return jnp.take(table_flat, idx, axis=0)

    # ------------------------------------------------------------------ fill
    # Local-mode start tracking: each cell carries the packed (i, j) of the
    # STOP cell its optimal path begins at, propagated along the same
    # pointers the traceback would follow (stride m+1 packing).
    stride = m + 1

    def pack_ij(k):
        # packed (i, j=k-i) per slot; junk for out-of-wavefront slots (masked).
        return iarr[None, :] * stride + (k - iarr[None, :])

    if not affine:

        def body(carry, k):
            H1, H2, SH1, SH2, score, bv, bk, bs = carry
            s_vec = subst_diag(k)
            d = _shift1(H2, NEG) + s_vec
            u = _shift1(H1, NEG) + g
            l = H1 + g
            best = jnp.maximum(jnp.maximum(d, u), l)
            ptr = jnp.where(
                d == best,
                PTR_DIAG,
                jnp.where(u == best, PTR_UP, PTR_LEFT),
            ).astype(jnp.uint8)
            if local:
                stop = best <= 0
                Hn = jnp.where(stop, 0, best)
                ptr = jnp.where(stop, PTR_STOP, ptr).astype(jnp.uint8)
            else:
                Hn = best
            # boundaries: i == 0 (cell (0, k)) and i == k (cell (k, 0))
            bmask = (iarr[None, :] == 0) | (iarr[None, :] == k)
            if local:
                Hn = jnp.where(bmask, 0, Hn)
                ptr = jnp.where(bmask, PTR_STOP, ptr).astype(jnp.uint8)
                SHn = jnp.where(
                    ptr[:] == PTR_DIAG,
                    _shift1(SH2, 0),
                    jnp.where(ptr[:] == PTR_UP, _shift1(SH1, 0), SH1),
                )
                SHn = jnp.where(ptr[:] == PTR_STOP, pack_ij(k), SHn)
            else:
                Hn = jnp.where(bmask, k * g, Hn)
                bptr = jnp.where(iarr[None, :] == 0, PTR_LEFT, PTR_UP)
                bptr = jnp.where(k == 0, PTR_STOP, bptr)
                ptr = jnp.where(bmask, bptr, ptr).astype(jnp.uint8)
                SHn = SH1
            (Hn,) = band_mask_apply(k, Hn)

            if local:
                j = k - iarr[None, :]
                valid = (
                    (iarr[None, :] >= 1)
                    & (iarr[None, :] <= qlen[:, None])
                    & (j >= 1)
                    & (j <= tlen[:, None])
                )
                v = jnp.where(valid, Hn, 0)
                upd = v > bv
                bv = jnp.where(upd, v, bv)
                bk = jnp.where(upd, k, bk)
                bs = jnp.where(upd, SHn, bs)
            else:
                fin = k == (qlen + tlen)
                sc_k = jnp.take_along_axis(Hn, qlen[:, None], axis=1)[:, 0]
                score = jnp.where(fin, sc_k, score)
            ys = ptr if want_tb else None
            return (Hn, H1, SHn, SH1, score, bv, bk, bs), ys

        init = (
            jnp.full((B, N1), NEG, jnp.int32),
            jnp.full((B, N1), NEG, jnp.int32),
            jnp.zeros((B, N1), jnp.int32),
            jnp.zeros((B, N1), jnp.int32),
            jnp.zeros((B,), jnp.int32),
            jnp.zeros((B, N1), jnp.int32),
            jnp.zeros((B, N1), jnp.int32),
            jnp.zeros((B, N1), jnp.int32),
        )
        (H1, _, _, _, score, bv, bk, bs), P = jax.lax.scan(
            body, init, jnp.arange(K, dtype=jnp.int32)
        )
    else:

        def body(carry, k):
            H1, H2, E1, F1, SH1, SH2, SE1, SF1, score, bv, bk, bs = carry
            s_vec = subst_diag(k)
            E_ext = E1 + e
            E_opn = H1 + o + e
            ext_e = E_ext >= E_opn  # tie-break: extend > open
            En = jnp.maximum(E_ext, E_opn)
            F_ext = _shift1(F1, NEG) + e
            F_opn = _shift1(H1, NEG) + o + e
            ext_f = F_ext >= F_opn
            Fn = jnp.maximum(F_ext, F_opn)
            d = _shift1(H2, NEG) + s_vec
            best = jnp.maximum(jnp.maximum(d, Fn), En)
            ptr = jnp.where(
                d == best,
                PTR_DIAG,
                jnp.where(Fn == best, PTR_UP, PTR_LEFT),
            )
            if local:
                stop = best <= 0
                Hn = jnp.where(stop, 0, best)
                ptr = jnp.where(stop, PTR_STOP, ptr)
            else:
                Hn = best
            # k == 0 origin: H[0,0] = 0, ptr STOP (slot 0 only)
            origin = (k == 0) & (iarr[None, :] == 0)
            Hn = jnp.where(origin, 0, Hn)
            ptr = jnp.where(origin, PTR_STOP, ptr)
            if local:
                bmask = (iarr[None, :] == 0) | (iarr[None, :] == k)
                Hn = jnp.where(bmask, 0, Hn)
                ptr = jnp.where(bmask, PTR_STOP, ptr)
                SEn = jnp.where(ext_e, SE1, SH1)
                SFn = jnp.where(ext_f, _shift1(SF1, 0), _shift1(SH1, 0))
                SHn = jnp.where(
                    ptr == PTR_DIAG,
                    _shift1(SH2, 0),
                    jnp.where(ptr == PTR_UP, SFn, SEn),
                )
                SHn = jnp.where(ptr == PTR_STOP, pack_ij(k), SHn)
            else:
                SEn, SFn, SHn = SE1, SF1, SH1
            Hn, En, Fn = band_mask_apply(k, Hn, En, Fn)

            if local:
                j = k - iarr[None, :]
                valid = (
                    (iarr[None, :] >= 1)
                    & (iarr[None, :] <= qlen[:, None])
                    & (j >= 1)
                    & (j <= tlen[:, None])
                )
                v = jnp.where(valid, Hn, 0)
                upd = v > bv
                bv = jnp.where(upd, v, bv)
                bk = jnp.where(upd, k, bk)
                bs = jnp.where(upd, SHn, bs)
            else:
                fin = k == (qlen + tlen)
                sc_k = jnp.take_along_axis(Hn, qlen[:, None], axis=1)[:, 0]
                score = jnp.where(fin, sc_k, score)
            if want_tb:
                pbyte = (
                    ptr.astype(jnp.uint8)
                    | (ext_e.astype(jnp.uint8) << _EXT_E_BIT)
                    | (ext_f.astype(jnp.uint8) << _EXT_F_BIT)
                )
                ys = pbyte
            else:
                ys = None
            return (Hn, H1, En, Fn, SHn, SH1, SEn, SFn, score, bv, bk, bs), ys

        init = (
            jnp.full((B, N1), NEG, jnp.int32),
            jnp.full((B, N1), NEG, jnp.int32),
            jnp.full((B, N1), NEG, jnp.int32),
            jnp.full((B, N1), NEG, jnp.int32),
            jnp.zeros((B, N1), jnp.int32),
            jnp.zeros((B, N1), jnp.int32),
            jnp.zeros((B, N1), jnp.int32),
            jnp.zeros((B, N1), jnp.int32),
            jnp.zeros((B,), jnp.int32),
            jnp.zeros((B, N1), jnp.int32),
            jnp.zeros((B, N1), jnp.int32),
            jnp.zeros((B, N1), jnp.int32),
        )
        (H1, _, _, _, _, _, _, _, score, bv, bk, bs), P = jax.lax.scan(
            body, init, jnp.arange(K, dtype=jnp.int32)
        )

    # ------------------------------------------------------------- coords
    if local:
        # per-slot bests -> global argmax with smallest-i, then smallest-j.
        maxv = jnp.max(bv, axis=1)  # (B,)
        big = jnp.int32(1 << 30)
        cand_i = jnp.where(bv == maxv[:, None], iarr[None, :], big)
        bi = jnp.min(cand_i, axis=1).astype(jnp.int32)
        bkk = jnp.take_along_axis(bk, bi[:, None], axis=1)[:, 0]
        bj = bkk - bi
        score = maxv
        empty = score <= 0
        bi = jnp.where(empty, 0, bi)
        bj = jnp.where(empty, 0, bj)
        start_i, start_j = bi, bj
        qe, te = bi, bj
        # propagated start of the optimal path (== traceback's landing cell)
        ps = jnp.take_along_axis(bs, bi[:, None], axis=1)[:, 0]
        si = jnp.where(empty, 0, ps // stride)
        sj = jnp.where(empty, 0, ps % stride)
    else:
        start_i, start_j = qlen, tlen
        qe, te = qlen, tlen
        si = jnp.zeros_like(score)
        sj = jnp.zeros_like(score)

    out = {"score": score, "qe": qe, "te": te}

    if not want_tb:
        out["qs"] = si
        out["ts"] = sj
        return out

    # --------------------------------------------------------- traceback
    # P: (K, B, N1) uint8; gather per pair at flat index (i+j)*B*N1 + b*N1 + i
    P_flat = P.reshape(-1)
    barr = jnp.arange(B, dtype=jnp.int32)
    if local:
        done0 = score <= 0
    else:
        done0 = jnp.zeros((B,), bool)

    def cell_byte(i, j):
        idx = (i + j) * (B * N1) + barr * N1 + i
        return jnp.take(P_flat, idx, axis=0)

    if not affine:

        def tb_body(carry, _):
            i, j, done = carry
            p = cell_byte(i, j) & 3
            stop = p == PTR_STOP
            done_n = done | stop
            act = ~done_n
            is_d = act & (p == PTR_DIAG)
            is_u = act & (p == PTR_UP)
            is_l = act & (p == PTR_LEFT)
            op = jnp.where(
                is_d, OP_M, jnp.where(is_u, OP_I, jnp.where(is_l, OP_D, OP_PAD))
            ).astype(jnp.uint8)
            i = i - (is_d | is_u).astype(jnp.int32)
            j = j - (is_d | is_l).astype(jnp.int32)
            return (i, j, done_n), op

        (fi, fj, _), ops_rev = jax.lax.scan(
            tb_body, (start_i, start_j, done0), None, length=n + m
        )
    else:
        ST_H, ST_E, ST_F = 0, 1, 2

        def tb_body(carry, _):
            i, j, st, done = carry
            byte = cell_byte(i, j)
            ph = (byte & 3).astype(jnp.int32)
            ext_e = ((byte >> _EXT_E_BIT) & 1).astype(bool)
            ext_f = ((byte >> _EXT_F_BIT) & 1).astype(bool)
            in_h = st == ST_H
            stop = in_h & (ph == PTR_STOP)
            done_n = done | stop
            act = ~done_n
            act_m = act & in_h & (ph == PTR_DIAG)
            act_i = act & ((in_h & (ph == PTR_UP)) | (st == ST_F))
            act_d = act & ((in_h & (ph == PTR_LEFT)) | (st == ST_E))
            op = jnp.where(
                act_m, OP_M, jnp.where(act_i, OP_I, jnp.where(act_d, OP_D, OP_PAD))
            ).astype(jnp.uint8)
            st_n = jnp.where(
                act_m,
                ST_H,
                jnp.where(
                    act_i,
                    jnp.where(ext_f, ST_F, ST_H),
                    jnp.where(act_d, jnp.where(ext_e, ST_E, ST_H), st),
                ),
            )
            i = i - (act_m | act_i).astype(jnp.int32)
            j = j - (act_m | act_d).astype(jnp.int32)
            return (i, j, st_n, done_n), op

        st0 = jnp.zeros((B,), jnp.int32)
        (fi, fj, _, _), ops_rev = jax.lax.scan(
            tb_body, (start_i, start_j, st0, done0), None, length=n + m
        )

    out["qs"] = fi
    out["ts"] = fj
    out["ops_rev"] = ops_rev.T  # (B, n+m), end->start order
    return out
