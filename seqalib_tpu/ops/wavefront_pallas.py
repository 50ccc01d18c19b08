"""Pallas TPU anti-diagonal wavefront DP kernels — the `pallas` backend.

TPU-native core of the engine (BASELINE.json:5 "Pallas anti-diagonal
wavefront DP kernels ... vectorize the diagonal fill across lanes"): the
re-design of the reference's sequential C++ DP loops (SeqALib
``NeedlemanWunschSA::buildMatrix`` et al., SURVEY.md §3.1).

Layout
------
Diagonal state vectors are ``(B, Np)`` int32: pair index on sublanes,
anti-diagonal cell index i (query position) on lanes (``Np`` = N1 rounded to
the 128-lane boundary).  The wavefront loop carries its state (H/E/F rolling
diagonals, the target-letter window, local-best trackers) as SSA loop-carry
values, processing ``NSUB`` diagonals per loop iteration so consecutive
diagonals pass state in registers; only the live subset for the requested
config (mode x affine x traceback) is carried at all.

Two structures:
* score/coords path (``want_tb=False``): ONE grid step, no scratch — the
  entire fill is a single fori_loop; nothing but inputs/outputs touches HBM.
* traceback path: 1-D grid over ``TK``-diagonal chunks; carries persist in
  VMEM scratch across sequential TPU grid steps; packed pointers (2 bits
  linear, 4 bits affine, int8 carrier) stream VMEM->HBM through the output
  BlockSpec pipeline one ``(TK, B, Np)`` block per step — the pointer matrix
  never sits in VMEM whole (SURVEY.md §7 "Traceback memory").

Substitution scoring
--------------------
* scalar match/mismatch (DNA): in-kernel compare of the query vector
  against the rolling target-letter window — zero gathers, scores are
  compile-time constants.
* substitution matrix (BLOSUM62): in-kernel Mosaic ``dynamic_gather``
  (sublane-axis ``take_along_axis``), the only gather form the TPU VPU
  supports natively (within one 8-sublane vreg for int32).  The query
  profile is laid out per pair as four 8-letter banks
  ``prof[b*32 + a, i] = table[q[b, i-1], a]`` and the bank select is a
  3-deep ``jnp.where`` cascade on the target letter's high bits.

Traceback
---------
Pointer-chasing is scalar, branchy, and gather-bound — the one part of the
problem TPUs are structurally bad at.  The fill emits the packed pointer
matrix to HBM; the walk runs host-side, vectorized across the batch
(`_host_traceback_*`).  Exact-parity semantics match seqalib_tpu.oracle
(tie-breaks DIAG > UP > LEFT, extend >= open).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import NEG_INF, PTR_DIAG, PTR_LEFT, PTR_STOP, PTR_UP
from ..utils.cigar import OP_D, OP_I, OP_M, OP_PAD

_EXT_E_BIT = 2
_EXT_F_BIT = 3

LANES = 128
SUBLANES = 8


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _shift1(x, fill):
    """y[..., i] = x[..., i-1]; y[..., 0] = fill (lane-axis shift)."""
    y = pltpu.roll(x, 1, axis=1)
    icol = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(icol == 0, fill, y)


def _carry_names(local: bool, affine: bool, want_tb: bool):
    """The live SSA-carry set for a given configuration."""
    names = ["H1", "sH", "W"]
    if affine:
        names += ["E1", "F1"]
    if local:
        names += ["BV", "BK"]
        if not want_tb:
            names += ["SH1", "sSH", "BS"]
            if affine:
                names += ["SE1", "SF1"]
    else:
        names += ["SC"]
    return names


def _fill_kernel(
    *refs,
    TK: int,
    NSUB: int,
    K: int,
    m: int,
    B: int,
    Np: int,
    mode: str,
    match: int,
    mismatch: int,
    gap_open: int,
    gap_extend: int,
    band: Optional[int],
    affine: bool,
    want_tb: bool,
    profile: bool,
    single_step: bool,
):
    local = mode == "local"
    names = _carry_names(local, affine, want_tb)

    it = iter(refs)
    qpad_ref = next(it)
    tk_ref = next(it)
    qlenc_ref = next(it)
    tlenc_ref = next(it)
    prof_ref = next(it) if profile else None
    score_ref = next(it)
    bk_ref = next(it) if local else None
    bs_ref = next(it) if (local and not want_tb) else None
    ptr_ref = next(it) if want_tb else None
    scratch_refs = list(it)  # one per carry name (multi-step only)

    g = pl.program_id(0) if not single_step else 0
    o, e = gap_open, gap_extend
    NEG = jnp.int32(NEG_INF)
    iarr = jax.lax.broadcasted_iota(jnp.int32, (B, Np), 1)
    qlenv = qlenc_ref[:, 0:1]  # (B, 1)
    tlenv = tlenc_ref[:, 0:1]
    stride = m + 1

    if band is not None:
        delta = tlenv - qlenv
        dlo = jnp.minimum(0, delta) - band
        dhi = jnp.maximum(0, delta) + band

    def subst(w):
        """Vector of substitution scores s(q[i-1], t[k-i-1]) per slot."""
        if not profile:
            return jnp.where(
                qpad_ref[:] == w, jnp.int32(match), jnp.int32(mismatch)
            )
        lo = w & 7
        hi = w >> 3
        rows = []
        for b in range(B):
            idx = jnp.broadcast_to(lo[b, :].reshape(1, Np), (SUBLANES, Np))
            gats = [
                jnp.take_along_axis(
                    prof_ref[
                        b * 32 + bank * SUBLANES : b * 32 + (bank + 1) * SUBLANES, :
                    ],
                    idx,
                    axis=0,
                )[0:1, :]
                for bank in range(4)
            ]
            hb = hi[b, :].reshape(1, Np)
            rows.append(
                jnp.where(
                    hb == 0,
                    gats[0],
                    jnp.where(hb == 1, gats[1], jnp.where(hb == 2, gats[2], gats[3])),
                )
            )
        return jnp.concatenate(rows, axis=0)

    # hoisted invariants
    valid_i = (iarr >= 1) & (iarr <= qlenv)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (B, LANES), 1)
    i0mask = iarr == 0

    def substep(k, st):
        """One anti-diagonal; st is a dict of live SSA values."""
        H1, sH, W = st["H1"], st["sH"], st["W"]
        live = k < K  # folded into result masks; junk beyond K is harmless

        # target window: W[b, i] = t[b, k-i-1].  Minor-dim loads must be
        # 128-aligned: load the aligned block, mask-reduce the lane out.
        off = pl.multiple_of((k // LANES) * LANES, LANES)
        blk = tk_ref[:, pl.ds(off, LANES)]  # (B, 128)
        tcol = jnp.sum(
            jnp.where(lane128 == (k - off), blk, 0), axis=1, keepdims=True
        )  # (B, 1) = t[:, k-1]
        W = _shift1(W, 0)
        W = jnp.where(i0mask, jnp.broadcast_to(tcol, (B, Np)), W)
        s_vec = subst(W)

        sH1 = _shift1(H1, NEG)  # shift1 of this diagonal's H[k-1]
        d = sH + s_vec  # sH == shift1(H[k-2])
        if not affine:
            gg = jnp.int32(e)
            u = sH1 + gg
            l = H1 + gg
            best = jnp.maximum(jnp.maximum(d, u), l)
            ptr = jnp.where(
                d == best, PTR_DIAG, jnp.where(u == best, PTR_UP, PTR_LEFT)
            )
            ext_e = ext_f = None
        else:
            oe = jnp.int32(o + e)
            E_ext = st["E1"] + e
            E_opn = H1 + oe
            ext_e = E_ext >= E_opn  # tie-break: extend > open
            En = jnp.maximum(E_ext, E_opn)
            F_ext = _shift1(st["F1"], NEG) + e
            F_opn = sH1 + oe
            ext_f = F_ext >= F_opn
            Fn = jnp.maximum(F_ext, F_opn)
            best = jnp.maximum(jnp.maximum(d, Fn), En)
            ptr = jnp.where(
                d == best, PTR_DIAG, jnp.where(Fn == best, PTR_UP, PTR_LEFT)
            )

        if local:
            stop = best <= 0
            Hn = jnp.where(stop, 0, best)
            ptr = jnp.where(stop, PTR_STOP, ptr)
        else:
            Hn = best

        # boundary cells (i == 0 -> (0, k); i == k -> (k, 0))
        bmask = i0mask | (iarr == k)
        if not affine:
            if local:
                Hn = jnp.where(bmask, 0, Hn)
                ptr = jnp.where(bmask, PTR_STOP, ptr)
            else:
                Hn = jnp.where(bmask, k * jnp.int32(e), Hn)
                bptr = jnp.where(i0mask, PTR_LEFT, PTR_UP)
                bptr = jnp.where(k == 0, PTR_STOP, bptr)
                ptr = jnp.where(bmask, bptr, ptr)
        else:
            origin = (k == 0) & i0mask
            Hn = jnp.where(origin, 0, Hn)
            ptr = jnp.where(origin, PTR_STOP, ptr)
            if local:
                Hn = jnp.where(bmask, 0, Hn)
                ptr = jnp.where(bmask, PTR_STOP, ptr)

        nxt = {"H1": Hn, "sH": sH1, "W": W}

        # local-mode start propagation (score/coords path only; the
        # traceback path recovers starts from the pointer walk)
        if local and not want_tb:
            pack = iarr * stride + (k - iarr)
            sSH1 = _shift1(st["SH1"], 0)
            if affine:
                SEn = jnp.where(ext_e, st["SE1"], st["SH1"])
                SFn = jnp.where(ext_f, _shift1(st["SF1"], 0), sSH1)
                SHn = jnp.where(
                    ptr == PTR_DIAG,
                    st["sSH"],
                    jnp.where(ptr == PTR_UP, SFn, SEn),
                )
                nxt["SE1"] = SEn
                nxt["SF1"] = SFn
            else:
                SHn = jnp.where(
                    ptr == PTR_DIAG,
                    st["sSH"],
                    jnp.where(ptr == PTR_UP, sSH1, st["SH1"]),
                )
            SHn = jnp.where(ptr == PTR_STOP, pack, SHn)
            nxt["SH1"] = SHn
            nxt["sSH"] = sSH1

        if band is not None:
            dkj = k - 2 * iarr
            out_of_band = (dkj < dlo) | (dkj > dhi)
            Hn = jnp.where(out_of_band, NEG, Hn)
            nxt["H1"] = Hn
            if affine:
                En = jnp.where(out_of_band, NEG, En)
                Fn = jnp.where(out_of_band, NEG, Fn)

        if affine:
            nxt["E1"] = En
            nxt["F1"] = Fn

        # -- result tracking (masked with `live` so beyond-K junk is inert)
        if local:
            valid = valid_i & (iarr <= k - 1) & (iarr >= k - tlenv) & live
            v = jnp.where(valid, Hn, 0)
            upd = v > st["BV"]
            nxt["BV"] = jnp.where(upd, v, st["BV"])
            nxt["BK"] = jnp.where(upd, k, st["BK"])
            if not want_tb:
                nxt["BS"] = jnp.where(upd, nxt["SH1"], st["BS"])
        else:
            fin = (k == (qlenv + tlenv)) & (iarr == qlenv) & live
            nxt["SC"] = jnp.where(fin, Hn, st["SC"])

        if want_tb:
            # pack in int32 (Mosaic can't legalize shifts on int8 vectors);
            # constant shifts become adds of 0/4 and 0/8.
            pword = ptr
            if affine:
                pword = (
                    pword
                    + ext_e.astype(jnp.int32) * (1 << _EXT_E_BIT)
                    + ext_f.astype(jnp.int32) * (1 << _EXT_F_BIT)
                )
            ptr_ref[k - g * TK, :, :] = pword.astype(jnp.int8)

        return nxt

    def group(gi, st_tuple):
        st = dict(zip(names, st_tuple))
        k0 = g * TK + gi * NSUB
        for u in range(NSUB):
            st = substep(k0 + u, st)
        return tuple(st[nm] for nm in names)

    def init_values():
        vals = {}
        for nm in names:
            fill = NEG if nm in ("H1", "sH", "E1", "F1") else jnp.int32(0)
            vals[nm] = jnp.full((B, Np), fill, jnp.int32)
        return tuple(vals[nm] for nm in names)

    if single_step:
        st0 = init_values()
        stN = jax.lax.fori_loop(0, TK // NSUB, group, st0)
    else:

        @pl.when(g == 0)
        def _init():
            for ref, val in zip(scratch_refs, init_values()):
                ref[:] = val

        st0 = tuple(ref[:] for ref in scratch_refs)
        stN = jax.lax.fori_loop(0, TK // NSUB, group, st0)
        for ref, val in zip(scratch_refs, stN):
            ref[:] = val

    st = dict(zip(names, stN))
    last = (g == pl.num_programs(0) - 1) if not single_step else True

    def _write_outputs():
        if local:
            score_ref[:] = st["BV"]
            bk_ref[:] = st["BK"]
            if not want_tb:
                bs_ref[:] = st["BS"]
        else:
            score_ref[:] = st["SC"]

    if single_step:
        _write_outputs()
    else:
        pl.when(last)(_write_outputs)


def _build_profile_banks(qpad: jax.Array, table: jax.Array, B: int, Np: int):
    """(32*B, Np) i32: prof[b*32 + a, i] = table[qpad[b, i], a].

    One-hot matmul keeps this off the pathologically slow XLA gather path.
    Table is zero-extended to 32 letters so sentinel codes score 0.
    """
    A1 = table.shape[0]
    tpad = jnp.zeros((32, 32), jnp.int32).at[:A1, :A1].set(table.astype(jnp.int32))
    qoh = jax.nn.one_hot(qpad, 32, dtype=jnp.bfloat16)  # (B, Np, 32)
    prof = jnp.einsum("bia,ac->bci", qoh, tpad.astype(jnp.bfloat16))
    return prof.astype(jnp.int32).reshape(32 * B, Np)


@functools.partial(
    jax.jit,
    static_argnames=(
        "mode",
        "match",
        "mismatch",
        "gap_open",
        "gap_extend",
        "band",
        "affine",
        "want_tb",
        "profile",
        "interpret",
    ),
)
def _fill(
    q,
    t,
    qlen,
    tlen,
    table,
    *,
    mode,
    match,
    mismatch,
    gap_open,
    gap_extend,
    band,
    affine,
    want_tb,
    profile,
    interpret,
):
    B, n = q.shape
    m = t.shape[1]
    N1 = n + 1
    Np = _ceil_to(N1, LANES)
    K = n + m + 1
    local = mode == "local"
    NSUB = 8
    single_step = not want_tb
    TK_chunk = 32  # diagonals per grid step on the traceback path
    if single_step:
        Kp = _ceil_to(K, NSUB)
        TK = Kp
        grid = (1,)
    else:
        Kp = _ceil_to(K, TK_chunk)
        TK = TK_chunk
        grid = (Kp // TK,)
    Kw = Kp + LANES
    A1 = table.shape[0]
    SENT_Q, SENT_T = A1, A1 + 1  # distinct: sentinel-vs-sentinel never matches

    qi = q.astype(jnp.int32)
    ti = t.astype(jnp.int32)
    iarr = jnp.arange(Np, dtype=jnp.int32)[None, :]
    # qpad[b, i] = q[b, i-1] for 1 <= i <= qlen else sentinel
    qpad = jnp.full((B, Np), SENT_Q, jnp.int32)
    qpad = jax.lax.dynamic_update_slice(qpad, qi[:, : Np - 1], (0, 1))
    qpad = jnp.where((iarr >= 1) & (iarr <= qlen[:, None]), qpad, SENT_Q)
    # tk[b, x] = t[b, x-1] for 1 <= x <= tlen else sentinel
    karr = jnp.arange(Kw, dtype=jnp.int32)[None, :]
    tk = jnp.full((B, Kw), SENT_T, jnp.int32)
    tk = jax.lax.dynamic_update_slice(tk, ti, (0, 1))
    tk = jnp.where((karr >= 1) & (karr <= tlen[:, None]), tk, SENT_T)

    qlenc = jnp.broadcast_to(qlen[:, None].astype(jnp.int32), (B, LANES))
    tlenc = jnp.broadcast_to(tlen[:, None].astype(jnp.int32), (B, LANES))

    kernel = functools.partial(
        _fill_kernel,
        TK=TK,
        NSUB=NSUB,
        K=K,
        m=m,
        B=B,
        Np=Np,
        mode=mode,
        match=match,
        mismatch=mismatch,
        gap_open=gap_open,
        gap_extend=gap_extend,
        band=band,
        affine=affine,
        want_tb=want_tb,
        profile=profile,
        single_step=single_step,
    )

    def cspec(shape):
        return pl.BlockSpec(shape, lambda g: (0,) * len(shape), memory_space=pltpu.VMEM)

    inputs = [qpad, tk, qlenc, tlenc]
    in_specs = [cspec((B, Np)), cspec((B, Kw)), cspec((B, LANES)), cspec((B, LANES))]
    if profile:
        prof = _build_profile_banks(qpad, table, B, Np)
        inputs.append(prof)
        in_specs.append(cspec((32 * B, Np)))

    out_shapes = [jax.ShapeDtypeStruct((B, Np), jnp.int32)]  # score / bv
    out_specs = [cspec((B, Np))]
    if local:
        out_shapes.append(jax.ShapeDtypeStruct((B, Np), jnp.int32))  # bk
        out_specs.append(cspec((B, Np)))
        if not want_tb:
            out_shapes.append(jax.ShapeDtypeStruct((B, Np), jnp.int32))  # bs
            out_specs.append(cspec((B, Np)))
    if want_tb:
        out_shapes.append(jax.ShapeDtypeStruct((Kp, B, Np), jnp.int8))
        out_specs.append(
            pl.BlockSpec((TK, B, Np), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
        )

    n_carry = len(_carry_names(local, affine, want_tb))
    scratch = (
        [] if single_step else [pltpu.VMEM((B, Np), jnp.int32) for _ in range(n_carry)]
    )

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_shape=out_shapes,
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(*inputs)
    if not isinstance(outs, (list, tuple)):
        outs = [outs]
    res = {"score": outs[0]}
    idx = 1
    if local:
        res["bk"] = outs[idx]
        idx += 1
        if not want_tb:
            res["bs"] = outs[idx]
            idx += 1
    if want_tb:
        res["P"] = outs[idx]
    return res


def _host_traceback_linear(P, starts_i, starts_j, done0, B):
    """Vectorized host pointer walk (linear gap). P: (Kp, B, Np) int8."""
    i = starts_i.copy()
    j = starts_j.copy()
    done = done0.copy()
    barr = np.arange(B)
    ops = []
    while not done.all():
        p = P[i + j, barr, i] & 3
        done = done | (p == PTR_STOP)
        act = ~done
        is_d = act & (p == PTR_DIAG)
        is_u = act & (p == PTR_UP)
        is_l = act & (p == PTR_LEFT)
        op = np.where(is_d, OP_M, np.where(is_u, OP_I, np.where(is_l, OP_D, OP_PAD)))
        ops.append(op.astype(np.uint8))
        i = i - (is_d | is_u)
        j = j - (is_d | is_l)
    ops_rev = np.stack(ops, axis=1) if ops else np.full((B, 1), OP_PAD, np.uint8)
    return ops_rev, i, j


def _host_traceback_affine(P, starts_i, starts_j, done0, B):
    """Vectorized host pointer walk (affine H/E/F state machine)."""
    ST_H, ST_E, ST_F = 0, 1, 2
    i = starts_i.copy()
    j = starts_j.copy()
    st = np.zeros(B, np.int32)
    done = done0.copy()
    barr = np.arange(B)
    ops = []
    while not done.all():
        byte = P[i + j, barr, i].astype(np.int32)
        ph = byte & 3
        ext_e = ((byte >> _EXT_E_BIT) & 1).astype(bool)
        ext_f = ((byte >> _EXT_F_BIT) & 1).astype(bool)
        in_h = st == ST_H
        done = done | (in_h & (ph == PTR_STOP))
        act = ~done
        act_m = act & in_h & (ph == PTR_DIAG)
        act_i = act & ((in_h & (ph == PTR_UP)) | (st == ST_F))
        act_d = act & ((in_h & (ph == PTR_LEFT)) | (st == ST_E))
        op = np.where(
            act_m, OP_M, np.where(act_i, OP_I, np.where(act_d, OP_D, OP_PAD))
        )
        ops.append(op.astype(np.uint8))
        st = np.where(
            act_m,
            ST_H,
            np.where(
                act_i,
                np.where(ext_f, ST_F, ST_H),
                np.where(act_d, np.where(ext_e, ST_E, ST_H), st),
            ),
        )
        i = i - (act_m | act_i)
        j = j - (act_m | act_d)
    ops_rev = np.stack(ops, axis=1) if ops else np.full((B, 1), OP_PAD, np.uint8)
    return ops_rev, i, j


def pallas_bucket(
    q,
    t,
    qlen,
    tlen,
    table,
    *,
    mode,
    gap_open,
    gap_extend,
    band,
    affine,
    want_tb,
):
    """Drop-in equivalent of wavefront_xla.wavefront_bucket on Pallas kernels.

    Device fill + (when want_tb) host-side pointer walk.  Output dict matches
    wavefront_bucket: score/qs/qe/ts/te (+ ops_rev when want_tb).

    Unbanded paths (local and global, score/coords and full traceback)
    route to the strip-tiled v2 kernel (strip_pallas), which is ~3-5x
    faster; banded full-matrix fallbacks stay on the v1 kernels here.
    """
    if band is not None and mode == "local":
        raise ValueError("banded local alignment is out of contract")
    if band is None and mode in ("local", "global"):
        from .strip_pallas import strip_bucket

        return strip_bucket(
            q,
            t,
            qlen,
            tlen,
            table,
            mode=mode,
            gap_open=gap_open,
            gap_extend=gap_extend,
            band=band,
            affine=affine,
            want_tb=want_tb,
        )
    interpret = jax.devices()[0].platform != "tpu"
    q = np.asarray(q)
    t = np.asarray(t)
    qlen = np.asarray(qlen)
    tlen = np.asarray(tlen)
    table_h = np.asarray(table)
    B0, n = q.shape
    m = t.shape[1]
    # pad batch to the int32 sublane tile
    B = _ceil_to(max(B0, SUBLANES), SUBLANES)
    if B != B0:
        pad = B - B0
        q = np.concatenate([q, np.repeat(q[:1], pad, 0)], axis=0)
        t = np.concatenate([t, np.repeat(t[:1], pad, 0)], axis=0)
        qlen = np.concatenate([qlen, np.repeat(qlen[:1], pad, 0)])
        tlen = np.concatenate([tlen, np.repeat(tlen[:1], pad, 0)])
    profile = bool(table_h.shape[0] > 8)
    match = int(table_h[0, 0])
    mismatch = int(table_h[0, 1]) if table_h.shape[0] > 1 else match

    res = _fill(
        jnp.asarray(q),
        jnp.asarray(t),
        jnp.asarray(qlen),
        jnp.asarray(tlen),
        jnp.asarray(table_h),
        mode=mode,
        match=match,
        mismatch=mismatch,
        gap_open=gap_open,
        gap_extend=gap_extend,
        band=band,
        affine=affine,
        want_tb=want_tb,
        profile=profile,
        interpret=interpret,
    )
    score_v = np.asarray(res["score"])
    qlen_h = qlen.astype(np.int64)
    tlen_h = tlen.astype(np.int64)
    local = mode == "local"
    N1 = n + 1
    stride = m + 1
    barr = np.arange(B)

    if local:
        bk_v = np.asarray(res["bk"])
        # global argmax with canonical smallest-i, then smallest-j tie-break
        # (per-slot bests keep the smallest k = smallest j: first strict >).
        bv = score_v[:, :N1]
        score = bv.max(axis=1)
        bi = np.argmax(bv == score[:, None], axis=1)
        bj = bk_v[barr, bi] - bi
        empty = score <= 0
        bi = np.where(empty, 0, bi)
        bj = np.where(empty, 0, bj)
        out = {
            "score": score.astype(np.int32),
            "qe": bi.astype(np.int32),
            "te": bj.astype(np.int32),
        }
        starts_i, starts_j = bi.astype(np.int64), bj.astype(np.int64)
        done0 = empty.copy()
    else:
        out = {
            "score": score_v[barr, qlen_h].astype(np.int32),
            "qe": qlen_h.astype(np.int32),
            "te": tlen_h.astype(np.int32),
        }
        starts_i = qlen_h.copy()
        starts_j = tlen_h.copy()
        done0 = np.zeros(B, bool)

    if not want_tb:
        if local:
            bs_v = np.asarray(res["bs"])
            ps = bs_v[barr, out["qe"]]
            empty = out["score"] <= 0
            out["qs"] = np.where(empty, 0, ps // stride).astype(np.int32)
            out["ts"] = np.where(empty, 0, ps % stride).astype(np.int32)
        else:
            out["qs"] = np.zeros(B, np.int32)
            out["ts"] = np.zeros(B, np.int32)
        return {k: v[:B0] for k, v in out.items()}

    P_h = np.asarray(res["P"])
    from ..native import walk_to_cigars

    native = walk_to_cigars(P_h, starts_i, starts_j, done0, affine)
    if native is not None:
        cigars, fi, fj = native
        out["qs"] = fi.astype(np.int32)
        out["ts"] = fj.astype(np.int32)
        res2 = {k: v[:B0] for k, v in out.items()}
        res2["cigars"] = cigars[:B0]
        return res2
    walk = _host_traceback_affine if affine else _host_traceback_linear
    ops_rev, fi, fj = walk(P_h, starts_i, starts_j, done0, B)
    full = np.full((B, n + m), OP_PAD, np.uint8)
    full[:, : min(ops_rev.shape[1], n + m)] = ops_rev[:, : n + m]
    out["qs"] = fi.astype(np.int32)
    out["ts"] = fj.astype(np.int32)
    out["ops_rev"] = full
    return {k: v[:B0] for k, v in out.items()}
