"""Strip-tiled wavefront kernel v2 — the high-throughput local score path.

Why v1 is slow: `wavefront_pallas` carries full-length diagonal vectors
(O(n) lanes x 7-12 arrays).  At 1kb that is ~100 vregs of live state per
substep — far beyond the register file — so every diagonal step spills to
and refills from VMEM and the kernel runs VMEM-bandwidth-bound (~10 GCUPS
measured, B=32 BLOSUM62 affine).

v2 tiles the DP matrix into horizontal *strips* of TI=128 query rows (the
GPU intra-tile scheme of SaLoBa-class aligners, PAPERS.md:6, re-mapped to
the 8x128 VPU): one (8,128) vreg spans 8 pairs x 128 strip rows, so EVERY
carried array is exactly one vreg and the whole wavefront working set is
register-resident.  The inner loop touches VMEM only once per 128 steps
(one aligned block load per boundary buffer + one store per collector).

Strips are sequential (strip s+1's lane 0 depends on strip s's bottom
row, exchanged through boundary buffers); 8-pair groups ride the grid's
outer dimension.

Geometry (per strip s, rows i in [s*TI+1, (s+1)*TI]):
  lane p <-> DP row i = s*TI + p + 1; at step k (k >= 0) lane p computes
  column j = k - p.  Dependencies: left (i, j-1) = same lane, step k-1;
  up (i-1, j) = lane p-1, step k-1 (lane 0: boundary value, column j=k);
  diag (i-1, j-1) = lane p-1, step k-2 (lane 0: boundary column k-1).

Lane-0/lane-127 traffic avoids cross-lane reductions entirely:

* Boundary *feeders*: per 128-step block, each boundary buffer's aligned
  128-column window is loaded once into a register that is rolled by -1
  every step, so its lane 0 always holds column k.  The diag feeder is
  simply the previous step's un-rolled up feeder (lane 0 = column k-1) —
  carried across block boundaries, where the up feeder is re-loaded.
* Rotating *collectors*: the bottom row's (lane 127) value self-aligns:
  C = where(lane==127, X, roll(C, -1)).  After the step with
  u == 126 the collector holds exactly the aligned 128-column window
  (b-1) in ascending column order and is flushed with one vreg store.

Substitution scoring (BLOSUM62) uses a *packed nibble profile*: biased
scores (s + 4, fitting 4 bits for the BLOSUM62 range [-4, 11]) of 8
letters packed per int32, 4 groups covering 32 letters:
  s(q_i, w) = ((PP[w>>3][i] >> ((w & 7) * 4)) & 0xF) - 4
— 3 group-selects + a vector-by-vector shift, ~9 ops, no gathers.  Tables
whose score span exceeds 15 fall back to a select cascade over per-letter
profile rows.

Scope: every unbanded path — local (SW) and global (NW), linear and
affine gap, score/coords and full traceback (BASELINE.json configs 1-3).
Traceback mode streams packed pointer blocks to HBM (the 128-step window
rides a third grid dimension; per-strip carries persist in VMEM scratch)
and the host walker recovers starts + CIGARs, so the fill carries no
start-tracking state.  Global mode swaps the local zero-clamp for
boundary gap values and captures H(qlen, tlen); the walkers synthesize
the unstored row-0/column-0 boundary.  Banded long reads live in
`banded_pallas`; `wavefront_pallas` keeps the banded full-matrix
fallbacks.

Tie-break parity with the oracle (oracle.sw_linear / sw_affine):
  * cascades DIAG > UP(F) > LEFT(E), extend >= open;
  * per-lane best keeps the FIRST maximum in (i, j) scan order (strict >),
    and the host reduces score = max(BV), packed = min(BK | BV == score),
    which is exactly the canonical smallest-i-then-smallest-j rule since
    packed = i*(m+1)+j.
"""

from __future__ import annotations

import functools
import itertools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import NEG_INF, PTR_DIAG, PTR_LEFT, PTR_STOP, PTR_UP

import os as _os

LANES = 128
SUBLANES = 8
TI = 128  # strip height == lane count
# substeps unrolled per inner fori iteration (tunable for experiments)
NSUB = int(_os.environ.get("SEQALIB_STRIP_NSUB", "8"))
NIBBLE_BIAS = 4  # packed-profile bias; tables must fit [-4, 11]
NEG_INF16 = -20000  # int16-mode -inf: loses every max, survives one gap step


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _state_names(affine: bool, want_starts: bool, gmode: bool = False):
    """Persistent (across blocks) SSA carry set.  DF/SDF are the diag
    feeders (previous step's up feeder).  Global mode captures the final
    cell into SC instead of tracking a local argmax."""
    names = ["H1", "H2", "E1", "F1", "W", "BV", "BK", "CH", "CF", "DF"]
    if gmode:
        names = [n for n in names if n not in ("BV", "BK")] + ["SC"]
    if not affine:
        names = [n for n in names if n not in ("E1", "F1", "CF")]
    if want_starts:
        names += ["SH1", "SH2", "SE1", "SF1", "CSH", "CSF", "SDF", "BS"]
        if not affine:
            names = [n for n in names if n not in ("SE1", "SF1", "CSF")]
    return names


def _feeder_names(affine: bool, want_starts: bool):
    names = ["TF", "HF"]
    if affine:
        names.append("FF")
    if want_starts:
        names.append("SHF")
        if want_starts and affine:
            names.append("SFF")
    return names


def _strip_kernel(
    *refs,
    BSUB: int,
    S: int,
    NB: int,
    mq: int,
    match: int,
    mismatch: int,
    gap_open: int,
    gap_extend: int,
    affine: bool,
    profile: bool,
    packed: bool,
    A1: int,
    want_starts: bool,
    want_ptr: bool = False,
    gmode: bool = False,
    dt16: bool = False,
):
    it = iter(refs)
    q_ref = next(it)  # (8, TI) strip query letters (0-based strip rows)
    t2_ref = next(it)  # (8, W2) target letters at x: t2[x] = t[x-1]
    qlenc_ref = next(it)
    tlenc_ref = next(it)
    prof_ref = next(it) if profile else None  # (8, 4, TI) packed | (8, 32, TI)
    bv_ref = next(it)
    bk_ref = next(it)
    bs_ref = next(it) if want_starts else None
    ptr_ref = next(it) if want_ptr else None  # (1,1,LANES,BSUB,TI) i8 block
    hbot = next(it)  # (8, W2) scratch: bottom-row H by column position
    fbot = next(it) if affine else None
    shbot = next(it) if want_starts else None
    sfbot = next(it) if (want_starts and affine) else None
    bv_scr = next(it)
    bk_scr = next(it)
    bs_scr = next(it) if want_starts else None
    state_scr = list(it)  # want_ptr mode: per-strip carry persistence

    s = pl.program_id(1)
    bgrid = pl.program_id(2) if want_ptr else None
    s0_cond = (s == 0) & (bgrid == 0) if want_ptr else (s == 0)
    # int16 mode: score values provably fit (strip_bucket checks the
    # bound), NEG16 never underflows int16 after one gap step
    DT = jnp.int16 if dt16 else jnp.int32
    NEG = DT(NEG_INF16 if dt16 else NEG_INF)
    ee = DT(gap_extend)
    oe = DT(gap_open + gap_extend)
    lane = jax.lax.broadcasted_iota(jnp.int32, (BSUB, LANES), 1)
    qlenv = qlenc_ref[:, 0:1]
    tlenv = tlenc_ref[:, 0:1]
    i0 = s * TI
    stride = mq + 1
    ivec = i0 + lane + 1
    ipack = ivec * stride
    irow_ok = ivec <= qlenv
    # global-mode boundary: H(i, 0) = [o +] i*e  (column-0 gap)
    gapvec = (
        (DT(gap_open) if affine else DT(0)) + ivec.astype(DT) * ee
    )
    names = _state_names(affine, want_starts, gmode)
    fnames = _feeder_names(affine, want_starts)

    @pl.when(s0_cond)
    def _reset():
        # DP row 0: local H = 0 (STOP cells, start pack = j); global
        # H(0, j) = [o +] j*e with H(0,0) = 0.  F row 0 = -inf either way.
        if gmode:
            xcol = jax.lax.broadcasted_iota(jnp.int32, hbot.shape, 1).astype(DT)
            row0 = (DT(gap_open) if affine else DT(0)) + xcol * ee
            hbot[:] = jnp.where(xcol == 0, DT(0), row0)
        else:
            hbot[:] = jnp.zeros_like(hbot)
        if affine:
            fbot[:] = jnp.full_like(fbot, NEG)
        if want_starts:
            shbot[:] = jax.lax.broadcasted_iota(jnp.int32, shbot.shape, 1)
            if affine:
                sfbot[:] = jnp.zeros_like(sfbot)
        bv_scr[:] = jnp.zeros_like(bv_scr)
        bk_scr[:] = jnp.zeros_like(bk_scr)
        if want_starts:
            bs_scr[:] = jnp.zeros_like(bs_scr)

    if profile:
        if packed:
            pp = [prof_ref[:, g, :] for g in range(4)]
        else:
            prof_rows = [prof_ref[:, a, :] for a in range(A1)]

    def subst(Wv):
        if not profile:
            return jnp.where(q_ref[:] == Wv, DT(match), DT(mismatch))
        if packed:
            Wv32 = Wv.astype(jnp.int32)  # Mosaic has no i16 vector shifts
            hi = Wv32 >> 3
            grp = jnp.where(
                hi == 0, pp[0], jnp.where(hi == 1, pp[1], jnp.where(hi == 2, pp[2], pp[3]))
            )
            sv = ((grp >> ((Wv32 & 7) * 4)) & 0xF) - NIBBLE_BIAS
            return sv.astype(DT)
        sv = jnp.zeros((BSUB, LANES), jnp.int32)
        for a in range(A1):
            sv = jnp.where(Wv == a, prof_rows[a], sv)
        return sv.astype(DT)

    lane0 = lane == 0
    lane_last = lane == TI - 1

    def rol1(x):
        """out[l] = x[l-1] (lane roll right by 1); Mosaic has no i16
        rotate, so int16 arrays use the concat-shift form instead."""
        if x.dtype == jnp.int16:
            return jnp.concatenate([x[:, -1:], x[:, :-1]], axis=1)
        return pltpu.roll(x, 1, axis=1)

    def rolm1(x):
        """out[l] = x[l+1] (lane roll left by 1)."""
        if x.dtype == jnp.int16:
            return jnp.concatenate([x[:, 1:], x[:, :1]], axis=1)
        return pltpu.roll(x, LANES - 1, axis=1)

    def substep(k, st, lean):
        """One anti-diagonal step.  st: dict of (8,128) SSA values.
        lean=True skips left-of-matrix masking (valid once k >= TI)."""
        Wv = jnp.where(lane0, st["TF"], rol1(st["W"]))
        s_vec = subst(Wv)
        H1u = jnp.where(lane0, st["HF"], rol1(st["H1"]))
        H2d = jnp.where(lane0, st["DF"], rol1(st["H2"]))
        d = H2d + s_vec

        nxt = {
            "H2": st["H1"],
            "W": Wv,
            "DF": st["HF"],
            "TF": rolm1(st["TF"]),
            "HF": rolm1(st["HF"]),
        }

        if affine:
            E_ext = st["E1"] + ee
            E_opn = st["H1"] + oe
            En = jnp.maximum(E_ext, E_opn)
            F1u = jnp.where(lane0, st["FF"], rol1(st["F1"]))
            nxt["FF"] = rolm1(st["FF"])
            F_ext = F1u + ee
            F_opn = H1u + oe
            Fn = jnp.maximum(F_ext, F_opn)
            up_v, left_v = Fn, En
        else:
            up_v = H1u + ee
            left_v = st["H1"] + ee
        best = jnp.maximum(jnp.maximum(d, up_v), left_v)
        Hn = best if gmode else jnp.maximum(best, DT(0))

        if not lean:
            jvec = k - lane
            jout = jvec <= 0
            Hn = jnp.where(jout, gapvec if gmode else DT(0), Hn)
            if affine:
                En = jnp.where(jout, NEG, En)
                Fn = jnp.where(jout, NEG, Fn)
        if affine:
            nxt["E1"] = En
            nxt["F1"] = Fn
        nxt["H1"] = Hn

        if want_ptr:
            # packed pointer byte (bits 0-1 H provenance, 2 E-ext, 3 F-ext;
            # wavefront_pallas-compatible); STOP at local zero cells and the
            # left-of-matrix boundary
            ptrv = jnp.where(
                d == best,
                jnp.int32(PTR_DIAG),
                jnp.where(up_v == best, jnp.int32(PTR_UP), jnp.int32(PTR_LEFT)),
            )
            if not gmode:
                stopm = best <= 0
                if not lean:
                    stopm = stopm | jout
                ptrv = jnp.where(stopm, jnp.int32(PTR_STOP), ptrv)
            if affine:
                ptrv = (
                    ptrv
                    + (E_ext >= E_opn).astype(jnp.int32) * 4
                    + (F_ext >= F_opn).astype(jnp.int32) * 8
                )
            u = k - (k // LANES) * LANES
            ptr_ref[u, :, :] = ptrv.astype(jnp.int8)

        if want_starts:
            SH1u = jnp.where(lane0, st["SHF"], rol1(st["SH1"]))
            SH2d = jnp.where(lane0, st["SDF"], rol1(st["SH2"]))
            nxt["SDF"] = st["SHF"]
            nxt["SHF"] = rolm1(st["SHF"])
            if affine:
                SF1u = jnp.where(lane0, st["SFF"], rol1(st["SF1"]))
                nxt["SFF"] = rolm1(st["SFF"])
                SEn = jnp.where(E_ext >= E_opn, st["SE1"], st["SH1"])
                SFn = jnp.where(F_ext >= F_opn, SF1u, SH1u)
                up_s, left_s = SFn, SEn
                nxt["SE1"] = SEn
                nxt["SF1"] = SFn
            else:
                up_s, left_s = SH1u, st["SH1"]
            SHn = jnp.where(d == best, SH2d, jnp.where(up_v == best, up_s, left_s))
            pack = ipack + (k - lane)
            stopm = best <= 0
            if not lean:
                stopm = stopm | jout
            SHn = jnp.where(stopm, pack, SHn)
            nxt["SH1"] = SHn
            nxt["SH2"] = st["SH1"]

        jvec2 = k - lane
        if gmode:
            # capture the final cell H(qlen, tlen)
            fin = (ivec == qlenv) & (jvec2 == tlenv)
            nxt["SC"] = jnp.where(fin, Hn, st["SC"])
        else:
            # best tracking (strict > keeps first max in (i, j) scan order)
            valid = irow_ok & (jvec2 <= tlenv)
            if not lean:
                valid = valid & (jvec2 >= 1)
            v = jnp.where(valid, Hn, DT(0))
            upd = v > st["BV"]
            nxt["BV"] = jnp.where(upd, v, st["BV"])
            nxt["BK"] = jnp.where(upd, ipack + jvec2, st["BK"])
            if want_starts:
                nxt["BS"] = jnp.where(upd, SHn, st["BS"])

        # rotating collectors: lane 127's value self-aligns into the
        # ascending-column window layout (see module docstring)
        nxt["CH"] = jnp.where(lane_last, Hn, rolm1(st["CH"]))
        if affine:
            nxt["CF"] = jnp.where(lane_last, Fn, rolm1(st["CF"]))
        if want_starts:
            nxt["CSH"] = jnp.where(lane_last, SHn, rolm1(st["CSH"]))
            if affine:
                nxt["CSF"] = jnp.where(
                    lane_last, SFn, rolm1(st["CSF"])
                )
        return nxt

    def load_feeders(b):
        off = pl.multiple_of(b * LANES, LANES)
        fd = {"TF": t2_ref[:, pl.ds(off, LANES)], "HF": hbot[:, pl.ds(off, LANES)]}
        if affine:
            fd["FF"] = fbot[:, pl.ds(off, LANES)]
        if want_starts:
            fd["SHF"] = shbot[:, pl.ds(off, LANES)]
            if affine:
                fd["SFF"] = sfbot[:, pl.ds(off, LANES)]
        return fd

    def flush(b, st):
        @pl.when(b >= 1)
        def _():
            off = pl.multiple_of((b - 1) * LANES, LANES)
            hbot[:, pl.ds(off, LANES)] = st["CH"]
            if affine:
                fbot[:, pl.ds(off, LANES)] = st["CF"]
            if want_starts:
                shbot[:, pl.ds(off, LANES)] = st["CSH"]
                if affine:
                    sfbot[:, pl.ds(off, LANES)] = st["CSF"]

    all_names = names + fnames

    def block_body(b, st_tuple, lean):
        st = dict(zip(all_names, st_tuple))
        st.update(load_feeders(b))
        k0 = b * LANES

        def group(gi, st_tuple):
            st = dict(zip(all_names, st_tuple))
            for uu in range(NSUB):
                st = substep(k0 + gi * NSUB + uu, st, lean)
            return tuple(st[n] for n in all_names)

        st_tuple = jax.lax.fori_loop(
            0, (LANES - NSUB) // NSUB, group, tuple(st[n] for n in all_names)
        )
        st = dict(zip(all_names, st_tuple))
        for uu in range(NSUB - 1):
            st = substep(k0 + LANES - NSUB + uu, st, lean)
        flush(b, st)
        st = substep(k0 + LANES - 1, st, lean)
        return tuple(st[n] for n in all_names)

    def init_state():
        st = {}
        for n in all_names:
            if n in ("E1", "F1"):
                st[n] = jnp.full((BSUB, LANES), NEG, DT)
            elif n in ("BV", "SC"):
                st[n] = bv_scr[:]
            elif n == "BK":
                st[n] = bk_scr[:]
            elif n == "BS":
                st[n] = bs_scr[:]
            elif n in ("BK", "BS", "SH1", "SH2", "SE1", "SF1", "CSH", "CSF", "SDF"):
                st[n] = jnp.zeros((BSUB, LANES), jnp.int32)
            else:
                st[n] = jnp.zeros((BSUB, LANES), DT)
        return tuple(st[n] for n in all_names)

    if want_ptr:
        # steps ride grid dim 2: one 128-step block per grid step, so the
        # pointer block streams VMEM->HBM through the output pipeline;
        # per-strip carries persist in scratch between grid steps.
        persist = [n for n in names if n not in ("BV", "BK")]

        @pl.when(bgrid == 0)
        def _strip_init():
            for r, n in zip(state_scr, persist):
                if n in ("E1", "F1"):
                    r[:] = jnp.full((BSUB, LANES), NEG, DT)
                else:
                    r[:] = jnp.zeros_like(r)

        st = {n: r[:] for r, n in zip(state_scr, persist)}
        if not gmode:
            st["BV"] = bv_scr[:]
            st["BK"] = bk_scr[:]
        # always non-lean: masking every step avoids a second traced body
        st.update(load_feeders(bgrid))
        k0 = bgrid * LANES

        def group(gi, t):
            st = dict(zip(all_names, t))
            for uu in range(NSUB):
                st = substep(k0 + gi * NSUB + uu, st, False)
            return tuple(st[n] for n in all_names)

        t = jax.lax.fori_loop(
            0,
            (LANES - NSUB) // NSUB,
            group,
            tuple(st[n] for n in all_names),
        )
        st = dict(zip(all_names, t))
        for uu in range(NSUB - 1):
            st = substep(k0 + LANES - NSUB + uu, st, False)
        flush(bgrid, st)
        st = substep(k0 + LANES - 1, st, False)
        for r, n in zip(state_scr, persist):
            r[:] = st[n]
        if not gmode:
            bv_scr[:] = st["BV"]
            bk_scr[:] = st["BK"]

        @pl.when((s == S - 1) & (bgrid == NB - 1))
        def _out_ptr():
            bv_ref[:] = (st["SC"] if gmode else st["BV"]).astype(bv_ref.dtype)
            bk_ref[:] = (
                st["SC"].astype(bk_ref.dtype) if gmode else st["BK"]
            )

        return

    # block 0 carries the left-of-matrix boundary (j <= 0 lanes); every
    # later block is past it and runs the lean body.
    st_tuple = block_body(0, init_state(), lean=False)
    st_tuple = jax.lax.fori_loop(
        1, NB, lambda b, t: block_body(b, t, lean=True), st_tuple
    )
    st = dict(zip(all_names, st_tuple))
    bv_scr[:] = st["SC"] if gmode else st["BV"]
    if not gmode:
        bk_scr[:] = st["BK"]
    if want_starts:
        bs_scr[:] = st["BS"]

    @pl.when(s == S - 1)
    def _out():
        bv_ref[:] = (st["SC"] if gmode else st["BV"]).astype(bv_ref.dtype)
        bk_ref[:] = st["SC"].astype(bk_ref.dtype) if gmode else st["BK"]
        if want_starts:
            bs_ref[:] = st["BS"]


def _build_profile_packed(qpad: jax.Array, table: jax.Array) -> jax.Array:
    """(B, 4, n_pad) i32 packed nibble profile:
    PP[b, g, i] packs (table[qpad[b,i], 8g+r] + NIBBLE_BIAS) << 4r, r<8."""
    A1 = table.shape[0]
    tpad = jnp.full((32, 32), -NIBBLE_BIAS, jnp.int32)
    tpad = tpad.at[:A1, :A1].set(table.astype(jnp.int32))
    shifts = jnp.arange(8, dtype=jnp.int32) * 4
    packed = (
        ((tpad + NIBBLE_BIAS).reshape(32, 4, 8) << shifts[None, None, :])
        .sum(axis=2)
        .astype(jnp.int32)
    )  # (32 letters, 4 groups)
    qoh = jax.nn.one_hot(qpad, 32, dtype=jnp.float32)  # (B, n_pad, 32)
    # float matmuls can't hold full 32-bit packed values exactly (> 2^24);
    # gather via two 16-bit planes, each exact in f32, and recombine.
    # precision=HIGHEST: the TPU's default f32 matmul truncates inputs to
    # bf16 (8-bit significand), which corrupts 16-bit plane values.
    hp = jax.lax.Precision.HIGHEST
    lo = jnp.einsum(
        "bia,ag->bgi", qoh, (packed & 0xFFFF).astype(jnp.float32), precision=hp
    )
    hi = jnp.einsum(
        "bia,ag->bgi",
        qoh,
        ((packed >> 16) & 0xFFFF).astype(jnp.float32),
        precision=hp,
    )
    return (hi.astype(jnp.int32) << 16) | lo.astype(jnp.int32)


def _build_profile_rows(qpad: jax.Array, table: jax.Array) -> jax.Array:
    """(B, 32, n_pad) i32: prof[b, a, i] = table[qpad[b, i], a]."""
    A1 = table.shape[0]
    tpad = jnp.zeros((32, 32), jnp.int32).at[:A1, :A1].set(table.astype(jnp.int32))
    qoh = jax.nn.one_hot(qpad, 32, dtype=jnp.bfloat16)
    prof = jnp.einsum("bia,ac->bci", qoh, tpad.astype(jnp.bfloat16))
    return prof.astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "BSUB",
        "mq",
        "match",
        "mismatch",
        "gap_open",
        "gap_extend",
        "affine",
        "profile",
        "packed",
        "A1",
        "want_starts",
        "want_ptr",
        "gmode",
        "dt16",
        "interpret",
    ),
)
def _strip_fill(
    qpad,
    t2,
    qlen,
    tlen,
    table,
    *,
    BSUB,
    mq,
    match,
    mismatch,
    gap_open,
    gap_extend,
    affine,
    profile,
    packed,
    A1,
    want_starts,
    interpret,
    want_ptr=False,
    gmode=False,
    dt16=False,
):
    B, n_pad = qpad.shape
    W2 = t2.shape[1]
    S = n_pad // TI
    # callers (strip_bucket) pad B to a BSUB multiple; a remainder would
    # silently drop pairs off the grid
    assert B % BSUB == 0, f"batch {B} not a multiple of BSUB {BSUB}"
    GB = B // BSUB
    NB = (W2 - LANES) // LANES
    assert not (want_ptr and want_starts)

    qlenc = jnp.broadcast_to(qlen[:, None].astype(jnp.int32), (B, LANES))
    tlenc = jnp.broadcast_to(tlen[:, None].astype(jnp.int32), (B, LANES))

    kernel = functools.partial(
        _strip_kernel,
        BSUB=BSUB,
        S=S,
        NB=NB,
        mq=mq,
        match=match,
        mismatch=mismatch,
        gap_open=gap_open,
        gap_extend=gap_extend,
        affine=affine,
        profile=profile,
        packed=packed,
        A1=A1,
        want_starts=want_starts,
        want_ptr=want_ptr,
        gmode=gmode,
        dt16=dt16,
    )
    DT = jnp.int16 if dt16 else jnp.int32

    # index maps: 2-D grid (gb, s) for the score path; 3-D (gb, s, b) with
    # steps on the minor grid dim for the pointer-emitting path
    if want_ptr:
        grid = (GB, S, NB)
        bspec = lambda blk, f: pl.BlockSpec(
            blk, lambda gb, s, b: f(gb, s), memory_space=pltpu.VMEM
        )
        semantics = ("arbitrary", "arbitrary", "arbitrary")
    else:
        grid = (GB, S)
        bspec = lambda blk, f: pl.BlockSpec(
            blk, lambda gb, s: f(gb, s), memory_space=pltpu.VMEM
        )
        semantics = ("arbitrary", "arbitrary")

    inputs = [qpad, t2, qlenc, tlenc]
    in_specs = [
        bspec((BSUB, TI), lambda gb, s: (gb, s)),
        bspec((BSUB, W2), lambda gb, s: (gb, 0)),
        bspec((BSUB, LANES), lambda gb, s: (gb, 0)),
        bspec((BSUB, LANES), lambda gb, s: (gb, 0)),
    ]
    if profile:
        if packed:
            inputs.append(_build_profile_packed(qpad, table))
            in_specs.append(bspec((BSUB, 4, TI), lambda gb, s: (gb, 0, s)))
        else:
            inputs.append(_build_profile_rows(qpad, table))
            in_specs.append(bspec((BSUB, 32, TI), lambda gb, s: (gb, 0, s)))

    n_out = 3 if want_starts else 2
    out_shapes = [jax.ShapeDtypeStruct((B, LANES), DT)] + [
        jax.ShapeDtypeStruct((B, LANES), jnp.int32)
    ] * (n_out - 1)
    out_specs = [bspec((BSUB, LANES), lambda gb, s: (gb, 0))] * n_out
    if want_ptr:
        # v1-style 3-D pointer stream: block row-major over (gb, s, b, u);
        # the host reshapes to (GB, S, NB*LANES, BSUB, TI)
        out_shapes.append(
            jax.ShapeDtypeStruct((GB * S * NB * LANES, BSUB, TI), jnp.int8)
        )
        out_specs.append(
            pl.BlockSpec(
                (LANES, BSUB, TI),
                lambda gb, s, b: ((gb * S + s) * NB + b, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )

    scratch = [pltpu.VMEM((BSUB, W2), DT)]  # hbot
    if affine:
        scratch.append(pltpu.VMEM((BSUB, W2), DT))  # fbot
    if want_starts:
        scratch.append(pltpu.VMEM((BSUB, W2), jnp.int32))  # shbot
        if affine:
            scratch.append(pltpu.VMEM((BSUB, W2), jnp.int32))  # sfbot
    scratch.append(pltpu.VMEM((BSUB, LANES), DT))  # bv/SC
    scratch += [pltpu.VMEM((BSUB, LANES), jnp.int32)] * (n_out - 1)
    if want_ptr:
        n_persist = len(_state_names(affine, False, gmode)) - (
            0 if gmode else 2
        )  # BV/BK live in their own scratch
        scratch += [pltpu.VMEM((BSUB, LANES), DT)] * n_persist

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_shape=out_shapes,
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=semantics,
        ),
    )(*inputs)
    res = {"bv": outs[0], "bk": outs[1]}
    if want_starts:
        res["bs"] = outs[2]
    if want_ptr:
        res["P"] = outs[-1]
    return res


def strip_bucket(
    q,
    t,
    qlen,
    tlen,
    table,
    *,
    mode,
    gap_open,
    gap_extend,
    band=None,
    affine=None,
    want_tb=False,
    want_starts=True,
    BSUB=None,
):
    """Score/coords (and with want_tb=True, CIGAR) alignment via the
    strip kernel.

    Same output contract as wavefront_pallas.pallas_bucket: dict of
    score/qs/qe/ts/te (B,) numpy arrays, plus "cigars" (list of str) when
    want_tb=True (the pointer matrix streams to HBM in strip layout and
    the walk runs host-side; starts come from the walk, so the fill
    carries no start-tracking state).

    mode="global" (NW) captures H(qlen, tlen) and walks from there; the
    degenerate qlen==0 / tlen==0 rows are resolved host-side."""
    assert mode in ("local", "global") and band is None
    gmode = mode == "global"
    if want_tb or gmode:
        want_starts = False
    if want_tb:
        # HBM guard: the pointer stream costs ~n_pad*(m_pad+TI) bytes per
        # pair; chunk oversized batches and merge.
        q = np.asarray(q)
        t = np.asarray(t)
        cap_bytes = int(
            float(_os.environ.get("SEQALIB_PTR_HBM_CAP", str(2 * 1024**3)))
        )
        per_pair = _ceil_to(max(q.shape[1], 1), TI) * (
            _ceil_to(max(t.shape[1], 1), LANES) + 2 * LANES
        )
        cap_pairs = max(32, cap_bytes // max(per_pair, 1))
        if q.shape[0] > cap_pairs:
            merged = None
            for lo in range(0, q.shape[0], cap_pairs):
                hi = lo + cap_pairs
                part = strip_bucket(
                    q[lo:hi],
                    t[lo:hi],
                    np.asarray(qlen)[lo:hi],
                    np.asarray(tlen)[lo:hi],
                    table,
                    mode=mode,
                    gap_open=gap_open,
                    gap_extend=gap_extend,
                    band=band,
                    affine=affine,
                    want_tb=True,
                    BSUB=BSUB,
                )
                if merged is None:
                    merged = {k: [v] for k, v in part.items()}
                else:
                    for k, v in part.items():
                        merged[k].append(v)
            return {
                k: (
                    list(itertools.chain.from_iterable(v))
                    if k == "cigars"
                    else np.concatenate(v)
                )
                for k, v in merged.items()
            }
    interpret = jax.devices()[0].platform != "tpu"
    q = np.asarray(q)
    t = np.asarray(t)
    qlen = np.asarray(qlen)
    tlen = np.asarray(tlen)
    table_h = np.asarray(table)
    B0, n = q.shape
    m = t.shape[1]
    if affine is None:
        affine = gap_open != 0
    if BSUB is None:
        import os

        BSUB = int(os.environ.get("SEQALIB_STRIP_BSUB", "32"))
    BSUB = max(SUBLANES, min(BSUB, _ceil_to(max(B0, SUBLANES), SUBLANES)))
    if want_tb:
        # the int8 pointer block's (BSUB, TI) trailing dims must respect
        # the int8 (32, 128) min tile
        BSUB = max(BSUB, 32)

    B = _ceil_to(max(B0, SUBLANES), BSUB)
    if B != B0:
        pad = B - B0
        q = np.concatenate([q, np.repeat(q[:1], pad, 0)], axis=0)
        t = np.concatenate([t, np.repeat(t[:1], pad, 0)], axis=0)
        qlen = np.concatenate([qlen, np.repeat(qlen[:1], pad, 0)])
        tlen = np.concatenate([tlen, np.repeat(tlen[:1], pad, 0)])

    profile = bool(table_h.shape[0] > 8)
    packed = bool(
        profile
        and table_h.min() >= -NIBBLE_BIAS
        and table_h.max() <= 15 - NIBBLE_BIAS
    )
    # int16 DP state when every reachable score provably fits: the most
    # negative cell is bounded by |o| + (n+m)*max(|e|, |s|) and the most
    # positive by min(n,m)*max(s).
    smax = int(max(abs(int(table_h.min())), abs(int(table_h.max()))))
    bound = abs(gap_open) + (n + m) * max(abs(gap_extend), smax)
    # int16 DP state halves vregs/array (tested bit-exact in interpret
    # mode) but this Mosaic build legalizes no i16 vector ALU ops
    # (rotate/shift/maxsi/cmpi all missing) -- off until the toolchain
    # catches up (SEQALIB_STRIP_INT16=1 to re-enable).
    dt16 = bool(
        bound < abs(NEG_INF16) - 2000
        and _os.environ.get("SEQALIB_STRIP_INT16", "0") == "1"
    )
    match = int(table_h[0, 0])
    mismatch = int(table_h[0, 1]) if table_h.shape[0] > 1 else match
    A1 = int(table_h.shape[0])
    SENT_Q, SENT_T = A1, A1 + 1

    n_pad = _ceil_to(max(n, 1), TI)
    m_pad = _ceil_to(max(m, 1), LANES)
    NB = m_pad // LANES + 1
    W2 = (NB + 1) * LANES

    iarr = np.arange(n_pad)[None, :]
    qpad = np.full((B, n_pad), SENT_Q, np.int32)
    qpad[:, :n] = q
    qpad = np.where(iarr < qlen[:, None], qpad, SENT_Q).astype(np.int32)

    xarr = np.arange(W2)[None, :]
    t2 = np.full((B, W2), SENT_T, np.int32)
    t2[:, 1 : 1 + m] = t
    t2 = np.where((xarr >= 1) & (xarr <= tlen[:, None]), t2, SENT_T).astype(np.int32)

    DTh = np.int16 if dt16 else np.int32
    res = _strip_fill(
        jnp.asarray(qpad.astype(DTh)),
        jnp.asarray(t2.astype(DTh)),
        jnp.asarray(qlen),
        jnp.asarray(tlen),
        jnp.asarray(table_h),
        BSUB=BSUB,
        mq=m,
        match=match,
        mismatch=mismatch,
        gap_open=gap_open,
        gap_extend=gap_extend,
        affine=bool(affine),
        profile=profile,
        packed=packed,
        A1=A1,
        want_starts=want_starts,
        want_ptr=want_tb,
        gmode=gmode,
        dt16=dt16,
        interpret=interpret,
    )
    bv = np.asarray(res["bv"]).astype(np.int32)  # (B, 128)
    bk = np.asarray(res["bk"])
    stride = m + 1
    barr0 = np.arange(B)
    if gmode:
        score = bv[barr0, (np.maximum(qlen, 1) - 1) % TI]
        # degenerate rows: all-gap alignments, resolved without the kernel
        go = gap_open if affine else 0
        degq = qlen == 0
        degt = tlen == 0
        score = np.where(degq, go + tlen * gap_extend, score)
        score = np.where(degt, go + qlen * gap_extend, score)
        score = np.where(degq & degt, 0, score)
        out = {
            "score": score.astype(np.int32),
            "qs": np.zeros(B, np.int32),
            "qe": qlen.astype(np.int32),
            "ts": np.zeros(B, np.int32),
            "te": tlen.astype(np.int32),
        }
        if want_tb:
            GB = B // BSUB
            S_ = n_pad // TI
            P = np.asarray(res["P"]).reshape(GB, S_, NB * LANES, BSUB, TI)
            deg = degq | degt
            cigars, _, _ = _strip_walk(
                P,
                qlen.astype(np.int64),
                tlen.astype(np.int64),
                deg,
                bool(affine),
                BSUB,
                global_mode=True,
            )
            for b in np.nonzero(deg)[0]:
                c = ""
                if tlen[b]:
                    c += f"{tlen[b]}D"
                if qlen[b]:
                    c += f"{qlen[b]}I"
                cigars[b] = c
            res2 = {k: v[:B0] for k, v in out.items()}
            res2["cigars"] = cigars[:B0]
            return res2
        return {k: v[:B0] for k, v in out.items()}
    score = bv.max(axis=1)
    masked_bk = np.where(bv == score[:, None], bk, np.iinfo(np.int32).max)
    lsel = masked_bk.argmin(axis=1)
    barr = np.arange(B)
    packed_best = bk[barr, lsel]
    empty = score <= 0
    qe = np.where(empty, 0, packed_best // stride)
    te = np.where(empty, 0, packed_best % stride)
    out = {
        "score": score.astype(np.int32),
        "qe": qe.astype(np.int32),
        "te": te.astype(np.int32),
    }
    if want_tb:
        GB = B // BSUB
        S_ = n_pad // TI
        P = np.asarray(res["P"]).reshape(GB, S_, NB * LANES, BSUB, TI)
        cigars, fi, fj = _strip_walk(
            P,
            qe.astype(np.int64),
            te.astype(np.int64),
            empty,
            bool(affine),
            BSUB,
        )
        out["qs"] = fi.astype(np.int32)
        out["ts"] = fj.astype(np.int32)
        res2 = {k: v[:B0] for k, v in out.items()}
        res2["cigars"] = cigars[:B0]
        return res2
    if want_starts:
        bs = np.asarray(res["bs"])
        spacked = bs[barr, lsel]
        out["qs"] = np.where(empty, 0, spacked // stride).astype(np.int32)
        out["ts"] = np.where(empty, 0, spacked % stride).astype(np.int32)
    else:
        out["qs"] = np.zeros(B, np.int32)
        out["ts"] = np.zeros(B, np.int32)
    return {k: v[:B0] for k, v in out.items()}


def _strip_walk(P, qe, te, done0, affine, BSUB, global_mode=False):
    """Host pointer walk over the strip-layout pointer matrix.

    P[gb, s, k, pr, p] is the packed byte of cell (i, j) with
    i = s*TI + p + 1, j = k - p, pair = gb*BSUB + pr.  Cells on DP row 0
    or column 0 are implicit STOP cells (local boundary, not stored).
    Tries the native C++ walker first; falls back to a lockstep
    vectorized NumPy walk.  Returns (cigars start->end, start_i, start_j).
    """
    from ..native import walk_strip_to_cigars
    from ..utils.cigar import OP_D, OP_I, OP_M, ops_to_cigar

    native = walk_strip_to_cigars(P, qe, te, done0, affine, BSUB, global_mode)
    if native is not None:
        return native

    GB, S, K, _, _ = P.shape
    B = len(qe)
    i = qe.copy()
    j = te.copy()
    done = done0.copy()
    pair = np.arange(B)
    gb = pair // BSUB
    pr = pair % BSUB
    st = np.zeros(B, np.int32)  # 0=H 1=E 2=F
    ops_cols = []
    while not done.all():
        edge = (i < 1) | (j < 1)
        srow = np.clip((i - 1) // TI, 0, S - 1)
        p = np.clip((i - 1) % TI, 0, TI - 1)
        k = np.clip(j + p, 0, K - 1)
        byte = np.where(edge, 0, P[gb, srow, k, pr, p]).astype(np.int32)
        ph = byte & 3
        if global_mode:
            # unstored boundary rows: all-D along row 0, all-I along col 0
            in_h0 = st == 0
            row0 = in_h0 & (i == 0) & (j > 0)
            col0 = in_h0 & (j == 0) & (i > 0)
            ph = np.where(row0, PTR_LEFT, np.where(col0, PTR_UP, ph))
        ext_e = ((byte >> 2) & 1).astype(bool)
        ext_f = ((byte >> 3) & 1).astype(bool)
        in_h = st == 0
        done = done | (in_h & (ph == PTR_STOP))
        act = ~done
        act_m = act & in_h & (ph == PTR_DIAG)
        act_i = act & ((in_h & (ph == PTR_UP)) | (st == 2))
        act_d = act & ((in_h & (ph == PTR_LEFT)) | (st == 1))
        op = np.where(act_m, OP_M, np.where(act_i, OP_I, np.where(act_d, OP_D, 255)))
        ops_cols.append(op.astype(np.uint8))
        if affine:
            st = np.where(
                act_m,
                0,
                np.where(
                    act_i,
                    np.where(ext_f, 2, 0),
                    np.where(act_d, np.where(ext_e, 1, 0), st),
                ),
            )
        i = i - (act_m | act_i)
        j = j - (act_m | act_d)
    cigars = []
    if ops_cols:
        mat = np.stack(ops_cols, axis=1)
        for b in range(B):
            row = mat[b]
            row = row[row != 255]
            cigars.append(ops_to_cigar(row[::-1]))
    else:
        cigars = [""] * B
    return cigars, i, j


