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

Local coords follow the TWO-PASS canonical scheme (oracle.py docstring):
pass 1 is the end-only fill (NO per-cell start-lineage state — round 1
carried a mirrored select cascade per DP array for in-fill start
tracking, a structural ~2x op-count tax, VERDICT.md item 1); pass 2
(emode: global-recurrence boundaries, no zero clamp, argmax tracking)
recovers the canonical start from the reversed prefixes, row-windowed
with escalation (_reverse_starts).  Local traceback adds pass 3: global
fill + walk over the [qs:qe] x [ts:te] windows only.

Global mode swaps the local zero-clamp for boundary gap values and
captures H(qlen, tlen); traceback mode streams packed pointer blocks to
HBM (the 128-step window rides a third grid dimension; per-strip carries
persist in VMEM scratch) and the host walker recovers CIGARs,
synthesizing the unstored row-0/column-0 boundary.  Banded long reads
live in `banded_pallas`; `wavefront_pallas` keeps the banded full-matrix
fallbacks.

Tie-break parity with the oracle (oracle.sw_linear / sw_affine):
  * cascades DIAG > UP(F) > LEFT(E), extend >= open;
  * per-lane best keeps the FIRST maximum in (i, j) scan order (strict >),
    and the host reduces score = max(BV), packed = min(BK | BV == score),
    which is exactly the canonical smallest-i-then-smallest-j rule since
    packed = i*(m+1)+j — applied to the reversed problem in pass 2 this
    yields the canonical (max qs, then max ts) start.
"""

from __future__ import annotations

import functools
import itertools
import logging

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import NEG_INF, PTR_DIAG, PTR_LEFT, PTR_STOP, PTR_UP

import os as _os

log = logging.getLogger("seqalib_tpu.strip")

LANES = 128
SUBLANES = 8
TI = 128  # strip height == lane count
# substeps unrolled per inner fori iteration.  Round-2 sweep (fastbv carry
# set, B=BSUB=128): NSUB 8/16/32/64 -> 53.9/56.9/59.3/58.0 GCUPS end-only;
# NSUB=16 could not even compile with round 1's fatter carry.
NSUB = int(_os.environ.get("SEQALIB_STRIP_NSUB", "32"))
NIBBLE_BIAS = 4  # packed-profile bias; tables must fit [-4, 11]
NEG_INF16 = -20000  # int16-mode -inf: loses every max, survives one gap step


def fused_wr() -> int:
    """Row window of the fused two-pass start recovery, a strip multiple.
    Default 4*TI=512: random 1kb BLOSUM62 protein pairs measure spans up
    to 398 (128-pair bench batch, seed 0 — median 69), so 512 clears the
    whole batch with ZERO escalations — the round-3 headline policy is a
    clean timed region over a flattering one (VERDICT.md round-2 weak 1).
    With the split-steady pass-2 specialization on (round 3), WR=512
    measures 43.8-44.1 GCUPS clean vs WR=384's 45.2 with 1/128 escalated
    out of the timed region — the ~1 GCUPS delta is not worth the
    asterisk.  Escalation is a score check, never a correctness trade.
    NOTE for WR tuners: the pass-2 column clamp scales with WR (~2*WR),
    so lowering WR also widens the knife-edge co-optimal-tie exposure
    class (b) in _strip_local_fused's docstring (ties with > ~WR net
    deletions) — account for both before shrinking it."""
    return _ceil_to(int(_os.environ.get("SEQALIB_FUSED_WR", str(4 * TI))), TI)


def fused_pass2_knobs(interpret: bool) -> dict:
    """Resolve the fused pass-2 tuning knobs (engine, band, NSUB, split)
    from the environment at the HOST boundary.  These become jit static
    args of `_strip_local_fused`, i.e. part of its cache key — an env
    read at TRACE time whose value is not in the key silently reuses a
    stale compile after the env changes within one process (that exact
    bug made the round-2 split/NSUB invariance tests vacuous: the second
    call was a cache hit that never traced the toggled path)."""
    env = _os.environ
    nsub = env.get("SEQALIB_BAND_NSUB")
    return dict(
        pass2=env.get("SEQALIB_FUSED_PASS2", "banded"),
        bw=int(env.get("SEQALIB_FUSED_BW", "64")),
        # on-chip sweep 2026-08-19: NSUB 8/16/32 -> 38.0/38.8/38.6 at
        # WR=512, ~40-42 at WR=256-384.  Interpret mode keeps 4:
        # unrolling 32 substeps only bloats CPU-test trace time.
        nsub=int(nsub) if nsub is not None else (4 if interpret else 32),
        split=env.get("SEQALIB_FUSED_SPLIT", "1") == "1",
        # opt-in sound canonical-tie closure (escalates aggressively on
        # long genuine alignments by design — see _strip_local_fused)
        tie_safe=env.get("SEQALIB_FUSED_TIE_SAFE", "0") == "1",
        # pass-2 slice size (pairs per band_fill_range launch): the
        # kernel holds its whole batch in VMEM, so the ceiling is scoped
        # vmem; 128 is the validated default (256 measured on-chip
        # round 5: see BASELINE.md)
        pc2=int(env.get("SEQALIB_FUSED_PC2", "128")),
    )


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit, static_argnames=("L", "lo", "fill", "interpret")
)
def _row_window(src, starts, hi, *, L, lo, fill, interpret):
    """out[n, x] = src[n, starts[n] + x] where lo <= x < hi[n], else fill.

    The per-pair reversed-prefix extraction of the fused pass 2.  A
    vmap(dynamic_slice) formulation lowers to a sequential XLA while
    loop over rows (~0.2ms per 128-pair batch — 6% of the whole fused
    program, trace-verified); this Pallas kernel does the same row-wise
    dynamic window loads in one launch.  Mosaic only allows LANE-ALIGNED
    dynamic lane offsets, so each row loads the 128-aligned superset
    window and rotates the remainder away (shift normalized mod width:
    dynamic negative shifts miscompile on non-power-of-two widths).
    Callers guarantee starts[n] + L + LANES <= src.shape[1] (sentinel
    tails one block longer than the slice form needed)."""
    N, W = src.shape
    Wp = L + LANES
    assert W % LANES == 0 and L % LANES == 0, (W, L)

    def kern(starts_ref, hi_ref, src_ref, out_ref):
        g = pl.program_id(0)
        x = jax.lax.broadcasted_iota(jnp.int32, (1, Wp), 1)
        rows = []
        for r in range(SUBLANES):
            s = starts_ref[g * SUBLANES + r]
            h = hi_ref[g * SUBLANES + r]  # scalar: SMEM loads are scalar
            base = pl.multiple_of((s // LANES) * LANES, LANES)
            rem = s - base
            win = src_ref[pl.ds(r, 1), pl.ds(base, Wp)]
            win = pltpu.roll(win, (Wp - rem) % Wp, axis=1)
            rows.append(jnp.where((x >= lo) & (x < h), win, fill))
        out_ref[...] = jnp.concatenate(rows, axis=0)[:, :L]

    assert N % SUBLANES == 0, N
    return pl.pallas_call(
        kern,
        grid=(N // SUBLANES,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            # 8 source rows per grid step: VMEM footprint stays bounded
            # at any batch size (all-vs-all chunks reach B >= 8192)
            pl.BlockSpec(
                (SUBLANES, W), lambda g: (g, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (SUBLANES, L), lambda g: (g, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((N, L), src.dtype),
        interpret=interpret,
    )(starts.astype(jnp.int32), hi.astype(jnp.int32), src)


def _state_names(affine: bool, gmode: bool = False):
    """Persistent (across blocks) SSA carry set.  DF is the diag feeder
    (previous step's up feeder).  H1R is the previous step's rolled H1
    (== rol1 of what H2 used to be — the roll is carried, not redone).
    Global mode captures the final cell into SC instead of tracking an
    argmax."""
    names = ["H1", "H1R", "E1", "F1", "W", "BV", "BK", "CH", "CF", "DF"]
    if gmode:
        names = [n for n in names if n not in ("BV", "BK")] + ["SC"]
    if not affine:
        names = [n for n in names if n not in ("E1", "F1", "CF")]
    return names


def _feeder_names(affine: bool):
    names = ["TF", "HF"]
    if affine:
        names.append("FF")
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
    want_ptr: bool = False,
    gmode: bool = False,
    emode: bool = False,
    dt16: bool = False,
    fastbv: bool = False,
    nsub: int = NSUB,
):
    it = iter(refs)
    q_ref = next(it)  # (8, TI) strip query letters (0-based strip rows)
    t2_ref = next(it)  # (8, W2) target letters at x: t2[x] = t[x-1]
    qlenc_ref = next(it)
    tlenc_ref = next(it)
    prof_ref = next(it) if profile else None  # (8, 4, TI) packed | (8, 32, TI)
    bv_ref = next(it)
    bk_ref = next(it)
    ptr_ref = next(it) if want_ptr else None  # (1,1,LANES,BSUB,TI) i8 block
    hbot = next(it)  # (8, W2) scratch: bottom-row H by column position
    fbot = next(it) if affine else None
    bv_scr = next(it)
    bk_scr = next(it)
    state_scr = list(it)  # want_ptr mode: per-strip carry persistence

    # emode = anchored extension (pass 2 of the two-pass local coords
    # scheme, oracle.py docstring): global-recurrence boundaries and no
    # zero clamp (like gmode) but argmax tracking (like local).
    noclamp = gmode or emode

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
    KM = NB * LANES
    # global-mode boundary: H(i, 0) = [o +] i*e  (column-0 gap)
    gapvec = (
        (DT(gap_open) if affine else DT(0)) + ivec.astype(DT) * ee
    )
    names = _state_names(affine, gmode)
    fnames = _feeder_names(affine)

    @pl.when(s0_cond)
    def _reset():
        # DP row 0: local H = 0 (STOP cells); global/extension
        # H(0, j) = [o +] j*e with H(0,0) = 0.  F row 0 = -inf either way.
        if noclamp:
            xcol = jax.lax.broadcasted_iota(jnp.int32, hbot.shape, 1).astype(DT)
            row0 = (DT(gap_open) if affine else DT(0)) + xcol * ee
            hbot[:] = jnp.where(xcol == 0, DT(0), row0)
        else:
            hbot[:] = jnp.zeros_like(hbot)
        if affine:
            fbot[:] = jnp.full_like(fbot, NEG)
        bv_scr[:] = jnp.zeros_like(bv_scr)
        bk_scr[:] = jnp.zeros_like(bk_scr)

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
        # sentinel/out-of-alphabet target letters must score NEGATIVE (the
        # fastbv decay argument relies on it); any constant <= -1 works
        sv = jnp.full((BSUB, LANES), -64, jnp.int32)
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
        rH1 = rol1(st["H1"])
        H1u = jnp.where(lane0, st["HF"], rH1)
        # H1R carries LAST step's rol1(H1) — exactly rol1(H2) since
        # H2 == previous H1 — so the diag neighbor costs a select, not a
        # second roll of the same data (one roll per step, ~3% of fill)
        H2d = jnp.where(lane0, st["DF"], st["H1R"])
        d = H2d + s_vec

        nxt = {
            "H1R": rH1,
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
        Hn = best if noclamp else jnp.maximum(best, DT(0))

        if not lean:
            jvec = k - lane
            jout = jvec <= 0
            Hn = jnp.where(jout, gapvec if noclamp else DT(0), Hn)
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

        if gmode:
            # capture the final cell H(qlen, tlen)
            jvec2 = k - lane
            fin = (ivec == qlenv) & (jvec2 == tlenv)
            nxt["SC"] = jnp.where(fin, Hn, st["SC"])
        elif fastbv:
            # unmasked best tracking (see fastbv derivation above).  The
            # key is the SCALAR s*KM + k (same for every lane; decoded
            # host-side with the lane index via _decode_bk) — a splat
            # select, no per-step vector add.
            upd = Hn > st["BV"]
            nxt["BV"] = jnp.where(upd, Hn, st["BV"])
            nxt["BK"] = jnp.where(upd, s * KM + k, st["BK"])
        else:
            # best tracking (strict > keeps first max in (i, j) scan order)
            jvec2 = k - lane
            valid = irow_ok & (jvec2 <= tlenv)
            if not lean:
                valid = valid & (jvec2 >= 1)
            v = jnp.where(valid, Hn, DT(0))
            upd = v > st["BV"]
            nxt["BV"] = jnp.where(upd, v, st["BV"])
            nxt["BK"] = jnp.where(upd, ipack + jvec2, st["BK"])

        # rotating collectors: lane 127's value self-aligns into the
        # ascending-column window layout (see module docstring)
        nxt["CH"] = jnp.where(lane_last, Hn, rolm1(st["CH"]))
        if affine:
            nxt["CF"] = jnp.where(lane_last, Fn, rolm1(st["CF"]))
        return nxt

    def load_feeders(b):
        off = pl.multiple_of(b * LANES, LANES)
        fd = {"TF": t2_ref[:, pl.ds(off, LANES)], "HF": hbot[:, pl.ds(off, LANES)]}
        if affine:
            fd["FF"] = fbot[:, pl.ds(off, LANES)]
        return fd

    def flush(b, st):
        @pl.when(b >= 1)
        def _():
            off = pl.multiple_of((b - 1) * LANES, LANES)
            hbot[:, pl.ds(off, LANES)] = st["CH"]
            if affine:
                fbot[:, pl.ds(off, LANES)] = st["CF"]

    all_names = names + fnames

    def block_body(b, st_tuple, lean):
        st = dict(zip(all_names, st_tuple))
        st.update(load_feeders(b))
        k0 = b * LANES

        def group(gi, st_tuple):
            st = dict(zip(all_names, st_tuple))
            for uu in range(nsub):
                st = substep(k0 + gi * nsub + uu, st, lean)
            return tuple(st[n] for n in all_names)

        st_tuple = jax.lax.fori_loop(
            0, (LANES - nsub) // nsub, group, tuple(st[n] for n in all_names)
        )
        st = dict(zip(all_names, st_tuple))
        for uu in range(nsub - 1):
            st = substep(k0 + LANES - nsub + uu, st, lean)
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
                elif n == "SC":
                    # the captured final-cell score must survive across
                    # strips: with bucket padding the capture strip is not
                    # the last one (reset only at the very first strip)
                    @pl.when(s == 0)
                    def _():
                        r[:] = jnp.zeros_like(r)

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
            for uu in range(nsub):
                st = substep(k0 + gi * nsub + uu, st, False)
            return tuple(st[n] for n in all_names)

        t = jax.lax.fori_loop(
            0,
            (LANES - nsub) // nsub,
            group,
            tuple(st[n] for n in all_names),
        )
        st = dict(zip(all_names, t))
        for uu in range(nsub - 1):
            st = substep(k0 + LANES - nsub + uu, st, False)
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

    @pl.when(s == S - 1)
    def _out():
        bv_ref[:] = (st["SC"] if gmode else st["BV"]).astype(bv_ref.dtype)
        bk_ref[:] = st["SC"].astype(bk_ref.dtype) if gmode else st["BK"]


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
    """(B, 32, n_pad) i32: prof[b, a, i] = table[qpad[b, i], a].

    Out-of-table rows (the q-side pad sentinel) score -64 so paths through
    padded rows strictly decay (fastbv soundness); -64 is exact in the
    bfloat16 einsum below."""
    A1 = table.shape[0]
    tpad = jnp.full((32, 32), -64, jnp.int32).at[:A1, :A1].set(
        table.astype(jnp.int32)
    )
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
        "want_ptr",
        "gmode",
        "emode",
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
    interpret,
    want_ptr=False,
    gmode=False,
    emode=False,
    dt16=False,
):
    # letters may arrive as uint8 (4x less host->device transfer — the
    # remote tunnel moves ~25-80 MB/s, so int32 letter shipping dominated
    # streaming-product chunks); upcast on device where it fuses for free
    DTL = jnp.int16 if dt16 else jnp.int32
    qpad = qpad.astype(DTL)
    t2 = t2.astype(DTL)
    B, n_pad = qpad.shape
    W2 = t2.shape[1]
    S = n_pad // TI
    # callers (strip_bucket) pad B to a BSUB multiple; a remainder would
    # silently drop pairs off the grid
    assert B % BSUB == 0, f"batch {B} not a multiple of BSUB {BSUB}"
    GB = B // BSUB
    NB = (W2 - LANES) // LANES
    assert not (want_ptr and emode)
    assert not (gmode and emode)

    qlenc = jnp.broadcast_to(qlen[:, None].astype(jnp.int32), (B, LANES))
    tlenc = jnp.broadcast_to(tlen[:, None].astype(jnp.int32), (B, LANES))

    # fast best-tracking: when every move into the sentinel-padded region
    # strictly decreases H (gap steps cost >= 1; sentinel substitution
    # scores <= -1 in every scoring mode: packed nibble floor -4, profile
    # row fill -64, scalar mismatch), cells outside the valid
    # [1..qlen] x [1..tlen] box can never reach the valid max, so the
    # per-step validity mask (4-5 hot-loop ops) is dropped entirely: the
    # strict > update keeps the first (i, j)-scan-order max, which is
    # always a valid cell.  Local zero-clamped invalid cells sit at 0 and
    # 0 > BV(>=0 init) never fires.
    fastbv = (
        not gmode
        and gap_extend <= -1
        and ((gap_open + gap_extend <= -1) if affine else True)
        and (profile or mismatch <= -1)
    )

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
        want_ptr=want_ptr,
        gmode=gmode,
        emode=emode,
        dt16=dt16,
        fastbv=fastbv,
        # interpret mode (CPU tests) pins the unroll at 8: NSUB=32 inflates
        # the traced HLO ~4x and XLA:CPU's JIT segfaults partway through a
        # long pytest session (deterministic at ~80 compiled programs);
        # the wide unroll only pays on real TPU hardware anyway
        nsub=8 if interpret else NSUB,
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

    n_out = 2
    out_shapes = [
        jax.ShapeDtypeStruct((B, LANES), DT),
        jax.ShapeDtypeStruct((B, LANES), jnp.int32),
    ]
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
    scratch.append(pltpu.VMEM((BSUB, LANES), DT))  # bv/SC
    scratch.append(pltpu.VMEM((BSUB, LANES), jnp.int32))  # bk
    if want_ptr:
        n_persist = len(_state_names(affine, gmode)) - (
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
    if fastbv and not gmode:
        # decode the kernel's scalar key s*KM + k into the canonical
        # packed index i*(mq+1) + j (i = s*TI + lane + 1, j = k - lane)
        KM = NB * LANES
        lanev = jnp.arange(LANES, dtype=jnp.int32)[None, :]
        bk = outs[1]
        ivec = (bk // KM) * TI + lanev + 1
        jvec = bk % KM - lanev
        res["bk"] = ivec * (mq + 1) + jvec
    if want_ptr:
        res["P"] = outs[-1]
    return res


def _prep_strip(q, t, qlen, tlen, table_h, *, gap_open, gap_extend, affine):
    """Host-side strip-kernel input prep shared by strip_bucket and the
    sharded path (parallel.dist.strip_sharded): sentinel-padded query
    strips (B, n_pad) and shifted target windows (B, W2), plus the static
    kernel-parameter dict (everything but BSUB/interpret)."""
    B, n = q.shape
    m = t.shape[1]
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

    # uint8 letter arrays: 4x less host work and host->device transfer
    # (the jitted fills upcast on device); every alphabet + sentinel fits
    assert SENT_T < 256, SENT_T
    iarr = np.arange(n_pad)[None, :]
    qpad = np.full((B, n_pad), SENT_Q, np.uint8)
    qpad[:, :n] = q
    qpad = np.where(iarr < qlen[:, None], qpad, np.uint8(SENT_Q)).astype(
        np.uint8
    )

    xarr = np.arange(W2)[None, :]
    t2 = np.full((B, W2), SENT_T, np.uint8)
    t2[:, 1 : 1 + m] = t
    t2 = np.where(
        (xarr >= 1) & (xarr <= tlen[:, None]), t2, np.uint8(SENT_T)
    ).astype(np.uint8)

    kwc = dict(
        mq=m,
        match=match,
        mismatch=mismatch,
        gap_open=gap_open,
        gap_extend=gap_extend,
        affine=bool(affine),
        profile=profile,
        packed=packed,
        A1=A1,
        dt16=dt16,
    )
    return qpad, t2, kwc


def _global_post(
    bv,
    P_raw,
    qlen,
    tlen,
    *,
    affine,
    gap_open,
    gap_extend,
    want_tb,
    BSUB,
    B0,
    n_pad,
    NB,
    interpret=None,
    walked=None,
):
    """Global-mode (NW) host assembly shared by strip_bucket and the
    sharded path (parallel.dist.strip_sharded): score capture at
    H(qlen, tlen), degenerate all-gap rows, and (want_tb) the pointer
    walk to CIGARs.  ``bv`` is the (B, TI) final-score capture, ``P_raw``
    the packed pointer stream (None when !want_tb; a DEVICE array on the
    device-walk engine — see _dev_walk_enabled — else host bytes).
    ``walked``: a pre-walked (ops, ifin, jfin) triple from
    strip_fill_walk_global (the sharded fill+walk program) — skips the
    engine choice entirely."""
    B = len(qlen)
    barr0 = np.arange(B)
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
        deg = degq | degt
        if interpret is None:
            interpret = jax.devices()[0].platform != "tpu"
        if walked is not None:
            ops_h, ifin, jfin = walked
            cigars = _cigars_from_ops(
                np.asarray(ops_h), np.asarray(ifin), np.asarray(jfin)
            )
        elif isinstance(P_raw, jax.Array) and _dev_walk_enabled(interpret):
            cigars, _, _ = strip_walk_dev(
                P_raw,
                qlen,
                tlen,
                deg,
                affine=bool(affine),
                BSUB=BSUB,
                S=S_,
                NB=NB,
                interpret=interpret,
            )
        else:
            P = np.asarray(P_raw).reshape(GB, S_, NB * LANES, BSUB, TI)
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
    want_tb=True.

    mode="local" follows the two-pass canonical coords contract
    (oracle.py docstring): pass 1 is the end-only fill (no per-cell
    start-lineage state — the round-1 in-fill tracking was a structural
    2x op-count tax, VERDICT.md item 1), pass 2 recovers the canonical
    start by an anchored reverse-extension fill over the reversed
    prefixes (row-windowed, escalating — see _reverse_starts), and
    want_tb adds pass 3: a global fill+walk over the [qs:qe] x [ts:te]
    windows (so the pointer stream covers only the alignments' own
    footprint, not the full matrix).

    mode="global" (NW) captures H(qlen, tlen) and walks from there; the
    degenerate qlen==0 / tlen==0 rows are resolved host-side."""
    assert mode in ("local", "global") and band is None
    gmode = mode == "global"
    if gmode:
        want_starts = False
    if want_tb and gmode:
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
            log.info(
                "pointer-stream HBM guard: chunking %d pairs into <=%d-pair "
                "calls (%.1f MB/pair)",
                q.shape[0],
                cap_pairs,
                per_pair / 1e6,
            )
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

        # round-2 sweep: BSUB 32/64/128 -> 35.7/51.3-55.5/59.3 GCUPS
        # (small batches still clamp to the padded batch size below)
        BSUB = int(os.environ.get("SEQALIB_STRIP_BSUB", "128"))
    BSUB = max(SUBLANES, min(BSUB, _ceil_to(max(B0, SUBLANES), SUBLANES)))
    if want_tb and gmode:
        # the int8 pointer block's (BSUB, TI) trailing dims must respect
        # the int8 (32, 128) min tile
        BSUB = max(BSUB, 32)

    B = _ceil_to(max(B0, SUBLANES), BSUB)
    if B != B0:
        # zero-length sentinel padding: padded slots are masked in-kernel
        # and skip all start-recovery / traceback work
        pad = B - B0
        q = np.concatenate([q, np.zeros((pad, q.shape[1]), q.dtype)], axis=0)
        t = np.concatenate([t, np.zeros((pad, t.shape[1]), t.dtype)], axis=0)
        qlen = np.concatenate([qlen, np.zeros(pad, qlen.dtype)])
        tlen = np.concatenate([tlen, np.zeros(pad, tlen.dtype)])

    qpad, t2, kwc = _prep_strip(
        q, t, qlen, tlen, table_h, gap_open=gap_open, gap_extend=gap_extend,
        affine=bool(affine),
    )
    dt16 = kwc["dt16"]
    A1 = kwc["A1"]
    SENT_Q, SENT_T = A1, A1 + 1
    n_pad = qpad.shape[1]
    NB = (t2.shape[1] - LANES) // LANES
    match, mismatch = kwc["match"], kwc["mismatch"]
    profile, packed = kwc["profile"], kwc["packed"]

    dev_args = (
        jnp.asarray(qpad),
        jnp.asarray(t2),
        jnp.asarray(qlen),
        jnp.asarray(tlen),
        jnp.asarray(table_h),
    )
    kwc = dict(kwc, BSUB=BSUB, interpret=interpret)
    need_starts = (want_starts or want_tb) and not gmode
    fused_tb = False
    if need_starts:
        if want_tb and _dev_walk_enabled(interpret) and B % 32 == 0:
            # HBM guard for the in-program pass-3 pointer stream (same
            # budget as the gmode chunking above); oversized batches
            # keep the two-phase host-windowed path, which sizes its
            # windows to the spans
            cap_bytes = int(
                float(
                    _os.environ.get("SEQALIB_PTR_HBM_CAP", str(2 * 1024**3))
                )
            )
            per_pair = n_pad * (t2.shape[1] - LANES)
            fused_tb = B * per_pair <= cap_bytes
        # resolve the window HERE, not inside the jitted body: WR is a
        # static cache key, and an env-read at trace time with WR=None in
        # the key would silently reuse a stale compile after the env
        # changes within one process
        fused_fn = _strip_local_fused_tb if fused_tb else _strip_local_fused
        res = fused_fn(
            *dev_args,
            WR=fused_wr(),
            **fused_pass2_knobs(interpret),
            **kwc,
        )
        if fused_tb:
            # two fetches total (meta + packed ops): each device->host
            # buffer fetch costs a ~30ms round trip on the remote link
            meta = np.asarray(res["meta"])
            ops_p = np.asarray(res["ops_p"])
            u = np.stack(
                [
                    (ops_p >> 6) & 3,
                    (ops_p >> 4) & 3,
                    (ops_p >> 2) & 3,
                    ops_p & 3,
                ],
                axis=2,
            ).reshape(ops_p.shape[0], -1)
            res = {
                "score": meta[0],
                "qe": meta[1],
                "te": meta[2],
                "qs": meta[3],
                "ts": meta[4],
                "score2": meta[5],
                "score_w": meta[6],
                "ifin": meta[7],
                "jfin": meta[8],
                "ops": np.where(u == 3, 255, u).astype(np.uint8),
            }
    else:
        res = _strip_fill(*dev_args, want_ptr=want_tb and gmode, gmode=gmode, **kwc)
        bv = np.asarray(res["bv"]).astype(np.int32)  # (B, 128)
        bk = np.asarray(res["bk"])
    stride = m + 1
    if gmode:
        return _global_post(
            bv,
            res.get("P"),
            qlen,
            tlen,
            affine=bool(affine),
            gap_open=gap_open,
            gap_extend=gap_extend,
            want_tb=want_tb,
            BSUB=BSUB,
            B0=B0,
            n_pad=n_pad,
            NB=NB,
        )
    if not need_starts:
        score, qe, te = _reduce_best(bv, bk, stride)
        return {
            "score": score.astype(np.int32)[:B0],
            "qe": qe.astype(np.int32)[:B0],
            "te": te.astype(np.int32)[:B0],
            "qs": np.zeros(B0, np.int32),
            "ts": np.zeros(B0, np.int32),
        }

    score = np.asarray(res["score"]).astype(np.int32)
    qe = np.asarray(res["qe"]).astype(np.int64)
    te = np.asarray(res["te"]).astype(np.int64)
    qs = np.asarray(res["qs"]).astype(np.int32)
    ts = np.asarray(res["ts"]).astype(np.int32)
    out = {
        "score": score,
        "qe": qe.astype(np.int32),
        "te": te.astype(np.int32),
    }
    # escalation: pairs whose alignment spans more than the fused pass-2
    # row window didn't reproduce the score there — rerun wider (rare)
    fail = (np.asarray(res["score2"]).astype(np.int32) != score) & (score > 0)
    if fail.any():
        log.info(
            "two-pass start recovery: %d/%d pairs escalated past the fused "
            "%d-row window",
            int(fail.sum()),
            B0,
            fused_wr(),
        )
        qs2, ts2 = _reverse_starts(
            q,
            t,
            np.where(fail, score, 0),
            qe,
            te,
            table_h,
            gap_open=gap_open,
            gap_extend=gap_extend,
            affine=bool(affine),
            BSUB=BSUB,
            interpret=interpret,
            Wq0=max(4 * TI, 2 * fused_wr()),
        )
        qs = np.where(fail, qs2, qs)
        ts = np.where(fail, ts2, ts)
    out["qs"] = qs.astype(np.int32)
    out["ts"] = ts.astype(np.int32)
    if not want_tb:
        return {k: v[:B0] for k, v in out.items()}

    if fused_tb:
        # single-program path: ops walked on device; validate the
        # window-global score (the same invariant window_global_cigars
        # asserts) on the non-escalated pairs, then assemble
        ok = ~fail & (score > 0)
        score_w = res["score_w"].astype(np.int32)
        if not np.array_equal(score_w[ok], score[ok]):
            # not an assert: this is the one-program path's correctness
            # gate and must survive python -O
            raise RuntimeError(
                "window-global score must equal the local score"
            )
        cigars = _cigars_from_ops(res["ops"], res["ifin"], res["jfin"])
        for b in range(len(cigars)):
            if score[b] <= 0:
                cigars[b] = ""
        if fail.any():
            # escalated pairs were windowed from pre-escalation starts;
            # rebuild exactly those on the host-windowed path
            idx = np.nonzero(fail)[0]
            fixed = window_global_cigars(
                q[idx], t[idx], score[idx], qs[idx], qe[idx], ts[idx],
                te[idx], table_h,
                gap_open=gap_open, gap_extend=gap_extend, affine=affine,
            )
            for r, b in enumerate(idx):
                cigars[b] = fixed[r]
    else:
        cigars = window_global_cigars(
            q, t, score, qs, qe, ts, te, table_h,
            gap_open=gap_open, gap_extend=gap_extend, affine=affine,
            BSUB=BSUB,
        )
    res2 = {k: v[:B0] for k, v in out.items()}
    res2["cigars"] = cigars[:B0]
    return res2


def window_global_cigars(
    q, t, score, qs, qe, ts, te, table_h, *, gap_open, gap_extend, affine,
    BSUB=None,
):
    """Pass 3 of the two-pass local coords scheme: canonical CIGAR of each
    pair = the GLOBAL traceback of its coordinate window q[qs:qe] x
    t[ts:te] (whose optimal global score provably equals the local score,
    asserted below).  Shared by strip_bucket and the sharded path
    (parallel.dist.strip_sharded).  score<=0 pairs get an empty CIGAR."""
    B = q.shape[0]
    n, m = q.shape[1], t.shape[1]
    A1 = int(table_h.shape[0])
    sent_q, sent_t = A1, A1 + 1
    wq = (np.asarray(qe, np.int64) - qs).astype(np.int64)
    wt = (np.asarray(te, np.int64) - ts).astype(np.int64)
    Lw_q = int(max(wq.max(), 1))
    Lw_t = int(max(wt.max(), 1))
    karr = np.arange(Lw_q)[None, :]
    qw = np.full((B, Lw_q), sent_q, np.int32)
    if n:
        qw = np.where(
            karr < wq[:, None],
            q[np.arange(B)[:, None], np.minimum(np.asarray(qs)[:, None] + karr, n - 1)],
            sent_q,
        ).astype(np.int32)
    karr = np.arange(Lw_t)[None, :]
    tw = np.full((B, Lw_t), sent_t, np.int32)
    if m:
        tw = np.where(
            karr < wt[:, None],
            t[np.arange(B)[:, None], np.minimum(np.asarray(ts)[:, None] + karr, m - 1)],
            sent_t,
        ).astype(np.int32)
    win = strip_bucket(
        qw,
        tw,
        wq.astype(np.int32),
        wt.astype(np.int32),
        table_h,
        mode="global",
        gap_open=gap_open,
        gap_extend=gap_extend,
        affine=affine,
        want_tb=True,
        BSUB=BSUB,
    )
    assert np.array_equal(np.asarray(win["score"]), np.asarray(score)), (
        "window-global score must equal the local score"
    )
    return ["" if score[b] <= 0 else win["cigars"][b] for b in range(B)]


def _reduce_best_jnp(bv, bk, stride):
    """In-jit canonical argmax reduce (see _reduce_best)."""
    bv = bv.astype(jnp.int32)
    score = jnp.max(bv, axis=1)
    big = jnp.int32(np.iinfo(np.int32).max)
    masked_bk = jnp.where(bv == score[:, None], bk, big)
    packed_best = jnp.min(masked_bk, axis=1)
    empty = score <= 0
    bi = jnp.where(empty, 0, packed_best // stride)
    bj = jnp.where(empty, 0, packed_best % stride)
    return score, bi, bj


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
        "dt16",
        "interpret",
        "WR",
        "pass2",
        "bw",
        "nsub",
        "split",
        "tie_safe",
        "pc2",
    ),
)
def _strip_local_fused(
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
    dt16,
    interpret,
    WR=None,
    pass2="banded",
    bw=64,
    nsub=None,
    split=None,
    tie_safe=False,
    pc2=128,
):
    """Fused two-pass local coords, fully inside jit: the end-only local
    fill, the canonical-end reduce, the reversed-prefix gathers, and the
    windowed (WR rows x ~2*WR columns) anchored reverse-extension fill.

    Returns score/qe/te/qs/ts plus the extension max score2; a pair whose
    alignment extends past the window has score2 < score and must be
    escalated host-side (strip_bucket._reverse_starts).  One jit means the
    whole coords path is a single device program — the unit the mesh path
    shard_maps and the bench times.

    The column clamp (~2*WR target columns) is sound for every realistic
    scoring scheme: a start outside it but inside the WR-row window would
    need an optimal alignment with > WR net deletions (gap cost
    >= |gap_open| + WR*|gap_extend|), and any *score* shortfall from the
    clamp is caught by the score2 != score escalation check.  Override the
    row window with SEQALIB_FUSED_WR (rounded up to a strip multiple).

    Canonical-start guarantee boundary (windowed pass 2, both engines):
    escalation catches every SCORE shortfall, but a co-optimal TIE whose
    canonical (smallest-ri) cell lies outside the window while another
    optimal cell lies inside would return the in-window start without
    escalating.  The ROW window is tie-safe by construction (the canonical
    cell has the minimal ri of all ties, so it is inside any row window
    that contains an optimal cell at all).  Residual exposure: (a) banded
    engine — a tie whose path's gap imbalance exceeds bw=64 at any point
    (needs >= 2*(|gap_open| + 65*|gap_extend|) of extra gap cost repaid
    exactly to a tie by extra matches); (b) either engine — a tie with
    > ~WR net deletions (the column clamp).  Both require adversarially
    constructed knife-edge score ties; the oracle's full-width reverse
    extension remains the definition, and `SEQALIB_FUSED_PASS2=strip`
    narrows the exposure to (b) only (its column window is the full
    target at lengths <= ~2*WR, e.g. the whole 1kb contract domain).

    ``tie_safe=True`` (env SEQALIB_FUSED_TIE_SAFE=1) CLOSES exposure (a)
    soundly: the banded pass-2 kernel tracks, per window-edge slot, the
    crossing bound  max(E/F_edge - smax*i)  and the pair escalates to the
    oracle-exact host rescan whenever  EV + smax*found_ri + e >= score —
    every path to an outside co-optimal cell must cross an edge slot, and
    its suffix gains at most smax per row plus one gap step, so no
    outside tie survives the check (BASELINE.md "Canonical-tie
    escalation" derives this and why it cannot be the default: the bound
    is adversarial-proof, so its smax slope escalates most long genuine
    alignments on random data — correctness mode, not headline mode).
    """
    if WR is None:
        # pure default only — env overrides resolve at the host boundary
        # (fused_wr()/fused_pass2_knobs() in strip_bucket/strip_sharded)
        # so they always land in the jit cache key
        WR = 4 * TI
    # uint8 letter shipping (see _strip_fill): upcast once on device
    DTL = jnp.int16 if dt16 else jnp.int32
    qpad = qpad.astype(DTL)
    t2 = t2.astype(DTL)
    kw = dict(
        BSUB=BSUB,
        mq=mq,
        match=match,
        mismatch=mismatch,
        gap_open=gap_open,
        gap_extend=gap_extend,
        affine=affine,
        profile=profile,
        packed=packed,
        A1=A1,
        dt16=dt16,
        interpret=interpret,
    )
    r1 = _strip_fill(qpad, t2, qlen, tlen, table, **kw)
    score, qe, te = _reduce_best_jnp(r1["bv"], r1["bk"], mq + 1)

    SENT_Q, SENT_T = A1, A1 + 1
    n_pad = qpad.shape[1]
    W2 = t2.shape[1]
    WR = min(WR, n_pad)  # qe <= qlen <= n_pad: never wider than pass 1
    # reversed prefixes: row k <-> q[qe-1-k] = qpad[qe-1-k]; column
    # x <-> t[te-x] = t2[te-x+1].  A reversed prefix is a CONTIGUOUS slice
    # of the statically flipped array, so each pair needs one row-granular
    # dynamic_slice instead of an element-granular gather (the
    # take_along_axis form cost more than the entire pass-1 fill on TPU).
    karr = jnp.arange(WR, dtype=jnp.int32)[None, :]
    B = qpad.shape[0]
    # row-wise windowed gathers go through the Pallas kernel when the
    # batch is sublane-aligned (the vmap(dynamic_slice) form lowers to a
    # sequential while over rows — 6% of the fused program wall)
    fastwin = B % SUBLANES == 0

    def _win(src, starts, hi, L, lo, fill):
        if fastwin:
            return _row_window(
                src, starts, hi, L=L, lo=lo, fill=fill, interpret=interpret
            )
        raw = jax.vmap(
            lambda row, start: jax.lax.dynamic_slice_in_dim(row, start, L)
        )(src, starts)
        x = jnp.arange(L, dtype=jnp.int32)[None, :]
        return jnp.where((x >= lo) & (x < hi[:, None]), raw, fill)

    # sentinel tail keeps every dynamic start in bounds (XLA would clamp
    # out-of-bounds starts, silently shifting the slice)
    qpadf = jnp.concatenate(
        [jnp.flip(qpad, axis=1), jnp.full((B, WR + LANES), SENT_Q, qpad.dtype)],
        axis=1
    )  # qpadf[b, y] = qpad[b, n_pad-1-y]
    qr = _win(qpadf, n_pad - qe, qe, WR, 0, SENT_Q).astype(qpad.dtype)
    # clamped pass-2 target width: data columns 1..TWD plus the same
    # 2-block slack pass 1 carries (t2 layout invariant)
    W2r = min(W2, (_ceil_to(2 * WR, LANES) // LANES + 2) * LANES)
    TWD = W2r - 2 * LANES
    te2 = jnp.minimum(te, TWD)
    t2f = jnp.concatenate(
        [jnp.flip(t2, axis=1), jnp.full((B, W2r + LANES), SENT_T, t2.dtype)],
        axis=1
    )  # t2f[b, y] = t2[b, W2-1-y]
    # tr[b, x] = t2[b, te-x+1] = t2f[b, (W2-2-te) + x]
    tr = _win(t2f, W2 - 2 - te, te2 + 1, W2r, 1, SENT_T).astype(t2.dtype)
    # pass-2 engine: the banded extension kernel does O(span * BW) work
    # (~10% of pass 1) vs the strip engine's O(WR * 2WR) (~30%); a start
    # whose net gap exceeds BW misses the score and escalates, same as the
    # window clamp.  Wide-range (non-packed) profiles stay on strip.
    use_banded = pass2 == "banded" and (not profile or packed)
    engine = pass2
    if engine == "none":
        # timing diagnostic ONLY: skip pass 2 (score2 := score disarms the
        # escalation gate; starts are WRONG).  Isolates the glue cost
        # (reversed-prefix extraction, profile rebuild) from the pass-2
        # kernel cost when benchmarked against "banded"/"strip".
        score2 = score
        # data-dependent always-zero term keeps the glue un-DCE'd
        ri = jnp.where(qr.sum(axis=1) + tr.sum(axis=1) < jnp.int32(-(1 << 30)),
                       1, 0).astype(score.dtype)
        rj = jnp.zeros_like(score)
    elif use_banded:
        from .banded_pallas import band_fill_range

        BW = bw
        Wpb = _ceil_to((2 * BW + 1) // 2 + 2, LANES)
        # CKb=64 gives the pass-2 fill a full clamp chunk (k <= BW=64):
        # with the round-4 phase machinery the whole fill runs on static
        # rolls except the one dyn transition chunk (_phase_runs)
        CKb = 64
        Kp = _ceil_to(WR + min(TWD, WR + BW) + 1, CKb)
        # + 2*LANES: the steady kernel's group-batched top-ups load
        # 2-lane-block aligned supersets around ih0 + Wp - 1 (banded
        # _band_kernel fast_tops) — the widths must cover them
        qwidth_b = _ceil_to((Kp - BW) // 2 + Wpb + 2, LANES) + 2 * LANES
        twidth_b = _ceil_to(Kp + 2, LANES) + 2 * LANES
        NEGj = jnp.int32(NEG_INF)
        # pure defaults mirror fused_pass2_knobs(); env overrides never
        # reach this body (they'd dodge the jit cache key — see
        # fused_pass2_knobs' docstring for the vacuous-test incident)
        nsub_f = nsub if nsub is not None else (4 if interpret else 32)
        # phase-split (round 4, generalizing round 3's split-steady):
        # clamp chunk(s) + one dyn transition chunk + parity-static steady
        # chunks — every roll shift is a compile-time constant outside the
        # transition chunk.  Values are identical (the phase split is
        # exact); the resume protocol carries BV/BK in the state.
        split_f = (
            (split if split is not None else True)
            and Kp > CKb
            and CKb % nsub_f == 0
            and nsub_f % 2 == 0
        )
        if profile:
            # the reversed-prefix profile is a flip+slice of the PASS-1
            # profile: a packed word is a pure function of the letter, and
            # _strip_fill builds profile(qpad) inside this same jit, so the
            # build below CSEs with it — no second one-hot/einsum rebuild.
            # Sentinel positions (k >= qe, and the 1-based column 0) take
            # the all-zero word = the sentinel letter's own packed word.
            prof_pad = _build_profile_packed(qpad, table)  # (B, G, n_pad)
            proff = jnp.concatenate(
                [
                    jnp.flip(prof_pad, axis=2),
                    jnp.zeros((B, 4, WR + LANES), prof_pad.dtype),
                ],
                axis=2,
            )  # proff[b, g, y] = prof_pad[b, g, n_pad-1-y]
            if fastwin:
                # rows (b, g) flattened b-major: starts/hi repeat per group
                prof_qr = _row_window(
                    proff.reshape(B * 4, -1),
                    jnp.repeat(n_pad - qe, 4),
                    jnp.repeat(qe, 4),
                    L=WR,
                    lo=0,
                    fill=0,
                    interpret=interpret,
                ).reshape(B, 4, WR)
            else:
                prof_qr = jax.vmap(
                    lambda rows, start: jax.lax.dynamic_slice_in_dim(
                        rows, start, WR, axis=1
                    )
                )(proff, n_pad - qe)  # (B, G, WR): word of qpad[qe-1-k]
                prof_qr = jnp.where(
                    karr[:, None, :] < qe[:, None, None], prof_qr, 0
                )
        else:
            prof_qr = None

        def _p2_banded(qr_c, tr_c, qe_c, te2_c, prof_c, score_c):
            """Banded reverse-extension for one <=PC2-pair slice.

            band_fill_range holds its whole batch resident in VMEM (no
            batch grid), so an unchunked B=512 launch blows the 16M
            scoped-vmem limit (measured 16.89M on-chip) — the kernel is
            invoked per PC2-slice and lax.map'd below for large B.
            """
            Bc = qr_c.shape[0]
            # 1-based letter arrays (banded convention: arr[:, x] = seq[x-1])
            qkb = jnp.concatenate(
                [
                    jnp.full((Bc, 1), SENT_Q, jnp.int32),
                    qr_c.astype(jnp.int32),
                    jnp.full((Bc, max(0, qwidth_b - 1 - WR)), SENT_Q, jnp.int32),
                ],
                axis=1,
            )[:, :qwidth_b]
            tkb = jnp.concatenate(
                [
                    tr_c.astype(jnp.int32),
                    jnp.full((Bc, max(0, twidth_b - W2r)), SENT_T, jnp.int32),
                ],
                axis=1,
            )[:, :twidth_b]
            qlen2 = jnp.minimum(qe_c, WR).astype(jnp.int32)
            te2b = jnp.minimum(te2_c, WR + BW).astype(jnp.int32)
            if profile:
                qin_b = jnp.concatenate(
                    [
                        jnp.zeros((Bc, 4, 1), jnp.int32),
                        prof_c.astype(jnp.int32),
                        jnp.zeros(
                            (Bc, 4, max(0, qwidth_b - 1 - WR)), jnp.int32
                        ),
                    ],
                    axis=2,
                )[:, :, :qwidth_b]
                qin_b = jnp.transpose(qin_b, (1, 0, 2))  # (G, Bc, qwidth_b)
                qrows = qin_b[:, :, :Wpb]
            else:
                qin_b = qkb
                qrows = qkb[None, :, :Wpb]
            state0b = jnp.concatenate(
                [
                    jnp.full((4, Bc, Wpb), NEGj),  # H1 H2 E F
                    qrows,  # letter/profile windows
                    jnp.zeros((1, Bc, Wpb), jnp.int32),  # TW
                    jnp.full((1, Bc, Wpb), NEGj),  # BV
                    jnp.zeros((1, Bc, Wpb), jnp.int32),  # BK
                ],
                axis=0,
            )
            fillkw = dict(
                K=Kp,
                Wp=Wpb,
                dlo=-BW,
                dhi=BW,
                match=match,
                mismatch=mismatch,
                gap_open=gap_open,
                gap_extend=gap_extend,
                want_ptr=False,
                want_ckpt=False,
                CK=CKb,
                interpret=interpret,
                profile=profile,
                emode=True,
                nsub=nsub_f,
                tie_safe=tie_safe,
                # packed tables are bounded by the nibble range; scalar
                # scoring by the match profit (static, sound upper bounds)
                smax=(15 - NIBBLE_BIAS) if profile else max(match, mismatch),
            )
            fillargs = (
                qin_b,
                tkb,
                qlen2,
                te2b,
                jnp.full((Bc,), -BW, jnp.int32),
                jnp.full((Bc,), BW, jnp.int32),
            )
            score_neg = jnp.full((Bc, Wpb), NEGj)
            if split_f:
                from ..models.banded import _phase_runs

                ev_out, st_out = score_neg, state0b
                for k0r, k1r, ph in _phase_runs(0, Kp, CKb, BW):
                    # score_in threads the tie_safe EV accumulator
                    ev_out, st_out, _, _ = band_fill_range(
                        *fillargs, st_out, ev_out, k_start=k0r, k_end=k1r,
                        phase=ph, **fillkw,
                    )
            else:
                ev_out, st_out, _, _ = band_fill_range(
                    *fillargs, state0b, score_neg, k_start=0, k_end=Kp,
                    **fillkw
                )
            BVb, BKb = st_out[-2], st_out[-1]
            # decode: slot p on diagonal k is cell i = ihat(k)+p, j = k-i
            iv = jnp.maximum(0, (BKb - BW + 1) // 2) + jnp.arange(
                Wpb, dtype=jnp.int32
            )[None, :]
            packedb = iv * (mq + 1) + (BKb - iv)
            score2_c = jnp.max(BVb, axis=1)
            big = jnp.int32(np.iinfo(np.int32).max)
            pb = jnp.min(
                jnp.where(BVb == score2_c[:, None], packedb, big), axis=1
            )
            emptyb = score2_c <= 0
            ri_c = jnp.where(emptyb, 0, pb // (mq + 1))
            rj_c = jnp.where(emptyb, 0, pb % (mq + 1))
            if tie_safe:
                # sound canonical-tie check (docstring): escalate (via a
                # forced score2 mismatch -> host rescan) when an outside
                # co-optimal cell with a smaller packed index cannot be
                # ruled out from the window-edge crossing bound
                ev = jnp.max(ev_out, axis=1)
                risk = (
                    ev
                    + jnp.int32(fillkw["smax"]) * ri_c
                    + jnp.int32(gap_extend)
                    >= score_c
                )
                score2_c = jnp.where(
                    risk & (score2_c == score_c), score_c - 1, score2_c
                )
            return score2_c, ri_c, rj_c

        PC2 = pc2  # pairs per band_fill_range launch (scoped-vmem bound)
        if B > PC2:
            Bp = _ceil_to(B, PC2)
            padn = Bp - B

            def _padrows(x, v):
                if padn == 0:
                    return x
                return jnp.concatenate(
                    [x, jnp.full((padn,) + x.shape[1:], v, x.dtype)], axis=0
                )

            # pad rows are empty pairs (qe=te2=0): the kernel leaves BV
            # at NEG so they decode to ri=rj=0 and are sliced off below
            xs = (
                _padrows(qr, SENT_Q),
                _padrows(tr, SENT_T),
                _padrows(qe, 0),
                _padrows(te2, 0),
                _padrows(score, 0),
            ) + ((_padrows(prof_qr, 0),) if profile else ())
            xs = jax.tree.map(
                lambda x: x.reshape((Bp // PC2, PC2) + x.shape[1:]), xs
            )
            score2, ri, rj = jax.lax.map(
                lambda a: _p2_banded(
                    a[0], a[1], a[2], a[3], a[5] if profile else None, a[4]
                ),
                xs,
            )
            score2 = score2.reshape(Bp)[:B]
            ri = ri.reshape(Bp)[:B]
            rj = rj.reshape(Bp)[:B]
        else:
            score2, ri, rj = _p2_banded(qr, tr, qe, te2, prof_qr, score)
    else:
        r2 = _strip_fill(
            qr,
            tr,
            jnp.minimum(qe, WR),
            te2,
            table,
            emode=True,
            **kw,
        )
        score2, ri, rj = _reduce_best_jnp(r2["bv"], r2["bk"], mq + 1)
        if tie_safe:
            # class-(b) closure for the STRIP engine (round 5): a
            # beyond-clamp co-optimal tie can only exist when the column
            # window was actually truncated (te > TWD) — the strip engine
            # has no banded-edge EV accumulator, so the sound move is to
            # escalate every clamped pair to the oracle-exact host rescan
            # (the banded engine needs no such rule: any beyond-clamp
            # cell there has d > BW, so every path to it crosses the
            # EV-tracked band edge — see the round-5 BASELINE note)
            score2 = jnp.where(
                (te > TWD) & (score2 == score), score - 1, score2
            )
    pos = score > 0
    qs = jnp.where(pos, qe - ri, 0)
    ts = jnp.where(pos, te - rj, 0)
    return {
        "score": score,
        "qe": qe,
        "te": te,
        "qs": qs,
        "ts": ts,
        "score2": score2,
    }


def _reduce_best(bv: np.ndarray, bk: np.ndarray, stride: int):
    """Canonical argmax reduce over the per-lane bests: score = max, cell =
    min packed index among maxima (= smallest i, then smallest j)."""
    score = bv.max(axis=1)
    masked_bk = np.where(bv == score[:, None], bk, np.iinfo(np.int32).max)
    lsel = masked_bk.argmin(axis=1)
    packed_best = bk[np.arange(len(bv)), lsel]
    empty = score <= 0
    bi = np.where(empty, 0, packed_best // stride)
    bj = np.where(empty, 0, packed_best % stride)
    return score, bi, bj


def _reverse_starts(
    q: np.ndarray,
    t: np.ndarray,
    score: np.ndarray,
    qe: np.ndarray,
    te: np.ndarray,
    table_h: np.ndarray,
    *,
    gap_open: int,
    gap_extend: int,
    affine: bool,
    BSUB: int,
    interpret: bool,
    Wq0: int = TI,
):
    """Canonical local starts by anchored reverse extension (pass 2).

    For each pair with score > 0, aligns reverse(q[:qe]) vs reverse(t[:te])
    with the global recurrence (emode) and takes the first score-max cell
    (ri, rj) in scan order; the canonical start is (qe - ri, te - rj).

    The query side is row-windowed to Wq rows (escalating x4 on failure):
    with the FULL reversed target span always scanned, finding the target
    score inside the window is sufficient — every competitor with a
    smaller ri lies inside the window too — so acceptance needs no
    geometric slack bound.  Random-data alignments fit Wq=128 almost
    always, so pass 2 costs ~Wq/n of pass 1."""
    B = len(score)
    qs = np.zeros(B, np.int32)
    ts = np.zeros(B, np.int32)
    pend = np.nonzero(score > 0)[0]
    A1 = int(table_h.shape[0])
    SENT_Q, SENT_T = A1, A1 + 1
    profile = bool(A1 > 8)
    packed = bool(
        profile
        and table_h.min() >= -NIBBLE_BIAS
        and table_h.max() <= 15 - NIBBLE_BIAS
    )
    match = int(table_h[0, 0])
    mismatch = int(table_h[0, 1]) if A1 > 1 else match
    Wq = Wq0
    while pend.size:
        qe_s = qe[pend].astype(np.int64)
        te_s = te[pend].astype(np.int64)
        n_pad = min(Wq, _ceil_to(int(qe_s.max()), TI))
        wq = np.minimum(qe_s, n_pad)
        m_sub = int(te_s.max())
        m_pad = _ceil_to(max(m_sub, 1), LANES)
        W2 = (m_pad // LANES + 2) * LANES
        bs_sub = max(SUBLANES, min(BSUB, _ceil_to(len(pend), SUBLANES)))
        Bs = _ceil_to(max(len(pend), SUBLANES), bs_sub)

        # reversed prefixes: row k <-> q[qe-1-k]; column x <-> t[te-x]
        karr = np.arange(n_pad)[None, :]
        idx = qe_s[:, None] - 1 - karr
        qr = np.full((Bs, n_pad), SENT_Q, np.int32)
        qr[: len(pend)] = np.where(
            idx >= 0, q[pend[:, None], np.maximum(idx, 0)], SENT_Q
        )
        xarr = np.arange(W2)[None, :]
        tidx = te_s[:, None] - xarr
        tr = np.full((Bs, W2), SENT_T, np.int32)
        tr[: len(pend)] = np.where(
            (xarr >= 1) & (tidx >= 0),
            t[pend[:, None], np.clip(tidx, 0, t.shape[1] - 1)],
            SENT_T,
        )
        qlen_r = np.zeros(Bs, np.int32)
        qlen_r[: len(pend)] = wq
        tlen_r = np.zeros(Bs, np.int32)
        tlen_r[: len(pend)] = te_s

        res = _strip_fill(
            jnp.asarray(qr),
            jnp.asarray(tr),
            jnp.asarray(qlen_r),
            jnp.asarray(tlen_r),
            jnp.asarray(table_h),
            BSUB=bs_sub,
            mq=m_sub,
            match=match,
            mismatch=mismatch,
            gap_open=gap_open,
            gap_extend=gap_extend,
            affine=affine,
            profile=profile,
            packed=packed,
            A1=A1,
            emode=True,
            interpret=interpret,
        )
        bv = np.asarray(res["bv"]).astype(np.int32)[: len(pend)]
        bk = np.asarray(res["bk"])[: len(pend)]
        score2, ri, rj = _reduce_best(bv, bk, m_sub + 1)
        ok = score2 == score[pend]
        # full-height windows must reproduce the score — anything else is a
        # kernel/contract bug, not a windowing artifact
        assert np.all(ok | (qe_s > n_pad)), (
            "reverse extension lost the local score",
            pend[~(ok | (qe_s > n_pad))],
        )
        sel = pend[ok]
        qs[sel] = (qe[sel] - ri[ok]).astype(np.int32)
        ts[sel] = (te[sel] - rj[ok]).astype(np.int32)
        pend = pend[~ok]
        Wq *= 4
    return qs, ts


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



# compile-time op codes for the walk kernels (== utils.cigar.OP_M/I/D;
# pinned by tests/test_native.py's codec round-trips)
OP_M_, OP_I_, OP_D_ = 0, 1, 2


def _dev_walk_enabled(interpret: bool) -> bool:
    """Engine choice for the global-mode strip traceback walk.

    auto (default): the DEVICE walk on real TPU — the pointer stream
    (~n_pad*(m_pad+TI) bytes/pair, ~670MB for a B=512 1kb window batch)
    never leaves the chip and the host receives a (B, S*K) int8 op
    matrix instead (~140x smaller); the host walkers keep interpret/CPU
    duty where a Pallas sweep is slower than the native C++ walk.
    SEQALIB_STRIP_DEV_WALK=1/0 forces either engine (tests pin parity
    with =1 in interpret mode)."""
    v = _os.environ.get("SEQALIB_STRIP_DEV_WALK", "auto")
    if v in ("0", "1"):
        return v == "1"
    return not interpret


@functools.partial(
    jax.jit,
    static_argnames=("S", "K", "BSUB", "affine", "interpret"),
)
def strip_walk_range(P, iv, jv, stv, donev, *, S, K, BSUB, affine,
                     interpret):
    """On-device traceback walk over the strip-layout pointer stream
    (global/NW mode) — the strip twin of banded_pallas.band_walk_range
    (VERDICT round-4 item 1).

    P: the (GB*S*NB*LANES, BSUB, TI) int8 want_ptr output of
    ``_strip_fill`` (never fetched); P[gb, s, k, pr, p] is the packed
    byte of cell (i = s*TI + p + 1, j = k - p), pair gb*BSUB + pr
    (see _strip_walk).  iv/jv/stv/donev: (B,) int32 walker state.

    Sweep order: strips DESCENDING, local diagonals k DESCENDING within
    each strip — a walker inside strip s moves to strictly smaller k
    every step (M: k-2, I/D: k-1) until it crosses into strip s-1
    (where it freezes until that strip's pass) or reaches the implicit
    row-0/column-0 boundary (i<1 or j<1: done; the HOST appends the
    deterministic all-D / all-I boundary run — see the ST_F-at-row-0
    impossibility note in strip_walk_dev).  Each strip pass reads only
    its own pointer blocks, so the whole sweep reads P exactly once.

    Returns (ops (B, S*Kp) int8 — column s*Kp + k holds the op consumed
    at strip s, diagonal k, 255 = none; ASCENDING array order IS
    start->end path order — plus i'/j'/st'/done' (B,) int32).
    """
    ST_H, ST_E, ST_F = 0, 1, 2
    BT = iv.shape[0]
    GB = BT // BSUB
    assert K % LANES == 0, K
    # batch chunking: the walker state/scratch/ops blocks all scale with
    # B and live in VMEM, so one launch serves at most BCAP pairs; the
    # HBM guards upstream bound only the pointer stream (a 4096-pair
    # short-read batch used to blow scoped vmem here)
    BCAP = 512
    B = min(BT, BCAP)
    # block cap ~1MB keeps the double-buffered pointer window modest
    WSTEP = next(
        w for w in (16, 8, 4, 2, 1)
        if w * B * TI <= (1 << 21) or w == 1
    )
    NG = K // WSTEP
    KC = K // LANES  # ops column blocks per strip

    def kern(ptr_ref, st_in_ref, ops_ref, st_out_ref, s_i, s_j, s_st, s_dn):
        sg = pl.program_id(0)
        g = pl.program_id(1)
        s_real = S - 1 - sg
        base = K - (g + 1) * WSTEP
        parr = jax.lax.broadcasted_iota(jnp.int32, (B, TI), 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, LANES), 1)

        @pl.when((sg == 0) & (g == 0))
        def _init():
            s_i[:] = st_in_ref[0]
            s_j[:] = st_in_ref[1]
            s_st[:] = st_in_ref[2]
            s_dn[:] = st_in_ref[3]

        # fresh ops block: first touch is its top column (K % LANES == 0,
        # so strip transitions land exactly on block boundaries)
        @pl.when((base + WSTEP - 1) % LANES == LANES - 1)
        def _blank():
            ops_ref[...] = jnp.full((B, LANES), 255, jnp.int32)

        i = s_i[:]
        j = s_j[:]
        st = s_st[:]
        done = s_dn[:]
        opsv = ops_ref[...]
        for u in range(WSTEP):
            c = WSTEP - 1 - u  # descending diagonals within the step
            kidx = base + c
            # implicit boundary: row 0 is all-D, column 0 all-I — the
            # host appends those runs; mark done BEFORE the read
            done = jnp.where((i < 1) | (j < 1), 1, done)
            iz = i - 1  # i >= 1 wherever done == 0
            sb = iz // TI
            pb = iz - sb * TI
            act = (done == 0) & (sb == s_real) & ((j + pb) == kidx)
            prow = ptr_ref[:, c].reshape(B, TI)
            byte = jnp.sum(
                jnp.where(parr == pb[:, 0:1], prow.astype(jnp.int32), 0),
                axis=1,
                keepdims=True,
            )
            byte = jnp.broadcast_to(byte, (B, LANES))
            ph = byte & 3
            ee = (byte >> 2) & 1
            ef = (byte >> 3) & 1
            in_h = st == ST_H
            act_m = act & in_h & (ph == PTR_DIAG)
            act_i = act & ((in_h & (ph == PTR_UP)) | (st == ST_F))
            act_d = act & ((in_h & (ph == PTR_LEFT)) | (st == ST_E))
            op = jnp.where(
                act_m,
                OP_M_,
                jnp.where(act_i, OP_I_, jnp.where(act_d, OP_D_, 255)),
            ).astype(jnp.int32)
            opsv = jnp.where(lane == kidx % LANES, op, opsv)
            if affine:
                st = jnp.where(
                    act_m,
                    ST_H,
                    jnp.where(
                        act_i,
                        jnp.where(ef == 1, ST_F, ST_H),
                        jnp.where(
                            act_d, jnp.where(ee == 1, ST_E, ST_H), st
                        ),
                    ),
                )
            i = i - (act_m | act_i).astype(jnp.int32)
            j = j - (act_m | act_d).astype(jnp.int32)
        ops_ref[...] = opsv
        s_i[:] = i
        s_j[:] = j
        s_st[:] = st
        s_dn[:] = done

        @pl.when((sg == S - 1) & (g == NG - 1))
        def _out():
            st_out_ref[0] = s_i[:]
            st_out_ref[1] = s_j[:]
            st_out_ref[2] = s_st[:]
            st_out_ref[3] = s_dn[:]

    # (GB, S, K, BSUB, TI) -> (S, K, BT, TI): one device transpose (~2x P
    # in HBM traffic, transient) buys a GB-free kernel block layout
    P5 = P.reshape(GB, S, K, BSUB, TI).transpose(1, 2, 0, 3, 4)
    P4 = P5.reshape(S, K, BT, TI)
    st_in_all = jnp.stack(
        [
            jnp.broadcast_to(x[:, None].astype(jnp.int32), (BT, LANES))
            for x in (iv, jv, stv, donev)
        ]
    )

    def launch(P4c, st_in):
        return pl.pallas_call(
            kern,
            grid=(S, NG),
            in_specs=[
                pl.BlockSpec(
                    (1, WSTEP, B, TI),
                    lambda sg, g: (S - 1 - sg, NG - 1 - g, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (4, B, LANES), lambda sg, g: (0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (B, LANES),
                    lambda sg, g: (
                        0,
                        (S - 1 - sg) * KC + (K - 1 - g * WSTEP) // LANES,
                    ),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (4, B, LANES), lambda sg, g: (0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, S * K), jnp.int32),
                jax.ShapeDtypeStruct((4, B, LANES), jnp.int32),
            ],
            scratch_shapes=[pltpu.VMEM((B, LANES), jnp.int32)] * 4,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")
            ),
        )(P4c, st_in)

    if BT <= BCAP:
        ops, st_out = launch(P4, st_in_all)
    else:
        # pad the tail chunk to the full BCAP (padded walkers start
        # done), so every chunk reuses ONE compiled program
        parts = []
        for lo in range(0, BT, BCAP):
            hi = min(lo + BCAP, BT)
            P4c = P4[:, :, lo:hi]
            stc = st_in_all[:, lo:hi]
            if hi - lo < BCAP:
                padn = BCAP - (hi - lo)
                P4c = jnp.pad(P4c, ((0, 0), (0, 0), (0, padn), (0, 0)))
                stc = jnp.pad(
                    stc, ((0, 0), (0, padn), (0, 0)),
                    constant_values=1,  # done=1; i/j/st values are inert
                )
            parts.append(launch(P4c, stc))
        ops = jnp.concatenate([o for o, _ in parts], axis=0)[:BT]
        st_out = jnp.concatenate([t for _, t in parts], axis=1)[:, :BT]
    return (
        ops.astype(jnp.int8),
        st_out[0, :, 0],
        st_out[1, :, 0],
        st_out[2, :, 0],
        st_out[3, :, 0],
    )


def strip_walk_dev(P, qlen, tlen, done0, *, affine, BSUB, S, NB, interpret):
    """Device-walk driver for the global-mode strip traceback: runs
    ``strip_walk_range`` on the resident pointer stream and assembles
    CIGARs from the fetched (B, S*K) int8 op matrix + the final walker
    coordinates (VERDICT round-4 item 1: the flagship full-CIGAR path
    ships op matrices, never pointer streams).

    The kernel stops a walker at the implicit row-0/column-0 boundary;
    the remaining prefix is a deterministic run: i'>0 means the path
    still owes i' I ops (column 0), j'>0 owes j' D ops (row 0).  Both
    cannot be positive, and gap STATE cannot leak across the boundary:
    ST_F at row 0 would need an F-extend bit at i=1, but
    F[1,j] = max(F[0,j]+e, H[0,j]+o+e) with F[0,j] = -inf always takes
    the open branch (same for ST_E at column 0) — so the appended run's
    op type is unconditionally correct.

    Returns (cigars, start_i, start_j) — _strip_walk's contract.
    """
    B = len(qlen)
    K = NB * LANES
    iv = jnp.asarray(qlen, jnp.int32)
    jv = jnp.asarray(tlen, jnp.int32)
    stv = jnp.zeros(B, jnp.int32)
    dnv = jnp.asarray(done0, jnp.int32)
    ops, iv, jv, stv, dnv = strip_walk_range(
        P, iv, jv, stv, dnv, S=S, K=K, BSUB=BSUB, affine=bool(affine),
        interpret=interpret,
    )
    cigars = _cigars_from_ops(np.asarray(ops), np.asarray(iv), np.asarray(jv))
    return cigars, np.zeros(B, np.int64), np.zeros(B, np.int64)


def _cigars_from_ops(ops_h, i_fin, j_fin):
    """Assemble CIGAR strings from a device-walk op matrix: filter the
    255 no-op columns (ascending array order = start->end path order) and
    prepend the implicit boundary run the kernel stopped at (i'>0: I run
    down column 0; j'>0: D run along row 0 — see strip_walk_dev)."""
    from ..utils.cigar import ops_to_cigar

    ops_h = ops_h.view(np.uint8)
    cigars = []
    for b in range(ops_h.shape[0]):
        row = ops_h[b]
        row = row[row != 255]
        head = np.full(int(i_fin[b]), OP_I_, np.uint8) if i_fin[b] > 0 else (
            np.full(int(j_fin[b]), OP_D_, np.uint8)
        )
        cigars.append(ops_to_cigar(np.concatenate([head, row])))
    return cigars


def strip_fill_walk_global(qpad, t2, qlen, tlen, table, *, BSUB, interpret,
                           **kwc):
    """Fused global fill + device traceback walk — ONE program suitable
    for shard_map (parallel.dist.strip_sharded): each device fills and
    walks its own pair shard, so the gather ships (B, S*K) int8 op
    matrices and never the pointer stream (BASELINE.json:5 "CIGAR
    tracebacks gathered via collectives").  Returns bv + the op matrix +
    final walker coords for _cigars_from_ops."""
    res = _strip_fill(
        qpad, t2, qlen, tlen, table,
        want_ptr=True, gmode=True, BSUB=BSUB, interpret=interpret, **kwc,
    )
    S = qpad.shape[1] // TI
    K = ((t2.shape[1] - LANES) // LANES) * LANES
    iv = jnp.asarray(qlen).astype(jnp.int32)
    jv = jnp.asarray(tlen).astype(jnp.int32)
    deg = ((iv == 0) | (jv == 0)).astype(jnp.int32)
    ops, ifin, jfin, _, _ = strip_walk_range(
        res["P"], iv, jv, jnp.zeros_like(iv), deg,
        S=S, K=K, BSUB=BSUB, affine=bool(kwc["affine"]),
        interpret=interpret,
    )
    return {"bv": res["bv"], "ops": ops, "ifin": ifin, "jfin": jfin}

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
        "dt16",
        "interpret",
        "WR",
        "pass2",
        "bw",
        "nsub",
        "split",
        "tie_safe",
        "pc2",
    ),
)
def _strip_local_fused_tb(
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
    dt16,
    interpret,
    WR=None,
    pass2="banded",
    bw=64,
    nsub=None,
    split=None,
    tie_safe=False,
    pc2=128,
):
    """ONE-program local full-CIGAR path (round 5): fused two-pass
    coords + DEVICE window extraction + pass-3 global fill + device
    traceback walk, all in a single jit — the host syncs exactly once
    and receives coords + a (B, S*K) int8 op matrix.

    The previous flow needed two device round trips (fetch coords ->
    build [qs:qe]x[ts:te] windows on host -> ship them -> pass-3 launch
    -> fetch), which dominated the align_batch full-CIGAR wall on the
    remote link.  Here the windows are extracted on-device with
    _row_window at the STATIC pass-1 shapes (n_pad x W2) — a window is a
    left-anchored slice of the pair padded with sentinels, so the pass-3
    fill/walk geometry is identical to pass 1's and costs one extra
    fill.  Escalated pairs (score2 != score) get wrong windows here by
    construction; the caller rebuilds exactly those CIGARs on the host
    path after fixing their starts.  ``score_w`` returns the
    window-global score for the caller's equality validation
    (window_global_cigars' assert, preserved at the host boundary)."""
    res = _strip_local_fused(
        qpad, t2, qlen, tlen, table,
        BSUB=BSUB, mq=mq, match=match, mismatch=mismatch,
        gap_open=gap_open, gap_extend=gap_extend, affine=affine,
        profile=profile, packed=packed, A1=A1, dt16=dt16,
        interpret=interpret, WR=WR, pass2=pass2, bw=bw, nsub=nsub,
        split=split, tie_safe=tie_safe, pc2=pc2,
    )
    B, n_pad = qpad.shape
    W2 = t2.shape[1]
    SENT_Q, SENT_T = A1, A1 + 1
    score = res["score"]
    live = score > 0
    wq = jnp.where(live, res["qe"] - res["qs"], 0).astype(jnp.int32)
    wt = jnp.where(live, res["te"] - res["ts"], 0).astype(jnp.int32)
    qs_ = jnp.where(live, res["qs"], 0).astype(jnp.int32)
    ts_ = jnp.where(live, res["ts"], 0).astype(jnp.int32)
    # sentinel tails keep every aligned superset load in bounds
    # (_row_window contract: starts + L + LANES <= width)
    qsrc = jnp.concatenate(
        [
            qpad.astype(jnp.int32),
            jnp.full((B, n_pad + LANES), SENT_Q, jnp.int32),
        ],
        axis=1,
    )
    tsrc = jnp.concatenate(
        [
            t2.astype(jnp.int32),
            jnp.full((B, W2 + LANES), SENT_T, jnp.int32),
        ],
        axis=1,
    )
    qw = _row_window(
        qsrc, qs_, wq, L=n_pad, lo=0, fill=SENT_Q, interpret=interpret
    )
    # t2[b, j] = t[b, j-1]: window column x maps to t[ts + x - 1] =
    # t2[ts + x], with the 1-based x = 0 slot (and x > wt) sentinel
    tw = _row_window(
        tsrc, ts_, wt + 1, L=W2, lo=1, fill=SENT_T, interpret=interpret
    )
    BSUB_tb = max(BSUB, 32)
    r3 = _strip_fill(
        qw, tw, wq, wt, table,
        BSUB=BSUB_tb, mq=mq, match=match, mismatch=mismatch,
        gap_open=gap_open, gap_extend=gap_extend, affine=affine,
        profile=profile, packed=packed, A1=A1, dt16=dt16,
        interpret=interpret, want_ptr=True, gmode=True,
    )
    # window-global score capture at H(wq, wt) (cf. _global_post)
    bv = r3["bv"].astype(jnp.int32)
    score_w = jnp.take_along_axis(
        bv, ((jnp.maximum(wq, 1) - 1) % TI)[:, None], axis=1
    )[:, 0]
    deg = (wq == 0) | (wt == 0)
    S = n_pad // TI
    K = ((W2 - LANES) // LANES) * LANES
    ops, ifin, jfin, _, _ = strip_walk_range(
        r3["P"], wq, wt, jnp.zeros_like(wq), deg.astype(jnp.int32),
        S=S, K=K, BSUB=BSUB_tb, affine=bool(affine), interpret=interpret,
    )
    # fetch-economy packing (the remote link charges ~30ms PER buffer
    # fetch): all (B,) results ride ONE (9, B) int32 array, and the op
    # matrix packs 4 ops/byte (op codes are 2 bits; 255 -> 3 = none)
    meta = jnp.stack(
        [
            res["score"].astype(jnp.int32),
            res["qe"].astype(jnp.int32),
            res["te"].astype(jnp.int32),
            res["qs"].astype(jnp.int32),
            res["ts"].astype(jnp.int32),
            res["score2"].astype(jnp.int32),
            score_w,
            ifin,
            jfin,
        ]
    )
    o4 = jnp.minimum(ops.astype(jnp.int32) & 0xFF, 3).reshape(
        ops.shape[0], -1, 4
    )
    ops_p = (
        (o4[:, :, 0] << 6) | (o4[:, :, 1] << 4) | (o4[:, :, 2] << 2)
        | o4[:, :, 3]
    ).astype(jnp.uint8)
    return {"meta": meta, "ops_p": ops_p}
