"""Banded affine-gap NW Pallas kernel — the O(n·w) long-read path (config 4).

BASELINE.json:10: banded affine NW on 10-100kb pairs, band-width sweep,
checkpointed traceback.  The full-matrix wavefront kernel
(`wavefront_pallas`) carries O(n)-wide diagonal state — impossible at 100kb
(VMEM).  This kernel carries *band-local* state: on anti-diagonal ``k`` the
in-band cells are ``i ∈ [ihat(k), ihat(k) + D/2 + 1]`` where
``ihat(k) = max(0, floor((k - dhi + 1) / 2))`` and ``D = dhi - dlo + 1`` is
the band's diagonal span (j - i steps by 2 along an anti-diagonal, so only
``D/2 + 1`` band slots exist per anti-diagonal).  State vectors are
``(B, Wp)`` with ``Wp = ceil(D/2 + 2, 128)``: O(w), length-independent.

Slot mapping ``p = i - ihat(k)``.  One diagonal step advances ``ihat`` by
``Δ1 = ihat(k) - ihat(k-1) ∈ {0,1}`` (a runtime scalar; ``pltpu.roll``
accepts dynamic shifts), so neighbor access is a ±1/0 lane roll; the
query/target letter windows slide with the band via shift+insert.

Structure: 1-D grid over ``CK``-diagonal chunks; band state persists in
VMEM scratch across sequential grid steps; per chunk the kernel can emit
(a) a state snapshot (the *checkpoint* for checkpointed traceback,
BASELINE.json:5) and/or (b) the packed pointer block for that chunk,
both streamed to HBM through blocked output specs.

Scoring is scalar match/mismatch (DNA — the long-read domain of config 4)
or, with ``profile=True``, substitution-matrix lookup via the packed-nibble
query profile (the strip kernel's technique, strip_pallas.py): the band
slides ``G_PROF`` packed-profile windows instead of one query-letter
window; the per-cell score is a 4-way group select + nibble shift — no
gathers.  Tables must fit the nibble range [-NIBBLE_BIAS, 15-NIBBLE_BIAS]
(BLOSUM62 does); wider tables use the full-matrix wavefront kernel.

Driver: `seqalib_tpu.models.banded`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import NEG_INF, PTR_DIAG, PTR_LEFT, PTR_STOP, PTR_UP

_EXT_E_BIT = 2
_EXT_F_BIT = 3

LANES = 128
N_STATE = 6  # scalar mode: H1, H2, E, F, QW, TW
NIBBLE_BIAS = 4  # packed-profile bias (strip_pallas.py convention)
G_PROF = 4  # 32 letters / 8 nibbles per int32


def n_band_state(profile: bool, emode: bool = False) -> int:
    """State rows: H1, H2, E, F, then the sliding letter/profile windows
    (QW scalar mode | PW0..PW3 profile mode), then TW; extension mode
    appends BV/BK argmax-tracking rows."""
    return 4 + (G_PROF if profile else 1) + 1 + (2 if emode else 0)


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def stream_windows(Wp: int, CK: int):
    """(WQW, WTW): per-chunk VMEM letter-window widths in streaming mode.
    Single source of truth — models/banded.py's VMEM chunking guard uses
    the same values to size batches.  The extra 2*LANES beyond the sliding
    span covers the static-phase group top-up block loads (aligned
    (B, 2*LANES) supersets around the last insert column of a chunk)."""
    WQW = _ceil_to(Wp + CK // 2 + 2 + 4 * LANES, LANES)
    WTW = _ceil_to(CK + 2 + 4 * LANES, LANES)
    return WQW, WTW


def banded_matrix_supported(table) -> bool:
    """True when a substitution table fits the banded kernel's
    packed-nibble profile (shared by the dispatcher's routing and
    banded_align_batch's own capability guard)."""
    t = np.asarray(table)
    return bool(
        t.min() >= -NIBBLE_BIAS
        and t.max() <= 15 - NIBBLE_BIAS
        and t.shape[0] + 1 <= 31
    )


def _band_kernel(
    qk_ref,  # (B, Lqp) i32 letters (scalar) | (G_PROF, B, Lqp) i32 packed profile
    tk_ref,  # (B, Ltp) i32: tk[:, x] = t[x-1] (sentinel outside)
    qlenc_ref,  # (B, 128) i32
    tlenc_ref,  # (B, 128) i32
    dloc_ref,  # (B, 128) i32 per-pair band lower bound on j - i
    dhic_ref,  # (B, 128) i32 per-pair band upper bound
    state_in_ref,  # (N_STATE, B, Wp) i32 resume state
    # with binject two more inputs follow here: bh_ref/bf_ref (B, Wb) i32
    # boundary-row H/F streams (banded-SP: the previous row block's last
    # row, injected as this block's row 0 during the clamp zone)
    *refs,  # [bh_ref, bf_ref,] score_ref, state_out_ref, ckpt_ref,
    # ptr_ref, [bout_ref,] then N_STATE (B, Wp) scratch (+ stream scratch)
    CK: int,
    NSUB: int,
    k_start: int,
    k_end: int,
    K: int,
    B: int,
    Wp: int,
    dlo: int,
    dhi: int,
    match: int,
    mismatch: int,
    gap_open: int,
    gap_extend: int,
    want_ptr: bool,
    want_ckpt: bool,
    profile: bool,
    emode: bool,
    stream: bool,
    phase: str,
    want_score: bool,
    tie_safe: bool,
    smax: int,
    binject: bool,
    want_bout: bool,
    bout_row: int,
    pack_ptr: bool,
    WQW: int,
    WTW: int,
):
    NS = n_band_state(profile, emode)
    refs = list(refs)
    if binject:
        bh_ref, bf_ref = refs[:2]
        del refs[:2]
    score_ref, state_out_ref, ckpt_ref, ptr_ref = refs[:4]
    del refs[:4]
    if want_bout:
        bout_ref = refs[0]  # (2, B, Wb) accumulating boundary capture
        del refs[:1]
    state_scratch = refs
    g = pl.program_id(0)
    o, e = gap_open, gap_extend
    NEG = jnp.int32(NEG_INF)
    parr = jax.lax.broadcasted_iota(jnp.int32, (B, Wp), 1)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (B, LANES), 1)
    qlenv = qlenc_ref[:, 0:1]
    tlenv = tlenc_ref[:, 0:1]
    # per-pair band bounds: the static dlo/dhi define the SLOT GEOMETRY
    # (ihat, rolls) of the whole bucket; the oracle's band semantics are
    # enforced per pair by these vectors, so one compile serves every
    # delta the bucket geometry covers (VERDICT.md round-1 item 3)
    dlov = dloc_ref[:, 0:1]
    dhiv = dhic_ref[:, 0:1]

    if stream:
        qwin, twin, semq, semt = state_scratch[-4:]
        del state_scratch[-4:]

    @pl.when(g == 0)
    def _init():
        for a in range(NS):
            state_scratch[a][:] = state_in_ref[a, :, :]
        score_ref[:] = jnp.full((B, Wp), NEG, jnp.int32)
        if want_bout:
            bout_ref[0] = jnp.full((B, bout_ref.shape[2]), NEG, jnp.int32)
            bout_ref[1] = jnp.full((B, bout_ref.shape[2]), NEG, jnp.int32)

    if want_ckpt:
        # checkpoint = state entering this chunk (diagonal k0 = chunk start)
        for a in range(NS):
            ckpt_ref[0, a, :, :] = state_scratch[a][:]

    def ihat(k):
        return jnp.maximum(0, (k - dhi + 1) // 2)

    # letter streaming: the full padded letter arrays stay in HBM (pl.ANY)
    # and each CK-chunk DMAs only its sliding windows into VMEM scratch —
    # the O(n)-wide resident letters were the VMEM ceiling at 100kb
    # (models/banded.py guard).  Bases are 128-aligned runtime scalars so
    # ONE compile serves every chunk.
    if stream:
        k0s = k_start + g * CK
        ih0 = ihat(k0s)
        qbase = (ih0 // LANES) * LANES
        tbase = (jnp.maximum(k0s - ih0 - 2, 0) // LANES) * LANES
        if profile:
            cq = pltpu.make_async_copy(
                qk_ref.at[:, :, pl.ds(qbase, WQW)], qwin, semq
            )
        else:
            cq = pltpu.make_async_copy(qk_ref.at[:, pl.ds(qbase, WQW)], qwin, semq)
        ct = pltpu.make_async_copy(tk_ref.at[:, pl.ds(tbase, WTW)], twin, semt)
        cq.start()
        ct.start()
        cq.wait()
        ct.wait()
        qsrc, tsrc = qwin, twin
    else:
        qbase = 0
        tbase = 0
        qsrc, tsrc = qk_ref, tk_ref

    def _roll_norm(x, s):
        # pltpu.roll with a static shift: fold 0 away, normalize
        # negatives mod the lane width (the op is circular but rejects
        # negative STATIC shifts at lowering).  Traced shifts MUST also
        # be normalized to non-negative: Mosaic miscompiles dynamic
        # NEGATIVE shifts on non-power-of-two widths (Wp=384/640 —
        # verified on-chip: roll(x, -1) returns garbage while
        # roll(x, (-1) % Wp) is exact; power-of-two widths mask the
        # bug).  One scalar rem per roll is noise next to the roll.
        W = x.shape[1]
        if isinstance(s, int):
            s %= W
            if s == 0:
                return x
        else:
            s = s % W
        return pltpu.roll(x, s, axis=1)

    def col(ref, x, gi=None):
        """(B, 1) word ref[(gi,) :, x] via aligned-block load + mask-reduce."""
        xs = jnp.maximum(x, 0)
        off = pl.multiple_of((xs // LANES) * LANES, LANES)
        if gi is None:
            blk = ref[:, pl.ds(off, LANES)]
        else:
            blk = ref[gi, :, pl.ds(off, LANES)]
        return jnp.sum(jnp.where(lane128 == (xs - off), blk, 0), axis=1, keepdims=True)

    static_phase = phase in ("clamp", "steady")
    pstash = []  # pack_ptr: pwords awaiting their pair (see `group`)

    def substep(k, st, dstat=None, tops=None, binj=None):
        H1, H2, E1, F1 = st[:4]
        if emode:
            qws = list(st[4:-3])
            TW, BV, BK = st[-3], st[-2], st[-1]
        else:
            qws = list(st[4:-1])  # [QW] scalar mode | [PW0..PW3] profile mode
            TW = st[-1]
        live = k < K

        ih = 0 if phase == "clamp" else ihat(k)
        if dstat is not None:
            # static phases: the ihat deltas are pure parity functions of
            # k (steady zone k >= dhi+1) or identically zero (clamp zone
            # k <= dhi), precomputed as PYTHON ints by `group` — every
            # roll below gets a static shift (half of them shift-0 no-ops)
            d1, d2 = dstat
        else:
            d1 = ih - ihat(k - 1)  # {0, 1}
            d2 = ih - ihat(k - 2)  # {0, 1, 2}

        # sliding windows (QW/PWg[p] = src[ih+p-1], TW[p] = t[k-ih-p-1]).
        # With STATIC deltas the redundant half of the maintenance drops
        # out: d1 == 0 leaves ihat (hence every query window)
        # bit-identical — the roll is shift-0 and the insert rewrites slot
        # Wp-1 with its own value; d1 == 1 leaves k - ihat (hence TW)
        # bit-identical the same way.  Skipping them is exact, not
        # approximate, and removes ~half the col() cross-lane reduces
        # per substep (VERDICT.md round-2 item 1's second audit target).
        if dstat is None or d1 == 1:
            for gi in range(len(qws)):
                w = _roll_norm(qws[gi], -d1)
                if tops is not None:
                    # group-batched top-up: (B, 1) column extracted from
                    # the group's pre-rotated superset block
                    top = tops[0][gi]
                else:
                    top = col(qsrc, ih + Wp - 1 - qbase, gi if profile else None)
                qws[gi] = jnp.where(
                    parr == Wp - 1, jnp.broadcast_to(top, (B, Wp)), w
                )
        if dstat is None or d1 == 0:
            TW = _roll_norm(TW, 1 - d1)
            tlow = tops[1] if tops is not None else col(tsrc, k - ih - tbase)
            TW = jnp.where(parr == 0, jnp.broadcast_to(tlow, (B, Wp)), TW)

        if not static_phase:
            ivec = ih + parr
            jvec = k - ivec
        if profile:
            # packed-nibble lookup: group select by TW>>3, nibble by TW&7
            grp = qws[0]
            for gi in range(1, G_PROF):
                grp = jnp.where((TW >> 3) == gi, qws[gi], grp)
            s_vec = ((grp >> ((TW & 7) * 4)) & 0xF) - NIBBLE_BIAS
        else:
            s_vec = jnp.where(qws[0] == TW, jnp.int32(match), jnp.int32(mismatch))

        # neighbors: l = H[k-1][p+d1], u = H[k-1][p+d1-1], d = H[k-2][p+d2-1]
        Hl = _roll_norm(H1, -d1)
        Hu = _roll_norm(H1, 1 - d1)
        Hd = _roll_norm(H2, 1 - d2)
        El = _roll_norm(E1, -d1)
        Fu = _roll_norm(F1, 1 - d1)

        oe = jnp.int32(o + e)
        E_ext = El + e
        E_opn = Hl + oe
        ext_e = E_ext >= E_opn  # tie-break: extend > open
        En = jnp.maximum(E_ext, E_opn)
        F_ext = Fu + e
        F_opn = Hu + oe
        ext_f = F_ext >= F_opn
        Fn = jnp.maximum(F_ext, F_opn)
        d = Hd + s_vec
        best = jnp.maximum(jnp.maximum(d, Fn), En)
        ptr = jnp.where(d == best, PTR_DIAG, jnp.where(Fn == best, PTR_UP, PTR_LEFT))
        Hn = best

        if dstat is None:
            origin = (k == 0) & (ivec == 0)
            Hn = jnp.where(origin, 0, Hn)
            ptr = jnp.where(origin, PTR_STOP, ptr)
        elif phase == "clamp":
            # clamp zone contains k=0: ih == 0, so the origin is slot 0
            origin = (k == 0) & (parr == 0)
            Hn = jnp.where(origin, 0, Hn)
            ptr = jnp.where(origin, PTR_STOP, ptr)
        else:
            origin = False  # steady zone starts past k=0 (asserted)

        if emode:
            # EXTENSION mode drops the per-cell band/validity mask:
            # sentinel letters score <= -NIBBLE_BIAS and every gap step
            # costs <= -1, so cells past (qlen, tlen) strictly decay from
            # the valid cells they extend and can never win the BV argmax
            # — the un-masked slot window computes a WIDER effective band
            # than [dlo, dhi] at zero extra cost (values stay exact or
            # underestimates, keeping the caller's score2 == score
            # escalation gate sound).  One invariant must survive the
            # mask removal: pltpu.roll is CIRCULAR, and the full mask was
            # what kept the edge slots NEG so that wraparound injected
            # NEG as the outside-the-window neighbor.  Forcing the TOP
            # physical slot (Wp-1) to NEG preserves that: wraps INTO
            # slot 0 (up/diag neighbors from slot Wp-1) read NEG, and
            # wraps INTO slot Wp-1 (left neighbors from slot 0) land in
            # a slot we discard.  (Measured: without this, a wrapped
            # real value teleports 128 rows and overestimates score2.)
            edge = parr == Wp - 1
            Hn = jnp.where(edge, NEG, Hn)
            En = jnp.where(edge, NEG, En)
            Fn = jnp.where(edge, NEG, Fn)
        elif static_phase:
            # out-of-band / out-of-matrix cells are exactly NEG (oracle
            # banded parity).  In static phases the six wide compares
            # reduce to a per-pair slot interval [plo, phi] computed with
            # narrow (B, 1) arithmetic:
            #   dkj <= dhiv  ->  p >= ceil((k - dhiv)/2) - ih
            #   jvec<= tlenv ->  p >= k - tlenv - ih
            #   dkj >= dlov  ->  p <= (k - dlov)//2 - ih
            #   ivec<= qlenv ->  p <= qlenv - ih
            #   jvec>= 0     ->  p <= k - ih        (ivec >= 0: p >= 0 always)
            plo = jnp.maximum((k - dhiv + 1) // 2, k - tlenv) - ih
            phi = jnp.minimum(jnp.minimum((k - dlov) // 2, qlenv), k) - ih
            ok = (parr >= plo) & (parr <= phi)
            Hn = jnp.where(ok, Hn, NEG)
            if phase == "clamp":
                Hn = jnp.where(origin, 0, Hn)
            En = jnp.where(ok, En, NEG)
            Fn = jnp.where(ok, Fn, NEG)
        else:
            # out-of-band / out-of-matrix cells are exactly NEG (oracle
            # banded parity)
            dkj = jvec - ivec
            ok = (
                (dkj >= dlov)
                & (dkj <= dhiv)
                & (ivec >= 0)
                & (ivec <= qlenv)
                & (jvec >= 0)
                & (jvec <= tlenv)
            )
            ok = ok & ~origin
            Hn = jnp.where(origin, 0, jnp.where(ok, Hn, NEG))
            En = jnp.where(ok, En, NEG)
            Fn = jnp.where(ok, Fn, NEG)

        if binject and (dstat is None or phase == "clamp"):
            # boundary-row injection (banded-SP, parallel/banded_sp.py):
            # local row 0 is the PREVIOUS row block's last row; its cells
            # (0, k) occupy slot 0 while ihat == 0 (k <= dhi).  Overwrite
            # the computed junk with the streamed boundary values AFTER
            # the mask (they must survive it).  E(0, .) is never read by
            # row 1 (E is within-row), so only H and F are injected.
            # Placed after the origin forcing too: for a resumed block the
            # local (0, 0) cell is the boundary corner, not the DP origin.
            if binj is not None:
                bhk, bfk = binj
            else:
                wb1 = bh_ref.shape[1] - 1
                bhk = col(bh_ref, jnp.minimum(k, wb1))
                bfk = col(bf_ref, jnp.minimum(k, wb1))
            if phase == "clamp":
                inj = parr == 0
            else:
                inj = (parr == 0) & (k <= jnp.int32(dhi))
            Hn = jnp.where(inj, jnp.broadcast_to(bhk, (B, Wp)), Hn)
            Fn = jnp.where(inj, jnp.broadcast_to(bfk, (B, Wp)), Fn)

        if want_bout:
            # boundary-row capture (banded-SP): cells of local row
            # `bout_row` (this block's last computed row) surface at slot
            # bout_row - ihat(k) over diagonals [2*bout_row, 2*bout_row +
            # D); capture column x = k - 2*bout_row receives (H, F) of
            # cell (bout_row, bout_row + x) — exactly the next block's
            # bh/bf stream layout (hitx gates all other diagonals off)
            pcap = bout_row - ih
            mcap = parr == pcap
            vH = jnp.sum(jnp.where(mcap, Hn, 0), axis=1, keepdims=True)
            vF = jnp.sum(jnp.where(mcap, Fn, 0), axis=1, keepdims=True)
            Wbo = bout_ref.shape[2]
            xarr = jax.lax.broadcasted_iota(jnp.int32, (B, Wbo), 1)
            hitx = xarr == (k - 2 * bout_row)
            bout_ref[0] = jnp.where(
                hitx, jnp.broadcast_to(vH, (B, Wbo)), bout_ref[0]
            )
            bout_ref[1] = jnp.where(
                hitx, jnp.broadcast_to(vF, (B, Wbo)), bout_ref[1]
            )

        if emode:
            # anchored-extension argmax: per band slot, strict > keeps the
            # first k, which is canonical within a slot (i = ihat(k) + p is
            # non-decreasing in k; equal i means smaller j); cross-slot
            # canonicalization happens in the caller's packed-index reduce.
            # BK stores k only — (i, j) are reconstructed from (k, p).
            upd = Hn > BV
            BV = jnp.where(upd, Hn, BV)
            BK = jnp.where(upd, jnp.int32(k), BK)
            if tie_safe:
                # canonical-tie soundness tracking (round 4): a co-optimal
                # cell OUTSIDE the slot window can only be reached through
                # a window-edge cell.  Accumulate, per edge slot, the
                # crossing upper-bound term  val - smax*i  where val is
                # the gap-state value at the edge (E at the deletion edge
                # p=0, F at the insertion edge p=Wp-2): any outside path
                # ending at row ri' scores <= val + smax*(ri' - i) + e.
                # The caller escalates iff  max(EV) + smax*found_ri + e >=
                # score  (BASELINE.md "Canonical-tie escalation").  The
                # p=0 slot is only an exit edge once ihat > 0 (k > dhi):
                # during the clamp phase it is row 0 of the matrix.
                # Accumulates into score_ref, unused in emode.
                iv_e = ih + parr
                cand = jnp.where(
                    (parr == 0) & (k > jnp.int32(dhi)),
                    En,
                    jnp.where(parr == Wp - 2, Fn, NEG),
                )
                score_ref[:] = jnp.maximum(
                    score_ref[:], cand - jnp.int32(smax) * iv_e
                )
        elif want_score:
            # the (B, Wp) read-modify-write capture runs only in ranges
            # the caller marked capture-relevant (want_score): the fill
            # driver statically skips it for every chunk before the first
            # possible finish diagonal
            if static_phase:
                kfin = (k == (qlenv + tlenv)) & live  # (B, 1)
                fin = (parr == (qlenv - ih)) & kfin
            else:
                fin = (k == (qlenv + tlenv)) & (ivec == qlenv) & live
            score_ref[:] = jnp.where(fin, Hn, score_ref[:])

        if want_ptr:
            # pack in int32 (Mosaic can't legalize shifts on int8 vectors)
            pword = (
                ptr
                + ext_e.astype(jnp.int32) * (1 << _EXT_E_BIT)
                + ext_f.astype(jnp.int32) * (1 << _EXT_F_BIT)
            )
            if pack_ptr:
                # 2 diagonals per byte: the pword is 4 bits; `group`
                # pairs consecutive substeps and stores lo | hi<<4 —
                # halving the ~1GB/batch of pointer HBM writes that
                # dominate the traceback recompute (round 4)
                pstash.append(pword)
            else:
                ptr_ref[k - k_start - g * CK, :, :] = pword.astype(jnp.int8)

        if emode:
            return (Hn, H1, En, Fn, *qws, TW, BV, BK)
        return (Hn, H1, En, Fn, *qws, TW)

    # group-batched window top-ups (static phases): instead of a per-step
    # col() — aligned load + compare + cross-lane mask-reduce + broadcast
    # (~8 ops per window per insert step, x4 profile windows: THE dominant
    # substep cost) — each NSUB group loads ONE (B, 2*LANES) aligned
    # superset per window side, rotates it once (ONE dynamic roll per
    # group) so the group's first wanted column sits at lane 0, and every
    # substep extracts its (B, 1) insert column with a STATIC roll +
    # aligned slice (the per-u column advance a_u is a pure parity
    # function, same derivation as the static ihat deltas).  Exact, not
    # approximate: only the extracted column is ever consumed.  Works for
    # any Wp and in stream mode (round 4; the round-3 fast_tops needed
    # Wp == LANES and resident letters).
    W2L = 2 * LANES

    def _col0(blk, c):
        # (B, 1) column c (static int, < LANES) of a group-rotated block
        return _roll_norm(blk, -c)[:, 0:1]

    def group(gi, st):
        k0 = k_start + g * CK + gi * NSUB
        qblks = tblk = None
        if static_phase:
            # clamp zone: ihat == 0 and the query window never advances
            ih0 = 0 if phase == "clamp" else ihat(k0)
            # parity of the linear ihat argument (k0 - dhi + 1); g*CK and
            # gi*NSUB are even, so it is static
            x0p = (k_start - dhi + 1) % 2
            if phase == "steady":
                cq = ih0 + Wp - 1 - qbase
                cqb = pl.multiple_of((cq // LANES) * LANES, LANES)
                qsh = (W2L - (cq - cqb)) % W2L  # first wanted col -> lane 0
                if profile:
                    qblks = [
                        _roll_norm(qsrc[gi2, :, pl.ds(cqb, W2L)], qsh)
                        for gi2 in range(G_PROF)
                    ]
                else:
                    qblks = [_roll_norm(qsrc[:, pl.ds(cqb, W2L)], qsh)]
            ct = k0 - ih0 - tbase
            ctb = pl.multiple_of((ct // LANES) * LANES, LANES)
            tblk = _roll_norm(
                tsrc[:, pl.ds(ctb, W2L)], (W2L - (ct - ctb)) % W2L
            )  # group's first wanted t column -> lane 0
            bblks = None
            if binject and phase == "clamp":
                # boundary stream column k0 + u per substep: same group-
                # rotated block mechanics as the letter top-ups
                cbb = pl.multiple_of((k0 // LANES) * LANES, LANES)
                bsh = (W2L - (k0 - cbb)) % W2L
                bblks = (
                    _roll_norm(bh_ref[:, pl.ds(cbb, W2L)], bsh),
                    _roll_norm(bf_ref[:, pl.ds(cbb, W2L)], bsh),
                )
        for u in range(NSUB):
            if phase == "steady":
                # parity(k) == parity(k_start + u): g*CK and gi*NSUB are
                # even (asserted in band_fill_range), so the ihat deltas
                # are static per unrolled substep: d1 = 1 iff (k + dhi)
                # odd, d2 = 1 (linear zone k >= dhi+1)
                d1s = 1 if (k_start + u + dhi) % 2 == 1 else 0
                a_u = (x0p + u) // 2  # ihat(k0+u) - ihat(k0), static
                if d1s == 1:
                    tops = ([_col0(b, a_u) for b in qblks], None)
                else:
                    tops = (None, _col0(tblk, u - a_u))
                st = substep(k0 + u, st, (d1s, 1), tops=tops)
            elif phase == "clamp":
                # d1 = d2 = 0 throughout; target advances one column/step
                binj = (
                    (_col0(bblks[0], u), _col0(bblks[1], u))
                    if binject
                    else None
                )
                st = substep(
                    k0 + u, st, (0, 0), tops=(None, _col0(tblk, u)), binj=binj
                )
            else:
                st = substep(k0 + u, st)
            if want_ptr and pack_ptr and u % 2 == 1:
                lo, hi = pstash
                pstash.clear()
                ptr_ref[(gi * NSUB + u) // 2, :, :] = (
                    lo | (hi << 4)
                ).astype(jnp.int8)
        return st

    st0 = tuple(state_scratch[a][:] for a in range(NS))
    stN = jax.lax.fori_loop(0, CK // NSUB, group, st0)
    for a in range(NS):
        state_scratch[a][:] = stN[a]

    last = g == pl.num_programs(0) - 1

    @pl.when(last)
    def _out():
        for a in range(NS):
            state_out_ref[a, :, :] = stN[a]


def init_band_state(
    qk: np.ndarray, B: int, Wp: int, profile: bool = False
) -> np.ndarray:
    """Initial state entering diagonal 0: H/E/F = NEG; the query-side
    window(s) pre-filled with the first Wp letters / packed-profile words
    (the band's clamp phase never re-inserts below the top slot), TW fills
    progressively via per-step inserts."""
    st = np.full((n_band_state(profile), B, Wp), NEG_INF, np.int32)
    if profile:
        st[4 : 4 + G_PROF] = np.asarray(qk)[:, :, :Wp]  # PWg[p] = ppk[g, p-1]
    else:
        st[4] = np.asarray(qk)[:, :Wp]  # QW[p] = q[p-1] (slot 0 = sentinel)
    st[-1] = 0
    return st


def build_packed_profile_np(qk: np.ndarray, table: np.ndarray) -> np.ndarray:
    """(G_PROF, B, L) i32 packed-nibble query profile over padded letters.

    word[g][b, x] packs (table[qk[b,x], 8g+r] + NIBBLE_BIAS) << 4r for
    r < 8; letters >= table size (the pad sentinel) pack all-zero nibbles
    (score -NIBBLE_BIAS — value irrelevant: out-of-matrix cells are masked
    to NEG in-kernel).  Host-side NumPy: exact, no einsum precision traps."""
    A1 = int(table.shape[0])
    t = np.asarray(table, np.int64)
    if t.min() < -NIBBLE_BIAS or t.max() > 15 - NIBBLE_BIAS:
        raise ValueError(
            f"table range [{t.min()}, {t.max()}] exceeds the packed-nibble "
            f"range [{-NIBBLE_BIAS}, {15 - NIBBLE_BIAS}]"
        )
    tpad = np.full((32, 32), -NIBBLE_BIAS, np.int64)
    tpad[:A1, :A1] = t
    shifts = (np.arange(8, dtype=np.int64) * 4)[None, None, :]
    packed = ((tpad + NIBBLE_BIAS).reshape(32, G_PROF, 8) << shifts).sum(axis=2)
    ppk = packed[np.asarray(qk, np.int64)]  # (B, L, G_PROF) int64
    return (
        ppk.transpose(2, 0, 1).astype(np.uint32).view(np.int32).copy()
    )  # (G_PROF, B, L)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k_start",
        "k_end",
        "K",
        "Wp",
        "dlo",
        "dhi",
        "match",
        "mismatch",
        "gap_open",
        "gap_extend",
        "want_ptr",
        "want_ckpt",
        "CK",
        "interpret",
        "profile",
        "emode",
        "stream",
        "nsub",
        "steady",
        "phase",
        "want_score",
        "tie_safe",
        "smax",
        "want_bout",
        "bout_row",
        "pack_ptr",
    ),
)
def band_fill_range(
    qk,
    tk,
    qlen,
    tlen,
    dlo_p,
    dhi_p,
    state_in,
    score_in,
    *,
    k_start,
    k_end,
    K,
    Wp,
    dlo,
    dhi,
    match,
    mismatch,
    gap_open,
    gap_extend,
    want_ptr,
    want_ckpt,
    CK,
    interpret,
    profile=False,
    emode=False,
    stream=False,
    nsub=None,
    steady=False,
    phase=None,
    want_score=True,
    tie_safe=False,
    smax=0,
    bh=None,
    bf=None,
    want_bout=False,
    bout_row=0,
    pack_ptr=False,
):
    """Fill anti-diagonals [k_start, k_end) resuming from state_in.

    Returns (score, state_out, ckpts, ptrs):
      score: (B, Wp) running masked capture (max-merged with score_in);
      state_out: (N_STATE, B, Wp) state after diagonal k_end-1;
      ckpts: (NC, N_STATE, B, Wp) state entering each CK-chunk;
      ptrs: (NCHUNK*CK, B, Wp) i8 packed pointers (dummy if !want_ptr).
    With ``want_bout`` a FIFTH element is returned: (2, B, Wbo) — the
    (H, F) boundary capture of local row ``bout_row`` (banded-SP).

    ``bh``/``bf``: optional (B, Wb) boundary-row streams — when given,
    local row 0 (cells (0, k), slot 0 while k <= dhi) is OVERWRITTEN with
    bh[:, k]/bf[:, k]: the banded-SP block-resume protocol
    (parallel/banded_sp.py).  Wb must cover k in [0, dhi] plus a 2*LANES
    aligned-block slack.

    ``phase``: "dyn" (default; per-step traced ihat deltas), "clamp"
    (every executed diagonal <= dhi: d1 = d2 = 0, all rolls static), or
    "steady" (every diagonal >= dhi+1: parity-static deltas).  ``steady=
    True`` is the legacy alias for phase="steady".  ``want_score=False``
    statically skips the per-substep final-score capture (callers use it
    for every range that cannot contain a finish diagonal).
    """
    B = qk.shape[1] if profile else qk.shape[0]
    NS = n_band_state(profile, emode)
    if phase is None:
        phase = "steady" if steady else "dyn"
    if phase not in ("dyn", "clamp", "steady"):
        raise ValueError(f"unknown phase {phase!r}")

    # substeps unrolled per fori iteration.  `nsub` is a jit static arg —
    # callers resolve any env override (SEQALIB_BAND_NSUB) at the host
    # boundary (models/banded.banded_align_batch's kw, strip_pallas.fused_pass2_knobs)
    # so the value is always in the cache key; a trace-time env read here
    # silently reused stale compiles after mid-process env changes.
    NSUB = nsub if nsub is not None else 4
    if CK % NSUB != 0:
        raise ValueError(f"nsub={NSUB} must divide CK={CK}")
    span = _ceil_to(k_end - k_start, max(CK, NSUB))
    if phase == "steady":
        # the static-roll specialization needs (a) parity(k) derivable
        # from k_start + u alone and (b) every k in the linear ihat zone
        if NSUB % 2 or CK % 2:
            raise ValueError(f"steady requires even NSUB/CK, got {NSUB}/{CK}")
        if k_start < dhi + 1:
            raise ValueError(f"steady requires k_start >= dhi+1, got {k_start}")
    if phase == "clamp" and k_start + span - 1 > dhi:
        # the grid runs to the padded span; every executed k must sit in
        # the clamp zone (ihat == 0)
        raise ValueError(
            f"clamp requires k_start+span-1 <= dhi, got {k_start + span - 1} > {dhi}"
        )
    if want_ptr and pack_ptr and (NSUB % 2 or CK % 2):
        raise ValueError(
            f"pack_ptr pairs consecutive diagonals: even NSUB/CK required, "
            f"got {NSUB}/{CK}"
        )
    if phase != "dyn" and NSUB > LANES:
        # group top-up blocks are (B, 2*LANES); the unrotated column
        # offset (< LANES) plus the per-substep advance (<= NSUB) must
        # stay inside the block
        raise ValueError(f"static phases require nsub <= {LANES}, got {NSUB}")
    NCHUNK = span // CK
    grid = (NCHUNK,)

    qlenc = jnp.broadcast_to(qlen[:, None].astype(jnp.int32), (B, LANES))
    tlenc = jnp.broadcast_to(tlen[:, None].astype(jnp.int32), (B, LANES))
    dloc = jnp.broadcast_to(dlo_p[:, None].astype(jnp.int32), (B, LANES))
    dhic = jnp.broadcast_to(dhi_p[:, None].astype(jnp.int32), (B, LANES))

    WQW, WTW = stream_windows(Wp, CK)
    kernel = functools.partial(
        _band_kernel,
        CK=CK,
        NSUB=NSUB,
        k_start=k_start,
        k_end=k_end,
        K=K,
        B=B,
        Wp=Wp,
        dlo=dlo,
        dhi=dhi,
        match=match,
        mismatch=mismatch,
        gap_open=gap_open,
        gap_extend=gap_extend,
        want_ptr=want_ptr,
        want_ckpt=want_ckpt,
        profile=profile,
        emode=emode,
        stream=stream,
        phase=phase,
        want_score=want_score,
        tie_safe=tie_safe,
        smax=smax,
        binject=bh is not None,
        want_bout=want_bout,
        bout_row=bout_row,
        pack_ptr=pack_ptr,
        WQW=WQW,
        WTW=WTW,
    )

    def cspec(shape):
        return pl.BlockSpec(shape, lambda g: (0,) * len(shape), memory_space=pltpu.VMEM)

    out_shapes = [
        jax.ShapeDtypeStruct((B, Wp), jnp.int32),
        jax.ShapeDtypeStruct((NS, B, Wp), jnp.int32),
        # the checkpoint output shrinks to one dummy block when unused
        # (a fill-only 10kb B=128 call otherwise allocates ~93MB of HBM
        # it never reads)
        jax.ShapeDtypeStruct(
            (NCHUNK if want_ckpt else 1, NS, B, Wp), jnp.int32
        ),
        jax.ShapeDtypeStruct(
            (NCHUNK * CK // (2 if pack_ptr else 1) if want_ptr else 1, B, Wp),
            jnp.int8,
        ),
    ]
    out_specs = [
        cspec((B, Wp)),
        cspec((NS, B, Wp)),
        (
            pl.BlockSpec(
                (1, NS, B, Wp), lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM
            )
            if want_ckpt
            else cspec((1, NS, B, Wp))
        ),
        (
            pl.BlockSpec(
                (CK // (2 if pack_ptr else 1), B, Wp),
                lambda g: (g, 0, 0),
                memory_space=pltpu.VMEM,
            )
            if want_ptr
            else cspec((1, B, Wp))
        ),
    ]
    if want_bout:
        # (H, F) boundary capture of local row bout_row (banded-SP)
        Wbo = _ceil_to(dhi - dlo + 1, LANES)
        out_shapes.append(jax.ShapeDtypeStruct((2, B, Wbo), jnp.int32))
        out_specs.append(cspec((2, B, Wbo)))

    scratch = [pltpu.VMEM((B, Wp), jnp.int32) for _ in range(NS)]
    if stream:
        # letters live in HBM; per-chunk windows DMA into these
        qwin_shape = (G_PROF, B, WQW) if profile else (B, WQW)
        scratch += [
            pltpu.VMEM(qwin_shape, jnp.int32),
            pltpu.VMEM((B, WTW), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ]
        letter_spec = pl.BlockSpec(memory_space=pl.ANY)
        in_specs = [letter_spec, letter_spec]
    else:
        in_specs = [cspec(qk.shape), cspec(tk.shape)]
    in_specs = in_specs + [
        cspec((B, LANES)),
        cspec((B, LANES)),
        cspec((B, LANES)),
        cspec((B, LANES)),
        cspec((NS, B, Wp)),
    ]
    args = [qk, tk, qlenc, tlenc, dloc, dhic, state_in]
    if bh is not None:
        in_specs += [cspec(bh.shape), cspec(bf.shape)]
        args += [bh, bf]
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_shape=out_shapes,
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
    )(*args)
    score, state_out, ckpts, ptrs = outs[:4]
    score = jnp.maximum(score, score_in)
    if want_bout:
        return score, state_out, ckpts, ptrs, outs[4]
    return score, state_out, ckpts, ptrs


@functools.partial(
    jax.jit,
    static_argnames=("KW", "dhi", "Wp", "B", "interpret", "packed"),
)
def band_walk_range(ptrs, iv, jv, stv, donev, k0, *, KW, dhi, Wp, B,
                    interpret, i_floor=-1, packed=False):
    """On-device banded traceback walk over one recomputed pointer
    super-block (the device twin of native walker sq_walk_banded,
    bit-identical semantics incl. slot clamping and STOP handling).

    The host walk hauled the whole (KW, B, Wp) int8 pointer block to the
    host first — ~200 MB per 128-pair 10kb batch, 95% of the config-4
    traceback wall through the remote tunnel.  This kernel walks ONE
    anti-diagonal per grid step (k descending), extracts each active
    pair's pointer byte with a lane mask-reduce, runs the H/E/F state
    machine vectorized over pairs, and emits at most one CIGAR op per
    pair per step into a (B, KW) matrix — 1/Wp the pointer volume.

    ptrs: (KW, B, Wp) int8 device array (band_fill_range's want_ptr
    output, never fetched).  iv/jv/stv/donev: (B,) int32 walker state.
    Returns (ops (B, KWp) int32 — column x holds the op consumed AT
    diagonal k0+x, 255 = none; iv', jv', stv', donev').

    ``packed``: ptrs holds TWO diagonals per byte (band_fill_range
    pack_ptr: row x//2, nibble x&1 for diagonal k0+x; k0 must be even).

    ``i_floor`` (runtime scalar): rows <= i_floor are a resume BOUNDARY
    whose pointer bytes must never be consumed — the walker marks itself
    done upon reaching them (banded-SP block handoff: local row 0 is the
    previous block's injected last row).  -1 (default) never triggers.
    """
    from ..utils.cigar import OP_D, OP_I, OP_M

    ST_H, ST_E, ST_F = 0, 1, 2
    KWp = _ceil_to(KW, LANES)
    # WSTEP diagonals per grid step (round 4): one-diagonal grid steps
    # measured ~4.3us each — pure grid/pipeline overhead against ~0.2us
    # of walk math — which made the walk the dominant 100kb traceback
    # component (200k steps).  The inner unroll is static (row indices
    # and nibble parities are compile-time), so a 16-wide step costs one
    # grid step + 16 cheap substeps.
    WSTEP = next(w for w in (16, 8, 4, 2, 1) if KW % w == 0)
    if packed and WSTEP % 2:
        raise ValueError(f"packed walk needs an even diagonal count, KW={KW}")
    NG = KW // WSTEP

    def kern(k0_ref, ptr_ref, st_in_ref, ops_ref, st_out_ref,
             s_i, s_j, s_st, s_dn):
        g = pl.program_id(0)
        base = KW - (g + 1) * WSTEP  # this step walks [base, base+WSTEP)
        # k0 is a runtime scalar (SMEM): each traceback super-block has a
        # different diagonal origin, and a static k0 would recompile the
        # walk kernel per super-block (~12+ remote compiles per 100kb
        # batch geometry)
        parrW = jax.lax.broadcasted_iota(jnp.int32, (B, Wp), 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, LANES), 1)

        @pl.when(g == 0)
        def _init():
            s_i[:] = st_in_ref[0]
            s_j[:] = st_in_ref[1]
            s_st[:] = st_in_ref[2]
            s_dn[:] = st_in_ref[3]

        # a fresh ops block starts at its top column (first touch; WSTEP
        # divides LANES, so a step never straddles two ops blocks)
        @pl.when((g == 0) | ((base + WSTEP - 1) % LANES == LANES - 1))
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
            k = k0_ref[0] + kidx
            # boundary floor: a walker standing on (or below) row i_floor
            # has left this block's computed rows — stop BEFORE the read
            done = jnp.where(i <= k0_ref[1], 1, done)
            act_blk = (done == 0) & ((i + j) == k)
            ih = jnp.maximum(0, (k - dhi + 1) // 2)  # // floors negatives
            p = jnp.clip(i - ih, 0, Wp - 1)
            prow = ptr_ref[c // 2 if packed else c]
            byte = jnp.sum(
                jnp.where(parrW == p[:, 0:1], prow.astype(jnp.int32), 0),
                axis=1,
                keepdims=True,
            )
            byte = jnp.broadcast_to(byte, (B, LANES))
            if packed:
                # static nibble parity (base is even: KW and WSTEP are);
                # the int8 load's sign extension is masked off
                byte = (byte >> (4 * (c % 2))) & 0xF
            ph = byte & 3
            ee = (byte >> _EXT_E_BIT) & 1
            ef = (byte >> _EXT_F_BIT) & 1
            in_h = st == ST_H
            stop = act_blk & in_h & (ph == PTR_STOP)
            done = jnp.where(stop, 1, done)
            act = act_blk & (done == 0)
            act_m = act & in_h & (ph == PTR_DIAG)
            act_i = act & ((in_h & (ph == PTR_UP)) | (st == ST_F))
            act_d = act & ((in_h & (ph == PTR_LEFT)) | (st == ST_E))
            op = jnp.where(
                act_m,
                OP_M,
                jnp.where(act_i, OP_I, jnp.where(act_d, OP_D, 255)),
            ).astype(jnp.int32)
            opsv = jnp.where(lane == kidx % LANES, op, opsv)
            st = jnp.where(
                act_m,
                ST_H,
                jnp.where(
                    act_i,
                    jnp.where(ef == 1, ST_F, ST_H),
                    jnp.where(act_d, jnp.where(ee == 1, ST_E, ST_H), st),
                ),
            )
            i = i - (act_m | act_i).astype(jnp.int32)
            j = j - (act_m | act_d).astype(jnp.int32)
        ops_ref[...] = opsv
        s_i[:] = i
        s_j[:] = j
        s_st[:] = st
        s_dn[:] = done

        @pl.when(g == NG - 1)
        def _out():
            st_out_ref[0] = s_i[:]
            st_out_ref[1] = s_j[:]
            st_out_ref[2] = s_st[:]
            st_out_ref[3] = s_dn[:]

    st_in = jnp.stack(
        [
            jnp.broadcast_to(x[:, None].astype(jnp.int32), (B, LANES))
            for x in (iv, jv, stv, donev)
        ]
    )
    PBLK = WSTEP // 2 if packed else WSTEP
    ops, st_out = pl.pallas_call(
        kern,
        grid=(NG,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (PBLK, B, Wp),
                lambda g: (NG - 1 - g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (4, B, LANES), lambda g: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (B, LANES),
                lambda g: (0, (KW - 1 - g * WSTEP) // LANES),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (4, B, LANES), lambda g: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, KWp), jnp.int32),
            jax.ShapeDtypeStruct((4, B, LANES), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((B, LANES), jnp.int32)] * 4,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
    )(jnp.asarray([k0, i_floor], jnp.int32), ptrs, st_in)
    return ops, st_out[0, :, 0], st_out[1, :, 0], st_out[2, :, 0], st_out[3, :, 0]
