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
    the same values to size batches."""
    WQW = _ceil_to(Wp + CK // 2 + 2 + 2 * LANES, LANES)
    WTW = _ceil_to(CK + 2 + 2 * LANES, LANES)
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
    score_ref,  # (B, Wp) i32 masked final-score capture (accumulating)
    state_out_ref,  # (N_STATE, B, Wp) i32 state after the last diagonal
    ckpt_ref,  # (1, N_STATE, B, Wp) i32 per-chunk snapshot (chunk start)
    ptr_ref,  # (CK, B, Wp) i8 pointer block (dummy (1,B,Wp) if !want_ptr)
    *state_scratch,  # N_STATE x (B, Wp) i32
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
    steady: bool,
    WQW: int,
    WTW: int,
):
    NS = n_band_state(profile, emode)
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

    state_scratch = list(state_scratch)
    if stream:
        qwin, twin, semq, semt = state_scratch[-4:]
        del state_scratch[-4:]

    @pl.when(g == 0)
    def _init():
        for a in range(NS):
            state_scratch[a][:] = state_in_ref[a, :, :]
        score_ref[:] = jnp.full((B, Wp), NEG, jnp.int32)

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

    def substep(k, st, dstat=None, tops=None):
        H1, H2, E1, F1 = st[:4]
        if emode:
            qws = list(st[4:-3])
            TW, BV, BK = st[-3], st[-2], st[-1]
        else:
            qws = list(st[4:-1])  # [QW] scalar mode | [PW0..PW3] profile mode
            TW = st[-1]
        live = k < K

        ih = ihat(k)
        if dstat is not None:
            # steady zone (k >= dhi+1): the ihat deltas are pure parity
            # functions of k, precomputed as PYTHON ints by `group` — every
            # roll below gets a static shift (half of them shift-0 no-ops)
            d1, d2 = dstat
        else:
            d1 = ih - ihat(k - 1)  # {0, 1}
            d2 = ih - ihat(k - 2)  # {0, 1, 2}

        # sliding windows (QW/PWg[p] = src[ih+p-1], TW[p] = t[k-ih-p-1]).
        # With STATIC deltas (steady zone) the redundant half of the
        # maintenance drops out: d1 == 0 leaves ihat (hence every query
        # window) bit-identical — the roll is shift-0 and the insert
        # rewrites slot Wp-1 with its own value; d1 == 1 leaves k - ihat
        # (hence TW) bit-identical the same way.  Skipping them is exact,
        # not approximate, and removes ~half the col() cross-lane reduces
        # per substep (VERDICT.md round-2 item 1's second audit target).
        if dstat is None or d1 == 1:
            for gi in range(len(qws)):
                w = _roll_norm(qws[gi], -d1)
                if tops is not None:
                    # group-batched top-up: the pre-rolled superset block
                    # already holds the wanted letter/word at lane Wp-1
                    qws[gi] = jnp.where(parr == Wp - 1, tops[0][gi], w)
                else:
                    top = col(qsrc, ih + Wp - 1 - qbase, gi if profile else None)
                    qws[gi] = jnp.where(
                        parr == Wp - 1, jnp.broadcast_to(top, (B, Wp)), w
                    )
        if dstat is None or d1 == 0:
            TW = _roll_norm(TW, 1 - d1)
            if tops is not None:
                TW = jnp.where(parr == 0, tops[1], TW)
            else:
                tlow = col(tsrc, k - ih - tbase)
                TW = jnp.where(parr == 0, jnp.broadcast_to(tlow, (B, Wp)), TW)

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
            if dstat is None:
                ok = ok & ~origin
                Hn = jnp.where(origin, 0, jnp.where(ok, Hn, NEG))
            else:
                Hn = jnp.where(ok, Hn, NEG)
            En = jnp.where(ok, En, NEG)
            Fn = jnp.where(ok, Fn, NEG)

        if emode:
            # anchored-extension argmax: per band slot, strict > keeps the
            # first k, which is canonical within a slot (i = ihat(k) + p is
            # non-decreasing in k; equal i means smaller j); cross-slot
            # canonicalization happens in the caller's packed-index reduce.
            # BK stores k only — (i, j) are reconstructed from (k, p).
            upd = Hn > BV
            BV = jnp.where(upd, Hn, BV)
            BK = jnp.where(upd, jnp.int32(k), BK)
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
            ptr_ref[k - k_start - g * CK, :, :] = pword.astype(jnp.int8)

        if emode:
            return (Hn, H1, En, Fn, *qws, TW, BV, BK)
        return (Hn, H1, En, Fn, *qws, TW)

    # group-batched window top-ups (steady zone): instead of a per-step
    # col() — aligned load + compare + cross-lane mask-reduce + broadcast
    # (~8 ops per window per d1=1 step, x4 profile windows: THE dominant
    # steady-substep cost) — each NSUB group loads ONE 2-lane-block
    # superset per window, rotates it once so the group's first wanted
    # column sits at the insert lane, and every substep takes a STATIC
    # roll of that block (the per-u column advance a_u is a pure parity
    # function, same derivation as the static ihat deltas).  Exact, not
    # approximate: only lane Wp-1 (query) / lane 0 (target) of the block
    # is ever selected.  Requires the insert lane to be a real lane index
    # (Wp == LANES, the fused pass-2 geometry) and VMEM-resident letters.
    fast_tops = steady and Wp == LANES and not stream
    W2L = 2 * LANES

    def group(gi, st):
        k0 = k_start + g * CK + gi * NSUB
        qblks = tblk = None
        if fast_tops:
            ih0 = ihat(k0)
            # parity of the linear ihat argument (k0 - dhi + 1); g*CK and
            # gi*NSUB are even, so it is static
            x0p = (k_start - dhi + 1) % 2
            cq = ih0 + Wp - 1 - qbase
            cqb = pl.multiple_of((cq // LANES) * LANES, LANES)
            qsh = (LANES - 1 - (cq - cqb)) % W2L  # wanted col -> lane 127
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
        for u in range(NSUB):
            if steady:
                # parity(k) == parity(k_start + u): g*CK and gi*NSUB are
                # even (asserted in band_fill_range), so the ihat deltas
                # are static per unrolled substep: d1 = 1 iff (k + dhi)
                # odd, d2 = 1 (linear zone k >= dhi+1)
                d1s = 1 if (k_start + u + dhi) % 2 == 1 else 0
                tops = None
                if fast_tops:
                    a_u = (x0p + u) // 2  # ihat(k0+u) - ihat(k0), static
                    if d1s == 1:
                        tops = (
                            [
                                _roll_norm(b, (W2L - a_u) % W2L)[:, :Wp]
                                for b in qblks
                            ],
                            None,
                        )
                    else:
                        b_u = u - a_u  # t-column advance, static
                        tops = (
                            None,
                            _roll_norm(tblk, (W2L - b_u) % W2L)[:, :Wp],
                        )
                st = substep(k0 + u, st, (d1s, 1), tops=tops)
            else:
                st = substep(k0 + u, st)
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
):
    """Fill anti-diagonals [k_start, k_end) resuming from state_in.

    Returns (score, state_out, ckpts, ptrs):
      score: (B, Wp) running masked capture (max-merged with score_in);
      state_out: (N_STATE, B, Wp) state after diagonal k_end-1;
      ckpts: (NC, N_STATE, B, Wp) state entering each CK-chunk;
      ptrs: (NCHUNK*CK, B, Wp) i8 packed pointers (dummy if !want_ptr).
    """
    B = qk.shape[1] if profile else qk.shape[0]
    NS = n_band_state(profile, emode)

    # substeps unrolled per fori iteration.  `nsub` is a jit static arg —
    # callers resolve any env override (SEQALIB_BAND_NSUB) at the host
    # boundary (models/banded.banded_align_batch's kw, strip_pallas.fused_pass2_knobs)
    # so the value is always in the cache key; a trace-time env read here
    # silently reused stale compiles after mid-process env changes.
    NSUB = nsub if nsub is not None else 4
    if CK % NSUB != 0:
        raise ValueError(f"nsub={NSUB} must divide CK={CK}")
    if steady:
        # the static-roll specialization needs (a) parity(k) derivable
        # from k_start + u alone and (b) every k in the linear ihat zone
        if NSUB % 2 or CK % 2:
            raise ValueError(f"steady requires even NSUB/CK, got {NSUB}/{CK}")
        if k_start < dhi + 1:
            raise ValueError(f"steady requires k_start >= dhi+1, got {k_start}")
    span = _ceil_to(k_end - k_start, max(CK, NSUB))
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
        steady=steady,
        WQW=WQW,
        WTW=WTW,
    )

    def cspec(shape):
        return pl.BlockSpec(shape, lambda g: (0,) * len(shape), memory_space=pltpu.VMEM)

    out_shapes = [
        jax.ShapeDtypeStruct((B, Wp), jnp.int32),
        jax.ShapeDtypeStruct((NS, B, Wp), jnp.int32),
        jax.ShapeDtypeStruct((NCHUNK, NS, B, Wp), jnp.int32),
        jax.ShapeDtypeStruct((NCHUNK * CK if want_ptr else 1, B, Wp), jnp.int8),
    ]
    out_specs = [
        cspec((B, Wp)),
        cspec((NS, B, Wp)),
        pl.BlockSpec(
            (1, NS, B, Wp), lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        (
            pl.BlockSpec((CK, B, Wp), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
            if want_ptr
            else cspec((1, B, Wp))
        ),
    ]

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
    score, state_out, ckpts, ptrs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs
        + [
            cspec((B, LANES)),
            cspec((B, LANES)),
            cspec((B, LANES)),
            cspec((B, LANES)),
            cspec((NS, B, Wp)),
        ],
        out_shape=out_shapes,
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
    )(qk, tk, qlenc, tlenc, dloc, dhic, state_in)
    score = jnp.maximum(score, score_in)
    return score, state_out, ckpts, ptrs


@functools.partial(
    jax.jit,
    static_argnames=("KW", "dhi", "Wp", "B", "interpret"),
)
def band_walk_range(ptrs, iv, jv, stv, donev, k0, *, KW, dhi, Wp, B,
                    interpret):
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
    """
    from ..utils.cigar import OP_D, OP_I, OP_M

    ST_H, ST_E, ST_F = 0, 1, 2
    KWp = _ceil_to(KW, LANES)
    NBK = KWp // LANES

    def kern(k0_ref, ptr_ref, st_in_ref, ops_ref, st_out_ref,
             s_i, s_j, s_st, s_dn):
        g = pl.program_id(0)
        kidx = KW - 1 - g  # descending diagonals
        # k0 is a runtime scalar (SMEM): each traceback super-block has a
        # different diagonal origin, and a static k0 would recompile the
        # walk kernel per super-block (~12+ remote compiles per 100kb
        # batch geometry)
        k = k0_ref[0] + kidx
        parrW = jax.lax.broadcasted_iota(jnp.int32, (B, Wp), 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, LANES), 1)

        @pl.when(g == 0)
        def _init():
            s_i[:] = st_in_ref[0]
            s_j[:] = st_in_ref[1]
            s_st[:] = st_in_ref[2]
            s_dn[:] = st_in_ref[3]

        # a fresh ops block starts at its top column (first touch)
        @pl.when((g == 0) | (kidx % LANES == LANES - 1))
        def _blank():
            ops_ref[...] = jnp.full((B, LANES), 255, jnp.int32)

        i = s_i[:]
        j = s_j[:]
        st = s_st[:]
        done = s_dn[:]
        kcur = i + j
        act_blk = (done == 0) & (kcur == k)
        num = k - dhi + 1
        ih = jnp.maximum(0, num // 2)  # traced scalar; // floors negatives
        p = jnp.clip(i - ih, 0, Wp - 1)
        byte = jnp.sum(
            jnp.where(parrW == p[:, 0:1], ptr_ref[0].astype(jnp.int32), 0),
            axis=1,
            keepdims=True,
        )
        byte = jnp.broadcast_to(byte, (B, LANES))
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
        ops_ref[...] = jnp.where(lane == kidx % LANES, op, ops_ref[...])
        st = jnp.where(
            act_m,
            ST_H,
            jnp.where(
                act_i,
                jnp.where(ef == 1, ST_F, ST_H),
                jnp.where(act_d, jnp.where(ee == 1, ST_E, ST_H), st),
            ),
        )
        s_i[:] = i - (act_m | act_i).astype(jnp.int32)
        s_j[:] = j - (act_m | act_d).astype(jnp.int32)
        s_st[:] = st
        s_dn[:] = done

        @pl.when(g == KW - 1)
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
    ops, st_out = pl.pallas_call(
        kern,
        grid=(KW,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, B, Wp), lambda g: (KW - 1 - g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (4, B, LANES), lambda g: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (B, LANES), lambda g: (0, (KW - 1 - g) // LANES),
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
    )(jnp.full((1,), k0, jnp.int32), ptrs, st_in)
    return ops, st_out[0, :, 0], st_out[1, :, 0], st_out[2, :, 0], st_out[3, :, 0]
