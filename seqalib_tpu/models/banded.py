"""Banded long-read alignment driver: fill + checkpointed traceback.

Config 4 (BASELINE.json:10): banded affine NW on 10-100kb pairs.  Two-phase
design (SURVEY.md §3.2-2):

1. **Fill** — `ops.banded_pallas.band_fill_range` over all K anti-diagonals,
   O(n·w) time / O(w) state, emitting a state snapshot (checkpoint) every
   ``CK`` diagonals to HBM: K/CK · 6 · B · Wp int32 ≪ the O(n·w) pointer
   matrix a naive traceback would need (impossible at 100kb).
2. **Traceback** — walk blocks last-to-first: recompute each CK-diagonal
   block from its checkpoint with pointer emission on (the recompute is the
   documented ~2x fill cost, SURVEY.md §7 "Traceback memory"), then walk the
   in-VMEM-sized pointer block on the host, vectorized across the batch.

Bucket contract: all pairs share ``tlen - qlen`` (the dispatcher groups
banded pairs by length delta) so the band geometry (dlo, dhi) is uniform;
per-pair lengths may differ inside the bucket.
"""

from __future__ import annotations

import logging
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger("seqalib_tpu.banded")

from ..ops.banded_pallas import (
    G_PROF,
    LANES,
    N_STATE,
    NIBBLE_BIAS,
    band_fill_range,
    build_packed_profile_np,
    init_band_state,
    n_band_state,
)
from ..types import (
    NEG_INF,
    PTR_DIAG,
    PTR_LEFT,
    PTR_STOP,
    PTR_UP,
    AlignResult,
    ScoringParams,
)
from ..utils.cigar import OP_D, OP_I, OP_M, ops_to_cigar

_EXT_E_BIT = 2
_EXT_F_BIT = 3


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _geometry(dlo: int, dhi: int, n: int, m: int):
    D = dhi - dlo + 1
    Wp = _ceil_to(D // 2 + 2, LANES)
    K = n + m + 1
    return Wp, K


def _phase_runs(k_lo: int, k_hi: int, CK: int, dhi: int):
    """Split the CK-aligned diagonal range [k_lo, k_hi) into maximal
    (k0, k1, phase) runs for band_fill_range's static-roll phases:
    "clamp" while every diagonal <= dhi (ihat == 0), one "dyn" transition
    chunk straddling dhi+1, "steady" for the parity-static remainder.
    The phase split is exact (same values), only the roll shifts become
    compile-time constants (round 4; VERDICT round-3 item 1)."""
    assert k_lo % CK == 0 and k_hi % CK == 0
    kA = min(((dhi + 1) // CK) * CK, k_hi)  # clamp chunks end here
    runs = []
    if k_lo < kA:
        runs.append((k_lo, kA, "clamp"))
    d0 = max(k_lo, kA)
    if kA < dhi + 1 and d0 == kA and d0 < k_hi:
        # the chunk containing dhi+1 keeps traced deltas (a range starting
        # past it is already in the steady zone: k_lo >= kA + CK > dhi)
        d1 = min(d0 + CK, k_hi)
        runs.append((d0, d1, "dyn"))
        d0 = d1
    if d0 < k_hi:
        runs.append((d0, k_hi, "steady"))
    return runs


def _pad_letters(seqs: np.ndarray, width: int, sentinel: int, lens: np.ndarray):
    """(B, width) i32: out[:, x] = seq[x-1] for 1 <= x <= len else sentinel."""
    B = seqs.shape[0]
    out = np.full((B, width), sentinel, np.int32)
    L = min(seqs.shape[1], width - 1)
    out[:, 1 : 1 + L] = seqs[:, :L]
    xs = np.arange(width)[None, :]
    return np.where((xs >= 1) & (xs <= lens[:, None]), out, sentinel).astype(np.int32)


def banded_align_batch(
    qs: np.ndarray,
    ts: np.ndarray,
    qlen: np.ndarray,
    tlen: np.ndarray,
    sp: ScoringParams,
    band: int,
    traceback: bool = True,
    CK: Optional[int] = None,
    device=None,
    device_walk: Optional[bool] = None,
) -> List[AlignResult]:
    """Banded affine-gap global alignment of a same-delta bucket.

    ``CK`` (checkpoint/chunk spacing, diagonals): defaults to 512 for
    score-only calls (+6% fill, round-4 sweep: 59.3 vs 55.8 GCUPS(n*w)
    at CK=512/256 — spacing is a free parameter when nothing recomputes
    from checkpoints) and 256 with traceback (the recompute block
    granularity rationale; VERDICT round-4 item 7).

    qs/ts: (B, L*) int letter codes.  Scoring: scalar match/mismatch, or a
    substitution matrix fitting the packed-nibble range (BLOSUM62 does) via
    the kernel's sliding packed-profile windows; wider tables raise (the
    dispatcher routes those to the full wavefront kernel).  Deltas
    (tlen - qlen) may differ per pair: the oracle's band semantics are
    enforced per pair by in-kernel bound vectors, while the SLOT geometry
    (dlo, dhi, Wp) covers the bucket's delta spread — one kernel compile
    per geometry bucket instead of one per distinct delta (VERDICT.md
    round-1 item 3).

    ``device``: pin every device call of this batch to one jax.Device
    (the mesh dispatcher round-robins banded groups over the mesh's
    devices; placement follows committed inputs under jit).  The fill ->
    host-walk loop is synchronous per batch, so cross-device overlap is
    limited to XLA's async dispatch window — true pipelined multi-chip
    banded fill is future work gated on real multi-chip hardware.
    """
    profile = sp.matrix is not None
    if profile:
        from ..ops.banded_pallas import banded_matrix_supported

        table = sp.substitution_matrix()
        if not banded_matrix_supported(table):
            raise NotImplementedError(
                "banded matrix scoring needs a packed-nibble-range table "
                f"([{-NIBBLE_BIAS}, {15 - NIBBLE_BIAS}]) and alphabet+1 <= "
                "31; wider tables use the full wavefront kernel (band= on "
                "align_batch)"
            )
        A1 = int(table.shape[0])
    interpret = jax.devices()[0].platform != "tpu"
    qs = np.asarray(qs, np.int32)
    ts = np.asarray(ts, np.int32)
    qlen = np.asarray(qlen, np.int64)
    tlen = np.asarray(tlen, np.int64)
    B0 = qs.shape[0]
    if B0 % 8:
        # Mosaic rejects non-sublane-aligned batch slices on real TPU
        # ("Slice shape along dimension 0 must be aligned to tiling (8)");
        # pad with zero-length sentinel pairs and slice the results off
        padb = 8 - B0 % 8
        qs = np.concatenate([qs, np.zeros((padb, qs.shape[1]), qs.dtype)])
        ts = np.concatenate([ts, np.zeros((padb, ts.shape[1]), ts.dtype)])
        qlen = np.concatenate([qlen, np.zeros(padb, qlen.dtype)])
        tlen = np.concatenate([tlen, np.zeros(padb, tlen.dtype)])
        return banded_align_batch(
            qs, ts, qlen, tlen, sp, band, traceback=traceback, CK=CK,
            device=device, device_walk=device_walk,
        )[:B0]
    deltas = tlen - qlen
    B = qs.shape[0]
    n = int(qlen.max())
    m = int(tlen.max())
    # per-pair oracle band bounds; bucket slot geometry covers them all
    dlo_p = (np.minimum(0, deltas) - band).astype(np.int64)
    dhi_p = (np.maximum(0, deltas) + band).astype(np.int64)
    dlo = int(dlo_p.min())
    dhi = int(dhi_p.max())
    Wp, K = _geometry(dlo, dhi, n, m)
    if CK is None:
        CK = 256 if traceback else 512
    CK = _ceil_to(CK, 4)
    import os as _os

    # letter streaming (default on): letters stay in HBM and each chunk
    # DMAs its sliding windows into VMEM scratch, lifting the resident-
    # letter VMEM ceiling that used to force tiny batches at 100kb
    stream = _os.environ.get("SEQALIB_BANDED_STREAM", "1") == "1"

    Kp = _ceil_to(K, CK)  # the grid may run past K; widths must cover it
    dma_slack = (CK // 2 + 4 * LANES) if stream else 0
    # + 2*LANES: the static-phase group top-ups load (B, 2*LANES) aligned
    # superset blocks around the last insert column
    qwidth = _ceil_to((Kp - dhi) // 2 + Wp + 2 + dma_slack, LANES) + 2 * LANES
    twidth = _ceil_to(Kp + 2 + 2 * dma_slack, LANES) + 2 * LANES

    # VMEM guard: chunk the batch so one call fits the ~16MB VMEM.
    # Streaming mode holds only the per-chunk windows + band state;
    # non-streaming additionally keeps the full padded letters resident.
    vmem_cap = int(_os.environ.get("SEQALIB_BANDED_VMEM_CAP", str(8 * 1024**2)))
    n_qrows = G_PROF if profile else 1  # resident query-side rows per pair
    if stream:
        from ..ops.banded_pallas import stream_windows

        WQW, WTW = stream_windows(Wp, CK)
        per_pair = (n_qrows * WQW + WTW + (10 + 2 * n_qrows) * Wp) * 4
    else:
        per_pair = (n_qrows * qwidth + twidth + (10 + 2 * n_qrows) * Wp) * 4
    if traceback:
        # the recompute pass streams (CK, B, Wp) int8 pointer blocks and
        # the fill pass (1, NS, B, Wp) checkpoint blocks through the
        # output pipeline — both live in scoped VMEM, double-buffered
        # (measured: B=128 w=256 blew the 16M scoped limit at 30.4M
        # before this term entered the guard)
        ns = n_band_state(profile, False)
        per_pair += 2 * (CK * Wp + ns * Wp * 4)
    max_b = max(1, vmem_cap // per_pair)
    # chunks stay sublane-aligned with a floor of 8: Mosaic rejects sub-8
    # batch slices, and a sub-8 chunk would bounce against the pad-to-8
    # entry guard forever (the VMEM estimate has slack; the default cap
    # is half the real budget)
    max_b = max(8, max_b - max_b % 8)
    if B > max_b:
        log.info(
            "banded VMEM guard: chunking %d pairs into <=%d-pair calls "
            "(%.2f MB resident/pair)",
            B,
            max_b,
            per_pair / 1e6,
        )
        out: List[AlignResult] = []
        for lo in range(0, B, max_b):
            out.extend(
                banded_align_batch(
                    qs[lo : lo + max_b],
                    ts[lo : lo + max_b],
                    qlen[lo : lo + max_b],
                    tlen[lo : lo + max_b],
                    sp,
                    band,
                    traceback=traceback,
                    CK=CK,
                    device=device,
                    device_walk=device_walk,
                )
            )
        return out
    q_sent, t_sent = (A1, A1 + 1) if profile else (4, 5)
    put = (lambda x: jax.device_put(x, device)) if device is not None else jnp.asarray
    qk_h = _pad_letters(qs, qwidth, q_sent, qlen)
    tk = put(_pad_letters(ts, twidth, t_sent, tlen))
    if profile:
        qin_h = build_packed_profile_np(qk_h, table)  # (G_PROF, B, qwidth)
    else:
        qin_h = qk_h
    qin = put(qin_h)
    qlen_j = put(np.asarray(qlen, np.int32))
    tlen_j = put(np.asarray(tlen, np.int32))
    dlo_j = put(np.asarray(dlo_p, np.int32))
    dhi_j = put(np.asarray(dhi_p, np.int32))

    state0 = put(init_band_state(qin_h, B, Wp, profile=profile))
    score0 = put(np.full((B, Wp), NEG_INF, np.int32))

    kw = dict(
        K=K,
        Wp=Wp,
        dlo=dlo,
        dhi=dhi,
        match=0 if profile else sp.match,
        mismatch=0 if profile else sp.mismatch,
        gap_open=sp.gap_open,
        gap_extend=sp.gap_extend,
        CK=CK,
        interpret=interpret,
        profile=profile,
        stream=stream,
        # resolved HERE (host boundary) so the env override is part of
        # the jit cache key — band_fill_range no longer reads env itself.
        # On-chip sweep (round 4, .claude/r4/band_profile3.log): the
        # phase-split fill measures 54.7/55.8/50.6 GCUPS(n*w) at NSUB
        # 8/32/64 — 32 ships; interpret mode keeps 4 (unroll = CPU-test
        # trace time)
        nsub=int(
            _os.environ.get("SEQALIB_BAND_NSUB", "4" if interpret else "32")
        ),
    )

    # ---- pass 1: fill with checkpoints (phase-split static rolls) -------
    # the clamp/steady phases compile every roll shift to a constant and
    # batch the window top-ups per NSUB group; only the one transition
    # chunk straddling dhi+1 keeps traced deltas.  Ranges that cannot
    # contain a finish diagonal additionally skip the per-substep score
    # capture (want_score=False).
    Kp_all = _ceil_to(K, CK)
    kfin_min = int((qlen + tlen).min())
    kSC = (kfin_min // CK) * CK  # first chunk with a possible finish
    runs = []
    for k0r, k1r, ph in _phase_runs(0, Kp_all, CK, dhi):
        if k0r < kSC < k1r and ph != "dyn":
            runs += [(k0r, kSC, ph), (kSC, k1r, ph)]
        else:
            runs.append((k0r, k1r, ph))
    score_v = score0
    state_v = state0
    ckpt_parts = []
    for k0r, k1r, ph in runs:
        score_v, state_v, ck_r, _ = band_fill_range(
            qin,
            tk,
            qlen_j,
            tlen_j,
            dlo_j,
            dhi_j,
            state_v,
            score_v,
            k_start=k0r,
            k_end=k1r,
            want_ptr=False,
            want_ckpt=traceback,
            phase=ph,
            want_score=k1r > kfin_min,
            **kw,
        )
        if traceback:
            ckpt_parts.append(ck_r)
    score_h = np.asarray(score_v)
    scores = score_h.max(axis=1)

    if not traceback:
        return [
            AlignResult(int(scores[b]), 0, int(qlen[b]), 0, int(tlen[b]), "")
            for b in range(B)
        ]

    # checkpoints stay ON DEVICE: at B=128 10kb they are ~93MB — a host
    # round-trip through the tunnel used to cost more than every other
    # traceback component combined (round 4); the super-block recompute
    # only ever re-feeds them to device fills
    ckpts_dev = (
        ckpt_parts[0]
        if len(ckpt_parts) == 1
        else jnp.concatenate(ckpt_parts, axis=0)
    )  # (NC, N_STATE, B, Wp)

    # ---- pass 2: blockwise recompute + walk ------------------------------
    ST_H, ST_E, ST_F = 0, 1, 2
    i = qlen.copy()
    j = tlen.copy()
    st = np.zeros(B, np.int32)
    done = np.zeros(B, bool)
    barr = np.arange(B)
    ops_rev_cols: List[np.ndarray] = []
    dev_blocks: List[np.ndarray] = []
    # walk engines, fastest first: (1) the DEVICE walk kernel
    # (ops/banded_pallas.band_walk_range) keeps the (KW, B, Wp) pointer
    # blocks on-device and ships only a (B, KW) op matrix — the pointer
    # haul was ~95% of the traceback wall through the remote tunnel;
    # (2) the native C++ per-pair walker (host, needs the pointer haul);
    # (3) the NumPy lockstep walk (no-toolchain fallback).
    use_dev_walk = device_walk if device_walk is not None else not interpret
    from .. import native as _native

    nwalk = (
        None
        if use_dev_walk
        else _native.BandedWalk.create(i, j, cap=int((qlen + tlen).max()) + 2)
    )

    def ihat(k):
        return np.maximum(0, (k - dhi + 1) // 2)

    k_cur = i + j
    ci = int(k_cur.max()) // CK
    # recompute pointer blocks in super-blocks of SB chunks per device
    # call: the walk visits every chunk, and per-call dispatch overhead
    # (~40ms through the remote tunnel) would otherwise dominate at 100kb
    # (e.g. 780 calls for K=200k, CK=256).  SB is capped so the pointer
    # block stays a modest HBM allocation (SB*CK*B*Wp int8).
    import os as _os

    # dev-walk default 192MB: the block is transient HBM never fetched, so
    # a larger SB only cuts launch count; the host paths keep 64MB (the
    # block IS the haul there)
    sb_env = _os.environ.get("SEQALIB_BANDED_SB_BYTES")
    sb_bytes = int(sb_env) if sb_env is not None else (
        (192 if use_dev_walk else 64) * 1024**2
    )
    sb_cap = 64 if use_dev_walk else 16
    # the dev path stores 2 diagonals/byte (pack_ptr), halving block bytes
    blk_bytes = CK * B * Wp // (2 if use_dev_walk else 1)
    SB = max(1, min(sb_cap, sb_bytes // max(1, blk_bytes)))
    NC_ALL = _ceil_to(K, CK) // CK  # total chunks (letter widths cover these)

    def _recompute_ptrs(cg, k1g, pack):
        st_r = ckpts_dev[cg]
        ptr_parts = []
        for k0r, k1r, ph in _phase_runs(cg * CK, k1g, CK, dhi):
            _, st_r, _, ptr_r = band_fill_range(
                qin,
                tk,
                qlen_j,
                tlen_j,
                dlo_j,
                dhi_j,
                st_r,
                score0,
                k_start=k0r,
                k_end=k1r,
                want_ptr=True,
                want_ckpt=False,
                phase=ph,
                want_score=False,
                pack_ptr=pack,
                **kw,
            )
            ptr_parts.append(ptr_r)
        return (
            ptr_parts[0]
            if len(ptr_parts) == 1
            else jnp.concatenate(ptr_parts, axis=0)
        )

    if use_dev_walk:
        # on-device walk, DEVICE-THREADED state (round 4, VERDICT round-3
        # item 5): ptrs never leave the chip AND the walker state (i, j,
        # state, done) now stays a device array across super-blocks, so
        # the whole recompute+walk chain is queued without a host sync
        # per block (16 blocks x ~3 tunnel round-trips used to dominate
        # the traceback wall); the global walk visits every chunk, so the
        # early-exit the host paths keep has nothing to save here.  The
        # op blocks are fetched once, after every launch is queued.
        from ..ops.banded_pallas import band_walk_range

        iv = jnp.asarray(i, jnp.int32)
        jv = jnp.asarray(j, jnp.int32)
        stv = jnp.asarray(st, jnp.int32)
        dnv = jnp.asarray(done, jnp.int32)
        blk_devs = []
        while ci >= 0:
            cg = (ci // SB) * SB
            k1g = min(cg + SB, NC_ALL) * CK
            ptrs = _recompute_ptrs(cg, k1g, pack=True)
            KW = k1g - cg * CK
            ops_blk, iv, jv, stv, dnv = band_walk_range(
                ptrs[: KW // 2],
                iv,
                jv,
                stv,
                dnv,
                cg * CK,
                KW=KW,
                dhi=dhi,
                Wp=Wp,
                B=B,
                interpret=interpret,
                packed=True,
            )
            # cast on DEVICE: op codes fit int8 and the fetch rides the
            # tunnel (4x fewer bytes)
            blk_devs.append((ops_blk.astype(jnp.int8), KW))
            ci = cg - 1
        for ops_blk, KW in blk_devs:
            # column x <-> diagonal k0+x; walk order is k DESCENDING
            ops8 = np.asarray(ops_blk).view(np.uint8)
            dev_blocks.append(ops8[:, :KW][:, ::-1])

    while not use_dev_walk and not done.all() and ci >= 0:
        cg = (ci // SB) * SB  # super-block's first chunk
        k0 = cg * CK
        k1g = min(cg + SB, NC_ALL) * CK  # clamp: kernel loads past the
        # padded diagonal range would run off the letter arrays
        ptrs = _recompute_ptrs(cg, k1g, pack=False)
        KW = k1g - k0
        P = np.asarray(ptrs)  # (k1g - k0, B, Wp)
        if nwalk is not None:
            nwalk.walk_block(P, k0, dhi)
            done = nwalk.done.astype(bool)
            i = nwalk.i
            j = nwalk.j
            ci = cg - 1
            continue
        # walk pairs while their current diagonal is inside this super-block
        while True:
            k_cur = i + j
            act_blk = (~done) & (k_cur >= k0) & (k_cur < k0 + KW)
            if not act_blk.any():
                break
            p_slot = i - ihat(k_cur)
            byte = np.where(
                act_blk, P[np.clip(k_cur - k0, 0, KW - 1), barr, np.clip(p_slot, 0, P.shape[2] - 1)], 0
            ).astype(np.int32)
            ph = byte & 3
            ext_e = ((byte >> _EXT_E_BIT) & 1).astype(bool)
            ext_f = ((byte >> _EXT_F_BIT) & 1).astype(bool)
            in_h = st == ST_H
            stop = act_blk & in_h & (ph == PTR_STOP)
            done = done | stop
            act = act_blk & ~done
            act_m = act & in_h & (ph == PTR_DIAG)
            act_i = act & ((in_h & (ph == PTR_UP)) | (st == ST_F))
            act_d = act & ((in_h & (ph == PTR_LEFT)) | (st == ST_E))
            op = np.where(
                act_m, OP_M, np.where(act_i, OP_I, np.where(act_d, OP_D, 255))
            ).astype(np.uint8)
            ops_rev_cols.append(op)
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
        ci = cg - 1

    results = []
    if nwalk is not None:
        cigars = nwalk.cigars()
        return [
            AlignResult(
                int(scores[b]), 0, int(qlen[b]), 0, int(tlen[b]), cigars[b]
            )
            for b in range(B)
        ]
    if use_dev_walk:
        # blocks were visited high-k first and each block's columns are
        # already in descending-k (= walk) order — same shape the NumPy
        # lockstep path produces
        ops_mat = (
            np.concatenate(dev_blocks, axis=1).astype(np.uint8)
            if dev_blocks
            else np.zeros((B, 0), np.uint8)
        )
    else:
        ops_mat = (
            np.stack(ops_rev_cols, axis=1)
            if ops_rev_cols
            else np.zeros((B, 0), np.uint8)
        )
    for b in range(B):
        row = ops_mat[b]
        row = row[row != 255]
        cigar = ops_to_cigar(row[::-1])
        results.append(
            AlignResult(int(scores[b]), 0, int(qlen[b]), 0, int(tlen[b]), cigar)
        )
    return results
