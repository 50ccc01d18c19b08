"""Banded sequence-parallel relay: one long pair's band split across the
mesh as per-device row blocks (the north star's "one pair or band per
core for long sequences" applied to the O(n·w) banded engine;
BASELINE.json:5, SURVEY.md §2.3).

Why a RELAY and not a latency-parallel pipeline — the critical-path math
(committed here so the design is judged against physics, not hope):
banded DP has a serial chain of K = n + m anti-diagonals; the parallel
work per step is the band width w.  One v5e core's VPU already covers
w <= ~4096 per vector op set, so splitting ONE pair's band across cores
cannot shorten the wall below the K-step chain — device d's first row
depends on device d-1's LAST row (the blocks chain strictly).  What the
split DOES buy, and what this module implements:

* **Memory scaling**: each device holds only its row block's O(w) state
  and letter slice, not the whole pair — the single-device VMEM/HBM
  ceilings (models/banded.py guard) stop binding sequence length.
* **Cross-pair pipelining**: with G >= D pair-groups in flight the relay
  is a classic pipeline — device d works on group s-d at super-step s —
  sustaining D-fold throughput at a fill/drain cost of (D-1)/(G+D-1).

Mechanics (TPU-idiomatic, all inside one jit):

* Row blocks of R = ceil(n/D) query rows per device on mesh axis 'band'.
* Each block is a self-contained banded fill (ops.banded_pallas, the
  phase-split static-roll kernel) over LOCAL coordinates i'' = i - d*R,
  j'' = j - d*R - dlo: the local band is [0, D_band-1] for every block,
  so ONE kernel compile serves all devices and groups.
* The incoming boundary (previous block's last row: H/F over the band's
  w columns — the whole inter-device dependency, because E is
  within-row) is INJECTED as local row 0 during the clamp zone
  (band_fill_range(bh=, bf=)); the outgoing last row is captured by the
  same kernel (want_bout) and shipped one neighbor hop with a single
  lax.ppermute per super-step.
* Scores: every device captures the (n, m) cell if its (possibly
  overcomputed) rows reach it; jax.lax.pmax dedups.

Scoring: scalar match/mismatch (the long-read domain) or a
substitution matrix in the packed-nibble range (BLOSUM62 fits) via the
kernel's packed-profile windows, matching models/banded.py.  Outputs: batched scores
(`banded_nw_affine_score_sp`) or score + full CIGAR for one pair
(`banded_nw_affine_align_sp`: per-block checkpointed recompute + the
on-device walk with an i_floor block-handoff, rescore-verified).
Letters are HALO-SHARDED (round 5): each device receives only its row
block's window [d*R, d*R + W) of the query/target/profile arrays via a
'band'-axis sharded (D, ...) window stack, so per-device letter memory
is O(R + band) — the memory-scaling rationale above covers letters as
well as DP state.  Oracle parity:
tests/test_banded_sp.py (fake 8-device CPU mesh, str-level for CIGARs),
wired into __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.banded_pallas import LANES, band_fill_range, n_band_state
from ..types import NEG_INF, ScoringParams
from ..models.banded import _phase_runs

BAND_AXIS = "band"
GB = 8  # pairs per relay group (the kernel's sublane-aligned batch floor)


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _init_block_state(qkb, geom):
    """(NS, GB, Wp) resume state: NEG H/E/F, letter (or packed-profile)
    windows preloaded, TW zeroed (fills via per-step inserts)."""
    g = geom
    profile = g["profile"]
    B = qkb.shape[1] if profile else qkb.shape[0]
    Wp = g["Wp"]
    st = jnp.full((n_band_state(profile), B, Wp), NEG_INF, jnp.int32)
    if profile:
        st = st.at[4 : 4 + qkb.shape[0]].set(qkb[:, :, :Wp])
    else:
        st = st.at[4].set(qkb[:, :Wp])
    return st.at[-1].set(0)


def _block_fill(qkb, tkb, qlen_l, tlen_l, dlo_l, dhi_l, bh, bf, *, geom):
    """One device's row-block banded fill: boundary-injected resume +
    boundary capture.  Returns (scores (GB,), bout (2, GB, Wbo))."""
    g = geom
    Wp = g["Wp"]
    B = qkb.shape[1] if g["profile"] else qkb.shape[0]
    st = _init_block_state(qkb, g)
    sc = jnp.full((B, Wp), NEG_INF, jnp.int32)
    bout = None
    for k0, k1, ph in g["runs"]:
        want_bout = k1 > 2 * g["R"]
        out = band_fill_range(
            qkb,
            tkb,
            qlen_l,
            tlen_l,
            dlo_l,
            dhi_l,
            st,
            sc,
            k_start=k0,
            k_end=k1,
            K=g["Kloc"],
            Wp=Wp,
            dlo=0,
            dhi=g["Dband"] - 1,
            match=g["match"],
            mismatch=g["mismatch"],
            gap_open=g["o"],
            gap_extend=g["e"],
            want_ptr=False,
            want_ckpt=False,
            CK=g["CK"],
            interpret=g["interpret"],
            profile=g["profile"],
            phase=ph,
            want_score=True,
            nsub=g["nsub"],
            bh=bh,
            bf=bf,
            want_bout=want_bout,
            bout_row=g["R"],
        )
        if want_bout:
            sc, st, _, _, bo = out
            bout = bo if bout is None else jnp.maximum(bout, bo)
        else:
            sc, st, _, _ = out
    return jnp.max(sc, axis=1), bout


def _relay_body(
    qg, tg, qlen_g, tlen_g, dlo_pg, dhi_pg, pgq=None, *, geom, NG, D,
    axis=BAND_AXIS, want_tb=False,
):
    """Per-device shard_map body: scan over super-steps with one ppermute
    per step; device d serves pair-group s - d at super-step s.

    Letters arrive HALO-SHARDED (round 5, VERDICT round-4 item 4b): qg/tg
    (and pgq) are the (1, NG, GB, W*) per-device slices of the 'band'-axis
    sharded (D, ...) window stacks built by _sp_relay — device d holds
    only its own row block's letter window [d*R, d*R + W*), so per-device
    letter memory is O(R + band) instead of the v1 O(n) replication and
    the module's memory-scaling rationale now covers letters too.

    With want_tb additionally returns the (resolved) boundary rows each
    step CONSUMED — (steps, 2, GB, Wb) per device — the checkpoints the
    traceback recomputes blocks from (device d's group-b boundary sits at
    step index b + d)."""
    g = geom
    d = jax.lax.axis_index(axis)
    qg = qg[0]
    tg = tg[0]
    if pgq is not None:
        pgq = pgq[0]
    R, Wb, Wbo = g["R"], g["Wb"], g["Wbo"]
    o, e = g["o"], g["e"]
    dlo_g = g["dlo_g"]
    NEG = jnp.int32(NEG_INF)
    xcols = jnp.arange(Wb, dtype=jnp.int32)[None, :]  # boundary column ids

    def step(carry, s):
        pkt, scores = carry
        b = s - d
        bc = jnp.clip(b, 0, NG - 1)
        active = (b >= 0) & (b < NG)
        if g["profile"]:
            # packed-nibble profile words replace the query letters
            qkb = jax.lax.dynamic_slice(
                pgq, (bc, 0, 0, 0), (1, pgq.shape[1], GB, g["WQL"])
            )[0]
        else:
            qkb = jax.lax.dynamic_slice(qg, (bc, 0, 0), (1, GB, g["WQL"]))[0]
        tkb = jax.lax.dynamic_slice(tg, (bc, 0, 0), (1, GB, g["WTL"]))[0]
        n_b = jax.lax.dynamic_slice(qlen_g, (bc, 0), (1, GB))[0]
        m_b = jax.lax.dynamic_slice(tlen_g, (bc, 0), (1, GB))[0]
        dlo_b = jax.lax.dynamic_slice(dlo_pg, (bc, 0), (1, GB))[0]
        dhi_b = jax.lax.dynamic_slice(dhi_pg, (bc, 0), (1, GB))[0]
        qlen_l = n_b - d * R
        tlen_l = m_b - d * R - dlo_g
        dlo_l = dlo_b - dlo_g
        dhi_l = dhi_b - dlo_g
        # device 0's boundary = the global DP row 0 (gap chain), a pure
        # function of the group's target lengths — no packet needed
        jg = dlo_g + xcols  # global column of boundary index x
        bh0 = jnp.where(
            jg == 0,
            0,
            jnp.where((jg >= 1) & (jg <= m_b[:, None]), o + jg * e, NEG),
        ).astype(jnp.int32)
        bh = jnp.where(d == 0, bh0, pkt[0])
        bf = jnp.where(d == 0, NEG, pkt[1])

        def compute(_):
            sc, bout = _block_fill(
                qkb, tkb, qlen_l, tlen_l, dlo_l, dhi_l, bh, bf, geom=g
            )
            return sc, bout

        def skip(_):
            return (
                jnp.full((GB,), NEG),
                jnp.full((2, GB, Wbo), NEG),
            )

        sc_b, bout = jax.lax.cond(active, compute, skip, None)
        # owner (and exact-overcompute) devices capture the same value;
        # inactive contribute NEG — a max-merge dedups all of it
        scores = scores.at[bc].max(jnp.where(active, sc_b, NEG))
        pkt_out = jnp.pad(bout, ((0, 0), (0, 0), (0, Wb - Wbo)),
                          constant_values=NEG_INF)
        pkt_next = jax.lax.ppermute(
            pkt_out, axis, [(i, (i + 1) % D) for i in range(D)]
        )
        ys = jnp.stack([bh, bf]) if want_tb else None
        return (pkt_next, scores), ys

    init = (
        jnp.full((2, GB, Wb), NEG, jnp.int32),
        jnp.full((NG, GB), NEG, jnp.int32),
    )
    (_, scores), ys = jax.lax.scan(
        step, init, jnp.arange(NG + D - 1, dtype=jnp.int32)
    )
    scores = jax.lax.pmax(scores, axis)
    if want_tb:
        return scores, ys
    return scores


def make_band_mesh(devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices.reshape(-1), (BAND_AXIS,))


def _sp_setup(qs, ts, sp: ScoringParams, band: int, mesh: Mesh, CK, nsub):
    """Shared host prep: geometry + padded/grouped arrays (see
    banded_nw_affine_score_sp)."""
    qs = [np.asarray(q, np.int32) for q in qs]
    ts = [np.asarray(t, np.int32) for t in ts]
    B0 = len(qs)
    qlen = np.array([len(q) for q in qs], np.int64)
    tlen = np.array([len(t) for t in ts], np.int64)
    deltas = tlen - qlen
    dlo_p = (np.minimum(0, deltas) - band).astype(np.int64)
    dhi_p = (np.maximum(0, deltas) + band).astype(np.int64)
    dlo_g, dhi_g = int(dlo_p.min()), int(dhi_p.max())
    Dband = dhi_g - dlo_g + 1
    n = int(qlen.max())
    D = mesh.shape[BAND_AXIS]
    R = max(1, _ceil_to(n, D) // D)
    Kloc = 2 * R + Dband
    Kp = _ceil_to(Kloc, CK)
    Wp = _ceil_to(Dband // 2 + 2, LANES)
    Wbo = _ceil_to(Dband, LANES)
    Wb = Wbo + 2 * LANES  # aligned-block slack for the injection stream
    WQL = _ceil_to(R + Dband // 2 + Wp + 2, LANES) + 2 * LANES
    WTL = _ceil_to(Kp + 2, LANES) + 2 * LANES

    NG = _ceil_to(B0, GB) // GB
    Bp = NG * GB
    profile = sp.matrix is not None
    if profile:
        from ..ops.banded_pallas import (
            banded_matrix_supported,
            build_packed_profile_np,
        )

        table = sp.substitution_matrix()
        if not banded_matrix_supported(table):
            raise NotImplementedError(
                "banded-SP matrix scoring needs a packed-nibble-range "
                "table (alphabet+1 <= 31); wider tables are single-device "
                "full-matrix territory"
            )
        A1 = int(table.shape[0])
        q_sent, t_sent = A1, A1 + 1
    else:
        q_sent, t_sent = 4, 5
    # replicated padded letters; blocks slice at d*R (see module docstring
    # for the halo-sharded production layout)
    qg = np.full((NG, GB, (D - 1) * R + WQL), q_sent, np.int32)
    tg = np.full((NG, GB, (D - 1) * R + WTL), t_sent, np.int32)
    qlen_g = np.zeros((NG, GB), np.int32)
    tlen_g = np.zeros((NG, GB), np.int32)
    dlo_pg = np.zeros((NG, GB), np.int32)
    dhi_pg = np.zeros((NG, GB), np.int32)
    for i in range(B0):
        gidx, gi = divmod(i, GB)
        # qpad[z] = q[z-1] (1-based rows); block d reads [d*R, d*R + WQL)
        qg[gidx, gi, 1 : 1 + len(qs[i])] = qs[i]
        # tpad2[z] = t[z + dlo_g - 1] (pre-shifted so block d reads at
        # d*R): z + dlo_g in [1, m]  ->  z in [1 - dlo_g, m - dlo_g]
        z0 = 1 - dlo_g
        tg[gidx, gi, z0 : z0 + len(ts[i])] = ts[i]
        qlen_g[gidx, gi] = len(qs[i])
        tlen_g[gidx, gi] = len(ts[i])
        dlo_pg[gidx, gi] = dlo_p[i]
        dhi_pg[gidx, gi] = dhi_p[i]

    if profile:
        # (NG, G_PROF, GB, W) packed-nibble query profile over the padded
        # letters (build_packed_profile_np zero-packs sentinel codes)
        pgq = np.stack(
            [build_packed_profile_np(qg[gi], table) for gi in range(NG)]
        )
    else:
        pgq = None
    interpret = jax.devices()[0].platform != "tpu"
    geom = dict(
        profile=profile,
        R=R,
        Dband=Dband,
        Kloc=Kloc,
        Kp=Kp,
        Wp=Wp,
        Wb=Wb,
        Wbo=Wbo,
        WQL=WQL,
        WTL=WTL,
        dlo_g=dlo_g,
        CK=CK,
        nsub=nsub,
        match=0 if profile else sp.match,
        mismatch=0 if profile else sp.mismatch,
        o=sp.gap_open,
        e=sp.gap_extend,
        interpret=interpret,
        runs=_phase_runs(0, Kp, CK, Dband - 1),
        D=D,
        NG=NG,
        B0=B0,
    )
    arrays = dict(
        qg=qg, tg=tg, qlen_g=qlen_g, tlen_g=tlen_g, dlo_pg=dlo_pg,
        dhi_pg=dhi_pg, qlen=qlen, tlen=tlen, pgq=pgq,
    )
    return geom, arrays


_SP_JIT_CACHE: dict = {}


def _geom_key(geom):
    """Hashable cache key of a geometry dict (``runs`` is a list)."""
    return tuple(
        (k, tuple(v) if isinstance(v, list) else v)
        for k, v in sorted(geom.items())
    )


def _halo_slices(geom, arrays):
    """(D, ...) stacked per-device letter windows for the 'band'-axis
    sharded relay inputs: slot d holds columns [d*R, d*R + W*) — the only
    letters device d's row block ever reads (VERDICT round-4 item 4b:
    drop the v1 full replication)."""
    g = geom
    D, R = g["D"], g["R"]
    qg_d = np.stack(
        [arrays["qg"][:, :, d * R : d * R + g["WQL"]] for d in range(D)]
    )
    tg_d = np.stack(
        [arrays["tg"][:, :, d * R : d * R + g["WTL"]] for d in range(D)]
    )
    pgq_d = None
    if arrays["pgq"] is not None:
        pgq_d = np.stack(
            [
                arrays["pgq"][:, :, :, d * R : d * R + g["WQL"]]
                for d in range(D)
            ]
        )
    return qg_d, tg_d, pgq_d


def _sp_relay(geom, arrays, mesh, want_tb=False):
    qg_d, tg_d, pgq_d = _halo_slices(geom, arrays)
    args = [
        jnp.asarray(qg_d),
        jnp.asarray(tg_d),
        jnp.asarray(arrays["qlen_g"]),
        jnp.asarray(arrays["tlen_g"]),
        jnp.asarray(arrays["dlo_pg"]),
        jnp.asarray(arrays["dhi_pg"]),
    ]
    if geom["profile"]:
        args.append(jnp.asarray(pgq_d))
    # cached jit(shard_map): a fresh wrapper per call retraced and
    # re-remote-compiled the whole relay program on EVERY score/align
    # call with identical geometry (ADVICE round-4) — same pattern as
    # parallel.dist._cached_sharded_jit
    key = ("relay", mesh, want_tb, _geom_key(geom))
    fn = _SP_JIT_CACHE.get(key)
    if fn is None:
        body = functools.partial(
            _relay_body, geom=geom, NG=geom["NG"], D=geom["D"],
            want_tb=want_tb,
        )
        out_specs = (P(), P(BAND_AXIS)) if want_tb else P()
        in_specs = (P(BAND_AXIS), P(BAND_AXIS)) + (P(),) * 4
        if geom["profile"]:
            in_specs = in_specs + (P(BAND_AXIS),)
        fn = jax.jit(
            jax.shard_map(
                body,
                mesh=mesh,
                in_specs=in_specs,
                out_specs=out_specs,
                check_vma=False,
            )
        )
        _SP_JIT_CACHE[key] = fn
    out = fn(*args)
    if want_tb:
        scores, bnds = out
        steps = geom["NG"] + geom["D"] - 1
        # (D, steps, 2, GB, Wb) device-resident boundary checkpoints
        return scores, bnds.reshape(geom["D"], steps, 2, GB, geom["Wb"])
    return out


def banded_nw_affine_score_sp(
    qs,
    ts,
    sp: ScoringParams,
    band: int,
    mesh: Mesh,
    CK: int = 512,
    nsub: int = 4,
):
    """Banded affine-gap global alignment SCOREs with the band split as
    per-device row blocks over ``mesh``'s 'band' axis (module docstring).

    ``CK`` (fill chunk spacing) defaults to 512 on this score-only path
    (+6% fill at CK=512 vs 256, round-4 sweep; nothing recomputes from
    checkpoints here — VERDICT round-4 item 7).

    qs/ts: one pair (1-D int codes) or a batch (B, L) / list of 1-D.
    Exact banded-oracle parity (models/banded.py semantics): per-pair
    band [min(0, delta) - band, max(0, delta) + band].  Returns an int
    for a single pair, else a list of ints.
    """
    single = isinstance(qs, np.ndarray) and qs.ndim == 1 or (
        not isinstance(qs, np.ndarray) and np.asarray(qs[0]).ndim == 0
    )
    if single:
        qs, ts = [np.asarray(qs)], [np.asarray(ts)]
    geom, arrays = _sp_setup(qs, ts, sp, band, mesh, CK, nsub)
    scores = np.asarray(_sp_relay(geom, arrays, mesh)).reshape(-1)[: geom["B0"]]
    out = [int(s) for s in scores]
    return out[0] if single else out


def _walk_body(qg, tg, bnds, qlen_g, tlen_g, dlo_pg, dhi_pg, pkt0,
               gi_arr, pgq=None, *, geom, d_start, axis=BAND_AXIS):
    """Per-device shard_map body of the SP traceback walk for pair-group
    ``gi_arr[0]`` (round 5: VERDICT round-4 items 4a/4c + ADVICE 2/3 —
    batched, device-threaded, runs where the letters live).  The group
    index is a RUNTIME scalar so one compiled program serves every group
    of a batched align (a static gi recompiled the whole fill+walk per
    group).  Pointers pack two diagonals per byte (pack_ptr), halving
    the materialized block.

    Phase 1 (all devices IN PARALLEL, no serialization): each device
    refills its OWN row block from its locally captured boundary
    (bnds[d, gi + d], never moved off-device) with want_ptr, materializing
    the block's full (Kp, GB, Wp) pointer array device-resident — the
    refill depends only on the relay's checkpoints, not the walker, so
    the per-block recompute that used to run serially per handoff now
    costs one block-fill wall for the whole pair.

    Phase 2 (reverse relay scan): the (4, GB) walker packet [global row,
    dlo-shifted col, gap state, done] hops device d -> d-1 with one
    ppermute per step; the active device walks its pointer array with
    band_walk_range(i_floor=0) for ALL GB pairs at once (pairs whose
    current row is outside this block are masked done for the call and
    merged back untouched).  No host syncs anywhere — the caller fetches
    ops/final-state/violation once, after the whole program is queued.

    Returns (ops (1, GB, Kp) int8 — this device's walked columns, 255 =
    none; final packet (1, 4, GB); violation flag, pmax-replicated)."""
    from ..ops.banded_pallas import band_walk_range

    g = geom
    d = jax.lax.axis_index(axis)
    D, R, Wp, Kp, CK = g["D"], g["R"], g["Wp"], g["Kp"], g["CK"]
    dhi_l = g["Dband"] - 1
    qg = qg[0]
    tg = tg[0]
    bnds_l = bnds[0]
    if pgq is not None:
        pgq = pgq[0]
    fillkw = dict(
        K=g["Kloc"], Wp=Wp, dlo=0, dhi=dhi_l,
        match=g["match"], mismatch=g["mismatch"],
        gap_open=g["o"], gap_extend=g["e"], CK=CK,
        interpret=g["interpret"], profile=g["profile"], nsub=g["nsub"],
    )
    gi = gi_arr[0]
    idx = lambda a: jax.lax.dynamic_index_in_dim(a, gi, 0, keepdims=False)
    qkb = idx(pgq) if g["profile"] else idx(qg)
    tkb = idx(tg)
    qlen_l = idx(qlen_g) - d * R
    tlen_l = idx(tlen_g) - d * R - g["dlo_g"]
    dlo_l = idx(dlo_pg) - g["dlo_g"]
    dhi_lv = idx(dhi_pg) - g["dlo_g"]
    # device d consumed group gi's boundary at super-step gi + d
    bstep = jax.lax.dynamic_index_in_dim(
        bnds_l, gi + d, axis=0, keepdims=False
    )
    bh, bf = bstep[0], bstep[1]
    sc0 = jnp.full((GB, Wp), jnp.int32(NEG_INF))
    st_r = _init_block_state(qkb, g)
    ptr_parts = []
    for k0r, k1r, ph in g["runs"]:
        _, st_r, _, ptr_r = band_fill_range(
            qkb, tkb, qlen_l, tlen_l, dlo_l, dhi_lv, st_r, sc0,
            k_start=k0r, k_end=k1r, want_ptr=True, want_ckpt=False,
            phase=ph, want_score=False, bh=bh, bf=bf, pack_ptr=True,
            **fillkw,
        )
        ptr_parts.append(ptr_r)
    ptrs = (
        ptr_parts[0] if len(ptr_parts) == 1
        else jnp.concatenate(ptr_parts, axis=0)
    )

    def step(carry, s):
        pkt, opsm, fin, viol = carry
        active = d == (d_start - s)

        def do(c):
            pkt, opsm, fin, viol = c
            i0, j0, stv, dn = pkt[0], pkt[1], pkt[2], pkt[3]
            # walkers currently inside this row block; the rest are
            # masked done for the call and merged back untouched
            partic = (dn == 0) & (i0 > d * R)
            ops_blk, il, jl, st2, _ = band_walk_range(
                ptrs, i0 - d * R, j0 - d * R, stv,
                jnp.where(partic, 0, 1), 0,
                KW=Kp, dhi=dhi_l, Wp=Wp, B=GB,
                interpret=g["interpret"], i_floor=0, packed=True,
            )
            i0n = jnp.where(partic, il + d * R, i0)
            j0n = jnp.where(partic, jl + d * R, j0)
            stn = jnp.where(partic, st2, stv)
            dnn = jnp.where(partic & (d == 0), 1, dn)
            # every participant must exit at the block floor (handoff
            # invariant; fetched once by the caller)
            viol = viol | (partic & (il != 0)).any()
            pkt2 = jnp.stack([i0n, j0n, stn, dnn])
            return pkt2, ops_blk.astype(jnp.int8), pkt2, viol

        pkt2, opsm2, fin2, viol2 = jax.lax.cond(
            active, do, lambda c: c, (pkt, opsm, fin, viol)
        )
        pkt_next = jax.lax.ppermute(
            pkt2, axis, [(i, (i - 1) % D) for i in range(D)]
        )
        return (pkt_next, opsm2, fin2, viol2), None

    KWp = _ceil_to(Kp, LANES)
    init = (
        pkt0,
        jnp.full((GB, KWp), 255, jnp.int8),
        pkt0,
        jnp.zeros((), bool),
    )
    (_, opsm, fin, viol), _ = jax.lax.scan(
        step, init, jnp.arange(d_start + 1, dtype=jnp.int32)
    )
    viol_all = jax.lax.pmax(viol.astype(jnp.int32), axis)
    return opsm[None], fin[None], viol_all


def banded_nw_affine_align_sp(
    q,
    t,
    sp: ScoringParams,
    band: int,
    mesh: Mesh,
    CK: int = 256,
    nsub: int = 4,
):
    """Banded affine global alignment over the mesh — scores AND CIGARs
    (north star "CIGAR tracebacks gathered via collectives").

    Accepts one pair (1-D int codes) or a BATCH (list of 1-D / (B, L)):
    the relay fills every GB-pair group in one pipelined pass, then the
    sharded walk program (_walk_body) tracebacks each group — all GB
    walker slots active, every block's recompute running on the device
    that owns its letters/boundaries, zero per-block host syncs (VERDICT
    round-4 item 4a/4c; ADVICE round-4 items 2/3).  Each CIGAR is
    rescore-verified against its relay score before returning.  Returns
    an AlignResult for a single pair, else a list.
    """
    from ..types import AlignResult
    from ..utils.cigar import OP_D, ops_to_cigar
    from .band_pipeline import _rescore_global_affine

    single = isinstance(q, np.ndarray) and q.ndim == 1 or (
        not isinstance(q, np.ndarray) and np.asarray(q[0]).ndim == 0
    )
    qs = [np.asarray(q, np.int32)] if single else [
        np.asarray(x, np.int32) for x in q
    ]
    ts = [np.asarray(t, np.int32)] if single else [
        np.asarray(x, np.int32) for x in t
    ]
    results: list = [None] * len(qs)
    live = [i for i, (qq, tt) in enumerate(zip(qs, ts))
            if len(qq) and len(tt)]
    for i in range(len(qs)):
        if i not in live:
            n, m = len(qs[i]), len(ts[i])
            score = 0 if n == m else sp.gap_open + max(n, m) * sp.gap_extend
            results[i] = AlignResult(
                int(score), 0, n, 0, m,
                (f"{m}D" if m else "") if n == 0 else f"{n}I",
            )
    if live:
        geom, arrays = _sp_setup(
            [qs[i] for i in live], [ts[i] for i in live], sp, band, mesh,
            CK, nsub,
        )
        g = geom
        ptr_bytes = g["Kp"] * GB * g["Wp"] // 2  # pack_ptr: 2 diagonals/byte
        cap = int(_os.environ.get(
            "SEQALIB_SP_PTR_CAP", str(2 * 1024**3)
        ))
        if ptr_bytes > cap:
            raise RuntimeError(
                f"banded-SP traceback pointer block {ptr_bytes/1e9:.1f} GB "
                f"per device exceeds SEQALIB_SP_PTR_CAP={cap}; use more "
                "devices (smaller R) or a narrower band"
            )
        scores, bnds = _sp_relay(geom, arrays, mesh, want_tb=True)
        scores_h = np.asarray(scores).reshape(-1)
        R, dlo_g = g["R"], g["dlo_g"]
        qlen, tlen = arrays["qlen_g"], arrays["tlen_g"]  # (NG, GB)
        # ONE walk program serves every group: d_start is the batch max
        # (groups whose owner block is lower simply have no participants
        # during the early steps), gi rides as a runtime scalar, and the
        # halo'd letter stacks upload once
        d_start = int((qlen.max() - 1) // R)
        walk_args = _sp_walk_args(geom, arrays, bnds)
        launched = []
        for gi in range(g["NG"]):
            # walker packet: [global row, col - dlo_g, gap state, done]
            dn0 = (qlen[gi] == 0).astype(np.int32)  # pad slots start done
            pkt0 = jnp.asarray(np.stack([
                qlen[gi].astype(np.int32),
                (tlen[gi] - dlo_g).astype(np.int32),
                np.zeros(GB, np.int32),
                dn0,
            ]))
            launched.append(
                _sp_walk(geom, mesh, walk_args, pkt0, gi=gi,
                         d_start=d_start)
            )
        for gi, (opsm, fin, viol) in enumerate(launched):
            opsm_h = np.asarray(opsm).view(np.uint8)  # (D, GB, KWp)
            fin0 = np.asarray(fin)[0]  # (4, GB) from device 0
            if int(np.asarray(viol)) != 0:
                raise RuntimeError(
                    "SP block walk ended mid-block (handoff invariant)"
                )
            for b in range(GB):
                idx = gi * GB + b
                if idx >= len(live):
                    break
                i_out = live[idx]
                row = np.concatenate(
                    [opsm_h[d, b] for d in range(d_start + 1)]
                )
                row = row[row != 255]
                j_glob = int(fin0[1, b]) + dlo_g
                if int(fin0[0, b]) != 0 or j_glob < 0:
                    raise RuntimeError(
                        f"SP walk final state invalid (pair {i_out}: "
                        f"i={int(fin0[0, b])}, j={j_glob})"
                    )
                ops = [OP_D] * j_glob + [int(x) for x in row]
                score = int(scores_h[idx])
                walked = _rescore_global_affine(
                    qs[i_out], ts[i_out], ops, sp
                )
                if walked != score:  # not an assert: survives python -O
                    raise RuntimeError(
                        f"banded-SP traceback rescore {walked} != relay "
                        f"score {score}"
                    )
                results[i_out] = AlignResult(
                    score, 0, len(qs[i_out]), 0, len(ts[i_out]),
                    ops_to_cigar(ops),
                )
    return results[0] if single else results


def _sp_walk_args(geom, arrays, bnds):
    """Device-upload the walk program's group-invariant inputs ONCE per
    align call (the halo'd letter stacks were re-built and re-shipped per
    group before; the remote link charges per buffer)."""
    qg_d, tg_d, pgq_d = _halo_slices(geom, arrays)
    args = [
        jnp.asarray(qg_d),
        jnp.asarray(tg_d),
        bnds,
        jnp.asarray(arrays["qlen_g"].astype(np.int32)),
        jnp.asarray(arrays["tlen_g"].astype(np.int32)),
        jnp.asarray(arrays["dlo_pg"]),
        jnp.asarray(arrays["dhi_pg"]),
    ]
    if geom["profile"]:
        args.append(jnp.asarray(pgq_d))
    return args


def _sp_walk(geom, mesh, walk_args, pkt0, *, gi, d_start):
    """Cached jit(shard_map) launch of _walk_body (same caching rationale
    as _sp_relay); ``gi`` is a runtime operand, so ONE compile serves all
    groups of a batched align."""
    key = ("walk", mesh, d_start, _geom_key(geom))
    fn = _SP_JIT_CACHE.get(key)
    if fn is None:
        body = functools.partial(_walk_body, geom=geom, d_start=d_start)
        in_specs = (P(BAND_AXIS), P(BAND_AXIS), P(BAND_AXIS)) + (P(),) * 6
        if geom["profile"]:
            in_specs = in_specs + (P(BAND_AXIS),)
        fn = jax.jit(
            jax.shard_map(
                body,
                mesh=mesh,
                in_specs=in_specs,
                out_specs=(P(BAND_AXIS), P(BAND_AXIS), P()),
                check_vma=False,
            )
        )
        _SP_JIT_CACHE[key] = fn
    pre, post = walk_args[:7], walk_args[7:]
    return fn(*pre, pkt0, jnp.asarray([gi], jnp.int32), *post)
