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
Letters are replicated to all devices in this v1 — production would
shard them with R-row halos; the protocol is unchanged.  Oracle parity:
tests/test_banded_sp.py (fake 8-device CPU mesh, str-level for CIGARs),
wired into __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

import functools

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

    With want_tb additionally returns the (resolved) boundary rows each
    step CONSUMED — (steps, 2, GB, Wb) per device — the checkpoints the
    traceback recomputes blocks from (device d's group-b boundary sits at
    step index b + d)."""
    g = geom
    d = jax.lax.axis_index(axis)
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
                pgq, (bc, 0, 0, d * R), (1, pgq.shape[1], GB, g["WQL"])
            )[0]
        else:
            qkb = jax.lax.dynamic_slice(
                qg, (bc, 0, d * R), (1, GB, g["WQL"])
            )[0]
        tkb = jax.lax.dynamic_slice(
            tg, (bc, 0, d * R), (1, GB, g["WTL"])
        )[0]
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


def _sp_relay(geom, arrays, mesh, want_tb=False):
    body = functools.partial(
        _relay_body, geom=geom, NG=geom["NG"], D=geom["D"], want_tb=want_tb
    )
    out_specs = (P(), P(BAND_AXIS)) if want_tb else P()
    n_in = 7 if geom["profile"] else 6
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(),) * n_in,
        out_specs=out_specs,
        check_vma=False,
    )
    args = [
        jnp.asarray(arrays["qg"]),
        jnp.asarray(arrays["tg"]),
        jnp.asarray(arrays["qlen_g"]),
        jnp.asarray(arrays["tlen_g"]),
        jnp.asarray(arrays["dlo_pg"]),
        jnp.asarray(arrays["dhi_pg"]),
    ]
    if geom["profile"]:
        args.append(jnp.asarray(arrays["pgq"]))
    out = jax.jit(fn)(*args)
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
    CK: int = 256,
    nsub: int = 4,
):
    """Banded affine-gap global alignment SCOREs with the band split as
    per-device row blocks over ``mesh``'s 'band' axis (module docstring).

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


def banded_nw_affine_align_sp(
    q,
    t,
    sp: ScoringParams,
    band: int,
    mesh: Mesh,
    CK: int = 256,
    nsub: int = 4,
):
    """Banded affine global alignment of ONE long pair over the mesh —
    score AND CIGAR (the item-4 stretch: the SP band path's output beyond
    a score; north star "CIGAR tracebacks gathered via collectives").

    Fill: the banded-SP relay, additionally keeping each block's CONSUMED
    boundary rows (device-resident).  Traceback: the banded checkpointed
    scheme applied per row block, owner block down to block 0 — each
    block refills with want_ckpt from its boundary, recomputes pointer
    super-blocks, and walks them ON DEVICE (band_walk_range with
    i_floor=0: local row 0 is the injected boundary, whose pointer bytes
    are junk — the walker stops there and hands off to the previous block
    with a coordinate shift).  The result CIGAR is rescore-verified
    against the relay score before returning.
    """
    from ..types import AlignResult
    from ..utils.cigar import OP_D, OP_I, ops_to_cigar
    from ..ops.banded_pallas import band_walk_range
    from .band_pipeline import _rescore_global_affine

    q = np.asarray(q, np.int32)
    t = np.asarray(t, np.int32)
    n, m = len(q), len(t)
    if n == 0 or m == 0:
        score = 0 if n == m else sp.gap_open + max(n, m) * sp.gap_extend
        return AlignResult(
            int(score), 0, n, 0, m,
            (f"{m}D" if m else "") if n == 0 else f"{n}I",
        )
    geom, arrays = _sp_setup([q], [t], sp, band, mesh, CK, nsub)
    scores, bnds = _sp_relay(geom, arrays, mesh, want_tb=True)
    score = int(np.asarray(scores).reshape(-1)[0])

    g = geom
    R, Wp, Kp, dlo_g = g["R"], g["Wp"], g["Kp"], g["dlo_g"]
    dhi_l = g["Dband"] - 1
    NEGj = jnp.int32(NEG_INF)
    fillkw = dict(
        K=g["Kloc"],
        Wp=Wp,
        dlo=0,
        dhi=dhi_l,
        match=g["match"],
        mismatch=g["mismatch"],
        gap_open=g["o"],
        gap_extend=g["e"],
        CK=CK,
        interpret=g["interpret"],
        profile=g["profile"],
        nsub=nsub,
    )
    qg, tg = arrays["qg"], arrays["tg"]
    NC_ALL = Kp // CK
    SB = max(1, min(64, (192 * 1024**2) // max(1, CK * GB * Wp)))
    d_owner = (n - 1) // R
    # walker state: slot 0 is the real pair; pad slots start done
    iv = jnp.asarray([n - d_owner * R] + [0] * (GB - 1), jnp.int32)
    jv = jnp.asarray(
        [m - d_owner * R - dlo_g] + [0] * (GB - 1), jnp.int32
    )
    stv = jnp.zeros((GB,), jnp.int32)
    dn0 = np.ones(GB, np.int32)
    dn0[0] = 0
    ops_blocks = []  # (device int8 ops block, KW), walk order
    for d in range(d_owner, -1, -1):
        if g["profile"]:
            qkb = jnp.asarray(arrays["pgq"][0, :, :, d * R : d * R + g["WQL"]])
        else:
            qkb = jnp.asarray(qg[0, :, d * R : d * R + g["WQL"]])
        tkb = jnp.asarray(tg[0, :, d * R : d * R + g["WTL"]])
        lens = dict(
            qlen=jnp.asarray(arrays["qlen_g"][0] - d * R, jnp.int32),
            tlen=jnp.asarray(
                arrays["tlen_g"][0] - d * R - dlo_g, jnp.int32
            ),
            dlo=jnp.asarray(arrays["dlo_pg"][0] - dlo_g, jnp.int32),
            dhi=jnp.asarray(arrays["dhi_pg"][0] - dlo_g, jnp.int32),
        )
        bh, bf = bnds[d, d, 0], bnds[d, d, 1]
        st0 = _init_block_state(qkb, g)
        sc0 = jnp.full((GB, Wp), NEGj)
        # block refill with per-CK checkpoints (device-resident)
        st_r, ck_parts = st0, []
        for k0r, k1r, ph in g["runs"]:
            _, st_r, ck_r, _ = band_fill_range(
                qkb, tkb, lens["qlen"], lens["tlen"], lens["dlo"],
                lens["dhi"], st_r, sc0,
                k_start=k0r, k_end=k1r, want_ptr=False, want_ckpt=True,
                phase=ph, want_score=False, bh=bh, bf=bf, **fillkw,
            )
            ck_parts.append(ck_r)
        ckpts = (
            ck_parts[0] if len(ck_parts) == 1
            else jnp.concatenate(ck_parts, axis=0)
        )
        dnv = jnp.asarray(dn0)
        kcur0 = int(np.asarray(iv[0] + jv[0]))
        ci = min(kcur0 // CK, NC_ALL - 1)
        while ci >= 0:
            cg = (ci // SB) * SB
            k1g = min(cg + SB, NC_ALL) * CK
            st_p, ptr_parts = ckpts[cg], []
            for k0r, k1r, ph in _phase_runs(cg * CK, k1g, CK, dhi_l):
                _, st_p, _, ptr_r = band_fill_range(
                    qkb, tkb, lens["qlen"], lens["tlen"], lens["dlo"],
                    lens["dhi"], st_p, sc0,
                    k_start=k0r, k_end=k1r, want_ptr=True, want_ckpt=False,
                    phase=ph, want_score=False, bh=bh, bf=bf, **fillkw,
                )
                ptr_parts.append(ptr_r)
            ptrs = (
                ptr_parts[0] if len(ptr_parts) == 1
                else jnp.concatenate(ptr_parts, axis=0)
            )
            KW = k1g - cg * CK
            ops_blk, iv, jv, stv, dnv = band_walk_range(
                ptrs[:KW], iv, jv, stv, dnv, cg * CK,
                KW=KW, dhi=dhi_l, Wp=Wp, B=GB, interpret=g["interpret"],
                i_floor=0,
            )
            ops_blocks.append((ops_blk.astype(jnp.int8), KW))
            ci = cg - 1
        # handoff: local row 0 of block d = local row R of block d-1
        il = int(np.asarray(iv[0]))
        jl = int(np.asarray(jv[0]))
        if il != 0:
            raise RuntimeError(
                f"SP block walk ended mid-block (d={d}, i_local={il})"
            )
        if d > 0:
            iv = iv.at[0].add(R)
            jv = jv.at[0].add(R)
    # assemble: blocks are in walk order; columns descend within a block
    ops = []
    for ops_blk, KW in ops_blocks:
        row = np.asarray(ops_blk).view(np.uint8)[0, :KW][::-1]
        ops.extend(int(x) for x in row if x != 255)
    ops.reverse()
    # epilogue: the walker stops at global row 0 (the injected gap-chain
    # boundary); any remaining columns are leading deletions.  Local
    # j'' = j_global - dlo_g at block 0.
    ops = [OP_D] * (jl + dlo_g) + ops
    walked = _rescore_global_affine(q, t, ops, sp)
    if walked != score:  # not an assert: must survive python -O
        raise RuntimeError(
            f"banded-SP traceback rescore {walked} != relay score {score}"
        )
    return AlignResult(int(score), 0, n, 0, m, ops_to_cigar(ops))
