"""Pallas tile body for the sequence-parallel pipeline (SP v2).

`parallel.band_pipeline` splits ONE long pair's DP matrix into
row-blocks (one per device) x column tiles, streaming row boundaries
between neighbors with one ppermute per step (SURVEY.md §2.3 row 2).
Round 1's tile body was a lax.scan over R+C-1 substeps carrying (R,)
lanes — per-iteration scan overhead and (for R >> C) near-zero lane
utilization made it parity-grade only (VERDICT.md round-1 item 5).

This kernel computes one R x C Gotoh tile for a single pair with the
anti-diagonal mapped FLAT onto (SUB, 128) vregs: flat slot f = row
(f // 128, f % 128), so one in-kernel strip covers RB = SUB*128 rows
and every vector op advances up to RB cells.  Diagonal-neighbor access
is a lane roll with a sublane-carry fixup at lane 0 (the strip kernel's
trick lifted from 128 to RB rows).  The grid walks NSTRIP = R / RB
strips sequentially.

Inter-strip rows ride ONE scratch buffer each (H and F): the bottom
cell of column c is produced RB-1 substeps after that column's top
value is consumed, so in-place single-position read-modify-writes are
hazard-free; a leading 128-lane trash block absorbs ramp-phase writes
without predication (Mosaic dynamic lane offsets must be 128-aligned,
which the (pos // 128) * 128 block RMW respects).

Boundary protocol matches `_tile_scan` (band_pipeline.py): in: top H
row (corner + C columns), top F row, left H/E columns; out: bottom H/F
rows, right H/E columns, max-merged capture of global cell (n, m).

Scoring: scalar match/mismatch (the long-read domain, as models/banded)
or packed-nibble substitution-matrix profiles (see the profile branch in
`_sp_tile_kernel` and `sp_tile_step(profile=True)`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
NEG = -(1 << 28)  # matches band_pipeline.NEG
NIBBLE_BIAS = 4  # packed-nibble profile bias (strip_pallas.py convention)


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _sp_tile_kernel(
    qk_ref,  # (NS8, 128) i32 letters | (G_PROF, NS8, 128) i32 packed profile
    tk_ref,  # (1, Ctp) i32 tile target letters: tk[0, x] = t[j0 + x - 1]
    htop_ref,  # (1, Ct1) i32: htop[0, x] = H(i0-1, j0 + x), x in 0..C
    ftop_ref,  # (1, Ctp) i32: ftop[0, x] = F(i0-1, j0 + x), x in 1..C
    hcol_ref,  # (NS8, 128) i32 left boundary H(i0 + r, j0)
    ecol_ref,  # (NS8, 128) i32 left boundary E(i0 + r, j0)
    meta_ref,  # (1, 128) i32: [i0, j0, n, m, cap_in, ...]
    hbot_ref,  # (1, Ct1) i32 out: hbot[0, x] = H(i0+R-1, j0+x), x in 1..C
    fbot_ref,  # (1, Ctp) i32 out: x in 1..C
    hcol_out_ref,  # (NS8, 128) i32 out: H(i0 + r, j0 + C)
    ecol_out_ref,  # (NS8, 128) i32 out
    cap_ref,  # (1, 128) i32 out: running max capture of cell (n, m)
    hrow_scr,  # (1, 128 + Ct1) scratch: trash block + current top H row
    frow_scr,  # (1, 128 + Ctp) scratch: trash block + current top F row
    *,
    SUB: int,
    C: int,
    match: int,
    mismatch: int,
    gap_open: int,
    gap_extend: int,
    profile: bool,
):
    s = pl.program_id(0)
    RB = SUB * LANES
    Ct1 = htop_ref.shape[1]
    Ctp = tk_ref.shape[1]
    NEGj = jnp.int32(NEG)
    e = jnp.int32(gap_extend)
    oe = jnp.int32(gap_open + gap_extend)

    lane = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 0)
    flat = sub * LANES + lane  # flat row within the strip
    slot0 = flat == 0
    lastm = flat == RB - 1
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    i0 = meta_ref[0, 0]  # device block's first global row (0-based)
    j0 = meta_ref[0, 1]  # tile's first global column (0-based)
    n = meta_ref[0, 2]
    m = meta_ref[0, 3]

    @pl.when(s == 0)
    def _init():
        hrow_scr[0:1, pl.ds(LANES, Ct1)] = htop_ref[:]
        frow_scr[0:1, pl.ds(LANES, Ctp)] = ftop_ref[:]
        cap_ref[:] = jnp.broadcast_to(meta_ref[0:1, 4:5], (1, LANES))

    def rowload(ref, pos, width):
        """Scalar ref[0, 128 + pos] via aligned block load + mask-reduce."""
        p = jnp.clip(pos + LANES, 0, width - 1)
        off = pl.multiple_of((p // LANES) * LANES, LANES)
        blk = ref[0:1, pl.ds(off, LANES)]
        return jnp.sum(jnp.where(lane128 == (p - off), blk, 0))

    def rowstore(ref, pos, val, width):
        """ref[0, 128 + pos] = val via aligned block RMW (pos < 0 or out of
        range routes to the leading trash block)."""
        ok = (pos >= 1) & (pos <= width - LANES - 1)
        p = jnp.where(ok, pos + LANES, jnp.int32(0))
        off = pl.multiple_of((p // LANES) * LANES, LANES)
        blk = ref[0:1, pl.ds(off, LANES)]
        ref[0:1, pl.ds(off, LANES)] = jnp.where(lane128 == (p - off), val, blk)

    def colload(ref, x, width):
        """Scalar ref[0, x] (no trash offset) for the tk letters."""
        p = jnp.clip(x, 0, width - 1)
        off = pl.multiple_of((p // LANES) * LANES, LANES)
        blk = ref[0:1, pl.ds(off, LANES)]
        return jnp.sum(jnp.where(lane128 == (p - off), blk, 0))

    def roll_down(x):
        """out[f] = x[f-1] in flat order (slot 0 = wraparound garbage,
        always overwritten by a boundary insert)."""
        xl = pltpu.roll(x, 1, axis=1)
        if SUB == 1:
            return xl
        return jnp.where(lane == 0, pltpu.roll(xl, 1, axis=0), xl)

    # strip-local letters/profile and left boundary (loaded once)
    if profile:
        pw = [qk_ref[g, pl.ds(s * SUB, SUB), :] for g in range(4)]
    else:
        qw = qk_ref[pl.ds(s * SUB, SUB), :]
    hc0 = hcol_ref[pl.ds(s * SUB, SUB), :]
    ec0 = ecol_ref[pl.ds(s * SUB, SUB), :]
    hc0u = roll_down(hc0)  # Hcol0[f-1]; slot 0 replaced by the corner

    ivec = i0 + s * RB + flat + 1  # global DP row (1-based) per flat slot

    def substep(k, st):
        H1, H2, E1, F1, W, HCn, ECn, cap, top_d = st
        # c = k - flat + 1: tile-local column (1-based), real for 1..C
        at_c1 = flat == k
        at_cC = flat == (k - C + 1)

        W = roll_down(W)
        tlet = colload(tk_ref, k + 1, Ctp)
        W = jnp.where(slot0, tlet, W)
        if profile:
            # packed-nibble lookup keyed by the target letter (the banded
            # kernel's technique): group select by W>>3, nibble by W&7
            grp = jnp.where(
                (W >> 3) == 0,
                pw[0],
                jnp.where((W >> 3) == 1, pw[1], jnp.where((W >> 3) == 2, pw[2], pw[3])),
            )
            s_vec = ((grp >> ((W & 7) * 4)) & 0xF) - NIBBLE_BIAS
        else:
            s_vec = jnp.where(qw == W, jnp.int32(match), jnp.int32(mismatch))

        top_u = rowload(hrow_scr, k + 1, LANES + Ct1)  # H(top-1, j0+k+1)
        top_f = rowload(frow_scr, k + 1, LANES + Ctp)  # F(top-1, j0+k+1)

        H1u = jnp.where(slot0, top_u, roll_down(H1))
        F1u = jnp.where(slot0, top_f, roll_down(F1))
        # diag for slot 0 = H(top-1, j0+k) = the previous substep's top_u
        H2d = jnp.where(slot0, top_d, roll_down(H2))
        # left-boundary column (c == 1): neighbors come from column j0
        diag = jnp.where(at_c1, jnp.where(slot0, top_d, hc0u), H2d)
        left_H = jnp.where(at_c1, hc0, H1)
        left_E = jnp.where(at_c1, ec0, E1)

        En = jnp.maximum(left_E + e, left_H + oe)
        Fn = jnp.maximum(F1u + e, H1u + oe)
        Hn = jnp.maximum(diag + s_vec, jnp.maximum(En, Fn))

        # right-edge capture (c == C) -> next tile's left boundary
        HCn = jnp.where(at_cC, Hn, HCn)
        ECn = jnp.where(at_cC, En, ECn)

        # bottom-row single-position RMW: column c = k - RB + 2 finished
        # its bottom cell this substep (trash-routed during the ramp)
        c_bot = k - RB + 2
        pos_ok = (c_bot >= 1) & (c_bot <= C)
        pos = jnp.where(pos_ok, c_bot, jnp.int32(-LANES))
        bot_h = jnp.sum(jnp.where(lastm, Hn, 0))
        bot_f = jnp.sum(jnp.where(lastm, Fn, 0))
        rowstore(hrow_scr, pos, bot_h, LANES + Ct1)
        rowstore(frow_scr, pos, bot_f, LANES + Ctp)

        # global capture of cell (n, m) — only by the tile that OWNS the
        # column (c in 1..C): slots keep running past the tile edge
        # (c > C, fed by stale scratch rows), and an earlier tile with
        # j0 + c == m would otherwise capture that garbage
        c_here = k - flat + 1
        hit = (
            (ivec == n)
            & ((j0 + c_here) == m)
            & (c_here >= 1)
            & (c_here <= C)
        )
        cap = jnp.maximum(cap, jnp.max(jnp.where(hit, Hn, NEGj)))

        return (Hn, H1, En, Fn, W, HCn, ECn, cap, top_u)

    st0 = (
        jnp.full((SUB, LANES), NEGj, jnp.int32),  # H1
        jnp.full((SUB, LANES), NEGj, jnp.int32),  # H2
        jnp.full((SUB, LANES), NEGj, jnp.int32),  # E1
        jnp.full((SUB, LANES), NEGj, jnp.int32),  # F1
        jnp.zeros((SUB, LANES), jnp.int32),  # W
        jnp.full((SUB, LANES), NEGj, jnp.int32),  # HCn (right col out)
        jnp.full((SUB, LANES), NEGj, jnp.int32),  # ECn
        jnp.max(cap_ref[:]),  # cap (scalar)
        rowload(hrow_scr, 0, LANES + Ct1),  # top_d = corner H(top-1, j0)
    )

    NSUB = 4
    KTOT = _ceil_to(RB + C - 1, NSUB)

    def group(gi, st):
        for u in range(NSUB):
            st = substep(gi * NSUB + u, st)
        return st

    stN = jax.lax.fori_loop(0, KTOT // NSUB, group, st0)
    (H1, H2, E1, F1, W, HCn, ECn, cap, top_d) = stN

    hcol_out_ref[pl.ds(s * SUB, SUB), :] = HCn
    ecol_out_ref[pl.ds(s * SUB, SUB), :] = ECn
    cap_ref[:] = jnp.zeros((1, LANES), jnp.int32) + cap

    # the scratch rows now hold THIS strip's bottom rows (positions 1..C);
    # refresh the corner for the next strip: H(bottom, j0) = hc0[RB-1]
    corner = jnp.sum(jnp.where(lastm, hc0, 0))
    blk = hrow_scr[0:1, pl.ds(LANES, LANES)]
    hrow_scr[0:1, pl.ds(LANES, LANES)] = jnp.where(lane128 == 0, corner, blk)

    @pl.when(s == pl.num_programs(0) - 1)
    def _emit_bottom():
        for cb in range(Ct1 // LANES):
            hbot_ref[0:1, pl.ds(cb * LANES, LANES)] = hrow_scr[
                0:1, pl.ds(LANES + cb * LANES, LANES)
            ]
        for cb in range(Ctp // LANES):
            fbot_ref[0:1, pl.ds(cb * LANES, LANES)] = frow_scr[
                0:1, pl.ds(LANES + cb * LANES, LANES)
            ]


@functools.partial(
    jax.jit,
    static_argnames=(
        "SUB",
        "C",
        "match",
        "mismatch",
        "gap_open",
        "gap_extend",
        "interpret",
        "profile",
    ),
)
def sp_tile(
    qk,
    tk,
    htop,
    ftop,
    hcol,
    ecol,
    meta,
    *,
    SUB,
    C,
    match,
    mismatch,
    gap_open,
    gap_extend,
    interpret,
    profile=False,
):
    """One R x C Gotoh tile (R = NS8 * 128) of a single pair.

    qk: (NS8, 128) i32 query letters, or with ``profile=True`` the
    (4, NS8, 128) packed-nibble profile of the query letters (matrix
    scoring keyed by target letter, as ops.banded_pallas).
    Returns (hbot (1, Ct1), fbot (1, Ctp), hcol_out (NS8, 128),
    ecol_out (NS8, 128), cap (1, 128)); hbot/fbot carry real values at
    positions 1..C.  See the module docstring for the boundary protocol.
    """
    NS8 = qk.shape[1] if profile else qk.shape[0]
    assert NS8 % SUB == 0, (NS8, SUB)
    NSTRIP = NS8 // SUB
    Ctp = tk.shape[1]
    Ct1 = htop.shape[1]

    kernel = functools.partial(
        _sp_tile_kernel,
        SUB=SUB,
        C=C,
        match=match,
        mismatch=mismatch,
        gap_open=gap_open,
        gap_extend=gap_extend,
        profile=profile,
    )

    def cspec(shape):
        return pl.BlockSpec(
            shape, lambda g: (0,) * len(shape), memory_space=pltpu.VMEM
        )

    out_shapes = [
        jax.ShapeDtypeStruct((1, Ct1), jnp.int32),
        jax.ShapeDtypeStruct((1, Ctp), jnp.int32),
        jax.ShapeDtypeStruct((NS8, LANES), jnp.int32),
        jax.ShapeDtypeStruct((NS8, LANES), jnp.int32),
        jax.ShapeDtypeStruct((1, LANES), jnp.int32),
    ]
    return pl.pallas_call(
        kernel,
        grid=(NSTRIP,),
        in_specs=[
            cspec(qk.shape),
            cspec(tk.shape),
            cspec(htop.shape),
            cspec(ftop.shape),
            cspec(hcol.shape),
            cspec(ecol.shape),
            cspec((1, LANES)),
        ],
        out_shape=out_shapes,
        out_specs=[cspec(s.shape) for s in out_shapes],
        scratch_shapes=[
            pltpu.VMEM((1, LANES + Ct1), jnp.int32),
            pltpu.VMEM((1, LANES + Ctp), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
    )(qk, tk, htop, ftop, hcol, ecol, meta)
