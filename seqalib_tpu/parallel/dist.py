"""Data-parallel distribution of the pair stream over a device mesh.

TPU-native scale-out layer (SURVEY.md §1.2 layer 3, §2.3; new-build — the
reference is a sequential single-thread library, SURVEY.md §2.1).  The unit
of parallelism is the *pair*: a padded bucket (B, L) is sharded over the
mesh axis ``'pairs'`` with ``shard_map``; every device runs the identical
wavefront program on its shard; XLA places the shards and the (trivial)
collectives on ICI/DCN.  Cross-host result assembly uses
``multihost_utils.process_allgather`` when more than one process is present.

No NCCL/MPI analog exists or is needed: the XLA TPU runtime owns transport
(SURVEY.md §2.3 "Comm backend").
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.wavefront_xla import wavefront_bucket

PAIR_AXIS = "pairs"


def make_pair_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices, axis name 'pairs'."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices.reshape(-1), (PAIR_AXIS,))


def _out_specs_like(fn, args):
    """P('pairs', None, ...) for every output leaf (all are batch-major).

    eval_shape runs on bare ShapeDtypeStructs: multi-process feeding
    commits args to a NamedSharding over an Explicit-axis mesh, and an
    aval carrying `@pairs` aborts inside the un-shard_mapped pallas_call
    trace ("requires all mesh axes to be Manual")."""
    shapes = jax.eval_shape(
        fn, *[jax.ShapeDtypeStruct(a.shape, a.dtype) for a in args]
    )
    return jax.tree.map(
        lambda s: P(PAIR_AXIS, *([None] * (len(s.shape) - 1))), shapes
    )


_SHARDED_JIT_CACHE: dict = {}


def _cached_sharded_jit(key, build):
    """Reuse jit(shard_map(...)) callables across calls.

    A fresh wrapper per call has a new Python identity, so jax.jit's
    trace cache misses and EVERY chunk of a streaming product re-traces
    and re-compiles — measured ~10s/chunk through the remote-compile
    tunnel vs 0.1s for the same program warm.  ``build()`` constructs
    the jitted callable once per static config; jit's own cache then
    handles shape polymorphism within a config."""
    fn = _SHARDED_JIT_CACHE.get(key)
    if fn is None:
        fn = _SHARDED_JIT_CACHE[key] = build()
    return fn


def wavefront_sharded(
    mesh: Mesh,
    q: jax.Array,
    t: jax.Array,
    qlen: jax.Array,
    tlen: jax.Array,
    table: jax.Array,
    *,
    mode: str,
    gap_open: int,
    gap_extend: int,
    band: Optional[int],
    affine: bool,
    want_tb: bool,
):
    """shard_map'ed wavefront_bucket over the mesh's 'pairs' axis.

    B must be a multiple of the axis size (the dispatcher pads the bucket,
    seqalib_tpu.parallel.dispatch.dispatch_batch ``pad_batch_to``).
    """
    ndev = mesh.shape[PAIR_AXIS]
    B = q.shape[0]
    if B % ndev != 0:
        raise ValueError(f"bucket batch {B} not divisible by mesh axis {ndev}")

    fn = functools.partial(
        wavefront_bucket,
        mode=mode,
        gap_open=gap_open,
        gap_extend=gap_extend,
        band=band,
        affine=affine,
        want_tb=want_tb,
    )
    args = (q, t, qlen, tlen, table)

    def build():
        in_specs = (
            P(PAIR_AXIS, None),
            P(PAIR_AXIS, None),
            P(PAIR_AXIS),
            P(PAIR_AXIS),
            P(None, None),
        )
        out_specs = _out_specs_like(fn, args)
        # check_vma=False: the wavefront scan's init carry is device-
        # invariant (jnp.full inside the body) while its output is pair-
        # varying, which the varying-manual-axes checker would reject;
        # per-device execution is still fully independent (pure data
        # parallelism, no collectives).
        sharded = jax.shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
        return jax.jit(sharded)

    key = ("wavefront", mesh, mode, gap_open, gap_extend, band, affine,
           want_tb)
    return _cached_sharded_jit(key, build)(*args)


def strip_sharded(
    mesh: Mesh,
    q: np.ndarray,
    t: np.ndarray,
    qlen: np.ndarray,
    tlen: np.ndarray,
    table: np.ndarray,
    *,
    mode: str,
    gap_open: int,
    gap_extend: int,
    affine: bool,
    want_tb: bool,
    BSUB: Optional[int] = None,
    launch_only: bool = False,
):
    """Pair-stream sharding of the strip-kernel fast path (SURVEY.md §3.2-1:
    ``pl.pallas_call`` inside the shard_map body; VERDICT.md round-1 item 2).

    Local mode shard_maps the fused two-pass coords program
    (ops.strip_pallas._strip_local_fused) over the 'pairs' axis; rare
    escalations (alignments taller than the fused pass-2 row window) and
    the want_tb window-traceback pass run host-side after the gather, on
    the strip kernels, unsharded — they touch only the alignments' own
    footprint.  Global mode (round 3; VERDICT.md round-2 item 6a)
    shard_maps the end-capture fill (+ the packed pointer stream when
    want_tb); the stream is gathered with the scores — the same volume
    the UNsharded path already hauls to the host for its pointer walk —
    and walked per pair host-side."""
    import functools as _ft

    import jax.numpy as jnp

    from ..ops.strip_pallas import (
        LANES,
        SUBLANES,
        _ceil_to,
        _prep_strip,
    )

    if mode not in ("local", "global"):
        raise ValueError(f"strip_sharded: unknown mode {mode!r}")
    gmode = mode == "global"
    ndev = mesh.shape[PAIR_AXIS]
    q = np.asarray(q)
    t = np.asarray(t)
    qlen = np.asarray(qlen, np.int32)
    tlen = np.asarray(tlen, np.int32)
    B0 = q.shape[0]

    if BSUB is None:
        import os

        BSUB = int(os.environ.get("SEQALIB_STRIP_BSUB", "128"))
    # per-device batch must be a BSUB multiple (the kernel grid asserts it)
    Bs = -(-B0 // ndev)
    BSUB = max(SUBLANES, min(BSUB, _ceil_to(Bs, SUBLANES)))
    if want_tb and gmode:
        # int8 pointer block min tile (strip_bucket applies the same clamp)
        BSUB = max(BSUB, 32)
    Bs = _ceil_to(Bs, BSUB)
    B = Bs * ndev
    if B != B0:
        pad = B - B0
        q = np.concatenate([q, np.repeat(q[:1], pad, 0)], axis=0)
        t = np.concatenate([t, np.repeat(t[:1], pad, 0)], axis=0)
        qlen = np.concatenate([qlen, np.zeros(pad, np.int32)])
        tlen = np.concatenate([tlen, np.zeros(pad, np.int32)])

    table_h = np.asarray(table)
    qpad, t2, kwc = _prep_strip(
        q, t, qlen, tlen, table_h,
        gap_open=gap_open, gap_extend=gap_extend, affine=affine,
    )
    interpret = jax.devices()[0].platform != "tpu"
    from ..ops.strip_pallas import fused_pass2_knobs, fused_wr as _fwr

    if gmode:
        from ..ops.strip_pallas import (
            _dev_walk_enabled,
            _strip_fill,
            strip_fill_walk_global,
        )

        dev_walk = want_tb and _dev_walk_enabled(interpret)
        if dev_walk:
            # fill + device traceback walk in ONE sharded program: every
            # device walks its own pair shard and the gather ships
            # (B, S*K) int8 op matrices, never the pointer stream
            # (BASELINE.json:5 "CIGAR tracebacks gathered via
            # collectives"; VERDICT round-4 item 1)
            fn = _ft.partial(
                strip_fill_walk_global, **kwc, BSUB=BSUB,
                interpret=interpret,
            )
        else:
            fn = _ft.partial(
                _strip_fill, **kwc, BSUB=BSUB, interpret=interpret,
                want_ptr=want_tb, gmode=True,
            )
    else:
        fn = _ft.partial(
            _fused_meta, **kwc, BSUB=BSUB, interpret=interpret,
            WR=_fwr(), **fused_pass2_knobs(interpret),
        )
    if jax.process_count() > 1:
        # per-process feeding (SURVEY.md §3.2-1; exercised by
        # tests/test_multihost.py on a 2-process CPU mesh): a plain
        # numpy arg cannot be auto-committed to a mesh with
        # non-addressable devices, so each process materializes only its
        # OWN shards of the global array.  Every process holds the full
        # host copy here; a production feeder would hand each process
        # just its slice via the same callback.
        def _feed(x, spec):
            x = np.asarray(x)
            sh = jax.NamedSharding(mesh, spec)
            return jax.make_array_from_callback(
                x.shape, sh, lambda idx: x[idx]
            )

        args = (
            _feed(qpad, P(PAIR_AXIS)),
            _feed(t2, P(PAIR_AXIS)),
            _feed(qlen, P(PAIR_AXIS)),
            _feed(tlen, P(PAIR_AXIS)),
            _feed(table_h, P(None, None)),
        )
    else:
        args = (
            jnp.asarray(qpad),
            jnp.asarray(t2),
            jnp.asarray(qlen),
            jnp.asarray(tlen),
            jnp.asarray(table_h),
        )

    def build():
        in_specs = (
            P(PAIR_AXIS), P(PAIR_AXIS), P(PAIR_AXIS), P(PAIR_AXIS),
            P(None, None),
        )
        # the fused local path packs its six (B,) outputs into ONE
        # (6, B) array (a gather round trip per BUFFER costs ~30ms on
        # the remote link, and fine-grained buckets multiplied the
        # per-chunk buffer count); everything else is batch-major
        out_specs = (
            P(None, PAIR_AXIS) if not gmode else _out_specs_like(fn, args)
        )
        sharded = jax.shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
        return jax.jit(sharded)

    # every static in fn's partial is in the key: a config change must
    # never reuse another config's compiled program
    key = ("strip", mesh, gmode, bool(want_tb), BSUB, interpret,
           fn.func.__name__, tuple(sorted(fn.keywords.items())))
    res_dev = _cached_sharded_jit(key, build)(*args)
    fin = functools.partial(
        _strip_finalize, res_dev, gmode=gmode, affine=affine,
        gap_open=gap_open, gap_extend=gap_extend, want_tb=want_tb,
        BSUB=BSUB, B0=B0, n_pad=qpad.shape[1],
        NB=(t2.shape[1] - LANES) // LANES, q=q, t=t, qlen=qlen,
        tlen=tlen, table_h=table_h, interpret=interpret,
    )
    if launch_only:
        # streaming overlap (align_all_vs_all): hand back a finalize
        # closure over the in-flight device results so the caller can
        # prep the NEXT chunk while this one computes/transfers;
        # finalize() is the sync point (gather + escalation + assembly)
        return fin
    return fin()


_FUSED_META_KEYS = ("score", "qe", "te", "qs", "ts", "score2")


def _fused_meta(qpad, t2, qlen, tlen, table, **kw):
    """_strip_local_fused with its six (B,) outputs stacked into one
    (6, B) int32 array — one gathered buffer instead of six."""
    import jax.numpy as jnp

    from ..ops.strip_pallas import _strip_local_fused

    r = _strip_local_fused(qpad, t2, qlen, tlen, table, **kw)
    return jnp.stack(
        [r[k].astype(jnp.int32) for k in _FUSED_META_KEYS]
    )


def _strip_finalize(res_dev, *, gmode, affine, gap_open, gap_extend,
                    want_tb, BSUB, B0, n_pad, NB, q, t, qlen, tlen,
                    table_h, interpret):
    """Sync point of a strip_sharded launch: gather + escalation +
    host-side assembly (pointer walk / window traceback)."""
    res = gather_to_host(res_dev)
    if not gmode:
        # unpack the (6, B) fused meta array (see strip_sharded.build)
        res = {
            k: res[i]
            for i, k in enumerate(_FUSED_META_KEYS)
        }
    if gmode:
        from ..ops.strip_pallas import _global_post

        walked = (
            (res["ops"], res["ifin"], res["jfin"]) if "ops" in res else None
        )
        return _global_post(
            np.asarray(res["bv"]).astype(np.int32),
            res.get("P"),
            np.asarray(qlen),
            np.asarray(tlen),
            affine=bool(affine),
            gap_open=gap_open,
            gap_extend=gap_extend,
            want_tb=want_tb,
            BSUB=BSUB,
            B0=B0,
            n_pad=n_pad,
            NB=NB,
            interpret=interpret,
            walked=walked,
        )

    score = res["score"].astype(np.int32)
    qe = res["qe"].astype(np.int64)
    te = res["te"].astype(np.int64)
    qs = res["qs"].astype(np.int32)
    ts = res["ts"].astype(np.int32)
    fail = (res["score2"].astype(np.int32) != score) & (score > 0)
    if fail.any():
        from ..ops.strip_pallas import TI, _reverse_starts

        qs2, ts2 = _reverse_starts(
            q, t, np.where(fail, score, 0), qe, te, table_h,
            gap_open=gap_open, gap_extend=gap_extend, affine=affine,
            BSUB=BSUB, interpret=interpret, Wq0=4 * TI,
        )
        qs = np.where(fail, qs2, qs)
        ts = np.where(fail, ts2, ts)
    out = {
        "score": score[:B0],
        "qs": qs[:B0],
        "qe": qe.astype(np.int32)[:B0],
        "ts": ts[:B0],
        "te": te.astype(np.int32)[:B0],
    }
    if not want_tb:
        return out
    # window traceback (pass 3), host-orchestrated on the strip kernels —
    # shared with strip_bucket's tail (includes the window-score assert)
    from ..ops.strip_pallas import window_global_cigars

    out["cigars"] = window_global_cigars(
        q[:B0], t[:B0], out["score"], qs[:B0], qe[:B0], ts[:B0], te[:B0],
        table_h, gap_open=gap_open, gap_extend=gap_extend, affine=affine,
    )
    return out


def gather_to_host(tree):
    """Bring a (possibly multi-host sharded) result pytree to every host.

    Single-process: plain device_get.  Multi-process: process_allgather so
    each host sees the full pair stream's results (SURVEY.md §3.2-1 "cross-
    host DCN boundary")."""
    if jax.process_count() == 1:
        return jax.tree.map(np.asarray, tree)
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree, tiled=True)
