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
    """P('pairs', None, ...) for every output leaf (all are batch-major)."""
    shapes = jax.eval_shape(fn, *args)
    return jax.tree.map(
        lambda s: P(PAIR_AXIS, *([None] * (len(s.shape) - 1))), shapes
    )


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
    in_specs = (
        P(PAIR_AXIS, None),
        P(PAIR_AXIS, None),
        P(PAIR_AXIS),
        P(PAIR_AXIS),
        P(None, None),
    )
    out_specs = _out_specs_like(fn, args)
    # check_vma=False: the wavefront scan's init carry is device-invariant
    # (jnp.full inside the body) while its output is pair-varying, which the
    # varying-manual-axes checker would reject; per-device execution is
    # still fully independent (pure data parallelism, no collectives).
    sharded = jax.shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
    )
    return jax.jit(sharded)(*args)


def gather_to_host(tree):
    """Bring a (possibly multi-host sharded) result pytree to every host.

    Single-process: plain device_get.  Multi-process: process_allgather so
    each host sees the full pair stream's results (SURVEY.md §3.2-1 "cross-
    host DCN boundary")."""
    if jax.process_count() == 1:
        return jax.tree.map(np.asarray, tree)
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree, tiled=True)
