"""Batched alignment dispatcher: length bucketing, padding, backend calls,
result assembly (SURVEY.md §1.2 layer 2, §3.2-1; new-build — the reference is
a single-pair sequential library with no batching, SURVEY.md §2.1).

Pipeline: sort pairs into (Lq, Lt) power-of-two buckets -> pad -> run each
bucket through the selected device backend (optionally shard_map'ed over a
mesh's 'pairs' axis, see seqalib_tpu.parallel.dist) -> decode tracebacks ->
unpermute to input order.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..types import AlignResult, ScoringParams
from ..utils.cigar import OP_PAD, ops_to_cigar

log = logging.getLogger(__name__)

MIN_BUCKET = 16


def bucket_len(n: int) -> int:
    """Bucket width for a sequence of length n.

    n <= 128: smallest power-of-two >= n (>= MIN_BUCKET) — fine-grained
    buckets for tiny pairs on the XLA/interpret backends.  n > 128: ceil
    to the next 128 multiple — the strip/banded kernels pad both sides
    to 128 (TI rows / LANES columns) internally, so 128-step buckets are
    the FINEST quantization that changes device work, and power-of-two
    buckets above 128 only added padding: at the config-5 contract
    distribution (reads 128-256 x refs 512-1024) they left a mean
    true/padded cell fraction of ~0.50 vs ~0.60 at 128 steps (VERDICT
    round-4 item 2; measured rates in BASELINE.md round 5)."""
    if n <= 128:
        b = MIN_BUCKET
        while b < n:
            b <<= 1
        return b
    if os.environ.get("SEQALIB_BUCKET_POLICY", "ceil128") == "pow2":
        # measurement override: coarser buckets = fewer per-chunk
        # launches/gathers — can win on a link-bound remote setup even
        # though ceil128 wins device-side (BASELINE.md round 5)
        b = 128
        while b < n:
            b <<= 1
        return b
    return -(-n // 128) * 128


def _pad_stack(seqs: List[np.ndarray], L: int) -> np.ndarray:
    out = np.zeros((len(seqs), L), dtype=np.int32)
    for r, s in enumerate(seqs):
        out[r, : len(s)] = s
    return out


def sentinel_table(sp: ScoringParams) -> np.ndarray:
    """(A+1, A+1) int32 substitution table with a zero sentinel row/col.

    The sentinel (last index) scores 0 against everything so padded lattice
    slots drift by 0 instead of accumulating junk (SMEM-resident in the
    Pallas kernels; SURVEY.md §2.1 'ScoringSystem' equivalent)."""
    m = sp.substitution_matrix()
    a = m.shape[0]
    out = np.zeros((a + 1, a + 1), dtype=np.int32)
    out[:a, :a] = m
    return out


def run_bucket(
    q: np.ndarray,
    t: np.ndarray,
    qlen: np.ndarray,
    tlen: np.ndarray,
    sp: ScoringParams,
    mode: str,
    band: Optional[int],
    backend: str,
    traceback: bool,
    mesh=None,
    launch_only: bool = False,
) -> Dict[str, np.ndarray]:
    """Run one padded bucket (B, Lq) x (B, Lt) on a device backend.

    ``launch_only``: return a 0-arg finalize callable instead of the
    result dict; on the sharded strip fast path the device work is left
    in flight so the caller can overlap host prep of the next bucket
    (align_all_vs_all's streaming loop); other routes finalize eagerly
    and the callable just hands the result back."""
    import jax.numpy as jnp

    table = jnp.asarray(sentinel_table(sp))
    affine = sp.is_affine or band is not None
    kwargs = dict(
        mode=mode,
        gap_open=sp.gap_open,
        gap_extend=sp.gap_extend,
        band=band,
        affine=affine,
        want_tb=traceback,
    )
    args = (jnp.asarray(q), jnp.asarray(t), jnp.asarray(qlen), jnp.asarray(tlen), table)

    if mesh is not None:
        if backend == "pallas" and band is None and mode in ("local", "global"):
            # fast path: shard_map over the strip-kernel programs — the
            # fused two-pass coords program (local) or the end-capture
            # fill + gathered pointer stream (global)
            from .dist import strip_sharded

            return strip_sharded(
                mesh,
                np.asarray(q),
                np.asarray(t),
                np.asarray(qlen),
                np.asarray(tlen),
                sentinel_table(sp),
                mode=mode,
                gap_open=sp.gap_open,
                gap_extend=sp.gap_extend,
                affine=affine,
                want_tb=traceback,
                launch_only=launch_only,
            )
        from .dist import gather_to_host, wavefront_sharded

        if backend == "pallas":
            # no silent path change under a mesh (VERDICT.md round-2
            # weak 4): whatever still lacks a sharded Pallas program says
            # so instead of quietly running the slow XLA body
            log.warning(
                "mesh dispatch: no sharded Pallas program for mode=%s "
                "band=%s; falling back to the sharded XLA wavefront",
                mode,
                band,
            )
        res = gather_to_host(wavefront_sharded(mesh, *args, **kwargs))
        return (lambda r=res: r) if launch_only else res
    if backend == "xla":
        from ..ops.wavefront_xla import wavefront_bucket

        out = wavefront_bucket(*args, **kwargs)
    elif backend == "pallas":
        from ..ops.wavefront_pallas import pallas_bucket

        out = pallas_bucket(*args, **kwargs)
    else:
        raise ValueError(f"unknown device backend {backend!r}")
    res = {k: np.asarray(v) for k, v in out.items()}
    return (lambda r=res: r) if launch_only else res


def _decode_ops_rev(row: np.ndarray) -> str:
    """end->start op codes, OP_PAD padded -> CIGAR string."""
    n = int((row != OP_PAD).sum())
    return ops_to_cigar(row[:n][::-1])


def dispatch_batch(
    qs: List[np.ndarray],
    ts: List[np.ndarray],
    sp: ScoringParams,
    mode: str = "local",
    band: Optional[int] = None,
    backend: str = "xla",
    traceback: bool = True,
    mesh=None,
    pad_batch_to: int = 1,
) -> List[AlignResult]:
    """Align all pairs; returns results in input order."""
    n_pairs = len(qs)
    # banded fast path covers scalar scoring AND nibble-range substitution
    # matrices (the packed-profile banded kernel, same predicate the
    # kernel guard uses); wider tables fall through to the full-matrix
    # wavefront with band masking
    def _banded_ok():
        if sp.matrix is None:
            return True
        from ..ops.banded_pallas import banded_matrix_supported

        return banded_matrix_supported(sp.substitution_matrix())

    if (
        band is not None
        and backend == "pallas"
        and mode == "global"
        and _banded_ok()
    ):
        # long-read path: O(n*w) banded kernel + checkpointed traceback
        # (models.banded).  Pairs are grouped by QUANTIZED length delta
        # (buckets of `band` wide): the kernel enforces exact per-pair band
        # bounds in-mask, so a group only needs its slot geometry to cover
        # the delta spread — exact-delta grouping recompiled the kernel per
        # distinct len(t)-len(q) on ragged long-read sets (VERDICT.md
        # round-1 item 3).  Under a mesh the delta-groups' sub-batches
        # round-robin over the mesh devices (VERDICT.md round-2 item 6b) —
        # same kernel, committed-input placement.
        from ..models.banded import banded_align_batch

        devices = None
        if mesh is not None:
            devices = list(np.asarray(mesh.devices).reshape(-1))

        groups: Dict[int, List[int]] = {}
        for idx, (q, t) in enumerate(zip(qs, ts)):
            groups.setdefault((len(t) - len(q)) // max(band, 1), []).append(idx)
        results: List[Optional[AlignResult]] = [None] * n_pairs
        parts: List[List[int]] = []
        for delta, idxs in sorted(groups.items()):
            if devices is None or len(idxs) == 1:
                parts.append(idxs)
            else:
                # split each group over the mesh so every device gets work
                nd = min(len(devices), len(idxs))
                step = -(-len(idxs) // nd)
                parts.extend(
                    idxs[lo : lo + step] for lo in range(0, len(idxs), step)
                )
        for pi, idxs in enumerate(parts):
            Lq = max(len(qs[i]) for i in idxs)
            Lt = max(len(ts[i]) for i in idxs)
            qb = _pad_stack([qs[i] for i in idxs], Lq)
            tb = _pad_stack([ts[i] for i in idxs], Lt)
            qlen = np.array([len(qs[i]) for i in idxs], np.int64)
            tlen = np.array([len(ts[i]) for i in idxs], np.int64)
            res = banded_align_batch(
                qb, tb, qlen, tlen, sp, band, traceback=traceback,
                device=None if devices is None else devices[pi % len(devices)],
            )
            for r, idx in enumerate(idxs):
                results[idx] = res[r]
        return results  # type: ignore[return-value]
    if mesh is not None and pad_batch_to == 1:
        from .dist import PAIR_AXIS

        pad_batch_to = mesh.shape[PAIR_AXIS]
    # bucket key: (padded Lq, padded Lt)
    buckets: Dict[Tuple[int, int], List[int]] = {}
    for idx, (q, t) in enumerate(zip(qs, ts)):
        key = (bucket_len(len(q)), bucket_len(len(t)))
        buckets.setdefault(key, []).append(idx)

    results: List[Optional[AlignResult]] = [None] * n_pairs
    # two-phase: LAUNCH every bucket before finalizing any — a chunk of
    # the all-vs-all product spans up to ~10 (Lq, Lt) buckets under the
    # 128-step policy, and a synchronous gather per bucket serialized
    # ~10 device round trips per chunk (round 5; the launch_only
    # machinery pipelines the buckets through XLA's async dispatch)
    pending = []
    for (Lq, Lt), idxs in sorted(buckets.items()):
        B = len(idxs)
        Bp = max(B, 1)
        if pad_batch_to > 1:
            Bp = ((B + pad_batch_to - 1) // pad_batch_to) * pad_batch_to
        # tail padding uses ZERO-LENGTH sentinels, not replicated real
        # pairs: padded slots then do no traceback/start-recovery work and
        # their fill lanes are masked out (VERDICT.md round-1 item 6)
        zpad = [np.zeros(0, np.int32)] * (Bp - B)
        qb = _pad_stack([qs[i] for i in idxs] + zpad, Lq)
        tb = _pad_stack([ts[i] for i in idxs] + zpad, Lt)
        qlen = np.array([len(qs[i]) for i in idxs] + [0] * (Bp - B), np.int32)
        tlen = np.array([len(ts[i]) for i in idxs] + [0] * (Bp - B), np.int32)
        fin = run_bucket(
            qb, tb, qlen, tlen, sp, mode, band, backend, traceback,
            mesh=mesh, launch_only=True,
        )
        pending.append((idxs, fin))
    for idxs, fin in pending:
        out = fin()
        for r, idx in enumerate(idxs):
            if not traceback:
                cigar = ""
            elif "cigars" in out:  # native walker emits strings directly
                cigar = out["cigars"][r]
            else:
                cigar = _decode_ops_rev(out["ops_rev"][r])
            results[idx] = AlignResult(
                int(out["score"][r]),
                int(out["qs"][r]),
                int(out["qe"][r]),
                int(out["ts"][r]),
                int(out["te"][r]),
                cigar,
            )
    return results  # type: ignore[return-value]
