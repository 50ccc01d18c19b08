"""Native (C++) host runtime components, loaded via ctypes.

The compute path is Pallas/XLA on the TPU; the host-side runtime around
it — traceback pointer walking and CIGAR run-length encoding, the hot
host loops — is C++ (walker.cpp), compiled on first use with the
toolchain's g++ into a cached shared library.  Everything here degrades
gracefully: if no compiler is available the callers fall back to the
vectorized NumPy implementations (wavefront_pallas._host_traceback_*).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import tempfile
from typing import List, Optional, Tuple

import numpy as np

log = logging.getLogger("seqalib_tpu.native")

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "walker.cpp")
# version the cache name with the exported-symbol set: the cache dir is
# shared across checkouts, and an older build with a newer mtime would
# otherwise load without the newer symbols
_LIB_NAME = "_walker_v2.so"

_lib: Optional[ctypes.CDLL] = None
_tried = False

_I64P = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_I32P = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_I8P = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
_U8P = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")


def _build() -> Optional[str]:
    """Compile walker.cpp -> a cached .so; returns the path or None."""
    cache_dir = os.environ.get(
        "SEQALIB_NATIVE_CACHE",
        os.path.join(tempfile.gettempdir(), "seqalib_tpu_native"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    lib_path = os.path.join(cache_dir, _LIB_NAME)
    if os.path.exists(lib_path) and os.path.getmtime(lib_path) >= os.path.getmtime(
        _SRC
    ):
        return lib_path
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O3",
        "-shared",
        "-fPIC",
        "-std=c++17",
        _SRC,
        "-o",
        lib_path,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except Exception as exc:
        # not silent: callers fall back to the ~10x slower NumPy walkers
        log.warning("native walker build failed (%s); using NumPy fallback", exc)
        return None
    return lib_path


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("SEQALIB_NO_NATIVE", "0") == "1":
        return None
    path = _build()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError as exc:
        log.warning("native walker load failed (%s); using NumPy fallback", exc)
        return None
    try:
        _bind(lib)
    except AttributeError as exc:
        # a stale cached .so lacking a newer symbol must degrade to the
        # NumPy fallback, not crash every native caller
        log.warning("native walker symbols missing (%s); using NumPy fallback", exc)
        return None
    _lib = lib
    return _lib


def _bind(lib) -> None:
    walk_sig = [
        _I8P,  # P
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,  # Kp, B, Np
        _I64P,
        _I64P,  # si, sj
        _U8P,  # done0
        ctypes.c_int64,  # cap
        _U8P,
        _I32P,
        _I32P,  # run_ops, run_cnts, nruns
        _I64P,
        _I64P,  # fi, fj
    ]
    lib.sq_walk_linear.argtypes = walk_sig
    lib.sq_walk_linear.restype = None
    lib.sq_walk_affine.argtypes = walk_sig
    lib.sq_walk_affine.restype = None
    lib.sq_rle.argtypes = [
        _U8P,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        _U8P,
        _I32P,
        _I32P,
    ]
    lib.sq_rle.restype = None
    lib.sq_walk_strip.argtypes = [
        _I8P,  # P
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,  # GB, S, K, BSUB, TI
        ctypes.c_int64,  # B
        _I64P,
        _I64P,  # si, sj
        _U8P,  # done0
        ctypes.c_int,  # affine
        ctypes.c_int,  # global_mode
        ctypes.c_int64,  # cap
        _U8P,
        _I32P,
        _I32P,  # run_ops, run_cnts, nruns
        _I64P,
        _I64P,  # fi, fj
    ]
    lib.sq_walk_strip.restype = None
    lib.sq_walk_banded.argtypes = [
        _I8P,  # P (KW, B, Wp)
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,  # KW, B, Wp
        ctypes.c_int64,
        ctypes.c_int64,  # k0, dhi
        _I64P,
        _I64P,  # i, j (in-out)
        _U8P,
        _U8P,  # st, done (in-out)
        ctypes.c_int64,  # cap
        _U8P,
        _I32P,
        _I32P,  # run_ops, run_cnts, nruns (in-out across blocks)
    ]
    lib.sq_walk_banded.restype = None


def available() -> bool:
    return _load() is not None


_OP_CHARS = "MID"


def _runs_to_cigars(
    run_ops: np.ndarray, run_cnts: np.ndarray, nruns: np.ndarray, reverse: bool
) -> List[str]:
    out = []
    for b in range(run_ops.shape[0]):
        nr = int(nruns[b])
        idx = range(nr - 1, -1, -1) if reverse else range(nr)
        out.append(
            "".join(f"{run_cnts[b, r]}{_OP_CHARS[run_ops[b, r]]}" for r in idx)
        )
    return out


def walk_to_cigars(
    P: np.ndarray,
    starts_i: np.ndarray,
    starts_j: np.ndarray,
    done0: np.ndarray,
    affine: bool,
) -> Optional[Tuple[List[str], np.ndarray, np.ndarray]]:
    """Walk packed pointers from (starts_i, starts_j) per pair.

    Returns (cigars, final_i, final_j) or None when the native library is
    unavailable.  CIGARs are start->end order; final coords are where the
    walk stopped (the alignment start)."""
    lib = _load()
    if lib is None:
        return None
    P = np.ascontiguousarray(P, dtype=np.int8)
    Kp, B, Np = P.shape
    si = np.ascontiguousarray(starts_i, dtype=np.int64)
    sj = np.ascontiguousarray(starts_j, dtype=np.int64)
    dn = np.ascontiguousarray(done0, dtype=np.uint8)
    cap = int(si.max(initial=0) + sj.max(initial=0) + 2)
    run_ops = np.zeros((B, cap), np.uint8)
    run_cnts = np.zeros((B, cap), np.int32)
    nruns = np.zeros(B, np.int32)
    fi = np.zeros(B, np.int64)
    fj = np.zeros(B, np.int64)
    fn = lib.sq_walk_affine if affine else lib.sq_walk_linear
    fn(P, Kp, B, Np, si, sj, dn, cap, run_ops, run_cnts, nruns, fi, fj)
    return _runs_to_cigars(run_ops, run_cnts, nruns, reverse=True), fi, fj


def walk_strip_to_cigars(
    P: np.ndarray,
    starts_i: np.ndarray,
    starts_j: np.ndarray,
    done0: np.ndarray,
    affine: bool,
    BSUB: int,
    global_mode: bool = False,
) -> Optional[Tuple[List[str], np.ndarray, np.ndarray]]:
    """Walk a strip-layout pointer matrix (ops/strip_pallas.py).

    P: (GB, S, K, BSUB, TI) int8.  Returns (cigars start->end, start_i,
    start_j) or None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    P = np.ascontiguousarray(P, dtype=np.int8)
    GB, S, K, BSUB_, TI = P.shape
    assert BSUB_ == BSUB
    si = np.ascontiguousarray(starts_i, dtype=np.int64)
    sj = np.ascontiguousarray(starts_j, dtype=np.int64)
    dn = np.ascontiguousarray(done0, dtype=np.uint8)
    B = len(si)
    cap = int(si.max(initial=0) + sj.max(initial=0) + 2)
    run_ops = np.zeros((B, cap), np.uint8)
    run_cnts = np.zeros((B, cap), np.int32)
    nruns = np.zeros(B, np.int32)
    fi = np.zeros(B, np.int64)
    fj = np.zeros(B, np.int64)
    lib.sq_walk_strip(
        P, GB, S, K, BSUB, TI, B, si, sj, dn, int(affine), int(global_mode),
        cap, run_ops, run_cnts, nruns, fi, fj,
    )
    return _runs_to_cigars(run_ops, run_cnts, nruns, reverse=True), fi, fj


class BandedWalk:
    """Stateful banded traceback walker (models/banded.py pass 2): one
    instance walks a whole batch across super-block calls, carrying
    (i, j, state, done) and the per-pair run buffers in C++-visible
    arrays.  Returns None from ``create`` when the native library is
    unavailable (callers keep the NumPy lockstep walk)."""

    @staticmethod
    def create(i, j, cap: int):
        if _load() is None:
            return None
        return BandedWalk(i, j, cap)

    def __init__(self, i, j, cap: int):
        B = len(i)
        self.i = np.ascontiguousarray(i, np.int64).copy()
        self.j = np.ascontiguousarray(j, np.int64).copy()
        self.st = np.zeros(B, np.uint8)
        self.done = np.zeros(B, np.uint8)
        self.cap = int(cap)
        self.run_ops = np.zeros((B, self.cap), np.uint8)
        self.run_cnts = np.zeros((B, self.cap), np.int32)
        self.nruns = np.zeros(B, np.int32)

    def walk_block(self, P: np.ndarray, k0: int, dhi: int) -> None:
        P = np.ascontiguousarray(P, np.int8)
        KW, B, Wp = P.shape
        _load().sq_walk_banded(
            P, KW, B, Wp, int(k0), int(dhi), self.i, self.j, self.st,
            self.done, self.cap, self.run_ops, self.run_cnts, self.nruns,
        )

    def all_done(self) -> bool:
        return bool(self.done.all())

    def cigars(self) -> List[str]:
        return _runs_to_cigars(self.run_ops, self.run_cnts, self.nruns,
                               reverse=True)


def ops_rows_to_cigars(ops: np.ndarray) -> Optional[List[str]]:
    """Batch RLE of (B, L) padded op rows (start->end order) to CIGARs."""
    lib = _load()
    if lib is None:
        return None
    ops = np.ascontiguousarray(ops, dtype=np.uint8)
    B, L = ops.shape
    cap = L + 1
    run_ops = np.zeros((B, cap), np.uint8)
    run_cnts = np.zeros((B, cap), np.int32)
    nruns = np.zeros(B, np.int32)
    lib.sq_rle(ops, B, L, cap, run_ops, run_cnts, nruns)
    return _runs_to_cigars(run_ops, run_cnts, nruns, reverse=False)
