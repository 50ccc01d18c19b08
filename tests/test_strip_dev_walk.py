"""Device-walk engine for the strip global/pass-3 traceback
(ops/strip_pallas.strip_walk_range + strip_walk_dev; VERDICT round-4
item 1).

The flagship full-CIGAR path used to haul the pass-3 window pointer
stream (~1.3 MB/pair) to the host walker; the device walk sweeps the
stream strip-major on-chip and ships a (B, S*K) int8 op matrix instead.
These tests pin bit-identical results (scores, coords, str-level
CIGARs) between the two engines in interpret mode; the host engine is
itself oracle-parity-pinned by test_strip/test_parity suites, so
dev == host => dev == oracle.  On-chip behavior is covered by the
tpu_smoke subset (test_tpu_smoke).
"""

import numpy as np
import pytest

from seqalib_tpu import ScoringParams
from seqalib_tpu.ops.strip_pallas import strip_bucket
from seqalib_tpu.parallel.dispatch import sentinel_table


def _both_engines(monkeypatch, fn):
    monkeypatch.setenv("SEQALIB_STRIP_DEV_WALK", "0")
    ref = fn()
    monkeypatch.setenv("SEQALIB_STRIP_DEV_WALK", "1")
    dev = fn()
    return ref, dev


def _assert_same(ref, dev):
    for k in ("score", "qs", "qe", "ts", "te"):
        np.testing.assert_array_equal(ref[k], dev[k], err_msg=k)
    assert ref["cigars"] == dev["cigars"]


def test_global_dev_walk_matches_host(monkeypatch):
    # multi-strip (L=150 -> S=2), ragged lengths, degenerate qlen=0 /
    # tlen=0 pairs (the host-appended boundary-run path), affine BLOSUM62
    rng = np.random.default_rng(5)
    sp = ScoringParams.blosum62()
    table = sentinel_table(sp)
    B, L = 8, 150
    q = rng.integers(0, 20, size=(B, L)).astype(np.int32)
    t = rng.integers(0, 20, size=(B, 180)).astype(np.int32)
    qlen = rng.integers(1, L + 1, size=B).astype(np.int64)
    tlen = rng.integers(1, 181, size=B).astype(np.int64)
    qlen[0] = 0
    qlen[1] = L
    tlen[2] = 0
    tlen[1] = 180

    ref, dev = _both_engines(
        monkeypatch,
        lambda: strip_bucket(
            q, t, qlen, tlen, table, mode="global",
            gap_open=sp.gap_open, gap_extend=sp.gap_extend,
            affine=True, want_tb=True,
        ),
    )
    _assert_same(ref, dev)


@pytest.mark.parametrize("affine", [True, False])
def test_local_pass3_dev_walk_matches_host(monkeypatch, affine):
    # the flagship pass-3 path: local coords + window-global CIGARs; a
    # planted similar region makes the windows span multiple strips
    rng = np.random.default_rng(9)
    sp = (
        ScoringParams(match=2, mismatch=-3, gap_open=-5, gap_extend=-2)
        if affine
        else ScoringParams(match=2, mismatch=-3, gap_open=0, gap_extend=-2)
    )
    table = sentinel_table(sp)
    B = 8
    q = rng.integers(0, 4, size=(B, 300)).astype(np.int32)
    t = rng.integers(0, 4, size=(B, 260)).astype(np.int32)
    t[:, 50:150] = q[:, 100:200]
    qlen = np.full(B, 300, np.int64)
    tlen = np.full(B, 260, np.int64)
    qlen[3] = 140
    tlen[4] = 90

    ref, dev = _both_engines(
        monkeypatch,
        lambda: strip_bucket(
            q, t, qlen, tlen, table, mode="local",
            gap_open=sp.gap_open, gap_extend=sp.gap_extend,
            affine=affine, want_tb=True,
        ),
    )
    _assert_same(ref, dev)


@pytest.mark.parametrize("protein", [False, True])
def test_local_single_program_fused_tb(monkeypatch, protein):
    """The round-5 ONE-program full-CIGAR path (_strip_local_fused_tb:
    coords + device window extraction + pass-3 fill + device walk in a
    single jit) engages at B % 32 == 0 under the dev-walk engine; its
    results must be bit-identical to the two-phase host-windowed path,
    INCLUDING pairs that escalate past the fused row window (those are
    re-windowed host-side after _reverse_starts fixes their starts).
    Both scoring modes: DNA scalar and BLOSUM62 packed profile."""
    rng = np.random.default_rng(13)
    sp = (
        ScoringParams.blosum62()
        if protein
        else ScoringParams(match=2, mismatch=-3, gap_open=-5, gap_extend=-2)
    )
    alpha = 20 if protein else 4
    table = sentinel_table(sp)
    B, L = 32, 300
    q = rng.integers(0, alpha, size=(B, L)).astype(np.int32)
    t = rng.integers(0, alpha, size=(B, L)).astype(np.int32)
    t[:, 40:120] = q[:, 60:140]
    # pair 5: identical sequences -> span 300 > WR=128 -> escalation
    t[5] = q[5]
    qlen = np.full(B, L, np.int64)
    tlen = np.full(B, L, np.int64)
    monkeypatch.setenv("SEQALIB_FUSED_WR", "128")

    ref, dev = _both_engines(
        monkeypatch,
        lambda: strip_bucket(
            q, t, qlen, tlen, table, mode="local",
            gap_open=sp.gap_open, gap_extend=sp.gap_extend,
            affine=True, want_tb=True,
        ),
    )
    _assert_same(ref, dev)
    assert dev["cigars"][5] == "300M"  # the escalated pair, rebuilt


def test_global_dev_walk_large_batch_chunked(monkeypatch):
    """strip_walk_range chunks batches past BCAP=512 (its walker state /
    ops / scratch blocks scale with B in VMEM — a 4096-pair short-read
    batch used to blow scoped vmem).  B=544 exercises the padded tail
    chunk against the host engine."""
    rng = np.random.default_rng(21)
    sp = ScoringParams(match=2, mismatch=-3, gap_open=-5, gap_extend=-2)
    table = sentinel_table(sp)
    B, L = 544, 40
    q = rng.integers(0, 4, size=(B, L)).astype(np.int32)
    t = rng.integers(0, 4, size=(B, L)).astype(np.int32)
    qlen = rng.integers(1, L + 1, size=B).astype(np.int64)
    tlen = rng.integers(1, L + 1, size=B).astype(np.int64)

    ref, dev = _both_engines(
        monkeypatch,
        lambda: strip_bucket(
            q, t, qlen, tlen, table, mode="global",
            gap_open=sp.gap_open, gap_extend=sp.gap_extend,
            affine=True, want_tb=True,
        ),
    )
    _assert_same(ref, dev)
