"""Pallas kernel backend vs NumPy oracle: exact score/coords/CIGAR parity
(SURVEY.md §4.2).  On the CPU test env the kernels run in Pallas interpret
mode (slow — sizes kept small); set SEQALIB_TEST_TPU=1 to run compiled on a
real chip.
"""

import numpy as np
import pytest

from seqalib_tpu.api import align_batch
from seqalib_tpu.oracle import align_oracle
from seqalib_tpu.types import ScoringParams, encode_dna

LIN = ScoringParams.linear(match=2, mismatch=-3, gap=-2)
AFF = ScoringParams.affine(match=2, mismatch=-3, gap_open=-4, gap_extend=-1)
BLO = ScoringParams.blosum62(gap_open=-10, gap_extend=-1)


def _rand_pairs(rng, n_pairs, lo, hi, alpha=4):
    qs, ts = [], []
    for _ in range(n_pairs):
        qs.append(rng.integers(0, alpha, size=int(rng.integers(lo, hi + 1))).astype(np.uint8))
        ts.append(rng.integers(0, alpha, size=int(rng.integers(lo, hi + 1))).astype(np.uint8))
    return qs, ts


def assert_parity(qs, ts, sp, mode, band=None):
    got = align_batch(qs, ts, scoring=sp, mode=mode, band=band, backend="pallas")
    for q, t, g in zip(qs, ts, got):
        want = align_oracle(q, t, sp, mode=mode, band=band)
        assert str(g) == str(want), f"\n got={g}\nwant={want}\nq={q}\nt={t}"


@pytest.mark.parametrize(
    "mode,sp",
    [("global", LIN), ("local", LIN), ("global", AFF), ("local", AFF)],
)
def test_random_parity(rng, mode, sp):
    qs, ts = _rand_pairs(rng, 6, 1, 36)
    assert_parity(qs, ts, sp, mode)


@pytest.mark.parametrize("mode", ["global", "local"])
def test_blosum62_parity(rng, mode):
    qs, ts = _rand_pairs(rng, 5, 5, 40, alpha=20)
    assert_parity(qs, ts, BLO, mode)


def test_banded_parity(rng):
    q = rng.integers(0, 4, size=48).astype(np.uint8)
    t = np.concatenate([q[:20], rng.integers(0, 4, 6).astype(np.uint8), q[24:]])
    for w in (3, 16):
        assert_parity([q], [t], AFF, "global", band=w)


def test_adversarial_shapes(rng):
    cases = [
        ("A", "A"),
        ("A", "G"),
        ("A", "GGGGGGGG"),
        ("AAAAAAAA", "CCCCCCCC"),
        ("ACGT" * 4, "TGCA"),
        ("A" * 16, "A" * 17),
    ]
    qs = [encode_dna(a) for a, _ in cases]
    ts = [encode_dna(b) for _, b in cases]
    for mode in ("global", "local"):
        assert_parity(qs, ts, LIN, mode)
        assert_parity(qs, ts, AFF, mode)


def test_score_only_coords_match_traceback(rng):
    qs, ts = _rand_pairs(rng, 6, 4, 32)
    with_tb = align_batch(qs, ts, scoring=AFF, mode="local", backend="pallas")
    no_tb = align_batch(
        qs, ts, scoring=AFF, mode="local", backend="pallas", traceback=False
    )
    for a, b in zip(with_tb, no_tb):
        assert (a.score, a.query_start, a.query_end, a.target_start, a.target_end) == (
            b.score,
            b.query_start,
            b.query_end,
            b.target_start,
            b.target_end,
        )
