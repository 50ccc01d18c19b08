"""Distribution-layer tests on a faked 8-device CPU mesh (SURVEY.md §4.4).

Asserts the sharded pair-stream path (bucket -> shard -> gather -> unpermute)
is bit-exact vs the oracle, including batches not divisible by the mesh and
mixed-length bucketing.
"""

import numpy as np
import pytest

import jax

from seqalib_tpu import ScoringParams, align_batch
from seqalib_tpu.oracle import align_oracle
from seqalib_tpu.parallel.dist import make_pair_mesh

from conftest import random_dna, random_protein


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device (faked CPU) backend")
    return make_pair_mesh()


def _check(results, qs, ts, sp, mode):
    for r, q, t in zip(results, qs, ts):
        o = align_oracle(q, t, sp, mode=mode)
        assert (r.score, r.query_start, r.query_end, r.target_start, r.target_end) == (
            o.score,
            o.query_start,
            o.query_end,
            o.target_start,
            o.target_end,
        )
        assert r.cigar == o.cigar


def test_sharded_local_linear_dna(mesh, rng):
    sp = ScoringParams.linear()
    qs = [random_dna(rng, int(n)) for n in rng.integers(20, 120, size=13)]
    ts = [random_dna(rng, int(n)) for n in rng.integers(20, 120, size=13)]
    res = align_batch(qs, ts, scoring=sp, mode="local", backend="xla", mesh=mesh)
    _check(res, qs, ts, sp, "local")


def test_sharded_global_affine_protein(mesh, rng):
    sp = ScoringParams.blosum62()
    qs = [random_protein(rng, int(n)) for n in rng.integers(10, 60, size=9)]
    ts = [random_protein(rng, int(n)) for n in rng.integers(10, 60, size=9)]
    res = align_batch(qs, ts, scoring=sp, mode="global", backend="xla", mesh=mesh)
    _check(res, qs, ts, sp, "global")


def test_sharded_strip_local_parity(mesh, rng):
    """backend='pallas' + mesh must ride the strip fast path (shard_map
    over the fused coords program) and stay bit-exact vs the oracle."""
    sp = ScoringParams.blosum62()
    qs = [random_protein(rng, int(n)) for n in rng.integers(15, 80, size=11)]
    ts = [random_protein(rng, int(n)) for n in rng.integers(15, 80, size=11)]
    res = align_batch(qs, ts, scoring=sp, mode="local", backend="pallas", mesh=mesh)
    _check(res, qs, ts, sp, "local")


def test_sharded_strip_matches_unsharded(mesh, rng):
    sp = ScoringParams.affine()
    qs = [random_dna(rng, 48) for _ in range(10)]
    ts = [random_dna(rng, 48) for _ in range(10)]
    a = align_batch(qs, ts, scoring=sp, mode="local", backend="pallas", mesh=mesh)
    b = align_batch(qs, ts, scoring=sp, mode="local", backend="pallas")
    assert a == b


def test_sharded_matches_unsharded(mesh, rng):
    sp = ScoringParams.affine()
    qs = [random_dna(rng, 64) for _ in range(16)]
    ts = [random_dna(rng, 64) for _ in range(16)]
    a = align_batch(qs, ts, scoring=sp, mode="local", backend="xla", mesh=mesh)
    b = align_batch(qs, ts, scoring=sp, mode="local", backend="xla")
    assert a == b


def test_sharded_strip_global_parity(mesh, rng):
    """mesh + global + pallas rides the sharded strip fill (round 3;
    VERDICT.md round-2 item 6a: it used to silently fall back to the XLA
    scan) — full score+coords+CIGAR parity, batch not divisible by the
    mesh."""
    sp = ScoringParams.blosum62()
    qs = [random_protein(rng, int(n)) for n in rng.integers(10, 70, size=11)]
    ts = [random_protein(rng, int(n)) for n in rng.integers(10, 70, size=11)]
    res = align_batch(qs, ts, scoring=sp, mode="global", backend="pallas", mesh=mesh)
    _check(res, qs, ts, sp, "global")


def test_sharded_strip_global_matches_unsharded(mesh, rng):
    sp = ScoringParams.affine()
    qs = [random_dna(rng, 48) for _ in range(10)]
    ts = [random_dna(rng, 52) for _ in range(10)]
    a = align_batch(qs, ts, scoring=sp, mode="global", backend="pallas", mesh=mesh)
    b = align_batch(qs, ts, scoring=sp, mode="global", backend="pallas")
    assert a == b


def test_sharded_banded_parity(mesh, rng):
    """mesh + banded routes to the banded kernel with delta-groups
    round-robined over the mesh devices (round 3; VERDICT.md round-2
    item 6b: it used to silently run the full-matrix XLA path, which
    cannot reach 100kb)."""
    sp = ScoringParams(match=2, mismatch=-3, gap_open=-5, gap_extend=-2)
    qs, ts = [], []
    for n in rng.integers(40, 90, size=9):
        q = random_dna(rng, int(n))
        t = q.copy()
        k = max(1, int(n) // 10)
        idx = rng.choice(int(n), k, replace=False)
        t[idx] = (t[idx] + 1 + rng.integers(0, 3, k)) % 4
        qs.append(q)
        ts.append(t)
    res = align_batch(
        qs, ts, scoring=sp, mode="global", band=16, backend="pallas", mesh=mesh
    )
    for r, q, t in zip(res, qs, ts):
        o = align_oracle(q, t, sp, mode="global", band=16)
        assert (r.score, r.cigar) == (o.score, o.cigar)


def test_sharded_banded_matches_unsharded(mesh, rng):
    sp = ScoringParams(match=2, mismatch=-3, gap_open=-5, gap_extend=-2)
    qs = [random_dna(rng, 60) for _ in range(6)]
    ts = [random_dna(rng, 64) for _ in range(6)]
    a = align_batch(
        qs, ts, scoring=sp, mode="global", band=16, backend="pallas", mesh=mesh
    )
    b = align_batch(qs, ts, scoring=sp, mode="global", band=16, backend="pallas")
    assert a == b


def test_strip_sharded_escalation_and_lookahead(monkeypatch):
    """Escalation through the MESH path's finalize closure: an alignment
    taller than a pinned 128-row fused window must escalate inside
    _strip_finalize (the launch/finalize split added for the streaming
    lookahead) and still return canonical coords — both via the sync
    call and via launch_only."""
    import numpy as np

    from seqalib_tpu.oracle import sw_affine
    from seqalib_tpu.parallel.dist import make_pair_mesh, strip_sharded
    from seqalib_tpu.parallel.dispatch import sentinel_table
    from seqalib_tpu.types import ScoringParams

    monkeypatch.setenv("SEQALIB_FUSED_WR", "128")
    rng = np.random.default_rng(5)
    sp = ScoringParams.affine(match=2, mismatch=-3, gap_open=-4,
                              gap_extend=-1)
    n = 200
    base = rng.integers(0, 4, n).astype(np.int32)
    q = np.stack([base] * 3)
    t = q.copy()
    t[1, 50] = (t[1, 50] + 1) % 4
    qlen = np.full(3, n, np.int32)
    mesh = make_pair_mesh()
    kw = dict(mode="local", gap_open=sp.gap_open, gap_extend=sp.gap_extend,
              affine=True, want_tb=False)
    out = strip_sharded(mesh, q, t, qlen, qlen, sentinel_table(sp), **kw)
    fin = strip_sharded(mesh, q, t, qlen, qlen, sentinel_table(sp),
                        launch_only=True, **kw)
    out2 = fin()
    for b in range(3):
        ref = sw_affine(q[b], t[b], sp)
        for o in (out, out2):
            got = (int(o["score"][b]), int(o["qs"][b]), int(o["qe"][b]),
                   int(o["ts"][b]), int(o["te"][b]))
            assert got == (ref.score, ref.query_start, ref.query_end,
                           ref.target_start, ref.target_end), (b, got)
        assert out["qe"][b] - out["qs"][b] > 128  # escalation actually hit
