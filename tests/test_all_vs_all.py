"""align_all_vs_all (config 5 surface) vs the oracle, including the
chunked product streaming and the sharded mesh path."""

import numpy as np

import seqalib_tpu as sa
from seqalib_tpu.oracle import sw_linear
from seqalib_tpu.types import ScoringParams

SP = ScoringParams(match=2, mismatch=-3, gap_open=0, gap_extend=-2)


def _mk(rng, n_reads=4, n_refs=3):
    reads = [
        rng.integers(0, 4, int(rng.integers(20, 40))).astype(np.uint8)
        for _ in range(n_reads)
    ]
    refs = [
        rng.integers(0, 4, int(rng.integers(40, 80))).astype(np.uint8)
        for _ in range(n_refs)
    ]
    return reads, refs


def _assert_matches(out, reads, refs):
    for i, q in enumerate(reads):
        for j, t in enumerate(refs):
            ref = sw_linear(q, t, SP)
            got = (
                out["score"][i, j],
                out["qs"][i, j],
                out["qe"][i, j],
                out["ts"][i, j],
                out["te"][i, j],
            )
            want = (
                ref.score,
                ref.query_start,
                ref.query_end,
                ref.target_start,
                ref.target_end,
            )
            assert got == want, (i, j, got, want)


def test_all_vs_all_chunked(rng):
    reads, refs = _mk(rng)
    out = sa.align_all_vs_all(reads, refs, scoring=SP, chunk_pairs=5)
    assert out["score"].shape == (4, 3)
    _assert_matches(out, reads, refs)


def test_all_vs_all_sharded(rng):
    from seqalib_tpu.parallel.dist import make_pair_mesh

    reads, refs = _mk(rng)
    out = sa.align_all_vs_all(
        reads, refs, scoring=SP, backend="xla", mesh=make_pair_mesh()
    )
    _assert_matches(out, reads, refs)
