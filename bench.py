#!/usr/bin/env python
"""Headline benchmark: GCUPS/chip on batched 1kb affine-gap Smith-Waterman
(BASELINE.json:2 metric; config-3-style BLOSUM62 protein pairs, score+coords).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md: "published": {}); the
recorded baseline here is the BASELINE.md roofline-derived target floor of
100 GCUPS/chip, so vs_baseline = GCUPS / 100.

Measurement: the remote-TPU tunnel adds ~2ms fixed overhead per dispatch
and ~30-50ms per host roundtrip, so a naive per-call wall clock measures
the tunnel, not the chip.  We jit a chain of X kernel launches (distinct
inputs per launch so nothing is CSE'd or result-cached) for two values of
X and take the *marginal* time per launch: (t(X2) - t(X1)) / (X2 - X1).
"""

import json
import os
import time

import numpy as np

BASELINE_GCUPS = 100.0


def main():
    import jax
    import jax.numpy as jnp

    from seqalib_tpu import ScoringParams
    from seqalib_tpu.parallel.dispatch import sentinel_table

    B = int(os.environ.get("BENCH_B", "32"))
    L = int(os.environ.get("BENCH_L", "1024"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    X1 = int(os.environ.get("BENCH_X1", "4"))
    X2 = int(os.environ.get("BENCH_X2", "20"))
    backend = os.environ.get("BENCH_BACKEND", "pallas")

    sp = ScoringParams.blosum62()
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.integers(0, 20, size=(B, L)), jnp.int32)
    t = jnp.asarray(rng.integers(0, 20, size=(B, L)), jnp.int32)
    qlen = jnp.full((B,), L, jnp.int32)
    tlen = jnp.full((B,), L, jnp.int32)
    table_h = sentinel_table(sp)
    table = jnp.asarray(table_h)
    match, mismatch = int(table_h[0, 0]), int(table_h[0, 1])

    if backend == "pallas":
        from seqalib_tpu.ops.wavefront_pallas import _fill

        interpret = jax.devices()[0].platform != "tpu"

        def one(qi):
            return _fill(
                qi,
                t,
                qlen,
                tlen,
                table,
                mode="local",
                match=match,
                mismatch=mismatch,
                gap_open=sp.gap_open,
                gap_extend=sp.gap_extend,
                band=None,
                affine=True,
                want_tb=False,
                profile=True,
                interpret=interpret,
            )["score"]

    else:
        from seqalib_tpu.ops.wavefront_xla import wavefront_bucket

        def one(qi):
            return wavefront_bucket(
                qi,
                t,
                qlen,
                tlen,
                table,
                mode="local",
                gap_open=sp.gap_open,
                gap_extend=sp.gap_extend,
                band=None,
                affine=True,
                want_tb=False,
            )["score"]

    def chain(X):
        @jax.jit
        def many(q0):
            acc = jnp.int32(0)
            for i in range(X):
                # distinct input per launch: batch-axis roll by i
                acc = acc + one(jnp.roll(q0, i, axis=0)).sum()
            return acc

        return many

    m1, m2 = chain(X1), chain(X2)
    jax.block_until_ready(m1(q))  # compile + warm
    jax.block_until_ready(m2(q))

    def timed(fn):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(q))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = timed(m1), timed(m2)
    per_call = (t2 - t1) / (X2 - X1)
    cells = B * L * L
    gcups = cells / per_call / 1e9
    print(
        json.dumps(
            {
                "metric": f"GCUPS/chip sw-affine-{L}x{L} B={B} "
                f"({backend}, {jax.devices()[0].platform})",
                "value": round(gcups, 3),
                "unit": "GCUPS",
                "vs_baseline": round(gcups / BASELINE_GCUPS, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
