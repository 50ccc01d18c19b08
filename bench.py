#!/usr/bin/env python
"""Headline benchmark: GCUPS/chip on batched 1kb affine-gap Smith-Waterman
(BASELINE.json:2 metric; config-3-style BLOSUM62 protein pairs, score+coords).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md: "published": {}); the
recorded baseline here is the BASELINE.md roofline-derived target floor of
100 GCUPS/chip, so vs_baseline = GCUPS / 100.
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
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    backend = os.environ.get("BENCH_BACKEND", "auto")

    sp = ScoringParams.blosum62()
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.integers(0, 20, size=(B, L)), jnp.int32)
    t = jnp.asarray(rng.integers(0, 20, size=(B, L)), jnp.int32)
    qlen = jnp.full((B,), L, jnp.int32)
    tlen = jnp.full((B,), L, jnp.int32)
    table = jnp.asarray(sentinel_table(sp))
    kwargs = dict(
        mode="local",
        gap_open=sp.gap_open,
        gap_extend=sp.gap_extend,
        band=None,
        affine=True,
        want_tb=False,
    )

    if backend == "auto":
        try:
            from seqalib_tpu.ops.wavefront_pallas import pallas_bucket as fn

            backend = "pallas"
        except Exception:
            from seqalib_tpu.ops.wavefront_xla import wavefront_bucket as fn

            backend = "xla"
    elif backend == "pallas":
        from seqalib_tpu.ops.wavefront_pallas import pallas_bucket as fn
    else:
        from seqalib_tpu.ops.wavefront_xla import wavefront_bucket as fn

    def step():
        return fn(q, t, qlen, tlen, table, **kwargs)

    jax.block_until_ready(step())  # compile + warm
    jax.block_until_ready(step())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    cells = B * L * L
    gcups = cells / dt / 1e9
    print(
        json.dumps(
            {
                "metric": f"GCUPS/chip sw-affine-{L} ({backend}, {jax.devices()[0].platform})",
                "value": round(gcups, 3),
                "unit": "GCUPS",
                "vs_baseline": round(gcups / BASELINE_GCUPS, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
