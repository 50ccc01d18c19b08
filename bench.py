#!/usr/bin/env python
"""Headline benchmark: GCUPS/chip on batched 1kb affine-gap Smith-Waterman
(BASELINE.json:2 metric; config-3-style BLOSUM62 protein pairs,
score + start/end coords via the strip-tiled Pallas kernel).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md: "published": {}); the
recorded baseline here is the BASELINE.md roofline-derived target floor of
100 GCUPS/chip, so vs_baseline = GCUPS / 100.

Measurement: the remote-TPU tunnel adds ~40ms FIXED overhead per synced
call (measured: t(X=1) == t(X=2) == 41ms; slope only stabilizes for
X >= 8), and async dispatch means block_until_ready through the tunnel
may under-report.  We jit a chain of X kernel launches (distinct inputs
per launch so nothing is CSE'd), force a value fetch (int()) for a true
sync, and take the marginal time per launch between two chain lengths
both inside the linear regime: (t(X2) - t(X1)) / (X2 - X1) with
X1=8, X2=32, median over reps (best-of selection under 40ms noise
biased round-1 numbers by up to 2x in either direction).
"""

import statistics

import functools
import json
import os
import time

import numpy as np

BASELINE_GCUPS = 100.0


def main():
    import jax
    import jax.numpy as jnp

    from seqalib_tpu import ScoringParams
    from seqalib_tpu.ops.strip_pallas import (
        LANES,
        TI,
        _ceil_to,
        _strip_fill,
        _strip_local_fused,
    )
    from seqalib_tpu.parallel.dispatch import sentinel_table

    B = int(os.environ.get("BENCH_B", "512"))
    L = int(os.environ.get("BENCH_L", "1024"))
    BSUB = int(os.environ.get("BENCH_BSUB", "128"))
    BSUB = min(BSUB, B)
    B = -(-B // BSUB) * BSUB  # pad to a BSUB multiple: all grid work is real
    reps = int(os.environ.get("BENCH_REPS", "9"))
    X1 = int(os.environ.get("BENCH_X1", "8"))
    X2 = int(os.environ.get("BENCH_X2", "32"))
    # start+end (default): the fused two-pass coords pipeline (end-only
    # fill + reverse-extension rescan).  end: the bare end-only fill.
    want_starts = os.environ.get("BENCH_STARTS", "1") == "1"

    sp = ScoringParams.blosum62()
    rng = np.random.default_rng(0)
    table_h = sentinel_table(sp)
    A1 = int(table_h.shape[0])
    q = rng.integers(0, 20, size=(B, L)).astype(np.int32)
    t = rng.integers(0, 20, size=(B, L)).astype(np.int32)
    n_pad = _ceil_to(L, TI)
    W2 = (_ceil_to(L, LANES) // LANES + 2) * LANES
    qpad = np.full((B, n_pad), A1, np.int32)
    qpad[:, :L] = q
    t2 = np.full((B, W2), A1 + 1, np.int32)
    t2[:, 1 : 1 + L] = t
    args = (
        jnp.asarray(qpad),
        jnp.asarray(t2),
        jnp.asarray(np.full(B, L, np.int32)),
        jnp.asarray(np.full(B, L, np.int32)),
        jnp.asarray(table_h),
    )
    kw = dict(
        BSUB=BSUB,
        mq=L,
        match=int(table_h[0, 0]),
        mismatch=int(table_h[0, 1]),
        gap_open=sp.gap_open,
        gap_extend=sp.gap_extend,
        affine=True,
        profile=True,
        packed=bool(table_h.min() >= -4 and table_h.max() <= 11),
        A1=A1,
        dt16=False,
        interpret=jax.devices()[0].platform != "tpu",
    )

    coords_label = "start+end(2pass)"
    if want_starts:
        from seqalib_tpu.ops.strip_pallas import fused_pass2_knobs, fused_wr

        fill = functools.partial(
            _strip_local_fused,
            **kw,
            WR=fused_wr(),
            **fused_pass2_knobs(kw["interpret"]),
        )
        acc_of = lambda out: out["score"].sum() + out["qs"].sum() + out["ts"].sum()
        # parity gate on the timed kernel: the fused pass-2 window must
        # hold (escalation would fall to the slower host path and the
        # measured number would not be the shipped number).  A crashed
        # bench records NOTHING, so degrade rather than die: a rare
        # escalation is labeled into the metric; a broken fused path
        # falls back to the end-only fill metric.
        try:
            chk = jax.jit(fill)(*args)
            sc = np.asarray(chk["score"])
            # same guard as strip_bucket: score<=0 pairs never ran pass 2
            n_esc = int(((np.asarray(chk["score2"]) != sc) & (sc > 0)).sum())
            if n_esc:
                import sys

                print(
                    f"WARNING: {n_esc}/{B} pairs escalated past the fused "
                    "window; per the headline policy (BASELINE.md) this "
                    "run is NOT a headline candidate",
                    file=sys.stderr,
                )
                # escalated runs are invalid headline runs, full stop
                # (BASELINE.md policy): the metric is printed (the driver
                # must record SOMETHING) but marked invalid
                coords_label = (
                    f"start+end(2pass,{n_esc}esc,INVALID-HEADLINE)"
                )
            assert n_esc <= max(2, B // 50), (
                f"{n_esc} pairs escalated past the fused window"
            )
        except Exception as exc:  # noqa: BLE001 - record SOMETHING
            import sys

            print(
                f"WARNING: fused coords path failed ({exc!r}); falling "
                "back to the end-only fill metric",
                file=sys.stderr,
            )
            want_starts = False
    if not want_starts:
        coords_label = "end"
        fill = functools.partial(_strip_fill, **kw)
        acc_of = lambda out: out["bv"].sum()

    def chain(X):
        # lax.scan, not an unrolled Python loop: the X=32 unrolled chain
        # inlines 32 copies of the whole pipeline and takes tens of minutes
        # to compile through the tunnel per program variant; the scan body
        # compiles once and the carry keeps the X launches sequential
        # (distinct rolled inputs per step so nothing is CSE'd)
        @jax.jit
        def many(q0):
            def step(carry, _):
                acc, qq = carry
                acc = acc + acc_of(fill(qq, *args[1:]))
                return (acc, jnp.roll(qq, 1, axis=0)), None

            (acc, _), _ = jax.lax.scan(
                step, (jnp.int32(0), q0), None, length=X
            )
            return acc

        return many

    c1, c2 = chain(X1), chain(X2)
    trace_dir = os.environ.get("BENCH_TRACE")
    if trace_dir:
        # profiler wrap (SURVEY.md §5 tracing): one short traced chain.
        # Reuses c1 so the X1 program compiles once, not twice (remote
        # chain compiles are expensive).
        import jax.profiler

        int(c1(args[0]))  # compile OUTSIDE the trace window
        with jax.profiler.trace(trace_dir):
            int(c1(args[0]))

    # interleaved per-rep marginals: medianing t1 and t2 SEPARATELY let
    # tunnel drift between the two sampling batches bias the difference
    # (observed 41-51 GCUPS across identical runs); a back-to-back
    # (t1_i, t2_i) pair sees the same tunnel state, and the median of
    # per-pair marginals is robust to spikes
    int(c1(args[0]))
    int(c2(args[0]))  # compile + sync both
    margs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        int(c1(args[0]))  # int() forces a true device sync
        t1 = time.perf_counter()
        int(c2(args[0]))
        t2_ = time.perf_counter()
        margs.append(((t2_ - t1) - (t1 - t0)) / (X2 - X1))
    per_call = statistics.median(margs)
    gcups = B * L * L / per_call / 1e9
    print(
        json.dumps(
            {
                "metric": f"GCUPS/chip sw-affine-blosum62-{L}x{L} B={B} "
                f"BSUB={kw['BSUB']} "  # effective (clamped to B) kernel batch
                f"coords={coords_label} "
                f"({jax.devices()[0].platform})",
                "value": round(gcups, 3),
                "unit": "GCUPS",
                "vs_baseline": round(gcups / BASELINE_GCUPS, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
