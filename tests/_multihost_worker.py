"""Worker process for tests/test_multihost.py (NOT a test module).

Runs one of two cooperating `jax.distributed` CPU processes: 4 local CPU
devices each, one global 8-device 'pairs' mesh spanning both.  Drives
align_batch through the sharded strip path so the REAL multi-process
branches execute: per-process feeding (dist.strip_sharded's
make_array_from_callback path) and the process_allgather in
dist.gather_to_host — the branch SURVEY.md §4.4's single-process fake
mesh can never reach (VERDICT round-4 item 5 / missing #3).

Usage: python _multihost_worker.py <process_id> <coordinator_port>
"""

import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
# the workers must agree on interpret-mode kernels; dev-walk off keeps
# the gmode pointer stream on the host path (exercises the P gather)
os.environ.pop("SEQALIB_STRIP_DEV_WALK", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=2,
    process_id=pid,
)
assert jax.process_count() == 2, jax.process_count()
assert jax.local_device_count() == 4, jax.local_device_count()
assert jax.device_count() == 8, jax.device_count()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from seqalib_tpu import ScoringParams, align_batch  # noqa: E402
from seqalib_tpu.oracle import align_oracle  # noqa: E402

mesh = jax.make_mesh((8,), ("pairs",))
sp = ScoringParams(match=2, mismatch=-3, gap_open=-5, gap_extend=-2)
# both processes seed identically: every host holds the full input (the
# feeding callback slices out each process's own shards)
rng = np.random.default_rng(123)
qs = [rng.integers(0, 4, size=rng.integers(40, 90)).astype(np.uint8)
      for _ in range(16)]
ts = [rng.integers(0, 4, size=rng.integers(40, 90)).astype(np.uint8)
      for _ in range(16)]

for mode in ("local", "global"):
    res = align_batch(
        qs, ts, scoring=sp, mode=mode, backend="pallas", mesh=mesh,
        traceback=True,
    )
    for b in range(16):
        ref = align_oracle(qs[b], ts[b], sp, mode=mode)
        assert str(res[b]) == str(ref), (pid, mode, b, res[b], ref)

# the sharded fill+DEVICE-walk program (strip_fill_walk_global) across a
# real process boundary: op matrices — not pointer streams — ride the
# process_allgather (the round-5 "CIGARs gathered via collectives" path)
os.environ["SEQALIB_STRIP_DEV_WALK"] = "1"
res = align_batch(
    qs, ts, scoring=sp, mode="global", backend="pallas", mesh=mesh,
    traceback=True,
)
for b in range(16):
    ref = align_oracle(qs[b], ts[b], sp, mode="global")
    assert str(res[b]) == str(ref), (pid, "global-devwalk", b, res[b], ref)

print(f"MULTIHOST-OK p{pid}", flush=True)
