"""Test env: force a faked 8-device CPU mesh unless SEQALIB_TEST_TPU=1.

Must run before the first `import jax` anywhere in the test process
(SURVEY.md §4.4: multi-host-without-a-cluster technique).
"""

import os

if os.environ.get("SEQALIB_TEST_TPU", "0") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # A site-installed accelerator plugin may have already forced
    # jax_platforms via jax.config at interpreter startup (overriding the
    # env var); re-force CPU before any backend initializes.
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu_smoke: curated on-chip regression subset (<=8 tests, <=3 min "
        "through the tunnel): SEQALIB_TEST_TPU=1 pytest -m tpu_smoke",
    )
    config.addinivalue_line(
        "markers",
        "slow: contract-scale shapes (minutes on the CPU mesh); excluded "
        "from the default suite — run with `pytest -m slow`",
    )


def pytest_collection_modifyitems(config, items):
    """Enforce the `slow` marker's contract: slow tests run only under an
    explicit `-m` selection (e.g. `pytest -m slow`).  Without this hook the
    marker was documentation-only and plain `pytest` ran the multi-minute
    banded-SP 8kb/100kb shapes (ADVICE round-4)."""
    if config.getoption("-m"):
        return
    skip_slow = pytest.mark.skip(reason="slow: run with `pytest -m slow`")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches():
    """Drop compiled executables between modules: the CPU (LLVM JIT)
    backend segfaults in backend_compile_and_load once ~90 tests' worth of
    large interpret-mode kernel programs accumulate in one process."""
    yield
    import jax

    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def random_dna(rng, n):
    return rng.integers(0, 4, size=n).astype(np.uint8)


def random_protein(rng, n):
    # 0..19 = the 20 real residues; skip B/Z/X/* for realistic data
    return rng.integers(0, 20, size=n).astype(np.uint8)
