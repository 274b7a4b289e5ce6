"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding logic is
validated on fake CPU devices via ``--xla_force_host_platform_device_count``
(same pattern as the driver's ``dryrun_multichip`` check).  These env vars
must be set before the first ``import jax`` anywhere in the test session.
"""

import os

# Force CPU: the ambient environment points JAX_PLATFORMS at the 'axon'
# TPU tunnel, which dispatches each op over the wire — tests must not
# use it.  (bench.py, by contrast, runs on the real chip.)
# Exception: SLAM_TPU_TESTS=1 keeps the real backend so the TPU-marked
# suite (tests/test_tpu.py — compiled Mosaic kernel parity) can run on
# hardware; remember the one-TPU-process-at-a-time rule.
_TPU_TESTS = bool(os.environ.get("SLAM_TPU_TESTS"))
if not _TPU_TESTS:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# the axon sitecustomize overrides the platform via jax.config at
# interpreter start; env vars alone do NOT stick.  Re-override before
# any backend initialises.
if not _TPU_TESTS:
    jax.config.update("jax_platforms", "cpu")

# XLA compiles are slow on this host (~0.5 s per tiny executable); the
# persistent cache makes re-runs cheap.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
