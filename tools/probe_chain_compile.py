"""Probe: does ops.pallas_chain compile on this toolchain?

The chain-lookup kernel is interpret-verified but its Mosaic compile
hung the remote compile helper in round 2 (>15 min, no diagnostic).
This probe times the compile on small-but-realistic shapes so the
hang can be bisected kernel-variant by kernel-variant.

Usage: timeout 480 python tools/probe_chain_compile.py [variant]
  variant: full (default) | lev1 | static | norows
Exit code 0 = compiled + ran; the surrounding `timeout` catches hangs.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from slam_eslam_tpu.utils.cache import enable_persistent_cache
from slam_eslam_tpu.ops import pallas_chain

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "full"

enable_persistent_cache()

B, NX, NY, K = 16, 40, 40, 4
N, C = 128, 8
LEVELS = 1 if VARIANT == "lev1" else 4

rng = np.random.default_rng(0)
mean = jnp.asarray(rng.normal(size=(B, NX, NY * K)).astype(np.float32))
stdev = jnp.abs(mean) * 0.1 + 0.01
valid = jnp.asarray((rng.random((B, NX, NY * K)) < 0.5).astype(np.int32))
chain = jnp.asarray(
    rng.integers(0, B, size=(N, LEVELS)).astype(np.int32))
origin = jnp.asarray(rng.normal(size=(B, 2)).astype(np.float32))
points = jnp.asarray(rng.normal(size=(N, C, 3)).astype(np.float32))

fn = jax.jit(
    lambda m, s, v, ch, org, pts: pallas_chain.chain_lookup_blocks(
        m, s, v, ch, org, 0.05, pts, k=K, z_window=3.0))

print(f"variant={VARIANT} backend={jax.default_backend()} "
      f"devices={jax.devices()}", flush=True)
t0 = time.time()
lowered = fn.lower(mean, stdev, valid, chain, origin, points)
print(f"lowered in {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
compiled = lowered.compile()
print(f"COMPILED in {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
out = jax.block_until_ready(compiled(mean, stdev, valid, chain, origin,
                                     points))
print(f"ran in {time.time()-t0:.2f}s found={int(out[0].sum())}",
      flush=True)
