"""Parity + timing: Pallas chain-lookup kernel vs the XLA gather path,
on the real backend at production SLAM-bench shapes.

Usage: timeout 480 python tools/probe_chain_parity.py [N] [C]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from slam_eslam_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from slam_eslam_tpu.mapping import map_pool as mp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
C = int(sys.argv[2]) if len(sys.argv) > 2 else 8
B, NX, NY, K, L = N + 64, 40, 40, 4, 3
STEPS = 50

rng = np.random.default_rng(0)
zeros = jnp.zeros((B, NX, NY * K))
pool = mp.MapPool(
    mean=jnp.asarray(rng.normal(size=(B, NX, NY * K)).astype(np.float32)),
    stdev=jnp.asarray(
        (0.01 + 0.2 * rng.random((B, NX, NY * K))).astype(np.float32)),
    height=zeros,
    # packed meta: valid bit from a coin flip, horizontal bit set
    meta=jnp.asarray(
        ((rng.random((B, NX, NY * K)) < 0.5).astype(np.int32)) | 2),
    color=None,
    origin=jnp.asarray(
        (rng.normal(size=(B, 2)) * 2).astype(np.float32)),
    allocated=jnp.ones((B,), bool),
    chain=jnp.asarray(np.where(
        rng.random((N, L)) < 0.8,
        rng.integers(0, B, size=(N, L)), -1).astype(np.int32)),
    resolution=0.25,
    nx=NX, ny=NY, k=K,
)
pts = jnp.asarray(
    rng.normal(size=(STEPS, N, C, 3)).astype(np.float32) * 3.0)

# the pool travels as an ARGUMENT (as in production steps) — closing
# over it bakes ~100 MB of pool constants into the compile request and
# overflows the remote compile helper (HTTP 413)
def run_xla(p, points):
    lk = mp.make_chain_lookup(p, 3.0, kernel="xla")
    f, m, s, _ = jax.vmap(lk)(jnp.arange(N), points)
    return f, m, s


def run_pal(p, points):
    lk = mp.make_chain_lookup(p, 3.0, kernel="pallas")
    assert getattr(lk, "batched", False)
    f, m, s, _ = lk(jnp.arange(N), points)
    return f, m, s


def scan_over(fn):
    def run(p, all_pts):
        def body(acc, pts_i):
            f, m, _ = fn(p, pts_i)
            return acc + jnp.sum(jnp.where(f, m, 0.0)), None
        return jax.lax.scan(body, 0.0, all_pts)[0]
    return jax.jit(run)


# parity on step 0
f0 = jax.jit(run_xla)(pool, pts[0])
f1 = jax.jit(run_pal)(pool, pts[0])
nf0, nf1 = int(f0[0].sum()), int(f1[0].sum())
same_f = bool(jnp.array_equal(f0[0], f1[0]))
dm = float(jnp.max(jnp.abs(jnp.where(f0[0], f0[1] - f1[1], 0.0))))
ds = float(jnp.max(jnp.abs(jnp.where(f0[0], f0[2] - f1[2], 0.0))))
print(f"parity: found {nf0} vs {nf1} equal={same_f} "
      f"max|dmean|={dm:.2e} max|dstdev|={ds:.2e}", flush=True)

for name, fn in (("xla", run_xla), ("pallas", run_pal)):
    g = scan_over(fn)
    t0 = time.time()
    jax.block_until_ready(g(pool, pts))
    comp = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(g(pool, pts))
        best = min(best, time.time() - t0)
    print(f"{name}: {best / STEPS * 1e3:.3f} ms/frame "
          f"({N * C * STEPS / best / 1e6:.1f}M queries/s) "
          f"compile+first {comp:.1f}s", flush=True)
