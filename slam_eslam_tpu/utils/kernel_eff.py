"""Per-kernel efficiency measurements for the bench JSON.

Round-4 verdict: the abstract ``sol_fraction`` models the weighting
step as an ideal streaming gather the fold algorithm cannot approach
(the fold kernel trades gathers for one-hot MXU MACs), so the bench
JSON reported "4% of an unreachable ideal" while the decision-relevant
numbers lived in prose.  This module measures each hot kernel against
ITS OWN roofline:

* ``fold_mfu`` — the contact-fold window kernel's achieved MXU
  utilisation (model FLOPs / measured time / chip peak) at a given
  window tier, standalone on real operand shapes;
* ``merge_floor_fraction`` — the block-merge kernel's time vs an
  empirical DMA floor: the SAME grid spec, block indexing, aliasing
  and operands with a passthrough body (copy-only), so the fraction
  isolates what the slot-rule body costs on top of unavoidable DMAs.

Both skip gracefully (return ``None``) off-TPU — interpret-mode
timings would be meaningless.
"""

from __future__ import annotations

import time


def _tpu_backend():
    import jax

    return jax.default_backend() == "tpu"


def _slope_time(fn, x0, iters, repeats):
    """Per-application seconds of ``x -> fn(x)`` via two chained-scan
    lengths: ``(t(4*iters) - t(iters)) / (3*iters)`` cancels the
    constant per-dispatch overhead exactly (one tunnel dispatch here
    costs ~20-35 ms — at small chain lengths it dominates the
    measurement; round-5 find)."""
    import jax

    def timed(length):
        run = jax.jit(lambda x: jax.lax.scan(
            lambda c, _: (fn(c), None), x, None, length=length)[0])
        jax.block_until_ready(run(x0))
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            jax.block_until_ready(run(x0))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(4 * iters) - timed(iters)) / (3 * iters)


def fold_flops_per_particle(tier, k=4, cp=8):
    """Model FLOPs/particle of ``_fused_select_contact_kernel`` at
    window ``tier = (twx, twy)``: per contact row (``cp`` padded rows
    all do real matmuls), stage-1 ``[WC, WX] @ [WX, TP]`` plus stage-2
    ``[C2, WC] @ [WC, TP]`` one-hot dots — ``WC = twy*2k``,
    ``C2 = 2k`` — i.e. ``2 * cp * twy*2k * (twx + 2k)`` flops
    (2 flops/MAC).  The VPU epilogue (likelihood ratio, group sums) is
    negligible next to the MXU work and is not counted."""
    twx, twy = tier
    c2 = 2 * k
    return 2 * cp * (twy * c2) * (twx + c2)


def fold_mfu(packed, tier, n, tile=1024, iters=10, repeats=3,
             peak_tflops=197.0, n_seg=4):
    """Measured MXU utilisation of the contact-fold kernel at
    ``tier = (twx, twy)`` on ``n`` particles (C = 8 contact rows, the
    production contact grid).  Operands mirror the production fold
    branch: pre-transposed table slice, ``[C, N]`` in-window queries.
    Returns ``{"us": .., "mfu": .., "gflops": ..}`` or ``None``
    off-TPU."""
    if not _tpu_backend():
        return None
    import jax
    import jax.numpy as jnp

    from slam_eslam_tpu.ops import pallas_gather as pg

    twx, twy = tier
    c2 = packed.k * 2
    cp = 8
    if packed.data_t is not None:
        table_t = jax.lax.dynamic_slice(
            packed.data_t, (0, 0, 0), (twy, c2, twx)
        ).reshape(twy * c2, twx)
        table, shape = None, (twx, twy, c2)
    else:
        table = jax.lax.dynamic_slice(
            packed.data, (0, 0, 0), (twx, twy, c2))
        table_t, shape = None, None

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    lx = jax.random.randint(k1, (cp, n), 0, twx)
    ly = jax.random.randint(k2, (cp, n), 0, twy)
    z = jax.random.normal(k3, (cp, n), jnp.float32) * 0.1
    av = jnp.ones((cp, n), jnp.float32)
    mv = jnp.full((1, n), 0.09, jnp.float32)
    act = jnp.ones((cp, 1), jnp.float32)
    seg = jnp.arange(cp, dtype=jnp.int32) % n_seg
    soh = (seg[:, None] == jnp.arange(n_seg)[None, :]).astype(
        jnp.float32)

    def one(z):
        out = pg.window_select_contact(
            table, lx, ly, z, av, mv, act, soh,
            correction=1.0, tile=tile, interpret=False,
            table_t=table_t, shape=shape,
        )
        # serialise the chain through a data dependency
        return z + 0.0 * out[0:1, :]

    t = _slope_time(one, z, iters, repeats)
    # padded particle tiles do real work; count them
    tp = max(128, tile // 128 * 128)
    n_pad = (n + tp - 1) // tp * tp
    flops = fold_flops_per_particle(tier, k=packed.k, cp=cp) * n_pad
    return {
        "us": t * 1e6,
        "gflops": flops / 1e9,
        "mfu": flops / t / (peak_tflops * 1e12),
    }


def merge_floor_fraction(n=4096, p=64, nx=40, ny=32, k=4, iters=20,
                         repeats=3):
    """Block-merge kernel vs its empirical DMA floor.

    Builds a synthetic pool at the compacted lane-aligned geometry
    (``ny*k = 128`` lanes), runs the production ``merge_blocks`` and a
    passthrough-body twin with the SAME PrefetchScalarGridSpec, block
    indexing, aliasing and operand set (the ``copy_all`` variant of
    ``tools/probe_merge_overhead.py``), and reports
    ``floor_fraction = t_copy / t_merge`` — the fraction of the merge
    kernel's time that is unavoidable DMA traffic.  Also reports the
    achieved copy bandwidth vs the 8 field images it moves.  ``None``
    off-TPU."""
    if not _tpu_backend():
        return None
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from slam_eslam_tpu.ops import pallas_merge

    nyk = ny * k
    b = n + 64
    rng = np.random.default_rng(0)
    mean = jnp.asarray(rng.normal(size=(b, nx, nyk)).astype(np.float32))
    stdev = jnp.asarray(
        rng.uniform(0.05, 0.3, size=(b, nx, nyk)).astype(np.float32))
    height = jnp.zeros((b, nx, nyk), jnp.float32)
    meta = jnp.asarray(
        (rng.random(size=(b, nx, nyk)) < 0.5).astype(np.int32))
    blk = jnp.asarray(rng.permutation(b)[:n].astype(np.int32))
    lx = jnp.asarray(rng.integers(0, nx, size=(n, p)).astype(np.int32))
    ly = jnp.asarray(rng.integers(0, ny, size=(n, p)).astype(np.int32))
    w = jnp.asarray(rng.uniform(1.0, 50.0, size=(n, p)).astype(
        np.float32))
    wz = jnp.asarray(rng.normal(size=(n, p)).astype(np.float32))

    def merge(c):
        return tuple(pallas_merge.merge_blocks(
            *c, blk, lx, ly, w, wz, 3, k=k))

    t_merge = _slope_time(merge, (mean, stdev, height, meta), iters,
                          repeats)

    def _copy_all_kernel(blk_ref, par_ref, lx_ref, lyt_ref, w_ref,
                         wz_ref, mi, si, hi, gi, mo, so, ho, go):
        del blk_ref, par_ref, lyt_ref, wz_ref
        mo[0] = mi[0]
        so[0] = si[0]
        ho[0] = hi[0]
        # consume the point operands so their DMAs survive DCE
        go[0] = gi[0] + (lx_ref[0, 0, 0] * 0
                         + w_ref[0, 0, 0].astype(jnp.int32) * 0)

    field_spec = pl.BlockSpec(
        (1, nx, nyk), lambda i, blk, par: (blk[i], 0, 0),
        memory_space=pltpu.VMEM)
    pt_specs = [
        pl.BlockSpec((1, 1, p), lambda i, blk, par: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, p, 1), lambda i, blk, par: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, p), lambda i, blk, par: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, p), lambda i, blk, par: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(n,),
        in_specs=pt_specs + [field_spec] * 4,
        out_specs=[field_spec] * 4)
    aliases = {6 + j: j for j in range(4)}
    shapes = [jax.ShapeDtypeStruct((b, nx, nyk), jnp.float32)] * 3 + [
        jax.ShapeDtypeStruct((b, nx, nyk), jnp.int32)]
    params = jnp.asarray([3], jnp.int32)
    lx3, lyt3 = lx[:, None, :], ly[:, :, None]
    w3, wz3 = w[:, None, :], wz[:, None, :]
    copy_call = functools.partial(
        pl.pallas_call, _copy_all_kernel, grid_spec=grid_spec,
        out_shape=shapes, input_output_aliases=aliases)

    def copy_all(c):
        return tuple(copy_call()(blk, params, lx3, lyt3, w3, wz3, *c))

    t_copy = _slope_time(copy_all, (mean, stdev, height, meta), iters,
                         repeats)
    bytes_per_step = 8 * nx * nyk * 4 + 4 * p * 4
    return {
        "merge_us_per_block": t_merge / n * 1e6,
        "copy_us_per_block": t_copy / n * 1e6,
        "floor_fraction": t_copy / t_merge,
        "copy_gbps": bytes_per_step * n / t_copy / 1e9,
    }


def steady_state_tier(particles, contact_extent, resolution, tiers,
                      window):
    """The fold-window tier the auto lookup uses for a particle cloud:
    conservative query bbox = particle x/y extent + the contact rig's
    xy reach, in cells; the SMALLEST tier whose (twx, twy) strictly
    covers the span wins, else the full window.  Mirrors the bbox gate
    in ``pallas_gather.windowed_grid_lookup.fold_one_device``."""
    import numpy as np

    x = np.asarray(particles.x)
    y = np.asarray(particles.y)
    span_x = (x.max() - x.min() + 2 * contact_extent) / resolution
    span_y = (y.max() - y.min() + 2 * contact_extent) / resolution
    for (twx, twy) in sorted(tuple(tiers), key=lambda t: t[0] * t[1]):
        if span_x < twx and span_y < twy:
            return (twx, twy)
    return tuple(window) if not isinstance(window, int) else (
        window, window)
