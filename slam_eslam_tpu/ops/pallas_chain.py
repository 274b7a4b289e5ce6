"""Pallas TPU kernel: per-particle map-chain lookup.

Per-particle SLAM's measurement update queries each particle's grid
CHAIN (head first, ``MLSMap::getPatch`` semantics) at its C contact
points — N*C*L random cell gathers into the block pool, which XLA
lowers at ~0.5 us per gathered scalar (``tools/bench_pool_ops.py``):
~24 ms per measurement frame at 4096 particles, the dominant cost of
the measurement branch once merges run in the block-merge kernel.

Same cure as ``pallas_merge``: stream, don't gather.  Grid = one step
per particle; the Pallas pipeline DMAs the particle's L chain blocks
(``[nx, ny*K]`` each, mean/stdev/valid) HBM->VMEM via
scalar-prefetched index maps, and the C queries resolve in VMEM:

* per level, a one-hot MXU matmul (queries on sublanes — the index
  columns arrive host-transposed as ``[C, 1]``) gathers the queried
  cells' slot rows,
* the z-window slot selection and head-first first-hit combine run as
  masked lane reductions.

Traffic = touched chain blocks only; no scatter/gather anywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.0e38


def _chain_kernel(chain_ref, lxy_ref, z_ref, *refs, nx, ny, k,
                  levels, z_window):
    # chain_ref is FLAT [N*L] int32: a rank-2 [N, L] scalar-prefetch
    # operand is lane-padded to [N, 128] in SMEM (2 MB at N=4096 —
    # over the 1 MB SMEM budget); the flat layout stays N*L words
    out_ref = refs[-1]
    field_refs = refs[:-1]                 # mean_0, std_0, val_0, mean_1..
    i = pl.program_id(0)
    nyk = ny * k
    nq = z_ref.shape[1]

    lxy_all = lxy_ref[0]                   # [L*C, 1] int32
    z = z_ref[0]                           # [C, 1] f32

    lane = jax.lax.broadcasted_iota(jnp.int32, (nq, nyk), 1)
    grp = lane // k
    iota_x = jax.lax.broadcasted_iota(jnp.int32, (nq, nx), 1)

    found = jnp.zeros((nq, 1), jnp.float32)
    mean = jnp.zeros((nq, 1), jnp.float32)
    stdev = jnp.zeros((nq, 1), jnp.float32)

    for l in range(levels):
        lcol = jax.lax.slice(lxy_all, (l * nq, 0), ((l + 1) * nq, 1))
        ok_q = lcol < nx * ny              # in-bounds query, this level
        lx = lcol // ny
        ly = lcol - lx * ny
        oh = (jnp.broadcast_to(lx, (nq, nx)) == iota_x).astype(
            jnp.float32
        )
        # float fields may be bf16 storage; meta is the packed int32
        # flag word (bit 0 = valid)
        m_blk = field_refs[3 * l][0].astype(jnp.float32)  # [nx, ny*K]
        s_blk = field_refs[3 * l + 1][0].astype(jnp.float32)
        v_blk = (field_refs[3 * l + 2][0] & 1).astype(jnp.float32)
        # value-carrying one-hot gathers need EXACT f32: the MXU's
        # default single-pass dot rounds f32 operands to bf16, which
        # flips z-window boundary cases vs the XLA gather (seen as
        # ~1e-4 found-rate parity drift on the compiled backend).
        # HIGHEST = 6-pass f32 decomposition = bitwise-exact row pick.
        exact = jax.lax.Precision.HIGHEST
        rows_m = jnp.dot(oh, m_blk, preferred_element_type=jnp.float32,
                         precision=exact)
        rows_s = jnp.dot(oh, s_blk, preferred_element_type=jnp.float32,
                         precision=exact)
        rows_v = jnp.dot(oh, v_blk, preferred_element_type=jnp.float32)

        dist = jnp.abs(rows_m - jnp.broadcast_to(z, (nq, nyk)))
        cand = (
            (grp == jnp.broadcast_to(ly, (nq, nyk)))
            & (rows_v > 0.5)
            & (dist <= z_window)
            & jnp.broadcast_to(ok_q, (nq, nyk))
        )
        dist_inf = jnp.where(cand, dist, _BIG)
        mind = jnp.min(dist_inf, axis=1, keepdims=True)
        score = jnp.where(cand & (dist_inf <= mind),
                          lane.astype(jnp.float32), _BIG)
        best = jnp.min(score, axis=1, keepdims=True)      # [C, 1]
        bm = lane.astype(jnp.float32) == jnp.broadcast_to(
            best, (nq, nyk)
        )
        m_l = jnp.sum(jnp.where(bm, rows_m, 0.0), axis=1, keepdims=True)
        s_l = jnp.sum(jnp.where(bm, rows_s, 0.0), axis=1, keepdims=True)
        f_l = (best < _BIG / 2).astype(jnp.float32)
        # chain entry may be empty (-1): the whole level is void then
        ch_ok = (chain_ref[i * levels + l] >= 0).astype(jnp.float32)
        use = f_l * ch_ok * (1.0 - found)
        mean = mean + use * m_l
        stdev = stdev + use * s_l
        found = jnp.maximum(found, use)

    out_ref[0] = jnp.concatenate([found, mean, stdev], axis=1)


def chain_lookup_blocks(mean, stdev, meta, chain, origin, resolution,
                        points, *, k, z_window=3.0, interpret=False,
                        chunk_particles=None):
    """Batched chain lookup over the block pool.

    ``mean/stdev``: pool float fields ``[B, nx, ny*K]`` (f32 or bf16
    storage), ``meta``: packed int32 flags (bit 0 = valid; see
    ``map_pool.pack_meta``).  ``chain [N, L]`` int32 (head first, -1 =
    empty), ``origin [B, 2]``, ``points [N, C, 3]`` world coordinates.
    Returns ``(found [N, C] bool, mean [N, C], stdev [N, C])``.
    """
    b, nx, nyk = mean.shape
    n, levels = chain.shape
    nq_in = points.shape[1]
    ny = nyk // k

    # the flat [N*L] chain rides in SMEM as a scalar-prefetch operand;
    # SMEM is ~1 MB, so big particle counts must chunk the grid (the
    # 100k-particle configuration hits 1.2 MB).  Budget 512 KB ->
    # 131072 int32 words; chunks run sequentially via lax.map (one
    # compiled body).
    max_n = (chunk_particles if chunk_particles
             else max(8, (131072 // levels) // 8 * 8))
    if n > max_n:
        c = max_n
        npad = (-n) % c
        chain_p = jnp.pad(chain, ((0, npad), (0, 0)),
                          constant_values=-1)
        pts_p = jnp.pad(points, ((0, npad), (0, 0), (0, 0)))
        nch = (n + npad) // c
        f, m, s = jax.lax.map(
            lambda args: chain_lookup_blocks(
                mean, stdev, meta, args[0], origin, resolution,
                args[1], k=k, z_window=z_window, interpret=interpret,
                chunk_particles=chunk_particles,
            ),
            (chain_p.reshape(nch, c, levels),
             pts_p.reshape(nch, c, nq_in, 3)),
        )
        flat = lambda a: a.reshape((nch * c,) + a.shape[2:])[:n]
        return flat(f), flat(m), flat(s)
    # pad the query count to a sublane multiple: the kernel slices the
    # [L*C, 1] index column per level at offset l*C, which must land on
    # a sublane (8) boundary for Mosaic
    nq = ((nq_in + 7) // 8) * 8
    if nq != nq_in:
        points = jnp.pad(points, ((0, 0), (0, nq - nq_in), (0, 0)))

    # per-level block-local cell ids (host side; tiny [N, L, C] arrays)
    ch = jnp.maximum(chain, 0)
    org = origin[ch]                                   # [N, L, 2]
    rel = (points[:, None, :, :2] - org[:, :, None, :]) / resolution
    ix = jnp.floor(rel[..., 0]).astype(jnp.int32)
    iy = jnp.floor(rel[..., 1]).astype(jnp.int32)
    inb = (ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny)
    if nq != nq_in:  # padded query slots always miss
        inb = inb & (jnp.arange(nq) < nq_in)
    lxy = jnp.where(inb, ix * ny + iy, nx * ny)        # [N, L, C]
    # queries ride sublanes in-kernel: host-transpose to [N, L*C, 1]
    lxy_t = lxy.reshape(n, levels * nq)[..., None]
    z_t = points[..., 2][..., None]                    # [N, C, 1]

    field_spec = lambda l: pl.BlockSpec(
        (1, nx, nyk),
        lambda i, ch, l=l: (jnp.maximum(ch[i * levels + l], 0), 0, 0),
        memory_space=pltpu.VMEM,
    )
    in_specs = [
        pl.BlockSpec((1, levels * nq, 1), lambda i, ch: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nq, 1), lambda i, ch: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    for l in range(levels):
        in_specs += [field_spec(l)] * 3
    fields = []
    for l in range(levels):
        fields += [mean, stdev, meta]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, nq, 3), lambda i, ch: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(
            _chain_kernel, nx=nx, ny=ny, k=k, levels=levels,
            z_window=z_window,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, nq, 3), jnp.float32),
        interpret=interpret,
    )(chain.reshape(-1).astype(jnp.int32), lxy_t, z_t, *fields)
    out = out[:, :nq_in]
    return out[..., 0] > 0.5, out[..., 1], out[..., 2]
