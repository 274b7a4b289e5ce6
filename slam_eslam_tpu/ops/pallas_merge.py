"""Pallas TPU kernel: per-particle MLS block merge.

The widest fan-out of the mapping path is merging one scan cloud into
every particle's active grid (``EmbodiedSlamFilter.cpp:179-232``; our
fused equivalent ``mapping.map_pool.merge_cloud_all``).  The XLA
formulation gathers + scatters N*P*K scalars across the block pool —
measured ~0.5 us/entry on v5e (``tools/bench_pool_ops.py``), ~130 ms
per mapping frame at 4096 particles, 40x above the pool-copy floor.

This kernel re-shapes the problem from random access to streaming:

* grid = one step per particle; the particle's ACTIVE block
  (``[nx, ny*K]``, ~26 KB/field) is DMA'd HBM->VMEM by the Pallas
  pipeline using a **scalar-prefetched block id** as the index map
  (``PrefetchScalarGridSpec``) and written back in place
  (``input_output_aliases``) — traffic = touched blocks only,
* the P scan points accumulate into per-cell inverse-variance sums
  with two tiny **MXU one-hot matmuls** (no scatter at all):
  ``acc[x, y] = (OX * w) @ OY^T``,
* cell sums expand to patch-slot lanes with a constant selector
  matmul, and the envire slot rules (fuse within thickness / extend
  within gap / insert-or-evict — ``mls_grid.fuse_slot_rows``) run
  vectorised on the whole block with masked lane-group reductions.

Requires unique active blocks (``ensure_unique_active`` first) so the
per-particle grid steps write disjoint blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.0e38


def _group_min(x, k, lane):
    """Min over each K-adjacent-lane group, broadcast back to all lanes
    of the group.  ``lane`` = slot-id iota (lane % K)."""
    out = x
    n = x.shape[-1]
    for s in range(1, k):
        # pltpu.roll has jnp.roll semantics: roll(x, s)[l] = x[l-s],
        # so "lane l <- x[l+s]" needs shift n-s (this was swapped
        # until round 3 — the group reductions mixed NEIGHBOURING
        # cells' slots whenever a cell held existing patches; caught
        # by tests/test_tpu.py::TestCompiledMerge on a half-full pool)
        fwd = pltpu.roll(x, shift=n - s, axis=1)    # lane l <- x[l+s]
        bwd = pltpu.roll(x, shift=s, axis=1)        # lane l <- x[l-s]
        out = jnp.minimum(out, jnp.where(lane + s < k, fwd, _BIG))
        out = jnp.minimum(out, jnp.where(lane - s >= 0, bwd, _BIG))
    return out


def _group_sum(x, k, lane):
    out = x
    n = x.shape[-1]
    for s in range(1, k):
        fwd = pltpu.roll(x, shift=n - s, axis=1)    # lane l <- x[l+s]
        bwd = pltpu.roll(x, shift=s, axis=1)        # lane l <- x[l-s]
        out = out + jnp.where(lane + s < k, fwd, 0.0)
        out = out + jnp.where(lane - s >= 0, bwd, 0.0)
    return out


def _merge_body(update_idx, lx_row, lyt_col, w_row, wz_row,
                mean, stdev, height, meta,
                *, nx, ny, k, patch_thickness, gap_size):
    """The merge math on one in-VMEM block image (f32 [nx, ny*K] float
    fields + packed int32 meta): accumulate the P points into per-cell
    inverse-variance sums and apply the envire slot rules.  Shared by
    the kernel operand layout variants (separate-field / packed).

    ``lx_row/w_row/wz_row`` are ``[1, P]`` rows, ``lyt_col`` a ``[P, 1]``
    column.  Returns the updated (mean, stdev, height, meta) images.
    """
    nyk = ny * k

    # ---- accumulate the P points into per-cell (w, w*z) sums,
    # expanded to the K slot lanes, in ONE MXU dot ---------------------
    # The y-side one-hot targets the EXPANDED lane axis directly
    # (oyt_e[pt, l] = ly[pt] == l // K) and the w / w*z rows stack on
    # sublanes, so accumulation + cell->lane expansion is a single
    # [2*nx, P] @ [P, ny*K] matmul — round-3 measured ~2.5x less MXU
    # time than the original acc-then-expand pair of dot chains.
    lx = lx_row                                      # [1, P] int32
    w = w_row                                        # [1, P] f32
    wz = wz_row
    p = lx.shape[-1]
    iota_x = jax.lax.broadcasted_iota(jnp.int32, (nx, p), 0)
    ox = (jnp.broadcast_to(lx, (nx, p)) == iota_x).astype(jnp.float32)
    oxw = ox * jnp.broadcast_to(w, (nx, p))
    oxwz = ox * jnp.broadcast_to(wz, (nx, p))

    ly = lyt_col                                     # [P, 1] int32
    iota_ye = jax.lax.broadcasted_iota(jnp.int32, (p, nyk), 1) // k
    oyt_e = (jnp.broadcast_to(ly, (p, nyk)) == iota_ye).astype(
        jnp.float32
    )

    # value-carrying MXU dots must be exact f32: the default
    # single-pass dot rounds f32 operands to bf16 (the one-hot side is
    # exact, but w/wz are not) — map content would drift from the XLA
    # path on every merge.  HIGHEST = multi-pass f32 decomposition.
    exact = jax.lax.Precision.HIGHEST
    stacked = jnp.concatenate([oxw, oxwz], axis=0)   # [2*nx, P]
    acc = jnp.dot(stacked, oyt_e, preferred_element_type=jnp.float32,
                  precision=exact)                   # [2*nx, ny*K]
    acc_w = jax.lax.slice(acc, (0, 0), (nx, nyk))
    acc_wz = jax.lax.slice(acc, (nx, 0), (2 * nx, nyk))

    has = acc_w > 0.0                                # [nx, ny*K]
    z = acc_wz / jnp.maximum(acc_w, 1e-30)
    var = 1.0 / jnp.maximum(acc_w, 1e-30)

    # ---- envire slot rules on the whole block (fuse_slot_rows) ------
    valid = (meta & 1) != 0
    horiz = (meta & 2) != 0
    lane = jax.lax.broadcasted_iota(jnp.int32, (nx, nyk), 1) % k

    dist = jnp.abs(mean - z)
    fuse_cand = valid & horiz & (dist <= patch_thickness)
    fdist = jnp.where(fuse_cand, dist, _BIG)
    gap_cand = valid & (dist <= gap_size)
    gdist = jnp.where(gap_cand, dist, _BIG)
    neg_std = jnp.where(valid, -stdev, _BIG)

    # the ~2 us/step body cost is Mosaic per-op overhead on small
    # [nx, ny*K] tiles, not VPU throughput (probe_merge_overhead:
    # passthrough copy 1.0 us vs full body 2.9 us) — so the seven
    # group-min and three group-sum passes run as THREE passes over
    # sublane-stacked images (rolls act on the lane axis only; the
    # math per rule is unchanged)
    lanef = lane.astype(jnp.float32)

    # pass 1: per-group minima of the three rule metrics
    # (a) Kalman fusion with nearest horizontal patch within thickness
    # (b) vertical extension within gap
    # (c) eviction candidate: max stdev = min(-stdev)
    g1 = _group_min(
        jnp.concatenate([fdist, gdist, neg_std], axis=0), k,
        jnp.concatenate([lane] * 3, axis=0),
    )
    gmin_f = jax.lax.slice(g1, (0, 0), (nx, nyk))
    gmin_g = jax.lax.slice(g1, (nx, 0), (2 * nx, nyk))
    gmin_ns = jax.lax.slice(g1, (2 * nx, 0), (3 * nx, nyk))
    can_fuse = gmin_f < _BIG / 2
    can_gap = (gmin_g < _BIG / 2) & ~can_fuse

    # pass 2: argmin slot per rule + first free slot
    g2 = _group_min(
        jnp.concatenate([
            jnp.where(fuse_cand & (fdist <= gmin_f), lanef, float(k)),
            jnp.where(gap_cand & (gdist <= gmin_g), lanef, float(k)),
            jnp.where(valid & (neg_std <= gmin_ns), lanef, float(k)),
            jnp.where(~valid, lanef, float(k)),
        ], axis=0), k, jnp.concatenate([lane] * 4, axis=0),
    )
    fslot = jax.lax.slice(g2, (0, 0), (nx, nyk))
    gslot = jax.lax.slice(g2, (nx, 0), (2 * nx, nyk))
    eslot = jax.lax.slice(g2, (2 * nx, 0), (3 * nx, nyk))
    free_slot = jax.lax.slice(g2, (3 * nx, 0), (4 * nx, nyk))
    has_free = free_slot < k
    ins_slot = jnp.where(has_free, free_slot, eslot)

    slot = jnp.where(can_fuse, fslot, jnp.where(can_gap, gslot, ins_slot))
    chosen = (lanef == slot) & has

    # pass 3: broadcast the chosen slot's fields to its group
    g3 = _group_sum(
        jnp.where(jnp.concatenate([chosen] * 3, axis=0),
                  jnp.concatenate([mean, stdev, height], axis=0), 0.0),
        k, jnp.concatenate([lane] * 3, axis=0),
    )
    m0 = jax.lax.slice(g3, (0, 0), (nx, nyk))
    s0 = jax.lax.slice(g3, (nx, 0), (2 * nx, nyk))
    h0 = jax.lax.slice(g3, (2 * nx, 0), (3 * nx, nyk))

    w1 = 1.0 / jnp.maximum(s0 * s0, 1e-12)
    w2 = 1.0 / jnp.maximum(var, 1e-12)
    fuse_mean = (m0 * w1 + z * w2) / (w1 + w2)
    fuse_stdev = jax.lax.sqrt(1.0 / (w1 + w2))
    top = jnp.maximum(m0, z)
    bottom = jnp.minimum(m0 - h0, z)
    sq_var = jax.lax.sqrt(var)
    new_mean = jnp.where(can_fuse, fuse_mean,
                         jnp.where(can_gap, top, z))
    new_stdev = jnp.where(
        can_fuse, fuse_stdev,
        jnp.where(can_gap, jnp.minimum(s0, sq_var), sq_var),
    )
    new_height = jnp.where(can_fuse, h0,
                           jnp.where(can_gap, top - bottom, 0.0))
    new_horiz = jnp.where(can_fuse | ~can_gap, 1, 0)

    upd = chosen
    # written slots: valid=1, horizontal=branch, update_idx=stamp
    new_meta = 1 | (new_horiz << 1) | (update_idx << 2)
    return (
        jnp.where(upd, new_mean, mean),
        jnp.where(upd, new_stdev, stdev),
        jnp.where(upd, new_height, height),
        jnp.where(upd, new_meta, meta),
    )


def _merge_kernel(blk_ref, par_ref, lx_ref, lyt_ref, w_ref, wz_ref,
                  mean_in, stdev_in, height_in, meta_in,
                  mean_out, stdev_out, height_out, meta_out,
                  *, nx, ny, k, patch_thickness, gap_size):
    del blk_ref  # consumed by the index maps
    # float fields may be stored bf16 — all math runs f32 in VMEM,
    # rounded once on the write-back
    nm, ns, nh, ng = _merge_body(
        par_ref[0], lx_ref[0], lyt_ref[0], w_ref[0], wz_ref[0],
        mean_in[0].astype(jnp.float32), stdev_in[0].astype(jnp.float32),
        height_in[0].astype(jnp.float32), meta_in[0],
        nx=nx, ny=ny, k=k, patch_thickness=patch_thickness,
        gap_size=gap_size,
    )
    ftype = mean_in.dtype
    mean_out[0] = nm.astype(ftype)
    stdev_out[0] = ns.astype(ftype)
    height_out[0] = nh.astype(ftype)
    meta_out[0] = ng


def _merge_kernel_grouped(blk_ref, par_ref, lxg_ref, lyt_ref, w_ref,
                          wz_ref, mean_hbm, stdev_hbm, height_hbm,
                          meta_hbm, mean_out, stdev_out, height_out,
                          meta_out, scr_m, scr_s, scr_h, scr_g,
                          sem_in, sem_out,
                          *, nx, ny, k, g, n_real, patch_thickness,
                          gap_size):
    """G particles' blocks per grid step via MANUAL DMA.

    The per-step cost of ``_merge_kernel`` is dominated by fixed
    per-op Mosaic overhead on the small ``[nx, ny*K]`` tiles (measured:
    passthrough copy 1.0 us vs full body 2.9 us/step —
    ``tools/probe_merge_overhead.py``).  Here the pool fields stay
    HBM-resident (``memory_space=ANY``, aliased 1:1 in->out) and the
    kernel DMAs the G scattered active blocks into one ``[G*nx, ny*K]``
    VMEM scratch image, runs the stacked ``_merge_body`` ONCE (the
    point one-hot goes global: x index ``lx + j*nx``, sentinel
    ``g*nx``), and DMAs the updated images back — per-op overhead
    amortises G-fold.  The padded tail (``i*g+j >= n_real``) skips both
    copies entirely, so duplicate pad block ids cannot race real
    writes.
    """
    i = pl.program_id(0)
    ngrid = pl.num_programs(0)
    ins = (mean_hbm, stdev_hbm, height_hbm, meta_hbm)
    outs = (mean_out, stdev_out, height_out, meta_out)
    scrs = (scr_m, scr_s, scr_h, scr_g)

    # 2-deep revolving pipeline over double-buffered scratch: groups at
    # consecutive steps touch DISJOINT blocks (unique actives), which
    # Mosaic's conservative aliased-operand pipelining cannot assume —
    # the per-block kernel's DMAs measure ~180 GB/s effective (BENCH.md
    # round 3); hand-rolled prefetch of group i+1 during group i's body
    # recovers the overlap.
    def in_copy(step, slot, j, f):
        return pltpu.make_async_copy(
            ins[f].at[blk_ref[step * g + j]],
            scrs[f].at[pl.ds((slot * g + j) * nx, nx)],
            sem_in.at[slot],
        )

    def out_copy(step, slot, j, f):
        return pltpu.make_async_copy(
            scrs[f].at[pl.ds((slot * g + j) * nx, nx)],
            outs[f].at[blk_ref[step * g + j]],
            sem_out.at[slot],
        )

    def move(copy_fn, step, slot, op):
        for j in range(g):
            @pl.when(step * g + j < n_real)
            def _(j=j):
                for f in range(4):
                    getattr(copy_fn(step, slot, j, f), op)()

    slot = jax.lax.rem(i, 2)
    nslot = jax.lax.rem(i + 1, 2)

    @pl.when(i == 0)
    def _prologue():
        move(in_copy, i, slot, "start")

    move(in_copy, i, slot, "wait")

    @pl.when(i + 1 < ngrid)
    def _prefetch_next():
        # the other buffer last held group i-1: drain its write-backs
        # before overwriting
        @pl.when(i >= 1)
        def _():
            move(out_copy, i - 1, nslot, "wait")
        move(in_copy, i + 1, nslot, "start")

    off = slot * g * nx
    ld = lambda ref: ref[pl.ds(off, g * nx), :]
    nm, ns, nh, ng = _merge_body(
        par_ref[0], lxg_ref[0], lyt_ref[0], w_ref[0], wz_ref[0],
        ld(scr_m).astype(jnp.float32), ld(scr_s).astype(jnp.float32),
        ld(scr_h).astype(jnp.float32), ld(scr_g),
        nx=g * nx, ny=ny, k=k, patch_thickness=patch_thickness,
        gap_size=gap_size,
    )
    ftype = scr_m.dtype
    scr_m[pl.ds(off, g * nx), :] = nm.astype(ftype)
    scr_s[pl.ds(off, g * nx), :] = ns.astype(ftype)
    scr_h[pl.ds(off, g * nx), :] = nh.astype(ftype)
    scr_g[pl.ds(off, g * nx), :] = ng
    move(out_copy, i, slot, "start")

    @pl.when(i == ngrid - 1)
    def _epilogue():
        @pl.when(i >= 1)
        def _():
            move(out_copy, i - 1, nslot, "wait")
        move(out_copy, i, slot, "wait")


def merge_blocks_grouped(mean, stdev, height, meta, blk,
                         lx, ly, w, wz, update_idx, *, k, group=8,
                         patch_thickness=0.1, gap_size=1.5,
                         interpret=False):
    """``merge_blocks`` processing ``group`` particles per grid step
    (see ``_merge_kernel_grouped``).  Same contract; bit-identical
    output (parity-tested)."""
    b, nx, nyk = mean.shape
    n, p = lx.shape
    ny = nyk // k
    # manual HBM-slice DMAs require the lane dim aligned to the (8,128)
    # tiling: Mosaic rejects "slice shape along dimension 2 must be
    # aligned to tiling (128)" otherwise.  The aligned production
    # geometries (ny*K = 128, 256, ...) qualify; callers fall back to
    # the per-block kernel for misaligned pools (merge_cloud_all).
    if not interpret and nyk % 128 != 0:
        raise ValueError(
            f"merge_blocks_grouped needs ny*K % 128 == 0 on TPU "
            f"(got {nyk}); use an aligned grid geometry or group=1"
        )
    g = max(1, min(group, n))
    npad = (n + g - 1) // g * g
    assert npad * 4 <= 768 * 1024, (
        f"merge_blocks_grouped: {npad} block ids exceed the SMEM "
        "scalar-prefetch budget; chunk the particle axis first"
    )
    ngrid = npad // g

    # pad to a group multiple; padded slots never copy in/out
    blk_p = jnp.pad(blk.astype(jnp.int32), (0, npad - n))
    pad_pts = ((0, npad - n), (0, 0))
    lx_p = jnp.pad(lx, pad_pts)
    ly_p = jnp.pad(ly, pad_pts)
    w_p = jnp.pad(w, pad_pts)
    wz_p = jnp.pad(wz, pad_pts)

    # global x indices on the stacked [G*nx, nyk] image; sentinel G*nx
    offs = (jnp.arange(g, dtype=jnp.int32) * nx)[None, :, None]
    lx3 = lx_p.reshape(ngrid, g, p)
    lxg = jnp.where(
        (lx3 >= 0) & (lx3 < nx), lx3 + offs, g * nx
    ).reshape(ngrid, 1, g * p)
    lyg = jnp.where(
        (ly_p >= 0) & (ly_p < ny), ly_p, ny
    ).reshape(ngrid, g * p, 1)
    wg = w_p.reshape(ngrid, 1, g * p).astype(jnp.float32)
    wzg = wz_p.reshape(ngrid, 1, g * p).astype(jnp.float32)
    params = jnp.asarray([update_idx], jnp.int32)

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    pt_spec = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda i, blk, par: (i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ngrid,),
        in_specs=[pt_spec((1, g * p)), pt_spec((g * p, 1)),
                  pt_spec((1, g * p)), pt_spec((1, g * p))]
        + [any_spec] * 4,
        out_specs=[any_spec] * 4,
        scratch_shapes=[
            pltpu.VMEM((2 * g * nx, nyk), mean.dtype),
            pltpu.VMEM((2 * g * nx, nyk), stdev.dtype),
            pltpu.VMEM((2 * g * nx, nyk), height.dtype),
            pltpu.VMEM((2 * g * nx, nyk), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    shapes = [jax.ShapeDtypeStruct(mean.shape, mean.dtype),
              jax.ShapeDtypeStruct(stdev.shape, stdev.dtype),
              jax.ShapeDtypeStruct(height.shape, height.dtype),
              jax.ShapeDtypeStruct(mean.shape, jnp.int32)]
    return pl.pallas_call(
        functools.partial(
            _merge_kernel_grouped, nx=nx, ny=ny, k=k, g=g, n_real=n,
            patch_thickness=patch_thickness, gap_size=gap_size,
        ),
        grid_spec=grid_spec,
        out_shape=shapes,
        input_output_aliases={6: 0, 7: 1, 8: 2, 9: 3},
        interpret=interpret,
    )(blk_p, params, lxg, lyg, wg, wzg, mean, stdev, height, meta)


def merge_blocks(mean, stdev, height, meta, blk,
                 lx, ly, w, wz, update_idx, *, k,
                 patch_thickness=0.1, gap_size=1.5, interpret=False):
    """Merge per-particle accumulated measurements into active blocks.

    ``mean/stdev/height``: pool float fields ``[B, nx, ny*K]`` (f32 or
    bf16 storage; math is f32 in VMEM), ``meta``: packed int32 flags
    (bit 0 valid, bit 1 horizontal, bits 2.. update_idx — see
    ``map_pool.pack_meta``).  ``blk [N]``: each particle's (unique)
    active block id.  ``lx, ly [N, P]`` int32 cell coords local to the
    block (out-of-range = masked), ``w, wz [N, P]`` inverse-variance
    weights / weighted z.  ``k``: patch slots per cell.
    ``update_idx``: int32 scalar stamp.  Returns the four updated
    fields; the inputs are donated (in-place on TPU).
    """
    b, nx, nyk = mean.shape
    n, p = lx.shape
    ny = nyk // k
    # blk rides in SMEM (scalar prefetch, ~1 MB budget); explicit guard
    # instead of an opaque Mosaic allocation failure.  Chunk the
    # particle axis (as chain_lookup_blocks does) if this ever fires.
    assert n * 4 <= 768 * 1024, (
        f"merge_blocks: {n} particles = {n * 4 / 1024:.0f} KB of "
        "scalar-prefetch block ids exceeds the SMEM budget; split the "
        "merge into particle chunks"
    )

    lx3 = jnp.where((lx >= 0) & (lx < nx), lx, nx)[:, None, :]
    ly3 = jnp.where((ly >= 0) & (ly < ny), ly, ny)[:, :, None]
    w3 = w[:, None, :].astype(jnp.float32)
    wz3 = wz[:, None, :].astype(jnp.float32)
    params = jnp.asarray([update_idx], jnp.int32)

    field_spec = pl.BlockSpec(
        (1, nx, nyk), lambda i, blk, par: (blk[i], 0, 0),
        memory_space=pltpu.VMEM,
    )
    pt_spec = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda i, blk, par: (i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n,),
        in_specs=[
            pt_spec((1, p)),            # lx
            pl.BlockSpec((1, p, 1), lambda i, blk, par: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # ly (transposed)
            pt_spec((1, p)),            # w
            pt_spec((1, p)),            # wz
            field_spec, field_spec, field_spec,   # mean, stdev, height
            field_spec,                           # packed meta
        ],
        out_specs=[field_spec] * 4,
    )
    shapes = [jax.ShapeDtypeStruct(mean.shape, mean.dtype)] * 3 + [
        jax.ShapeDtypeStruct(mean.shape, jnp.int32)
    ]
    out = pl.pallas_call(
        functools.partial(
            _merge_kernel, nx=nx, ny=ny, k=k,
            patch_thickness=patch_thickness, gap_size=gap_size,
        ),
        grid_spec=grid_spec,
        out_shape=shapes,
        # pool fields update in place: input operand order is
        # (2 scalar-prefetch) + (4 point arrays) + 4 fields -> inputs
        # 6..9 alias outputs 0..3
        input_output_aliases={6: 0, 7: 1, 8: 2, 9: 3},
        interpret=interpret,
    )(blk.astype(jnp.int32), params, lx3, ly3, w3, wz3,
      mean, stdev, height, meta)
    return out
