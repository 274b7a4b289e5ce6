"""Pallas TPU kernel: windowed MLS patch gather via one-hot matmuls.

Why: the contact-weighting hot loop performs N*C random cell lookups
(2M at 100k particles).  XLA lowers them to an HBM gather whose
per-element latency dominates the whole filter step (~100 ms measured —
see ``tools/profile_step.py``).  During tracking the particle cloud is
compact, so the queries hit a small window of the grid.  This kernel:

1. holds the packed window (``[W, W, 2K]``, e.g. 64x64x8 f32 = 128 KB)
   entirely in VMEM,
2. per tile of T queries, expands the x-index into a one-hot ``[T, W]``
   and contracts it with the window on the **MXU** -> rows ``[T, W*2K]``,
3. selects the y-cell with a repeated one-hot mask on the VPU and
   collapses the channel dimension with a second (constant) matmul,
   so the ``[T, W*2K]`` intermediate never leaves VMEM — the fusion XLA
   will not do for a gather.

HBM traffic: indices in + ``[Q, 2K]`` results out (+ window once) —
~30x less than the gather path's effective cost; compute ~0.5 GFLOP per
1M queries.  Queries outside the window report "not found" (callers
choose the window to cover the particle cloud; see
``windowed_grid_lookup``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(lx_ref, ly_ref, table_ref, out_ref, *, w, channels,
                   mxu_dtype):
    """One tile: out[t] = table[lx[t], ly[t], :].

    Both matmuls run in ``mxu_dtype`` (bf16 by default: one-hots are
    exact in bf16 and the MXU is native bf16 — the f32 path runs ~8x
    slower through the systolic array; table bf16 rounding costs <0.5%
    relative on patch means, far below the measurement noise).
    """
    lx = lx_ref[...]                       # [T, 1] int32
    ly = ly_ref[...]                       # [T, 1]
    t = lx.shape[0]

    iota_w = jax.lax.broadcasted_iota(jnp.int32, (t, w), 1)
    oh_x = (lx == iota_w).astype(mxu_dtype)            # [T, W]
    # table arrives pre-flattened [W, W*C] (Mosaic cannot shape-cast
    # (W, W, C) -> (W, W*C) in-kernel)
    rows = jnp.dot(
        oh_x, table_ref[...].astype(mxu_dtype),
        preferred_element_type=jnp.float32,
    )

    # y-select mask over the (y-major, channel-minor) column order of
    # ``rows``: mask[t, y*C + c] = (ly[t] == y)
    colid = jax.lax.broadcasted_iota(jnp.int32, (t, w * channels), 1)
    mask = (ly == colid // channels)
    masked = jnp.where(mask, rows, 0.0).astype(mxu_dtype)

    # collapse y: constant selector S[(y*C + c), c'] = (c == c')
    col = jax.lax.broadcasted_iota(jnp.int32, (w * channels, channels), 0)
    outc = jax.lax.broadcasted_iota(jnp.int32, (w * channels, channels), 1)
    sel = ((col % channels) == outc).astype(mxu_dtype)
    out_ref[...] = jnp.dot(masked, sel, preferred_element_type=jnp.float32)


def window_gather(table, lx, ly, *, tile=512, interpret=False,
                  mxu_dtype=jnp.bfloat16):
    """Gather ``table[W, W, C]`` rows at per-query cells ``(lx, ly)``.

    ``lx, ly``: int32 [Q], assumed pre-clamped to [0, W).  Returns
    ``[Q, C]`` float32.  Q is padded to a tile multiple internally.
    ``mxu_dtype=jnp.float32`` gives exact values at ~8x the matmul cost.
    """
    w, w2, channels = table.shape
    assert w == w2, "square windows only"
    q = lx.shape[0]
    qp = ((q + tile - 1) // tile) * tile
    pad = qp - q
    lxp = jnp.pad(lx, (0, pad))[:, None]
    lyp = jnp.pad(ly, (0, pad))[:, None]
    table2 = table.reshape(w, w * channels)

    out = pl.pallas_call(
        functools.partial(_gather_kernel, w=w, channels=channels,
                          mxu_dtype=mxu_dtype),
        grid=(qp // tile,),
        in_specs=[
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, w * channels), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, channels), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((qp, channels), jnp.float32),
        interpret=interpret,
    )(lxp, lyp, table2)
    return out[:q]


def _window_anchor(ic, tw, n, center=None):
    """Window origin for (clipped) query cells ``ic`` on a grid axis of
    size ``n``: mean-centred, then clamped into the coverage interval
    ``[max(mx - tw + 1, 0), min(mn, n - tw)]`` so that whenever the
    cell span fits (``mx - mn < tw``) EVERY in-bounds query lands
    inside the window.  Round-4 advisor find: the bare mean-centred
    anchor could place a just-fitting but skewed cloud so that its far
    tail spilled out of the window, silently zeroing those contacts in
    the tiered fold path whose ``fits`` gate tests only the bbox span.
    When the span does NOT fit (fallback-off regimes) ``lo > hi`` and
    ``clip`` anchors at the bbox min — a best-effort window, same
    contract as before (out-of-window queries report not-found).
    ``center`` overrides the mean (``center_subsample`` support)."""
    if center is None:
        center = jnp.mean(ic).astype(jnp.int32)
    lo = jnp.maximum(jnp.max(ic) - tw + 1, 0)
    hi = jnp.minimum(jnp.min(ic), max(n - tw, 0))
    return jnp.clip(center - tw // 2, lo, hi)


def windowed_get_patch(packed, points, z_window=3.0, window=64,
                       margin=2, tile=512, interpret=False,
                       mxu_dtype=jnp.bfloat16):
    """Drop-in ``get_patch_packed`` replacement using the Pallas window
    kernel.

    The window is centred on the query cloud's mean cell (a cheap
    reduction); queries outside the window report not-found — correct
    for the tracking regime where the cloud is compact relative to
    ``window * resolution`` (64 cells @ 0.05 m = 3.2 m).  ``packed``:
    ``mapping.mls_grid.PackedLookup``.
    """
    k = packed.k
    nx, ny = packed.data.shape[0], packed.data.shape[1]
    flat = points.reshape(-1, 3)
    rel = (flat[:, :2] - packed.origin) / packed.resolution
    ix = jnp.floor(rel[:, 0]).astype(jnp.int32)
    iy = jnp.floor(rel[:, 1]).astype(jnp.int32)
    inb = (ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny)

    # window origin: cloud mean cell, coverage-clamped (_window_anchor)
    cx = _window_anchor(jnp.clip(ix, 0, nx - 1), window, nx)
    cy = _window_anchor(jnp.clip(iy, 0, ny - 1), window, ny)
    table = jax.lax.dynamic_slice(
        packed.data, (cx, cy, 0), (window, window, 2 * k)
    )

    lx = ix - cx
    ly = iy - cy
    inw = inb & (lx >= 0) & (lx < window) & (ly >= 0) & (ly < window)
    lxc = jnp.clip(lx, 0, window - 1)
    lyc = jnp.clip(ly, 0, window - 1)

    cell = window_gather(table, lxc, lyc, tile=tile, interpret=interpret,
                         mxu_dtype=mxu_dtype)
    means = cell[:, :k]
    stdevs = cell[:, k:]
    valids = stdevs >= 0.0

    z = flat[:, 2:3]
    dist = jnp.abs(means - z)
    cand = valids & (dist <= z_window)
    dist = jnp.where(cand, dist, jnp.inf)
    best = jnp.argmin(dist, axis=-1)
    found = inw & jnp.any(cand, axis=-1)
    take = lambda a: jnp.take_along_axis(a, best[:, None], axis=-1)[:, 0]
    mean = take(means)
    stdev = jnp.abs(take(stdevs))

    shape = points.shape[:-1]
    color = jnp.zeros(shape + (3,), mean.dtype)
    return (
        found.reshape(shape),
        mean.reshape(shape),
        stdev.reshape(shape),
        color,
    )


def _fused_select_kernel(lx_ref, ly_ref, z_ref, table_ref, out_ref, *, wx,
                         wy, k, z_window, mxu_dtype, stage1, stage2):
    """One tile of the fused lookup+z-select kernel.

    Gathers ``cell = table[lx, ly, :]`` (2K channels: K means then K
    stdevs) like ``_gather_kernel``, then performs the MLS z-window slot
    selection *in VMEM* (the reference semantics of
    ``MLSMap::getPatch(p, patch, zwin)``, ``PoseEstimator.hpp:97-105``):
    best = argmin |mean - z| over slots with ``stdev >= 0`` and
    ``|mean - z| <= z_window``.  Emits ``[T, 8]`` rows
    ``(found, mean, stdev, 0...)`` — 2K/3x less HBM write traffic than
    the raw gather and no XLA-side argmin/take pass.

    ``stage1`` selects the x-row gather: ``'onehot'`` (MXU one-hot
    matmul) or ``'dg'`` (Mosaic ``dynamic_gather`` over sublanes; table
    pre-padded to T rows).  ``stage2`` selects the y/channel reduction:
    ``'matmul'`` (mask + constant selector matmul), ``'fold'``
    (lane-halving adds down to 128 lanes + tiny selector matmul), or
    ``'dg'`` (lane ``dynamic_gather``).
    """
    c = 2 * k
    lx = lx_ref[...]                       # [T, 1] int32
    ly = ly_ref[...]                       # [T, 1]
    t = lx.shape[0]
    wc = wy * c

    if stage1 == "dg":
        # table padded to [T, W*C]; one batched sublane gather
        idx = jnp.broadcast_to(lx, (t, wc))
        rows = jnp.take_along_axis(
            table_ref[...], idx, axis=0, mode="promise_in_bounds"
        )
    else:
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (t, wx), 1)
        oh_x = (lx == iota_w).astype(mxu_dtype)            # [T, WX]
        rows = jnp.dot(
            oh_x, table_ref[...].astype(mxu_dtype),
            preferred_element_type=jnp.float32,
        )                                                  # [T, W*C]

    colid = jax.lax.broadcasted_iota(jnp.int32, (t, wc), 1)
    if stage2 == "dg":
        # lane gather: cell[t, c'] = rows[t, ly[t]*C + c']
        idx2 = ly * c + (colid % c)
        g = jnp.take_along_axis(rows, idx2, axis=1,
                                mode="promise_in_bounds")
        cell = g[:, :c]
    else:
        mask = (ly == colid // c)
        masked = jnp.where(mask, rows, 0.0)
        if stage2 == "fold":
            # halve the lane width by adding y-group blocks (the y-select
            # mask already zeroed every other group) until one 128-lane
            # vreg remains, then collapse with a tiny constant matmul.
            width = wc
            x = masked
            while width > 128:
                width //= 2
                x = x[:, :width] + x[:, width:]
            col = jax.lax.broadcasted_iota(jnp.int32, (width, c), 0)
            outc = jax.lax.broadcasted_iota(jnp.int32, (width, c), 1)
            sel = ((col % c) == outc).astype(mxu_dtype)
            cell = jnp.dot(x.astype(mxu_dtype), sel,
                           preferred_element_type=jnp.float32)
        else:
            col = jax.lax.broadcasted_iota(jnp.int32, (wc, c), 0)
            outc = jax.lax.broadcasted_iota(jnp.int32, (wc, c), 1)
            sel = ((col % c) == outc).astype(mxu_dtype)
            cell = jnp.dot(masked.astype(mxu_dtype), sel,
                           preferred_element_type=jnp.float32)

    # ---- fused z-window slot selection (all [T, 2K] lane ops; the mean
    # lanes are 0..K-1, each paired stdev sits K lanes to the right) ----
    z = z_ref[...]                                          # [T, 1] f32
    lane = jax.lax.broadcasted_iota(jnp.int32, (t, c), 1)
    is_mean = lane < k
    stds = pltpu.roll(cell, shift=k, axis=1)  # stdev of mean-lane j at lane j
    dist = jnp.abs(cell - z)
    cand = is_mean & (stds >= 0.0) & (dist <= z_window)
    dist_inf = jnp.where(cand, dist, jnp.inf)
    mind = jnp.min(dist_inf, axis=1, keepdims=True)
    score = jnp.where(cand & (dist_inf == mind), lane, c)
    best = jnp.min(score, axis=1, keepdims=True)            # [T, 1]
    bm = lane == best
    mean_b = jnp.sum(jnp.where(bm, cell, 0.0), axis=1, keepdims=True)
    stdev_b = jnp.sum(jnp.where(bm, stds, 0.0), axis=1, keepdims=True)
    found = (best < c).astype(jnp.float32)
    pad = jnp.zeros((t, 5), jnp.float32)
    out_ref[...] = jnp.concatenate([found, mean_b, stdev_b, pad], axis=1)


def _fused_select_kernel_t(lxy_ref, z_ref, table_ref, out_ref, *, wx, wy,
                           k, z_window, mxu_dtype, rows_f32=True):
    """Transposed-layout fused select: queries ride the LANE axis.

    Motivation (measured via device trace): with queries on the sublane
    axis the kernel operands are ``[Q, 1]``/``[Q, 8]`` arrays whose
    (8, 128) tiling pads the lane dim 128x/16x — materialising them
    costs ~2.5 ms/step of pure HBM inflation at 800k queries.  Here the
    host passes ``lx*WY+ly`` as ``[Q/128, 128]`` and receives
    ``[8, Q]`` (channels on sublanes, C = 2K = 8 = the native sublane
    count) — every operand is layout-compact.

    Math identical to ``_fused_select_kernel`` (onehot+matmul stages),
    transposed: per 128-query lane block, ``rows_T = tableT @ onehot_T``
    on the MXU, y-select mask over sublanes, channel collapse by a
    constant ``[2K, WY*2K]`` selector matmul, z-window argmin over
    sublanes.
    """
    c = 2 * k
    wc = wy * c
    lxy = lxy_ref[...]                     # [TB, 128] int32 (lx*WY + ly)
    tb = lxy.shape[0]
    table_t = table_ref[...].astype(mxu_dtype)          # [WX*... ] see host
    # constant channel-collapse selector, transposed: [C, WC]
    col = jax.lax.broadcasted_iota(jnp.int32, (c, wc), 1)
    outc = jax.lax.broadcasted_iota(jnp.int32, (c, wc), 0)
    sel_t = ((col % c) == outc).astype(mxu_dtype)

    t = tb * 128
    # Fuse the two matmuls across the tile's lane blocks: concatenate
    # the FULL-HEIGHT one-hot blocks along lanes so stage 1 runs once
    # over [WX, T] (better MXU pipelining than tb separate N=128 dots).
    # The [1, 128] ly/z rows cannot be lane-concatenated (Mosaic:
    # "offset mismatch on non-concat dimension" — they live on
    # different sublanes of the index tile), so masking and the
    # z-select stay per block.
    iota_x = jax.lax.broadcasted_iota(jnp.int32, (wx, 128), 0)
    ohs, lys, zs = [], [], []
    for b in range(tb):
        lxyb = lxy[b:b + 1, :]                           # [1, 128]
        lxb = lxyb // wy
        lys.append(lxyb - lxb * wy)
        zs.append(z_ref[b:b + 1, :])
        ohs.append(
            (jnp.broadcast_to(lxb, (wx, 128)) == iota_x).astype(mxu_dtype)
        )
    oh_t = jnp.concatenate(ohs, axis=1)                  # [WX, T]
    # rows are one-hot selections of (already mxu_dtype-rounded) table
    # values — keeping them in mxu_dtype loses nothing and halves the
    # VPU width of the y-mask stage, the dominant non-MXU cost
    rows_dt = jnp.float32 if rows_f32 else mxu_dtype
    rows_t = jnp.dot(table_t, oh_t,
                     preferred_element_type=rows_dt)      # [WC, T]

    rowid = jax.lax.broadcasted_iota(jnp.int32, (wc, 128), 0)
    zero = jnp.zeros((), rows_dt)
    masked_blocks = []
    for b in range(tb):
        rb = jax.lax.slice(rows_t, (0, b * 128), (wc, (b + 1) * 128))
        mask = (rowid // c) == jnp.broadcast_to(lys[b], (wc, 128))
        masked_blocks.append(
            jnp.where(mask, rb, zero).astype(mxu_dtype)
        )
    masked = jnp.concatenate(masked_blocks, axis=1)      # [WC, T]
    cell_all = jnp.dot(sel_t, masked,
                       preferred_element_type=jnp.float32)  # [C, T]

    lane = jax.lax.broadcasted_iota(jnp.int32, (c, 128), 0)
    is_mean = lane < k
    out_blocks = []
    for b in range(tb):
        cell_t = jax.lax.slice(cell_all, (0, b * 128), (c, (b + 1) * 128))
        zb = zs[b]
        stds = pltpu.roll(cell_t, shift=k, axis=0)
        dist = jnp.abs(cell_t - jnp.broadcast_to(zb, (c, 128)))
        cand = is_mean & (stds >= 0.0) & (dist <= z_window)
        dist_inf = jnp.where(cand, dist, jnp.inf)
        mind = jnp.min(dist_inf, axis=0, keepdims=True)
        score = jnp.where(cand & (dist_inf == mind), lane, c)
        best = jnp.min(score, axis=0, keepdims=True)     # [1, 128]
        bm = lane == best
        mean_b = jnp.sum(jnp.where(bm, cell_t, 0.0), axis=0,
                         keepdims=True)
        stdev_b = jnp.sum(jnp.where(bm, stds, 0.0), axis=0,
                          keepdims=True)
        found = (best < c).astype(jnp.float32)
        pad = jnp.zeros((5, 128), jnp.float32)
        out_blocks.append(
            jnp.concatenate([found, mean_b, stdev_b, pad], axis=0)
        )
    out_ref[...] = jnp.concatenate(out_blocks, axis=1)   # [8, T]


def _fused_select_kernel_flat_direct(lxy_ref, z_ref, table_ref, out_ref,
                                     *, wx, wy, k, z_window, mxu_dtype):
    """Flat-layout fused select WITHOUT the stage-2 channel-collapse
    matmul: the z-window slot selection runs directly on the masked
    ``[WY*2K, T]`` rows (sublane reductions) instead of collapsing to
    ``[2K, T]`` first.

    Rationale: stage 2's constant selector has M = 2K = 8 output rows,
    padded to 128 on the MXU — ~6% utilisation, the dominant term of
    the kernel's measured ~3.5 ns fixed floor (BENCH.md round 2).
    Whether trading that MXU pass for wider VPU reductions wins is
    hardware-specific — benchmarked side by side in
    ``tools/bench_kernels.py``.
    """
    c = 2 * k
    wc = wy * c
    lxy = lxy_ref[0]                        # [1, T] int32
    t = lxy.shape[-1]
    lx = lxy // wy
    ly = lxy - lx * wy

    iota_x = jax.lax.broadcasted_iota(jnp.int32, (wx, t), 0)
    oh_t = (jnp.broadcast_to(lx, (wx, t)) == iota_x).astype(mxu_dtype)
    rows_t = jnp.dot(table_ref[...].astype(mxu_dtype), oh_t,
                     preferred_element_type=jnp.float32)   # [WC, T]

    rowid = jax.lax.broadcasted_iota(jnp.int32, (wc, t), 0)
    in_group = (rowid // c) == jnp.broadcast_to(ly, (wc, t))
    is_mean = (rowid % c) < k
    # stdev of the mean at row y*c+ch sits at row y*c+ch+k: shift the
    # row axis up by k (cyclic wrap only crosses groups for the last
    # k stdev rows, which are never mean rows)
    stds = pltpu.roll(rows_t, shift=wc - k, axis=0)
    z = jnp.broadcast_to(z_ref[0], (wc, t))
    dist = jnp.abs(rows_t - z)
    cand = in_group & is_mean & (stds >= 0.0) & (dist <= z_window)
    dist_inf = jnp.where(cand, dist, jnp.inf)
    mind = jnp.min(dist_inf, axis=0, keepdims=True)
    score = jnp.where(cand & (dist_inf == mind), rowid, wc)
    best = jnp.min(score, axis=0, keepdims=True)           # [1, T]
    bm = rowid == best
    mean_b = jnp.sum(jnp.where(bm, rows_t, 0.0), axis=0, keepdims=True)
    stdev_b = jnp.sum(jnp.where(bm, stds, 0.0), axis=0, keepdims=True)
    found = (best < wc).astype(jnp.float32)
    pad = jnp.zeros((5, t), jnp.float32)
    out_ref[...] = jnp.concatenate([found, mean_b, stdev_b, pad],
                                   axis=0)


def _fused_select_kernel_flat(lxy_ref, z_ref, table_ref, out_ref, *, wx,
                              wy, k, z_window, mxu_dtype):
    """Transposed fused select with FULL-TILE index rows.

    ``_fused_select_kernel_t`` unrolls a per-128-query block loop
    because its ``[tb, 128]`` index tile puts each query block on a
    different sublane and Mosaic rejects lane-concats across sublane
    offsets.  Measured consequence: a ~4 ns/query FIXED cost that
    barely scales with window area (64^2: 4.19 ns, 128^2: 4.92 ns) —
    the block loop serialises the VPU stages.  Here the host feeds
    ``lxy``/``z`` as single-sublane ``[1, T]`` rows instead, so the
    one-hot build, y-mask and z-select all run as ONE full-tile op
    each; the two MXU dots are unchanged.
    """
    c = 2 * k
    wc = wy * c
    lxy = lxy_ref[0]                        # [1, T] int32
    t = lxy.shape[-1]
    lx = lxy // wy
    ly = lxy - lx * wy

    iota_x = jax.lax.broadcasted_iota(jnp.int32, (wx, t), 0)
    oh_t = (jnp.broadcast_to(lx, (wx, t)) == iota_x).astype(mxu_dtype)
    rows_t = jnp.dot(table_ref[...].astype(mxu_dtype), oh_t,
                     preferred_element_type=jnp.float32)   # [WC, T]

    rowgrp = jax.lax.broadcasted_iota(jnp.int32, (wc, t), 0) // c
    mask = rowgrp == jnp.broadcast_to(ly, (wc, t))
    masked = jnp.where(mask, rows_t, 0.0).astype(mxu_dtype)

    col = jax.lax.broadcasted_iota(jnp.int32, (c, wc), 1)
    outc = jax.lax.broadcasted_iota(jnp.int32, (c, wc), 0)
    sel_t = ((col % c) == outc).astype(mxu_dtype)
    cell = jnp.dot(sel_t, masked,
                   preferred_element_type=jnp.float32)     # [C, T]

    z = jnp.broadcast_to(z_ref[0], (c, t))                 # [C, T]
    lane = jax.lax.broadcasted_iota(jnp.int32, (c, t), 0)
    is_mean = lane < k
    stds = pltpu.roll(cell, shift=k, axis=0)
    dist = jnp.abs(cell - z)
    cand = is_mean & (stds >= 0.0) & (dist <= z_window)
    dist_inf = jnp.where(cand, dist, jnp.inf)
    mind = jnp.min(dist_inf, axis=0, keepdims=True)
    score = jnp.where(cand & (dist_inf == mind), lane, c)
    best = jnp.min(score, axis=0, keepdims=True)           # [1, T]
    bm = lane == best
    mean_b = jnp.sum(jnp.where(bm, cell, 0.0), axis=0, keepdims=True)
    stdev_b = jnp.sum(jnp.where(bm, stds, 0.0), axis=0, keepdims=True)
    found = (best < c).astype(jnp.float32)
    pad = jnp.zeros((5, t), jnp.float32)
    out_ref[...] = jnp.concatenate([found, mean_b, stdev_b, pad],
                                   axis=0)


_MILLS_U0 = -3.0
_MILLS_CF_DEPTH = 8


def _mills_ratio(u):
    """Inverse Mills ratio ``phi(u) / Phi(u)`` from VPU-friendly ops.

    The contact likelihood ratio (``ContactModel.cpp:104-115``) is
    ``pdf(z;0,s)/cdf(z;0,s) = mills(z/s)/s``.  ``jax.scipy``'s
    ``log_ndtr`` needs ``erfc``, which this Mosaic version does not
    lower, so the kernel uses a two-branch approximation built from
    ``exp``/``div``/``select`` only:

    * ``u >= -3``: ``phi/Phi`` with Abramowitz-Stegun 7.1.26 ``erfc``
      (abs err 1.5e-7);
    * ``u < -3``: the Laplace continued fraction
      ``lambda(u) = x + 1/(x + 2/(x + 3/...))`` (x = -u, depth 8).

    Max relative error 5.2e-5 over u in [-30, 12] vs scipy (asserted in
    ``tests/test_contact_fold.py``) — far below the bf16 table rounding
    the TPU lookup path already carries.
    """
    u = u.astype(jnp.float32)
    a = u * jnp.float32(-0.7071067811865476)        # -u / sqrt(2)
    x = jnp.abs(a)
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    e = poly * jnp.exp(-x * x)
    cphi = 0.5 * jnp.where(a >= 0, e, 2.0 - e)      # Phi(u)
    phi = jnp.float32(0.3989422804014327) * jnp.exp(-0.5 * u * u)
    lam_a = phi / jnp.maximum(cphi, 1e-38)
    xx = jnp.maximum(-u, 0.5)
    tcf = xx
    for j in range(_MILLS_CF_DEPTH, 0, -1):
        tcf = xx + j / tcf
    return jnp.where(u >= _MILLS_U0, lam_a, tcf)


def _contact_rows(found, mean, stdev, z, av, mv, correction):
    """Shared fold epilogue math: per-query contact-model quantities.

    ``found``/``mean``/``stdev`` are the z-selected lookup results (any
    matching shape), ``z`` the query heights, ``av`` the 0/1 active
    mask (already ANDed with any in-window mask), ``mv`` the per-query
    measurement variance.  Returns the five group-sum integrands
    ``(ratio, ratio*zdiff, ratio*zvar, ratio*pose_var, contrib)``
    replicating ``ContactModel.cpp:160-208`` (see
    ``models.contact_model.evaluate_pose``).
    """
    zdiff = z - mean
    pose_var = stdev * stdev
    zvar = pose_var + mv
    s = jnp.sqrt(zvar) * correction
    ratio = _mills_ratio(zdiff / s) / s
    contrib = av * found
    rm = jnp.where(contrib > 0.5, ratio, 0.0)
    return rm, rm * zdiff, rm * zvar, rm * pose_var, contrib


def _contact_group_stats(rm, rz, rv, rp, contrib, act_col, seg_oh,
                         n_seg):
    """Segment sums + group-level contact math + per-particle totals.

    All inputs are contact-grid arrays: rows = contact points (C on
    SUBLANES), lanes = particles.  ``act_col [C, 1]`` is the active
    mask, ``seg_oh [C, S]`` the segment membership.  Runs identically
    inside the Mosaic kernel and in plain XLA (the spread-fallback
    branch) — pure f32 VPU ops, no matmuls.  Returns the five
    per-particle rows ``(d1, d2, sq, pose_var, n_contacts)`` [1, N]
    from which ``evaluate_pose_batch`` reconstructs the reference
    weighting (``ContactModel.cpp:262-317``):

      delta  = d1 / d2
      sum_i (zdiff_i - delta)^2 / zvar_i  =  sq - d1^2 / d2
    """
    tp = rm.shape[-1]
    zero = jnp.zeros((1, tp), jnp.float32)
    d1, d2, sq, pv, nc = zero, zero, zero, zero, zero
    cp = rm.shape[0]
    for s in range(n_seg):
        mcol = seg_oh[:, s:s + 1]                       # [C, 1]
        m = jnp.broadcast_to(mcol, (cp, tp))
        rsum = jnp.sum(rm * m, axis=0, keepdims=True)   # [1, N]
        zds = jnp.sum(rz * m, axis=0, keepdims=True)
        zvs = jnp.sum(rv * m, axis=0, keepdims=True)
        pvs = jnp.sum(rp * m, axis=0, keepdims=True)
        ncb = jnp.sum(contrib * m, axis=0, keepdims=True)
        act_s = jnp.sum(act_col * mcol)                 # scalar
        # group invalid when any active member missed the map
        # (ContactModel.cpp:189-190): n_contrib < n_active
        ok = (ncb >= act_s - 0.5) & (ncb > 0.5) & (rsum > 1e-9)
        okf = ok.astype(jnp.float32)
        safe = jnp.where(ok, rsum, 1.0)
        czd = jnp.where(ok, zds / safe, 0.0)            # cp_zdiff
        inv = okf * safe / jnp.where(ok, zvs, 1.0)      # 1 / cp_zvar
        d1 = d1 + czd * inv
        d2 = d2 + inv
        sq = sq + czd * czd * inv
        pv = pv + okf * pvs / safe
        nc = nc + okf
    return d1, d2, sq, pv, nc


def _fused_select_contact_kernel(lxy_ref, z_ref, av_ref, mv_ref,
                                 act_ref, soh_ref, table_ref, out_ref,
                                 *, wx, wy, k, z_window, mxu_dtype,
                                 correction, n_seg):
    """Contact-grid fused select + full contact-model fold.

    Layout (the round-3 design that finally beat the XLA postlude):
    operands are ``[C, N]`` — contact points on SUBLANES (C = 8 fills a
    vreg row exactly), particles on LANES — so every per-query array is
    layout-compact and the group reductions are plain sublane sums.
    Per grid step the kernel processes ``TP`` particles (``C * TP``
    queries): per contact row, stage-1/2 one-hot matmuls + z-window
    slot selection (as ``_fused_select_kernel_flat``); then the
    likelihood-ratio epilogue (``_mills_ratio``) and the ENTIRE group
    + particle reduction pipeline (``_contact_group_stats``) run on
    ``[C, TP]`` vregs.  Output: ``[8, TP]`` per-particle rows
    (d1, d2, sq, pose_var, n_contacts, 0, 0, 0) — ~C*S/8x less HBM
    write traffic than per-query rows, and the downstream XLA step is
    a handful of ``[N]`` elementwise ops.
    """
    c2 = 2 * k
    wc = wy * c2
    cp = lxy_ref.shape[0]
    tp = lxy_ref.shape[-1]
    table_t = table_ref[...].astype(mxu_dtype)
    col = jax.lax.broadcasted_iota(jnp.int32, (c2, wc), 1)
    outc = jax.lax.broadcasted_iota(jnp.int32, (c2, wc), 0)
    sel_t = ((col % c2) == outc).astype(mxu_dtype)
    iota_x = jax.lax.broadcasted_iota(jnp.int32, (wx, tp), 0)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (c2, tp), 0)
    is_mean = lane2 < k

    founds, means, stds_out = [], [], []
    for ci in range(cp):
        lxyr = lxy_ref[ci:ci + 1, :]                    # [1, TP]
        lx = lxyr // wy
        ly = lxyr - lx * wy
        oh = (jnp.broadcast_to(lx, (wx, tp)) == iota_x).astype(mxu_dtype)
        rows_t = jnp.dot(table_t, oh,
                         preferred_element_type=jnp.float32)  # [WC, TP]
        rowgrp = jax.lax.broadcasted_iota(jnp.int32, (wc, tp), 0) // c2
        mask = rowgrp == jnp.broadcast_to(ly, (wc, tp))
        masked = jnp.where(mask, rows_t, 0.0).astype(mxu_dtype)
        cell = jnp.dot(sel_t, masked,
                       preferred_element_type=jnp.float32)    # [C2, TP]

        zr = jnp.broadcast_to(z_ref[ci:ci + 1, :], (c2, tp))
        stds = pltpu.roll(cell, shift=k, axis=0)
        dist = jnp.abs(cell - zr)
        cand = is_mean & (stds >= 0.0) & (dist <= z_window)
        dist_inf = jnp.where(cand, dist, jnp.inf)
        mind = jnp.min(dist_inf, axis=0, keepdims=True)
        score = jnp.where(cand & (dist_inf == mind), lane2, c2)
        best = jnp.min(score, axis=0, keepdims=True)          # [1, TP]
        bm = lane2 == best
        means.append(
            jnp.sum(jnp.where(bm, cell, 0.0), axis=0, keepdims=True))
        stds_out.append(jnp.abs(
            jnp.sum(jnp.where(bm, stds, 0.0), axis=0, keepdims=True)))
        founds.append((best < c2).astype(jnp.float32))

    found = jnp.concatenate(founds, axis=0)             # [C, TP]
    mean = jnp.concatenate(means, axis=0)
    stdev = jnp.concatenate(stds_out, axis=0)
    mv = jnp.broadcast_to(mv_ref[0:1, :], (cp, tp))
    rm, rz, rv, rp, contrib = _contact_rows(
        found, mean, stdev, z_ref[...], av_ref[...], mv, correction)
    d1, d2, sq, pv, nc = _contact_group_stats(
        rm, rz, rv, rp, contrib, act_ref[...], soh_ref[...], n_seg)
    out_ref[...] = jnp.concatenate(
        [d1, d2, sq, pv, nc, jnp.zeros((3, tp), jnp.float32)], axis=0)


def contact_fold_sums(found, mean, stdev, z, av, mv, act_col, seg_oh,
                      correction):
    """XLA twin of the contact-fold kernel on ``[C, N]`` contact-grid
    lookup results (the production auto-lookup's spread-fallback
    branch and the parity oracle).  Returns ``[8, N]`` float32 rows
    ``(d1, d2, sq, pose_var, n_contacts, 0, 0, 0)``."""
    cp, n = found.shape
    rows = _contact_rows(
        found.astype(jnp.float32), mean, jnp.abs(stdev), z, av,
        jnp.broadcast_to(mv, (cp, n)), correction)
    n_seg = seg_oh.shape[1]
    d1, d2, sq, pv, nc = _contact_group_stats(
        *rows, act_col.astype(jnp.float32), seg_oh.astype(jnp.float32),
        n_seg)
    return jnp.concatenate(
        [d1, d2, sq, pv, nc, jnp.zeros((3, n), jnp.float32)], axis=0)


def window_select_contact(table, lx, ly, z, av, mv, act_col, seg_oh, *,
                          correction, z_window=3.0, tile=1024,
                          interpret=False, mxu_dtype=jnp.bfloat16,
                          table_t=None, shape=None):
    """Fused lookup + z-select + contact fold over a VMEM window.

    Contact-grid operands: ``lx, ly`` int32 ``[C, N]`` pre-clamped to
    the window, ``z``/``av`` float32 ``[C, N]`` (``av`` = active &
    in-window mask as 0/1), ``mv [1, N]`` per-particle measurement
    variance, ``act_col [C, 1]`` the active mask alone, ``seg_oh
    [C, S]`` the (traced) segment membership.  Returns ``[8, N]`` f32
    per-particle rows (d1, d2, sq, pose_var, n_contacts, 0, 0, 0).
    """
    if table_t is None:
        wx, wy, c = table.shape
        table_t = table.reshape(wx, wy * c).T
    else:
        wx, wy, c = shape
    k = c // 2
    c_pts, n = lx.shape
    n_seg = seg_oh.shape[1]
    cpad = (c_pts + 7) // 8 * 8 - c_pts
    tp = max(128, tile // 128 * 128)
    npad = (n + tp - 1) // tp * tp - n
    lxy = lx * wy + ly

    def padq(x, cval=0.0):
        return jnp.pad(x, ((0, cpad), (0, npad)), constant_values=cval)

    lxy = padq(lxy)
    z2 = padq(z).astype(jnp.float32)
    av2 = padq(av).astype(jnp.float32)       # padded rows/cols inactive
    mv2 = jnp.pad(mv, ((0, 0), (0, npad)),
                  constant_values=1.0).astype(jnp.float32)
    act2 = jnp.pad(act_col, ((0, cpad), (0, 0))).astype(jnp.float32)
    soh2 = jnp.pad(seg_oh, ((0, cpad), (0, 0))).astype(jnp.float32)
    cp = c_pts + cpad
    ntiles = (n + npad) // tp

    out = pl.pallas_call(
        functools.partial(
            _fused_select_contact_kernel, wx=wx, wy=wy, k=k,
            z_window=z_window, mxu_dtype=mxu_dtype,
            correction=correction, n_seg=n_seg,
        ),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((cp, tp), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cp, tp), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cp, tp), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tp), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cp, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cp, n_seg), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wy * c, wx), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, tp), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, n + npad), jnp.float32),
        interpret=interpret,
    )(lxy, z2, av2, mv2, act2, soh2, table_t)
    return out[:, :n]


def window_select_flat(table, lx, ly, z, *, z_window=3.0, tile=1024,
                       interpret=False, mxu_dtype=jnp.bfloat16,
                       table_t=None, shape=None, direct_select=False):
    """Fused select via ``_fused_select_kernel_flat`` (single-sublane
    full-tile index rows).  Same contract as ``window_select``.
    ``table_t`` ([WY*2K, WX], with ``shape=(wx, wy, 2k)``) skips the
    per-call transpose when the caller holds a pre-transposed table."""
    if table_t is None:
        wx, wy, c = table.shape
        table_t = table.reshape(wx, wy * c).T
    else:
        wx, wy, c = shape
    k = c // 2
    q = lx.shape[0]
    qp = ((q + tile - 1) // tile) * tile
    pad = qp - q
    lxy = lx * wy + ly
    if pad:
        lxy = jnp.pad(lxy, (0, pad))
        z = jnp.pad(z, (0, pad))
    lxy2 = lxy.reshape(qp // tile, 1, tile)
    z2 = z.reshape(qp // tile, 1, tile).astype(jnp.float32)

    kern = (_fused_select_kernel_flat_direct if direct_select
            else _fused_select_kernel_flat)
    out = pl.pallas_call(
        functools.partial(
            kern, wx=wx, wy=wy, k=k,
            z_window=z_window, mxu_dtype=mxu_dtype,
        ),
        grid=(qp // tile,),
        in_specs=[
            pl.BlockSpec((1, 1, tile), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wy * c, wx), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, qp), jnp.float32),
        interpret=interpret,
    )(lxy2, z2, table_t)
    return out[0, :q] > 0.5, out[1, :q], out[2, :q]


def window_select_t(table, lx, ly, z, *, z_window=3.0, tile=1024,
                    interpret=False, mxu_dtype=jnp.bfloat16,
                    rows_f32=True, table_t=None, shape=None):
    """Layout-compact fused select (see ``_fused_select_kernel_t``).
    Same contract as ``window_select``.  ``tile`` must be a multiple of
    1024 (the index block's sublane dim ``tile/128`` must divide by 8).
    ``rows_f32=False`` keeps the stage-1 rows in ``mxu_dtype`` (exact —
    they are one-hot copies of the already-rounded table) to halve the
    y-mask VPU work.  ``table_t`` ([WY*2K, WX] + ``shape``) skips the
    per-call transpose.
    """
    if table_t is None:
        wx, wy, c = table.shape
        # transposed table [WY*C, WX] so rows_T = tableT @ onehot_T
        table_t = table.reshape(wx, wy * c).T
    else:
        wx, wy, c = shape
    k = c // 2
    q = lx.shape[0]
    tile = max(tile, 1024)
    assert tile % 1024 == 0, "q_lanes tiles must be multiples of 1024"
    qp = ((q + tile - 1) // tile) * tile
    pad = qp - q
    lxy = lx * wy + ly
    if pad:
        lxy = jnp.pad(lxy, (0, pad))
        z = jnp.pad(z, (0, pad))
    lxy2 = lxy.reshape(qp // 128, 128)
    z2 = z.reshape(qp // 128, 128).astype(jnp.float32)
    tb = tile // 128

    out = pl.pallas_call(
        functools.partial(
            _fused_select_kernel_t, wx=wx, wy=wy, k=k, z_window=z_window,
            mxu_dtype=mxu_dtype, rows_f32=rows_f32,
        ),
        grid=(qp // tile,),
        in_specs=[
            pl.BlockSpec((tb, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wy * c, wx), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, qp), jnp.float32),
        interpret=interpret,
    )(lxy2, z2, table_t)
    return out[0, :q] > 0.5, out[1, :q], out[2, :q]


def window_select(table, lx, ly, z, *, z_window=3.0, tile=512,
                  interpret=False, mxu_dtype=jnp.bfloat16,
                  stage1="onehot", stage2="matmul"):
    """Fused gather + z-window slot select.

    ``table [WX, WY, 2K]`` (means ‖ stdevs, stdev<0 = empty slot),
    ``lx, ly`` int32 ``[Q]`` pre-clamped to ``[0, WX/WY)``, ``z``
    float32 ``[Q]``.  Returns ``(found [Q] bool, mean [Q], stdev [Q])``.

    Rectangular windows trade MXU/VPU work for coverage shape: the
    one-hot K dim pads to 128 regardless, so ``WX=128, WY=32`` costs
    about HALF of ``64x64`` at identical area (selector matmul N and
    the mask width scale with ``WY*2K``).
    """
    wx, wy, c = table.shape
    k = c // 2
    q = lx.shape[0]
    qp = ((q + tile - 1) // tile) * tile
    pad = qp - q
    if pad:
        lx = jnp.pad(lx, (0, pad))
        ly = jnp.pad(ly, (0, pad))
        z = jnp.pad(z, (0, pad))
    lxp = lx[:, None]
    lyp = ly[:, None]
    zp = z[:, None].astype(jnp.float32)
    table2 = table.reshape(wx, wy * c)
    rows = wx
    if stage1 == "dg":
        rows = max(tile, wx)
        table2 = jnp.pad(table2, ((0, rows - wx), (0, 0)))

    out = pl.pallas_call(
        functools.partial(
            _fused_select_kernel, wx=wx, wy=wy, k=k, z_window=z_window,
            mxu_dtype=mxu_dtype, stage1=stage1, stage2=stage2,
        ),
        grid=(qp // tile,),
        in_specs=[
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, wy * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((qp, 8), jnp.float32),
        interpret=interpret,
    )(lxp, lyp, zp, table2)
    out = out[:q]
    return out[:, 0] > 0.5, out[:, 1], out[:, 2]


def windowed_select_cells(packed, ix, iy, z, z_window=3.0, window=64,
                          tile=512, interpret=False,
                          mxu_dtype=jnp.bfloat16,
                          stage1="onehot", stage2="matmul",
                          center_subsample=0, layout="q_lanes",
                          rows_f32=True):
    """Window-kernel select on precomputed FLAT cell queries.

    ``ix, iy`` int32 ``[Q]`` (unclamped — out-of-grid marks not-found),
    ``z`` f32 ``[Q]``.  Returns flat ``(found [Q] bool, mean, stdev)``.

    This is the cond-friendly entry: the production auto lookup keeps
    its ``lax.cond`` operands as these flat 1-D arrays — passing the
    raw ``[N, C, 3]`` points forced ~1 ms/step of layout-transposing
    conditional-boundary copies at 100k particles (round-3 trace).
    """
    wx, wy = ((window, window) if isinstance(window, int) else window)
    nx, ny = packed.data.shape[0], packed.data.shape[1]
    inb = (ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny)

    ctr_x = ctr_y = None
    if center_subsample > 1:
        ctr_x = jnp.mean(
            jnp.clip(ix[:center_subsample], 0, nx - 1)
        ).astype(jnp.int32)
        ctr_y = jnp.mean(
            jnp.clip(iy[:center_subsample], 0, ny - 1)
        ).astype(jnp.int32)
    cx = _window_anchor(jnp.clip(ix, 0, nx - 1), wx, nx, center=ctr_x)
    cy = _window_anchor(jnp.clip(iy, 0, ny - 1), wy, ny, center=ctr_y)
    c = 2 * packed.k
    if layout in ("q_lanes", "q_flat") and packed.data_t is not None:
        # pre-transposed table: the slice + leading-dim merge are
        # layout-preserving (no per-step relayout of the window)
        table = None
        table_t = jax.lax.dynamic_slice(
            packed.data_t, (cy, 0, cx), (wy, c, wx)
        ).reshape(wy * c, wx)
        tshape = (wx, wy, c)
    else:
        table = jax.lax.dynamic_slice(
            packed.data, (cx, cy, 0), (wx, wy, c)
        )
        table_t, tshape = None, None

    lx = ix - cx
    ly = iy - cy
    inw = inb & (lx >= 0) & (lx < wx) & (ly >= 0) & (ly < wy)
    lxc = jnp.clip(lx, 0, wx - 1)
    lyc = jnp.clip(ly, 0, wy - 1)

    if layout == "q_flat":
        found, mean, stdev = window_select_flat(
            table, lxc, lyc, z, z_window=z_window, tile=tile,
            interpret=interpret, mxu_dtype=mxu_dtype,
            table_t=table_t, shape=tshape,
            direct_select=(stage2 == "direct"),
        )
    elif layout == "q_lanes":
        found, mean, stdev = window_select_t(
            table, lxc, lyc, z, z_window=z_window, tile=tile,
            interpret=interpret, mxu_dtype=mxu_dtype, rows_f32=rows_f32,
            table_t=table_t, shape=tshape,
        )
    else:
        found, mean, stdev = window_select(
            table, lxc, lyc, z, z_window=z_window, tile=tile,
            interpret=interpret, mxu_dtype=mxu_dtype,
            stage1=stage1, stage2=stage2,
        )
    return found & inw, mean, jnp.abs(stdev)


def cells_from_points(packed, points):
    """Flat cell coordinates + z for a ``[..., 3]`` point batch:
    ``(ix, iy, z)``, each ``[Q]`` (unclamped cell indices)."""
    flat = points.reshape(-1, 3)
    rel = (flat[:, :2] - packed.origin) / packed.resolution
    ix = jnp.floor(rel[:, 0]).astype(jnp.int32)
    iy = jnp.floor(rel[:, 1]).astype(jnp.int32)
    return ix, iy, flat[:, 2]


def windowed_get_patch_fused(packed, points, z_window=3.0, window=64,
                             tile=512, interpret=False,
                             mxu_dtype=jnp.bfloat16,
                             stage1="onehot", stage2="matmul",
                             center_subsample=0, layout="q_lanes",
                             rows_f32=True):
    """``windowed_get_patch`` with the z-window slot selection fused into
    the kernel (see ``_fused_select_kernel``).

    ``window``: int (square) or ``(wx, wy)``.  Measured on v5e: the
    64x64 default and 128x64 run at the same speed (the one-hot K dim
    pads to 128 regardless, so 128x64 gives 2x coverage area for free);
    128x32 is ~25% slower despite halving the selector-matmul passes —
    the kernel is not MXU-pass-bound.  ``center_subsample``: when > 0,
    centre the window on the mean of the first ``s`` queries instead of
    all Q (a contiguous prefix: strided slices lower to expensive
    gathers on TPU; measured no win from either on v5e, kept for
    latency-sensitive small-window configs).
    """
    ix, iy, z = cells_from_points(packed, points)
    found, mean, stdev = windowed_select_cells(
        packed, ix, iy, z, z_window=z_window, window=window, tile=tile,
        interpret=interpret, mxu_dtype=mxu_dtype, stage1=stage1,
        stage2=stage2, center_subsample=center_subsample, layout=layout,
        rows_f32=rows_f32,
    )
    shape = points.shape[:-1]
    color = jnp.zeros(shape + (3,), mean.dtype)
    return (
        found.reshape(shape),
        mean.reshape(shape),
        stdev.reshape(shape),
        color,
    )


def _auto_kernel_defaults(interpret, mxu_dtype):
    """Resolve ``None`` kernel options by backend: CPU runs the kernel
    in interpret mode with exact f32 dots (bf16 dots do not execute on
    the CPU backend inside shard_map); TPU compiles Mosaic with bf16."""
    on_cpu = jax.default_backend() == "cpu"
    if interpret is None:
        interpret = on_cpu
    if mxu_dtype is None:
        mxu_dtype = jnp.float32 if on_cpu else jnp.bfloat16
    return interpret, mxu_dtype


def windowed_grid_lookup(packed, z_window=3.0, window=64, tile=1024,
                         interpret=None, mxu_dtype=None,
                         fused=True, stage1="onehot", stage2="matmul",
                         mesh=None, layout="q_lanes", fallback=False,
                         tiers=()):
    """Lookup factory for the pose estimator (shared-map mode) using the
    Pallas window kernel.  ``map_id`` is ignored.

    ``fused=True`` (default) runs the z-window slot selection inside the
    kernel (``windowed_get_patch_fused``); ``fused=False`` keeps the raw
    ``[Q, 2K]`` gather + XLA-side selection.

    ``interpret``/``mxu_dtype``: ``None`` = auto by backend (CPU ->
    interpret + f32, TPU -> Mosaic + bf16).

    ``mesh``: on a multi-chip mesh the kernel must run shard-locally
    (XLA cannot auto-partition a Mosaic custom call) — pass the
    ``('dp',)`` mesh and the lookup wraps itself in ``shard_map``: each
    shard centres a window on *its own* particle shard's cloud and
    gathers locally; no communication (the map is replicated, the
    query batch stays sharded).

    ``fallback=True`` adds spread detection ON DEVICE: when the query
    cloud's cell bounding box does not fit the window (e.g. right after
    hash relocalisation spread the particles globally), a ``lax.cond``
    routes the batch through the exact full-grid gather instead — no
    retrace, no silent misses (the production ``lookup_mode='auto'``).
    Without it, lookups farther than ``window * resolution / 2`` from
    the query-cloud centroid silently miss; only use ``fallback=False``
    when the cloud is guaranteed compact (tracking-regime benches).
    """
    from slam_eslam_tpu.mapping import mls_grid

    if not isinstance(packed, mls_grid.PackedLookup):
        packed = mls_grid.PackedLookup.from_grid(packed)
    interpret, mxu_dtype = _auto_kernel_defaults(interpret, mxu_dtype)
    nx, ny = packed.data.shape[0], packed.data.shape[1]
    wx, wy = ((window, window) if isinstance(window, int) else window)
    # clamp to the grid (dynamic_slice would shrink silently otherwise)
    wx, wy = min(wx, nx), min(wy, ny)
    window = (wx, wy)

    def kernel_path(points):
        if fused:
            return windowed_get_patch_fused(
                packed, points, z_window, window=window, tile=tile,
                interpret=interpret, mxu_dtype=mxu_dtype,
                stage1=stage1, stage2=stage2, layout=layout,
            )
        return windowed_get_patch(
            packed, points, z_window, window=wx, tile=tile,
            interpret=interpret, mxu_dtype=mxu_dtype,
        )

    def select_cells(ix, iy, z):
        """Flat-cells select with the auto fallback (if enabled)."""
        if not fallback:
            return windowed_select_cells(
                packed, ix, iy, z, z_window=z_window, window=window,
                tile=tile, interpret=interpret, mxu_dtype=mxu_dtype,
                stage1=stage1, stage2=stage2, layout=layout,
            )
        ixc = jnp.clip(ix, 0, nx - 1)
        iyc = jnp.clip(iy, 0, ny - 1)
        fits = (
            (jnp.max(ixc) - jnp.min(ixc) < wx)
            & (jnp.max(iyc) - jnp.min(iyc) < wy)
        )
        out = jax.lax.cond(
            fits,
            lambda i, j, zz: windowed_select_cells(
                packed, i, j, zz, z_window=z_window, window=window,
                tile=tile, interpret=interpret, mxu_dtype=mxu_dtype,
                stage1=stage1, stage2=stage2, layout=layout,
            ),
            lambda i, j, zz: mls_grid.get_patch_packed_cells(
                packed, i, j, zz, z_window
            ),
            ix, iy, z,
        )
        # keep the cond results FLAT: without the barrier XLA sinks the
        # caller's [Q] -> [N, C] reshape into both branches, turning
        # the cond outputs into lane-padded [N, 8] buffers (~0.4
        # ms/step of boundary copies at 100k particles, round-3 trace)
        return jax.lax.optimization_barrier(out)

    def one_device(points):
        if isinstance(points, tuple):
            # SoA flat queries (x, y, z): the contact model's fast path
            xf, yf, zf = points
            ix = jnp.floor(
                (xf - packed.origin[0]) / packed.resolution
            ).astype(jnp.int32)
            iy = jnp.floor(
                (yf - packed.origin[1]) / packed.resolution
            ).astype(jnp.int32)
            return select_cells(ix, iy, zf)
        if not fallback:
            return kernel_path(points)
        # the cond operands/results are FLAT 1-D arrays: routing the
        # [N, C, 3] points through lax.cond forced layout-transposing
        # boundary copies worth ~1 ms/step at 100k particles (trace,
        # BENCH.md round 3) — both branches consume cell queries anyway
        ix, iy, z = cells_from_points(packed, points)
        found, mean, stdev = select_cells(ix, iy, z)
        shape = points.shape[:-1]
        color = jnp.zeros(shape + (3,), mean.dtype)
        return (found.reshape(shape), mean.reshape(shape),
                stdev.reshape(shape), color)

    def fold_one_device(ix, iy, z, act_col, mv, onehot, correction):
        """Contact-fold lookup on one shard: window kernel with the
        in-VMEM contact epilogue, spread-fallback to the exact gather +
        ``contact_fold_sums`` (same math, same ``[8, N]`` output).
        All query operands are contact-grid ``[C, N]``.

        With ``tiers`` set (production ``lookup_mode='auto'``), the
        query cloud's bounding box picks the SMALLEST window it fits,
        nested smallest-first before the full-window kernel and the
        exact gather: the fold kernel's stage-1 one-hot matmul does
        ~twy*2K*twx MACs per particle, so a converged tracking cloud
        running in a (128, 32) tier is ~3x cheaper on the MXU than the
        robust (128, 96) default."""

        def make_kernel_branch(twx, twy):
            def kernel_branch(ix, iy, zz, act, mv):
                ixc = jnp.clip(ix, 0, nx - 1)
                iyc = jnp.clip(iy, 0, ny - 1)
                cx = _window_anchor(ixc, twx, nx)
                cy = _window_anchor(iyc, twy, ny)
                c = 2 * packed.k
                if packed.data_t is not None:
                    table = None
                    table_t = jax.lax.dynamic_slice(
                        packed.data_t, (cy, 0, cx), (twy, c, twx)
                    ).reshape(twy * c, twx)
                    tshape = (twx, twy, c)
                else:
                    table = jax.lax.dynamic_slice(
                        packed.data, (cx, cy, 0), (twx, twy, c)
                    )
                    table_t, tshape = None, None
                lx = ix - cx
                ly = iy - cy
                inb = (ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny)
                inw = (inb & (lx >= 0) & (lx < twx)
                       & (ly >= 0) & (ly < twy))
                av = act * inw.astype(jnp.float32)
                return window_select_contact(
                    table, jnp.clip(lx, 0, twx - 1),
                    jnp.clip(ly, 0, twy - 1), zz, av, mv, act, onehot,
                    correction=correction,
                    z_window=z_window, tile=tile, interpret=interpret,
                    mxu_dtype=mxu_dtype, table_t=table_t, shape=tshape,
                )

            return kernel_branch

        def gather_branch(ix, iy, zz, act, mv):
            f, m, sd = mls_grid.get_patch_packed_cells(
                packed, ix.reshape(-1), iy.reshape(-1),
                zz.reshape(-1), z_window
            )
            shp = ix.shape
            av = jnp.broadcast_to(act, shp)
            return contact_fold_sums(
                f.reshape(shp), m.reshape(shp), sd.reshape(shp), zz,
                av, mv, act, onehot, correction,
            )

        if not fallback:
            return make_kernel_branch(wx, wy)(ix, iy, z, act_col, mv)
        ixc = jnp.clip(ix, 0, nx - 1)
        iyc = jnp.clip(iy, 0, ny - 1)
        sx = jnp.max(ixc) - jnp.min(ixc)
        sy = jnp.max(iyc) - jnp.min(iyc)
        # windows smallest-first; each strictly-smaller tier nests
        # outside the next (the cheapest fitting kernel wins)
        windows = sorted(
            {(min(twx, nx), min(twy, ny)) for (twx, twy) in tiers
             if min(twx, nx) * min(twy, ny) < wx * wy},
            key=lambda w: w[0] * w[1],
        ) + [(wx, wy)]
        fn = gather_branch
        for (twx, twy) in reversed(windows):
            def fn(i, j, zz, a, m, _twx=twx, _twy=twy, _inner=fn):
                return jax.lax.cond(
                    (sx < _twx) & (sy < _twy),
                    make_kernel_branch(_twx, _twy), _inner,
                    i, j, zz, a, m,
                )
        out = fn(ix, iy, z, act_col, mv)
        return jax.lax.optimization_barrier(out)

    def fold(queries, act_col, mv, *, onehot, correction):
        """Batched contact-model fold (see ``evaluate_pose_batch``):
        contact-grid ``[C, N]`` SoA world queries, ``act_col [C, 1]``
        active mask, ``mv [1, N]`` measurement variance -> ``[8, N]``
        per-particle rows (d1, d2, sq, pose_var, n_contacts, 0, 0, 0);
        no per-query array ever reaches HBM on the kernel branch."""
        xf, yf, zf = queries
        ix = jnp.floor(
            (xf - packed.origin[0]) / packed.resolution
        ).astype(jnp.int32)
        iy = jnp.floor(
            (yf - packed.origin[1]) / packed.resolution
        ).astype(jnp.int32)
        if mesh is None:
            return fold_one_device(ix, iy, zf, act_col, mv, onehot,
                                   correction)
        from jax.sharding import PartitionSpec as P

        shard_map = (jax.shard_map if hasattr(jax, "shard_map")
                     else __import__(
                         "jax.experimental.shard_map",
                         fromlist=["shard_map"]
                     ).shard_map)
        return shard_map(
            lambda i, j, zz, a, m: fold_one_device(
                i, j, zz, a, m, onehot, correction),
            mesh=mesh,
            in_specs=(P(None, "dp"), P(None, "dp"), P(None, "dp"),
                      P(None, None), P(None, "dp")),
            out_specs=P(None, "dp"),
            check_vma=False,
        )(ix, iy, zf, act_col, mv)

    def lookup(map_id, points):
        del map_id
        if mesh is None:
            return one_device(points)
        from jax.sharding import PartitionSpec as P

        shard_map = (jax.shard_map if hasattr(jax, "shard_map")
                     else __import__(
                         "jax.experimental.shard_map", fromlist=["shard_map"]
                     ).shard_map)
        n_out = 3 if isinstance(points, tuple) else 4
        return shard_map(
            one_device,
            mesh=mesh,
            in_specs=P("dp"),
            out_specs=(P("dp"),) * n_out,
            # pallas_call outputs carry no varying-mesh-axes metadata
            check_vma=False,
        )(points)

    # consumes the whole [N, C, 3] batch (window shared across particles)
    lookup.batched = True
    # also accepts SoA flat queries ``(x, y, z)`` -> flat
    # ``(found, mean, stdev)`` — see ``evaluate_pose_batch``
    lookup.soa = fused
    if fused:
        # in-kernel contact-model fold (group sums out, see ``fold``)
        lookup.fold = fold
    return lookup
