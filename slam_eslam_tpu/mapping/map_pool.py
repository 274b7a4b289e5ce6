"""Per-particle MLS maps: a copy-on-write block pool.

The reference gives every particle its own mutable ``MLSMap`` (a chain
of MLSGrids with an active grid) via ``shared_ptr`` + deep clone on
resample (``/root/reference/src/PoseEstimator.hpp:28-106``,
``PoseEstimator.cpp:31-45``) and rolls to a fresh active grid when the
particle leaves the current one (``EmbodiedSlamFilter.cpp:195-207``).
Naively that is O(N x map) memory traffic per resample.

TPU-native design: one dense **block pool** ``[B, nx, ny, K]``; a
particle map is a fixed-length chain of block indices (most recent
first).  Invariants:

* merges only ever write a particle's *active* (chain head) block, so
  non-head blocks are immutable and can be shared freely — resampling
  duplicates chains by index copy (O(N) ints, no map copies);
* before any write, ``ensure_unique_active`` gives each particle an
  exclusively-owned head block, copying only the blocks that are
  actually shared (true copy-on-write; the reference's ``cloneMaps``
  deep-copies whole maps eagerly);
* all heads unique  =>  the merge of N particles x P cloud points is a
  single collision-free ``scatter_fuse_cells`` over the pool flattened
  to ``[B*nx, ny, K]`` — one kernel for the widest fan-out in the
  mapping path (``EmbodiedSlamFilter.cpp:179-232``).

Pool exhaustion degrades gracefully: particles that cannot get a
private block keep sharing (their concurrent cell writes then resolve
in unspecified order — bounded corruption of one scan merge, flagged in
the returned ``alloc_failed`` count).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from slam_eslam_tpu.mapping import mls_grid
from slam_eslam_tpu.mapping.mls_grid import MLSGrid, PatchCloud

_FIELDS = ["mean", "stdev", "height", "valid", "horizontal", "update_idx"]


def _data_fields(pool):
    """Per-slot SoA fields of this pool (``color`` is optional — None
    when the pool was built without colour to save 1.5x patch memory)."""
    return _FIELDS + (["color"] if pool.color is not None else [])


@partial(
    jax.tree_util.register_dataclass,
    data_fields=_FIELDS + ["color", "origin", "allocated", "chain"],
    meta_fields=["resolution"],
)
@dataclasses.dataclass
class MapPool:
    mean: jax.Array        # [B, nx, ny, K] float32
    stdev: jax.Array
    height: jax.Array
    valid: jax.Array       # [B, nx, ny, K] bool
    horizontal: jax.Array
    update_idx: jax.Array  # int32
    color: jax.Array | None  # [B, nx, ny, K, 3] float32, or None
    origin: jax.Array      # [B, 2] float32 — world xy of block cell (0,0)
    allocated: jax.Array   # [B] bool
    chain: jax.Array       # [N, L] int32 block ids, head = active; -1 empty
    resolution: float

    @property
    def b(self):
        return self.mean.shape[0]

    @property
    def nx(self):
        return self.mean.shape[1]

    @property
    def ny(self):
        return self.mean.shape[2]

    @property
    def k(self):
        return self.mean.shape[3]

    @property
    def n(self):
        return self.chain.shape[0]

    @property
    def chain_len(self):
        return self.chain.shape[1]

    def active(self):
        return self.chain[:, 0]

    @staticmethod
    def from_template(template: MLSGrid, n_particles, num_blocks,
                      chain_len=4, with_color=True):
        """Every particle starts with its own copy of the template grid
        (per-particle mode ``setEnvironment`` + immediate ``cloneMaps``,
        ``PoseEstimator.cpp:47-62``; seeding from a prebuilt environment
        grid = the clone-from-env path).

        ``with_color=False`` drops patch colours (1.5x less patch
        memory/merge traffic; slip/terrain fusion and textures then only
        work in shared-map mode)."""
        b = num_blocks
        assert b >= n_particles, "pool must hold one block per particle"

        def tile(x, fill=0):
            out = jnp.full((b,) + x.shape, fill, x.dtype)
            return out.at[:n_particles].set(
                jnp.broadcast_to(x, (n_particles,) + x.shape)
            )

        chain = jnp.full((n_particles, chain_len), -1, jnp.int32)
        chain = chain.at[:, 0].set(jnp.arange(n_particles, dtype=jnp.int32))
        return MapPool(
            mean=tile(template.mean),
            stdev=tile(template.stdev),
            height=tile(template.height),
            valid=tile(template.valid, False),
            horizontal=tile(template.horizontal, True),
            update_idx=tile(template.update_idx),
            color=tile(template.color) if with_color else None,
            origin=jnp.broadcast_to(template.origin, (b, 2)).copy(),
            allocated=(jnp.arange(b) < n_particles),
            chain=chain,
            resolution=template.resolution,
        )

    def refcounts(self):
        """References per block over all chain entries."""
        flat = self.chain.reshape(-1)
        return jax.ops.segment_sum(
            (flat >= 0).astype(jnp.int32),
            jnp.where(flat >= 0, flat, 0),
            num_segments=self.b,
        )

    def resample(self, idx):
        """Duplicate chains along a resampling index map — O(N) ints,
        replaces the reference's deep ``cloneMaps`` copies."""
        return dataclasses.replace(self, chain=self.chain[idx])


def _free_mask(pool: MapPool):
    """Blocks with zero chain references (safe to reclaim)."""
    return pool.refcounts() == 0


def _copy_blocks(pool: MapPool, dst, src, mask):
    """pool[dst[i]] <- pool[src[i]] where mask[i] (unique dst).

    The whole gather+scatter (2 x pool-sized HBM traffic in the worst
    case) runs under ``lax.cond``: frames where no block actually needs
    copying — every mapping frame between resamples, once heads are
    unique — cost nothing.  (Measured: at 4096 particles the
    unconditional copy dominated the streaming SLAM step.)
    """

    def do_copy(pool):
        d = jnp.where(mask, dst, pool.b)  # out-of-bounds -> dropped

        def cp(a):
            return a.at[d].set(a[jnp.where(mask, src, 0)], mode="drop")

        return dataclasses.replace(
            pool,
            **{f: cp(getattr(pool, f)) for f in _data_fields(pool)},
            origin=pool.origin.at[d].set(
                pool.origin[jnp.where(mask, src, 0)], mode="drop"
            ),
        )

    return jax.lax.cond(jnp.any(mask), do_copy, lambda p: p, pool)


def _allocate(pool: MapPool, want_mask):
    """Assign a distinct free block to each particle with ``want_mask``.

    Returns ``(new_block [N] int32 or -1, n_failed)``.
    """
    free = _free_mask(pool)
    # rank free blocks: free_ids[j] = index of j-th free block
    order = jnp.argsort(~free)  # frees first, stable
    n_free = jnp.sum(free)
    rank = jnp.cumsum(want_mask.astype(jnp.int32)) - 1
    ok = want_mask & (rank < n_free)
    new_block = jnp.where(
        ok, order[jnp.clip(rank, 0, pool.b - 1)], -1
    ).astype(jnp.int32)
    n_failed = jnp.sum(want_mask) - jnp.sum(ok)
    return new_block, n_failed


def ensure_unique_active(pool: MapPool):
    """Copy-on-write: give every particle an exclusively-owned head block.

    Returns ``(pool, n_failed)`` — ``n_failed`` particles stayed on a
    shared block because the pool was exhausted.
    """
    active = pool.active()
    n = pool.n
    idx = jnp.arange(n, dtype=jnp.int32)
    owner = jax.ops.segment_min(idx, active, num_segments=pool.b)
    is_dup = idx != owner[active]

    new_block, n_failed = _allocate(pool, is_dup)
    do = new_block >= 0
    pool = _copy_blocks(pool, new_block, active, do)
    chain = pool.chain.at[:, 0].set(
        jnp.where(do, new_block, pool.chain[:, 0])
    )
    allocated = pool.allocated.at[
        jnp.where(do, new_block, pool.b)
    ].set(True, mode="drop")
    return dataclasses.replace(pool, chain=chain, allocated=allocated), n_failed


def rollover(pool: MapPool, xy, threshold):
    """Select a fresh active grid for particles that left their current
    one (``MLSMap::selectActiveGrid``; trigger condition
    ``EmbodiedSlamFilter.cpp:195-207``: |offset| beyond
    ``gridSize/2 * gridThreshold`` from the active grid centre).

    ``xy``: [N, 2] particle positions.  New blocks are empty grids
    centred on the particle; the chain shifts (oldest dropped — its
    block frees itself once unreferenced).  Returns ``(pool, n_failed)``.
    """
    size_x = pool.nx * pool.resolution
    size_y = pool.ny * pool.resolution
    center = pool.origin[pool.active()] + jnp.array(
        [size_x / 2.0, size_y / 2.0], xy.dtype
    )
    off = jnp.abs(xy - center)
    need = (off[:, 0] > threshold) | (off[:, 1] > threshold)

    new_block, n_failed = _allocate(pool, need)
    do = new_block >= 0

    def do_roll(pool):
        # clear the new blocks and position them on the particle
        d = jnp.where(do, new_block, pool.b)
        pool = dataclasses.replace(
            pool,
            valid=pool.valid.at[d].set(False, mode="drop"),
            update_idx=pool.update_idx.at[d].set(0, mode="drop"),
            origin=pool.origin.at[d].set(
                xy - jnp.array([size_x / 2.0, size_y / 2.0], xy.dtype),
                mode="drop",
            ),
            allocated=pool.allocated.at[d].set(True, mode="drop"),
        )
        shifted = jnp.concatenate(
            [new_block[:, None], pool.chain[:, :-1]], axis=1
        )
        chain = jnp.where(do[:, None], shifted, pool.chain)
        return dataclasses.replace(pool, chain=chain)

    # rollovers are rare (a particle crossing its grid border) — skip
    # the pool-wide scatters entirely on frames with none
    pool = jax.lax.cond(jnp.any(do), do_roll, lambda p: p, pool)
    return pool, n_failed


def chain_lookup(pool: MapPool, z_window=3.0):
    """Build the per-particle map-lookup callback over grid chains.

    ``lookup(particle_idx, points [C, 3])`` searches the particle's
    chain head-first and returns the first hit per point
    (``MLSMap::getPatch`` searches its grid list the same way).
    Vmapped by the pose estimator over particles.
    """

    def lookup(particle_idx, points):
        chain = pool.chain[particle_idx]          # [L]
        found = jnp.zeros(points.shape[:-1], bool)
        mean = jnp.zeros(points.shape[:-1], pool.mean.dtype)
        stdev = jnp.zeros(points.shape[:-1], pool.mean.dtype)
        color = jnp.zeros(points.shape[:-1] + (3,), pool.mean.dtype)
        with_color = pool.color is not None
        for l in range(pool.chain_len):
            b = chain[l]
            ok = b >= 0
            bi = jnp.where(ok, b, 0)
            f, m, s, c = _block_get_patch(
                pool, bi, points, z_window, with_color=with_color
            )
            use = ok & f & ~found
            mean = jnp.where(use, m, mean)
            stdev = jnp.where(use, s, stdev)
            if with_color:
                color = jnp.where(use[..., None], c, color)
            found = found | use
        return found, mean, stdev, color

    return lookup


def _block_get_patch(pool: MapPool, b, points, z_window, with_color=False):
    origin = pool.origin[b]
    rel = (points[..., :2] - origin) / pool.resolution
    ix = jnp.floor(rel[..., 0]).astype(jnp.int32)
    iy = jnp.floor(rel[..., 1]).astype(jnp.int32)
    inb = (ix >= 0) & (ix < pool.nx) & (iy >= 0) & (iy < pool.ny)
    cix = jnp.where(inb, ix, 0)
    ciy = jnp.where(inb, iy, 0)
    means = pool.mean[b, cix, ciy]     # [..., K]
    stdevs = pool.stdev[b, cix, ciy]
    valids = pool.valid[b, cix, ciy]
    z = points[..., 2:3]
    dist = jnp.abs(means - z)
    cand = valids & (dist <= z_window)
    dist = jnp.where(cand, dist, jnp.inf)
    best = jnp.argmin(dist, axis=-1)
    found = inb & jnp.any(cand, axis=-1)
    take = partial(jnp.take_along_axis, indices=best[..., None], axis=-1)
    color = None
    if with_color and pool.color is not None:
        colors = pool.color[b, cix, ciy]  # [..., K, 3]
        color = jnp.take_along_axis(
            colors, best[..., None, None], axis=-2
        )[..., 0, :]
    return found, take(means)[..., 0], take(stdevs)[..., 0], color


def merge_cloud_all(pool: MapPool, xy, yaw, z_offset, offset_stdev,
                    cloud: PatchCloud, update_idx,
                    patch_thickness=0.1, gap_size=1.5):
    """Merge one scan cloud into every particle's active grid at once.

    The fused equivalent of the reference's per-particle
    ``pgrid->merge(scanMap, C_s2p, offsetPatch)`` loop
    (``EmbodiedSlamFilter.cpp:222-227``): transforms the cloud by each
    particle pose, offsets by its (zPos, zSigma), and scatter-fuses all
    N x P patches into the flattened pool in one pass.  Requires unique
    active blocks (call ``ensure_unique_active`` first).
    """
    n, p = pool.n, cloud.p
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    # [N, P, 2] world xy of cloud points under each particle
    px, py = cloud.xy[:, 0], cloud.xy[:, 1]
    wx = c[:, None] * px[None, :] - s[:, None] * py[None, :] + xy[:, 0:1]
    wy = s[:, None] * px[None, :] + c[:, None] * py[None, :] + xy[:, 1:2]
    wz = cloud.z[None, :] + z_offset[:, None]
    var = (cloud.stdev**2)[None, :] + (offset_stdev**2)[:, None]

    active = pool.active()                      # [N]
    origin = pool.origin[active]                # [N, 2]
    ix = jnp.floor((wx - origin[:, 0:1]) / pool.resolution).astype(jnp.int32)
    iy = jnp.floor((wy - origin[:, 1:2]) / pool.resolution).astype(jnp.int32)
    inb = (ix >= 0) & (ix < pool.nx) & (iy >= 0) & (iy < pool.ny)
    mask = inb & cloud.valid[None, :]

    # fuse same-cell points row-wise: each particle merges into its own
    # (unique) active block, so cross-particle collisions are impossible
    # and the dedup runs as N independent lane-axis sorts + MXU segment
    # sums instead of one global N*P sort (see _dedup_fuse_rows)
    bx = pool.b * pool.nx
    lin = (active[:, None] * pool.nx + ix) * pool.ny + iy      # [N, P]
    cf = (
        jnp.broadcast_to(cloud.color[None], (n, p, 3))
        if pool.color is not None else None
    )
    lin_s, z2r, v2r, keepr, fcolor = mls_grid._dedup_fuse_rows(
        lin, wz, var, mask, sentinel=bx * pool.ny, color=cf
    )
    flat = lambda a: a.reshape((-1,) + a.shape[2:])
    gx2 = flat(lin_s // pool.ny)
    gy2 = flat(lin_s % pool.ny)
    z2, v2, keep = flat(z2r), flat(v2r), flat(keepr)
    fcolor = None if fcolor is None else flat(fcolor)
    fields = _data_fields(pool)

    def flat_pool(a):
        return a.reshape((bx, pool.ny, pool.k) + a.shape[4:])

    arrays = {f: flat_pool(getattr(pool, f)) for f in fields}
    out = mls_grid.scatter_fuse_cells(
        arrays, gx2, gy2, z2, v2, keep, update_idx,
        patch_thickness=patch_thickness, gap_size=gap_size, x_oob=bx,
        color=fcolor,
    )
    shape = (pool.b, pool.nx, pool.ny, pool.k)
    return dataclasses.replace(
        pool,
        **{f: out[f].reshape(shape + out[f].shape[3:]) for f in fields},
    )


def match_cloud_all(pool: MapPool, xy, yaw, z_offset, offset_stdev,
                    cloud: PatchCloud, sampling=10, sigma=0.2,
                    z_window=3.0):
    """Per-particle scan-to-map consistency scores [N] (fused equivalent
    of the ``pgrid->match`` loop, ``EmbodiedSlamFilter.cpp:214-221``;
    matches query the particle's active grid)."""
    p = cloud.p
    sample_mask = (jnp.arange(p) % sampling) == 0
    m = cloud.valid & sample_mask

    def one(i, x, th, zo, os_):
        c_, s_ = jnp.cos(th), jnp.sin(th)
        wx = c_ * cloud.xy[:, 0] - s_ * cloud.xy[:, 1] + x[0]
        wy = s_ * cloud.xy[:, 0] + c_ * cloud.xy[:, 1] + x[1]
        wz = cloud.z + zo
        pts = jnp.stack([wx, wy, wz], axis=-1)
        b = pool.chain[i, 0]
        f, mean, stdev, _ = _block_get_patch(pool, b, pts, z_window)
        var = sigma**2 + stdev**2 + cloud.stdev**2 + os_**2
        score = jnp.exp(-0.5 * (wz - mean) ** 2 / var)
        score = jnp.where(m & f, score, 0.0)
        return jnp.sum(score) / jnp.maximum(jnp.sum(m), 1)

    return jax.vmap(one)(
        jnp.arange(pool.n), xy, yaw, z_offset, offset_stdev
    )
