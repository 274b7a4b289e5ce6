"""Map-pool tests: copy-on-write, chains, rollover, fused match/merge."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from slam_eslam_tpu.mapping import map_pool as mp
from slam_eslam_tpu.mapping import mls_grid
from slam_eslam_tpu.mapping.mls_grid import MLSGrid, PatchCloud


def make_pool(n=4, b=10, nx=20, ny=20, res=0.5, chain_len=3,
              with_color=True):
    template = MLSGrid.create(nx, ny, res, (-5.0, -5.0), k=2)
    return mp.MapPool.from_template(template, n, b, chain_len,
                                    with_color=with_color)


def write_cell(pool, block, x, y, z):
    """Directly poke one patch into a block (test helper)."""
    ix = int((x - float(pool.origin[block, 0])) / pool.resolution)
    iy = int((y - float(pool.origin[block, 1])) / pool.resolution)
    lane = iy * pool.k  # slot 0 of the cell in the [nx, ny*K] image
    return dataclasses.replace(
        pool,
        mean=pool.mean.at[block, ix, lane].set(z),
        stdev=pool.stdev.at[block, ix, lane].set(0.1),
        # set valid bit, keep the template's horizontal bit
        meta=pool.meta.at[block, ix, lane].set(
            pool.meta[block, ix, lane] | 1
        ),
    )


class TestPoolBasics:
    def test_from_template(self):
        pool = make_pool()
        assert pool.n == 4 and pool.b == 10
        np.testing.assert_array_equal(np.asarray(pool.active()), [0, 1, 2, 3])
        np.testing.assert_array_equal(
            np.asarray(pool.refcounts()), [1, 1, 1, 1, 0, 0, 0, 0, 0, 0]
        )

    def test_resample_shares_blocks(self):
        pool = make_pool()
        pool = pool.resample(jnp.array([0, 0, 0, 3]))
        np.testing.assert_array_equal(np.asarray(pool.active()), [0, 0, 0, 3])
        ref = np.asarray(pool.refcounts())
        assert ref[0] == 3 and ref[3] == 1 and ref[1] == 0

    def test_ensure_unique_active(self):
        pool = make_pool()
        pool = write_cell(pool, 0, 0.0, 0.0, 7.0)
        pool = pool.resample(jnp.array([0, 0, 0, 3]))
        pool, n_failed = mp.ensure_unique_active(pool)
        assert int(n_failed) == 0
        active = np.asarray(pool.active())
        assert len(set(active.tolist())) == 4, f"actives not unique: {active}"
        # copies carry the content
        lookup = mp.chain_lookup(pool)
        for i in range(3):
            f, m, s, _ = lookup(jnp.asarray(i), jnp.array([[0.0, 0.0, 7.0]]))
            assert bool(f[0]), f"particle {i} lost its map content"
            np.testing.assert_allclose(m[0], 7.0)

    def test_resample_frees_unreferenced_blocks(self):
        # collapsing onto particle 0 releases blocks 1-3, so COW can
        # still hand every duplicate a private block
        pool = make_pool(n=4, b=4)
        pool = pool.resample(jnp.array([0, 0, 0, 0]))
        pool, n_failed = mp.ensure_unique_active(pool)
        assert int(n_failed) == 0
        assert len(set(np.asarray(pool.active()).tolist())) == 4

    def test_pool_exhaustion_degrades(self):
        # pin every block through chain tails: no free blocks left
        pool = make_pool(n=4, b=4)
        pool = pool.resample(jnp.array([0, 0, 0, 0]))
        chain = pool.chain.at[:, 1].set(jnp.array([1, 2, 3, 1], jnp.int32))
        pool = dataclasses.replace(pool, chain=chain)
        pool, n_failed = mp.ensure_unique_active(pool)
        assert int(n_failed) == 3  # three dups could not get blocks


class TestRollover:
    def test_no_rollover_when_inside(self):
        pool = make_pool()
        xy = jnp.zeros((4, 2))
        pool2, nf = mp.rollover(pool, xy, threshold=3.0)
        np.testing.assert_array_equal(
            np.asarray(pool2.chain), np.asarray(pool.chain)
        )

    def test_rollover_allocates_and_chains(self):
        pool = make_pool()
        pool = write_cell(pool, 1, 0.0, 0.0, 2.5)
        xy = jnp.array([[0.0, 0.0], [8.0, 0.0], [0.0, 0.0], [0.0, 0.0]])
        pool2, nf = mp.rollover(pool, xy, threshold=3.0)
        assert int(nf) == 0
        chain1 = np.asarray(pool2.chain[1])
        assert chain1[1] == 1, "old grid should move down the chain"
        assert chain1[0] >= 4, "fresh block expected"
        # new block centred on the particle
        org = np.asarray(pool2.origin[chain1[0]])
        np.testing.assert_allclose(org, [8.0 - 5.0, -5.0], atol=1e-5)
        # old content still reachable through the chain
        lookup = mp.chain_lookup(pool2)
        f, m, s, _ = lookup(jnp.asarray(1), jnp.array([[0.0, 0.0, 2.5]]))
        assert bool(f[0])
        np.testing.assert_allclose(m[0], 2.5)

    def test_chain_head_priority(self):
        # head (newer) grid wins over older chain entries
        pool = make_pool()
        pool = write_cell(pool, 1, 0.0, 0.0, 2.5)
        xy = jnp.array([[0.0, 0.0], [8.0, 0.0], [0.0, 0.0], [0.0, 0.0]])
        pool, _ = mp.rollover(pool, xy, threshold=3.0)
        head = int(pool.chain[1, 0])
        # overlapping area: write different z into the head block
        pool = write_cell(pool, head, 4.0, 0.0, 9.0)
        pool = write_cell(pool, 1, 4.0, 0.0, 1.0)
        lookup = mp.chain_lookup(pool, z_window=20.0)
        f, m, _, _ = lookup(jnp.asarray(1), jnp.array([[4.0, 0.0, 5.0]]))
        assert bool(f[0])
        np.testing.assert_allclose(m[0], 9.0)


class TestFusedMergeMatch:
    def _cloud(self, n=32, z=1.0):
        key = jax.random.PRNGKey(3)
        xy = jax.random.uniform(key, (n, 2), minval=-2.0, maxval=2.0)
        return PatchCloud.create(
            xy=xy, z=jnp.full((n,), z), stdev=jnp.full((n,), 0.1),
            valid=jnp.ones((n,), bool),
        )

    def test_merge_cloud_all_isolated_per_particle(self):
        pool = make_pool()
        cloud = self._cloud()
        xy = jnp.zeros((4, 2))
        yaw = jnp.zeros((4,))
        z_off = jnp.array([0.0, 10.0, 0.0, 0.0])
        pool = mp.merge_cloud_all(
            pool, xy, yaw, z_off, jnp.zeros((4,)), cloud, 5
        )
        lookup = mp.chain_lookup(pool, z_window=3.0)
        # particle 1's map has patches at z=11, particle 0 at z=1
        pt = np.asarray(cloud.xy[0])
        f0, m0, _, _ = lookup(
            jnp.asarray(0), jnp.array([[pt[0], pt[1], 1.0]])
        )
        f1, m1, _, _ = lookup(
            jnp.asarray(1), jnp.array([[pt[0], pt[1], 11.0]])
        )
        assert bool(f0[0]) and bool(f1[0])
        np.testing.assert_allclose(m0[0], 1.0, atol=1e-5)
        np.testing.assert_allclose(m1[0], 11.0, atol=1e-5)
        # particle 0's map must NOT see z=11
        f0b, _, _, _ = lookup(
            jnp.asarray(0), jnp.array([[pt[0], pt[1], 11.0]])
        )
        assert not bool(f0b[0])

    def test_match_cloud_all_discriminates(self):
        pool = make_pool()
        cloud = self._cloud(z=0.5)
        xy = jnp.zeros((4, 2))
        yaw = jnp.zeros((4,))
        pool = mp.merge_cloud_all(
            pool, xy, yaw, jnp.zeros(4), jnp.zeros(4), cloud, 0
        )
        # particle 0 matches at its build pose; particle 1 offset 2 m up
        scores = mp.match_cloud_all(
            pool, xy, yaw, jnp.array([0.0, 2.0, 0.0, 0.0]), jnp.zeros(4),
            cloud, sampling=1,
        )
        s = np.asarray(scores)
        assert s[0] > 0.9
        assert s[1] < 0.1

    def test_update_idx_stamped(self):
        pool = make_pool()
        cloud = self._cloud()
        pool = mp.merge_cloud_all(
            pool, jnp.zeros((4, 2)), jnp.zeros(4), jnp.zeros(4),
            jnp.zeros(4), cloud, 42,
        )
        assert int(jnp.max(pool.update_idx)) == 42

    def test_pallas_merge_matches_xla(self):
        """The per-block streaming Pallas merge kernel (interpret mode
        on CPU) must reproduce the dedup + gather/scatter XLA path —
        same slot decisions, same fused values, untouched blocks kept."""
        pool = make_pool(n=4, b=10, with_color=False)
        # pre-populate some patches so fuse/gap/insert all trigger
        pool = write_cell(pool, 0, 0.1, 0.1, 1.02)   # fuses (|dz|<=0.1)
        pool = write_cell(pool, 1, -0.9, 0.4, 1.9)   # gap-extends
        cloud = self._cloud(n=48, z=1.0)
        xy = jnp.zeros((4, 2))
        yaw = jnp.array([0.0, 0.3, -0.2, 1.0])
        z_off = jnp.array([0.0, 1.0, 0.0, -0.5])
        os_ = jnp.array([0.05, 0.0, 0.1, 0.2])
        args = (pool, xy, yaw, z_off, os_, cloud, 7)
        px = mp.merge_cloud_all(*args, kernel="xla")
        pk = mp.merge_cloud_all(*args, kernel="pallas")
        np.testing.assert_array_equal(
            np.asarray(px.valid), np.asarray(pk.valid)
        )
        np.testing.assert_array_equal(
            np.asarray(px.horizontal), np.asarray(pk.horizontal)
        )
        np.testing.assert_array_equal(
            np.asarray(px.update_idx), np.asarray(pk.update_idx)
        )
        np.testing.assert_allclose(
            np.asarray(px.mean), np.asarray(pk.mean), rtol=1e-5,
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(px.stdev), np.asarray(pk.stdev), rtol=1e-5,
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(px.height), np.asarray(pk.height), rtol=1e-5,
            atol=1e-6,
        )
        # unvisited blocks (4..9) kept their contents bit-for-bit
        np.testing.assert_array_equal(
            np.asarray(pk.mean[4:]), np.asarray(pool.mean[4:])
        )

    def test_pallas_merge_multi_point_cells(self):
        """Several points landing in one cell must inverse-variance
        fuse identically in both paths (the kernel's one-hot matmul
        accumulation vs the XLA sort-dedup)."""
        pool = make_pool(n=4, b=10, with_color=False)
        n_pts = 32
        xy = jnp.tile(jnp.array([[0.3, 0.3], [0.3, 0.8]]), (16, 1))
        cloud = PatchCloud.create(
            xy=xy,
            z=jnp.linspace(0.9, 1.1, n_pts),
            stdev=jnp.linspace(0.05, 0.3, n_pts),
            valid=jnp.arange(n_pts) % 5 != 4,
        )
        args = (pool, jnp.zeros((4, 2)), jnp.zeros(4), jnp.zeros(4),
                jnp.zeros(4), cloud, 1)
        px = mp.merge_cloud_all(*args, kernel="xla")
        pk = mp.merge_cloud_all(*args, kernel="pallas")
        np.testing.assert_array_equal(
            np.asarray(px.valid), np.asarray(pk.valid)
        )
        np.testing.assert_allclose(
            np.asarray(px.mean), np.asarray(pk.mean), rtol=1e-5,
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(px.stdev), np.asarray(pk.stdev), rtol=1e-5,
            atol=1e-6,
        )

    def test_pallas_chain_lookup_matches_xla(self):
        """The streaming chain-lookup kernel (interpret mode on CPU)
        must reproduce the vmapped XLA chain_lookup: same hits, same
        selected patches, head-first chain priority, empty chain
        entries skipped."""
        from slam_eslam_tpu.ops import pallas_chain

        pool = make_pool(n=4, b=10, with_color=False)
        cloud = self._cloud(n=48, z=1.0)
        pool = mp.merge_cloud_all(
            pool, jnp.zeros((4, 2)), jnp.zeros(4),
            jnp.array([0.0, 10.0, 0.0, 0.0]), jnp.zeros(4), cloud, 1,
            kernel="xla",
        )
        # grow particle 1's chain so a tail level must resolve
        pool, _ = mp.rollover(
            pool, jnp.array([[0.0, 0.0], [8.0, 0.0], [0.0, 0.0],
                             [0.0, 0.0]]), threshold=3.0,
        )
        # queries: on-cloud points (hits incl. through the chain tail),
        # plus out-of-bounds and out-of-z-window misses
        base = jnp.concatenate(
            [cloud.xy[:12], jnp.full((12, 1), 1.0)], axis=1
        )
        pts = jnp.stack([
            base,                                        # z = 1 hits p0
            base.at[:, 2].set(11.0),                     # hits p1 tail
            base.at[:, 0].add(20.0),                     # out of bounds
            base.at[:, 2].set(6.0),                      # z-window miss
        ], axis=0)

        ref = mp.chain_lookup(pool, z_window=3.0)
        rf, rm, rs, _ = jax.vmap(ref)(jnp.arange(4), pts)
        kf, km, ks = pallas_chain.chain_lookup_blocks(
            pool.mean, pool.stdev, pool.meta, pool.chain, pool.origin,
            pool.resolution, pts, k=pool.k, z_window=3.0,
            interpret=True,
        )
        f = np.asarray(rf)
        assert f[0].sum() == 12 and f[1].sum() == 12, "fixture weak"
        assert f[2].sum() == 0 and f[3].sum() == 0
        np.testing.assert_array_equal(f, np.asarray(kf))
        np.testing.assert_allclose(
            np.asarray(km)[f], np.asarray(rm)[f], rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(ks)[f], np.asarray(rs)[f], rtol=1e-6
        )

    def test_jit_merge(self):
        pool = make_pool()
        cloud = self._cloud()
        f = jax.jit(
            lambda p, c: mp.merge_cloud_all(
                p, jnp.zeros((4, 2)), jnp.zeros(4), jnp.zeros(4),
                jnp.zeros(4), c, 0,
            )
        )
        out = f(pool, cloud)
        assert int(jnp.sum(out.valid)) > 0

    def test_merge_parity_on_dense_random_pool(self):
        """Kernel-vs-XLA parity on a HALF-FULL random pool (k=4).

        Regression test for the round-3 `_group_min`/`_group_sum` roll
        direction bug: `pltpu.roll(x, s)[l] = x[l-s]` (jnp.roll
        semantics), and the swapped shifts mixed NEIGHBOURING cells'
        slot metrics into each group — invisible on the sparse
        insert-mostly fixtures above (empty neighbour groups carry the
        same masked sentinel), catastrophic on dense pools where the
        fuse/gap/evict rules read existing patches."""
        n, b, nx, ny, k = 16, 20, 40, 40, 4
        rng = np.random.default_rng(11)
        shape = (b, nx, ny * k)
        pool = mp.MapPool(
            mean=jnp.asarray(rng.normal(size=shape).astype(np.float32)),
            stdev=jnp.asarray(
                (0.01 + 0.2 * rng.random(shape)).astype(np.float32)),
            height=jnp.zeros(shape, jnp.float32),
            meta=jnp.asarray(
                ((rng.random(shape) < 0.5).astype(np.int32)) | 2),
            color=None,
            origin=jnp.asarray(
                (rng.normal(size=(b, 2)) * 2).astype(np.float32)),
            allocated=jnp.ones((b,), bool),
            chain=jnp.broadcast_to(
                jnp.arange(n, dtype=jnp.int32)[:, None], (n, 3)),
            resolution=0.25,
            nx=nx, ny=ny, k=k,
        )
        p = 96
        xy = rng.uniform(0.0, 10.0, size=(p, 2)).astype(np.float32)
        xy += np.asarray(pool.origin[0])
        cloud = PatchCloud.create(
            xy=jnp.asarray(xy),
            z=jnp.asarray(rng.normal(size=(p,)).astype(np.float32)),
            stdev=jnp.full((p,), 0.05),
            valid=jnp.ones((p,), bool),
        )
        args = (pool, jnp.zeros((n, 2)), jnp.zeros(n), jnp.zeros(n),
                jnp.full((n,), 0.01), cloud, 7)
        px = mp.merge_cloud_all(*args, kernel="xla")
        pk = mp.merge_cloud_all(*args, kernel="pallas")
        np.testing.assert_array_equal(
            np.asarray(px.meta), np.asarray(pk.meta))
        v = np.asarray((px.meta & 1) != 0)
        for fld in ("mean", "stdev", "height"):
            np.testing.assert_allclose(
                np.asarray(getattr(pk, fld))[v],
                np.asarray(getattr(px, fld))[v], rtol=1e-5, atol=1e-6)


class TestNegativeInformation:
    """Laser-path negative information on per-particle active grids
    (``EmbodiedSlamFilter.cpp:160``; config doc
    ``src/Configuration.hpp:190-193``)."""

    def test_contradicted_patch_removed_per_particle(self):
        pool = make_pool(n=2, with_color=False)
        # stale patches: particle 0 at world (1, 1, z=2); particle 1 at
        # world (-2, 0, z=0.5)
        pool = write_cell(pool, 0, 1.0, 1.0, 2.0)
        pool = write_cell(pool, 1, -2.0, 0.0, 0.5)

        # free-space samples in the body frame; particle poses differ
        xy = jnp.array([[0.0, 0.0], [-3.0, 0.0]])
        yaw = jnp.zeros(2)
        z = jnp.array([0.0, 0.5])
        # body-frame point (1, 1, 2.0) -> p0 world (1, 1, 2.0) HIT;
        #                              -> p1 world (-2, 1, 2.5) miss
        # body-frame point (1, 0, 0.0) -> p0 world (1, 0, 0.0) no patch;
        #                              -> p1 world (-2, 0, 0.5) HIT
        pts = jnp.array([[1.0, 1.0, 2.0], [1.0, 0.0, 0.0]])
        mask = jnp.ones(2, bool)
        out = mp.apply_negative_cloud_all(pool, xy, yaw, z, pts, mask)

        lookup = mp.chain_lookup(out)
        f0, _, _, _ = lookup(0, jnp.array([[1.0, 1.0, 2.0]]))
        f1, _, _, _ = lookup(1, jnp.array([[-2.0, 0.0, 0.5]]))
        assert not bool(f0[0]), "particle 0's contradicted patch survives"
        assert not bool(f1[0]), "particle 1's contradicted patch survives"

    def test_z_margin_and_mask_respected(self):
        pool = make_pool(n=1, with_color=False)
        pool = write_cell(pool, 0, 1.0, 1.0, 2.0)
        xy, yaw, z = jnp.zeros((1, 2)), jnp.zeros(1), jnp.zeros(1)

        # sample 0.5 m below the patch: outside the 0.15 m margin
        out = mp.apply_negative_cloud_all(
            pool, xy, yaw, z, jnp.array([[1.0, 1.0, 1.5]]),
            jnp.ones(1, bool),
        )
        f, _, _, _ = mp.chain_lookup(out)(0, jnp.array([[1.0, 1.0, 2.0]]))
        assert bool(f[0]), "sample outside z_margin must not erase"

        # masked-off sample never erases
        out = mp.apply_negative_cloud_all(
            pool, xy, yaw, z, jnp.array([[1.0, 1.0, 2.0]]),
            jnp.zeros(1, bool),
        )
        f, _, _, _ = mp.chain_lookup(out)(0, jnp.array([[1.0, 1.0, 2.0]]))
        assert bool(f[0]), "masked sample must not erase"

    def test_only_active_block_touched(self):
        # a patch in a chain TAIL block (not head) must survive: merges
        # only write the active grid, so only it can hold stale patches
        pool = make_pool(n=1, b=10, with_color=False)
        pool = write_cell(pool, 5, 1.0, 1.0, 2.0)
        pool = dataclasses.replace(
            pool, chain=jnp.array([[0, 5, -1]], jnp.int32)
        )
        out = mp.apply_negative_cloud_all(
            pool, jnp.zeros((1, 2)), jnp.zeros(1), jnp.zeros(1),
            jnp.array([[1.0, 1.0, 2.0]]), jnp.ones(1, bool),
        )
        f, _, _, _ = mp.chain_lookup(out)(0, jnp.array([[1.0, 1.0, 2.0]]))
        assert bool(f[0]), "tail-block patch must survive negative info"


class TestCompactStorage:
    """Packed meta word + optional bf16 float fields (the 100k-particle
    HBM configuration)."""

    def test_meta_roundtrip(self):
        v = jnp.array([1, 0, 1], jnp.int32)
        h = jnp.array([0, 1, 1], jnp.int32)
        u = jnp.array([0, 7, 123456], jnp.int32)
        meta = mp.pack_meta(v, h, u)
        np.testing.assert_array_equal(np.asarray(meta & 1), np.asarray(v))
        np.testing.assert_array_equal(
            np.asarray((meta >> 1) & 1), np.asarray(h)
        )
        np.testing.assert_array_equal(np.asarray(meta >> 2), np.asarray(u))

    def test_bf16_pool_merge_and_lookup(self):
        template = MLSGrid.create(20, 20, 0.5, (-5.0, -5.0), k=2)
        mk = lambda dt: mp.MapPool.from_template(
            template, 4, 10, 3, with_color=False, dtype=dt
        )
        key = jax.random.PRNGKey(3)
        n = 32
        xy = jax.random.uniform(key, (n, 2), minval=-2.0, maxval=2.0)
        cloud = PatchCloud.create(
            xy=xy, z=jnp.full((n,), 1.0), stdev=jnp.full((n,), 0.1),
            valid=jnp.ones((n,), bool),
        )
        args = (jnp.zeros((4, 2)), jnp.zeros(4),
                jnp.array([0.0, 10.0, 0.0, 0.0]), jnp.zeros(4), cloud, 5)
        outs = {}
        for dt in (jnp.float32, jnp.bfloat16):
            pool = mp.merge_cloud_all(mk(dt), *args, kernel="xla")
            assert pool.mean.dtype == dt
            lookup = mp.chain_lookup(pool, z_window=3.0)
            pt = np.asarray(cloud.xy[0])
            f, m, s, _ = lookup(jnp.asarray(0),
                                jnp.array([[pt[0], pt[1], 1.0]]))
            assert bool(f[0])
            assert m.dtype == jnp.float32  # lookups always return f32
            outs[str(dt)] = (float(m[0]), float(s[0]))
        # bf16 storage rounds once: ~3 decimal digits
        a, b = outs["<class 'jax.numpy.float32'>"], outs[
            "<class 'jax.numpy.bfloat16'>"
        ]
        np.testing.assert_allclose(b[0], a[0], rtol=1e-2, atol=1e-2)

    def test_bf16_pallas_merge_matches_xla(self):
        template = MLSGrid.create(16, 16, 0.5, (-4.0, -4.0), k=2)
        pool0 = mp.MapPool.from_template(
            template, 4, 8, 2, with_color=False, dtype=jnp.bfloat16
        )
        key = jax.random.PRNGKey(9)
        n = 24
        xy = jax.random.uniform(key, (n, 2), minval=-2.0, maxval=2.0)
        cloud = PatchCloud.create(
            xy=xy,
            z=jax.random.normal(jax.random.PRNGKey(1), (n,)),
            stdev=jnp.full((n,), 0.1),
            valid=jnp.ones((n,), bool),
        )
        args = (jnp.zeros((4, 2)), jnp.zeros(4), jnp.zeros(4),
                jnp.zeros(4), cloud, 3)
        px = mp.merge_cloud_all(pool0, *args, kernel="xla")
        pk = mp.merge_cloud_all(pool0, *args, kernel="pallas")
        np.testing.assert_array_equal(
            np.asarray(px.meta), np.asarray(pk.meta)
        )
        for fld in ("mean", "stdev", "height"):
            np.testing.assert_allclose(
                np.asarray(getattr(px, fld), np.float32),
                np.asarray(getattr(pk, fld), np.float32),
                rtol=2e-2, atol=2e-2,
            )


class TestGroupedMerge:
    """merge_blocks_grouped (G blocks/step via manual DMA) must be
    bit-identical to the per-block kernel, including ragged tails
    (n % group != 0) and group > n."""

    def _setup(self, n=5):
        pool = make_pool(n=n, b=12, with_color=False)
        pool = write_cell(pool, 0, 0.1, 0.1, 1.02)
        pool = write_cell(pool, 1, -0.9, 0.4, 1.9)
        key = jax.random.PRNGKey(11)
        xy_c = jax.random.uniform(key, (48, 2), minval=-2.0, maxval=2.0)
        cloud = PatchCloud.create(
            xy=xy_c, z=jnp.full((48,), 1.0),
            stdev=jnp.full((48,), 0.1), valid=jnp.ones((48,), bool),
        )
        xy = jnp.zeros((n, 2))
        yaw = jnp.linspace(-1.0, 1.0, n)
        z_off = jnp.linspace(-0.5, 1.0, n)
        os_ = jnp.full((n,), 0.05)
        return pool, (xy, yaw, z_off, os_, cloud)

    def _assert_pools_equal(self, a, b):
        # slot decisions must agree exactly; float fields may differ by
        # a ULP (the grouped kernel's accumulation dot contracts over
        # G*P instead of P terms — different HIGHEST-precision
        # decomposition order)
        np.testing.assert_array_equal(
            np.asarray(a.meta), np.asarray(b.meta), err_msg="meta"
        )
        for f in ("mean", "stdev", "height"):
            np.testing.assert_allclose(
                np.asarray(getattr(a, f)).astype(np.float32),
                np.asarray(getattr(b, f)).astype(np.float32),
                rtol=1e-6, atol=1e-7, err_msg=f,
            )

    def test_ragged_group(self):
        pool, args = self._setup(n=5)
        p1 = mp.merge_cloud_all(pool, *args, 7, kernel="pallas")
        p4 = mp.merge_cloud_all(pool, *args, 7, kernel="pallas",
                                group=4)
        self._assert_pools_equal(p1, p4)

    def test_group_exceeds_n(self):
        pool, args = self._setup(n=3)
        p1 = mp.merge_cloud_all(pool, *args, 2, kernel="pallas")
        pg = mp.merge_cloud_all(pool, *args, 2, kernel="pallas",
                                group=8)
        self._assert_pools_equal(p1, pg)

    def test_exact_group(self):
        pool, args = self._setup(n=4)
        p1 = mp.merge_cloud_all(pool, *args, 1, kernel="pallas")
        pg = mp.merge_cloud_all(pool, *args, 1, kernel="pallas",
                                group=2)
        self._assert_pools_equal(p1, pg)

    def test_grouped_bf16_pool(self):
        template = MLSGrid.create(20, 20, 0.5, (-5.0, -5.0), k=2)
        pool = mp.MapPool.from_template(
            template, 5, 12, 3, with_color=False, dtype=jnp.bfloat16
        )
        _, args = self._setup(n=5)
        p1 = mp.merge_cloud_all(pool, *args, 3, kernel="pallas")
        pg = mp.merge_cloud_all(pool, *args, 3, kernel="pallas",
                                group=4)
        self._assert_pools_equal(p1, pg)


class TestMatchKernel:
    def test_pallas_match_matches_xla(self):
        """match_cloud_all(kernel='pallas') (interpret on CPU) must
        reproduce the vmapped XLA gather scores — hits, misses,
        sampling mask and normalisation included."""
        pool = make_pool(n=4, b=10, with_color=False)
        key = jax.random.PRNGKey(3)
        n_pts = 37  # deliberately not a multiple of sampling
        xy = jax.random.uniform(key, (n_pts, 2), minval=-2.0, maxval=2.0)
        cloud = PatchCloud.create(
            xy=xy, z=jnp.full((n_pts,), 0.5),
            stdev=jnp.full((n_pts,), 0.1),
            valid=jnp.arange(n_pts) % 5 != 4,
        )
        pxy = jnp.zeros((4, 2))
        yaw = jnp.array([0.0, 0.3, 0.0, 0.0])
        pool = mp.merge_cloud_all(
            pool, pxy, yaw, jnp.zeros(4), jnp.zeros(4), cloud, 0
        )
        zo = jnp.array([0.0, 2.0, 0.1, -5.0])
        zs = jnp.array([0.0, 0.1, 0.2, 0.0])
        args = (pool, pxy, yaw, zo, zs, cloud)
        for sampling in (1, 3, 10):
            sx = mp.match_cloud_all(*args, sampling=sampling,
                                    kernel="xla")
            sp = mp.match_cloud_all(*args, sampling=sampling,
                                    kernel="pallas")
            np.testing.assert_allclose(
                np.asarray(sp), np.asarray(sx), rtol=1e-5, atol=1e-7,
                err_msg=f"sampling={sampling}",
            )


class TestChainKernelChunking:
    def test_chunked_grid_matches_direct(self):
        """Particle counts whose flat chain exceeds the SMEM
        scalar-prefetch budget run the kernel in sequential chunks
        (lax.map) — results must be identical, including ragged tails
        (n not a multiple of the chunk)."""
        from slam_eslam_tpu.ops import pallas_chain

        pool = make_pool(n=4, b=10, with_color=False)
        pool = write_cell(pool, 0, 1.0, 1.0, 2.0)
        pool = write_cell(pool, 2, -2.0, 0.0, 0.5)
        # 7 particles, chains referencing the 4 originals
        chain = jnp.asarray(
            [[0, -1, -1], [1, 0, -1], [2, -1, -1], [3, 2, -1],
             [0, 2, -1], [2, 0, -1], [1, -1, -1]], jnp.int32,
        )
        rng = np.random.default_rng(5)
        pts = jnp.asarray(
            rng.uniform(-4, 4, size=(7, 6, 3)).astype(np.float32)
        )
        pts = pts.at[:, 0].set(jnp.array([1.0, 1.0, 2.0]))  # known hit
        args = (pool.mean, pool.stdev, pool.meta, chain, pool.origin,
                pool.resolution, pts)
        kw = dict(k=pool.k, z_window=3.0, interpret=True)
        rf, rm, rs = pallas_chain.chain_lookup_blocks(*args, **kw)
        for chunk in (2, 3, 8):
            cf, cm, cs = pallas_chain.chain_lookup_blocks(
                *args, **kw, chunk_particles=chunk
            )
            np.testing.assert_array_equal(
                np.asarray(rf), np.asarray(cf), err_msg=f"chunk={chunk}"
            )
            np.testing.assert_allclose(
                np.asarray(rm), np.asarray(cm), err_msg=f"chunk={chunk}"
            )
            np.testing.assert_allclose(
                np.asarray(rs), np.asarray(cs), err_msg=f"chunk={chunk}"
            )
