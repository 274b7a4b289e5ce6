"""Tests for the SoA MLS grid: lookup, fusion, match/merge.

Scripted-grid style follows the reference's fake-map pattern
(``/root/reference/test/testContactModel.cpp:8-38`` and the thin direct
MLS access in ``test/testMap.cpp:236-257``).
"""

import jax
import jax.numpy as jnp
import numpy as np

from slam_eslam_tpu.mapping.mls_grid import (
    MLSGrid,
    PatchCloud,
    get_patch,
    match_cloud,
    merge_cloud,
    merge_points,
)


def make_grid(nx=20, ny=20, res=0.5, origin=(-5.0, -5.0), k=4):
    return MLSGrid.create(nx, ny, res, origin, k)


class TestCoordinates:
    def test_roundtrip(self):
        g = make_grid()
        xy = jnp.array([[0.26, 0.26], [-4.9, 4.9]])
        ix, iy, inb = g.to_grid(xy)
        assert bool(inb.all())
        np.testing.assert_array_equal(np.asarray(ix), [10, 0])
        np.testing.assert_array_equal(np.asarray(iy), [10, 19])
        centers = g.from_grid(ix, iy)
        np.testing.assert_allclose(centers[0], [0.25, 0.25], atol=1e-6)

    def test_out_of_bounds(self):
        g = make_grid()
        _, _, inb = g.to_grid(jnp.array([[5.1, 0.0], [-5.1, 0.0]]))
        assert not bool(inb.any())


class TestMergeAndLookup:
    def test_insert_then_lookup(self):
        g = make_grid()
        xy = jnp.array([[0.0, 0.0], [1.0, 1.0]])
        z = jnp.array([0.5, -0.25])
        sd = jnp.array([0.1, 0.2])
        g = merge_points(g, xy, z, sd, jnp.array([True, True]), 7)
        pts = jnp.array([[0.0, 0.0, 0.4], [1.0, 1.0, 0.0], [3.0, 3.0, 0.0]])
        found, mean, stdev, _ = get_patch(g, pts)
        np.testing.assert_array_equal(np.asarray(found), [True, True, False])
        np.testing.assert_allclose(mean[0], 0.5, atol=1e-6)
        np.testing.assert_allclose(mean[1], -0.25, atol=1e-6)
        np.testing.assert_allclose(stdev[0], 0.1, atol=1e-6)
        # update_idx stamped
        ix, iy, _ = g.to_grid(xy[:1])
        assert int(g.update_idx[int(ix[0]), int(iy[0]), 0]) == 7

    def test_same_cell_points_fused(self):
        g = make_grid()
        # two measurements in the same cell, equal variance -> fused mean
        xy = jnp.array([[0.1, 0.1], [0.2, 0.2]])
        z = jnp.array([1.0, 2.0])
        sd = jnp.array([0.5, 0.5])
        g = merge_points(g, xy, z, sd, jnp.array([True, True]), 0)
        found, mean, stdev, _ = get_patch(g, jnp.array([[0.1, 0.1, 1.5]]))
        assert bool(found[0])
        np.testing.assert_allclose(mean[0], 1.5, atol=1e-5)
        np.testing.assert_allclose(stdev[0], 0.5 / np.sqrt(2), atol=1e-5)
        # only one slot occupied
        ix, iy, _ = g.to_grid(xy[:1])
        assert int(g.valid[int(ix[0]), int(iy[0])].sum()) == 1

    def test_kalman_fusion_within_thickness(self):
        g = make_grid()
        ones = jnp.array([True])
        g = merge_points(g, jnp.array([[0.0, 0.0]]), jnp.array([1.0]),
                         jnp.array([0.3]), ones, 0)
        g = merge_points(g, jnp.array([[0.0, 0.0]]), jnp.array([1.05]),
                         jnp.array([0.3]), ones, 1, patch_thickness=0.1)
        ix, iy, _ = g.to_grid(jnp.array([[0.0, 0.0]]))
        cell_valid = g.valid[int(ix[0]), int(iy[0])]
        assert int(cell_valid.sum()) == 1  # fused, not stacked
        found, mean, stdev, _ = get_patch(g, jnp.array([[0.0, 0.0, 1.0]]))
        np.testing.assert_allclose(mean[0], 1.025, atol=1e-5)
        np.testing.assert_allclose(stdev[0], 0.3 / np.sqrt(2), atol=1e-5)
        assert int(g.update_idx[int(ix[0]), int(iy[0]), 0]) == 1

    def test_multi_level_patches(self):
        # a bridge: two patches in the same cell far apart stay separate
        g = make_grid()
        ones = jnp.array([True])
        g = merge_points(g, jnp.array([[0.0, 0.0]]), jnp.array([0.0]),
                         jnp.array([0.1]), ones, 0, gap_size=1.0)
        g = merge_points(g, jnp.array([[0.0, 0.0]]), jnp.array([3.0]),
                         jnp.array([0.1]), ones, 0, gap_size=1.0)
        ix, iy, _ = g.to_grid(jnp.array([[0.0, 0.0]]))
        assert int(g.valid[int(ix[0]), int(iy[0])].sum()) == 2
        # z-window selects the right level
        found, mean, _, _ = get_patch(g, jnp.array([[0.0, 0.0, 0.2]]), 1.0)
        np.testing.assert_allclose(mean[0], 0.0, atol=1e-6)
        found, mean, _, _ = get_patch(g, jnp.array([[0.0, 0.0, 2.8]]), 1.0)
        np.testing.assert_allclose(mean[0], 3.0, atol=1e-6)

    def test_vertical_extension_within_gap(self):
        g = make_grid()
        ones = jnp.array([True])
        g = merge_points(g, jnp.array([[0.0, 0.0]]), jnp.array([0.0]),
                         jnp.array([0.1]), ones, 0,
                         patch_thickness=0.1, gap_size=1.0)
        g = merge_points(g, jnp.array([[0.0, 0.0]]), jnp.array([0.5]),
                         jnp.array([0.1]), ones, 0,
                         patch_thickness=0.1, gap_size=1.0)
        ix, iy, _ = g.to_grid(jnp.array([[0.0, 0.0]]))
        ci, cj = int(ix[0]), int(iy[0])
        assert int(g.valid[ci, cj].sum()) == 1
        assert not bool(g.horizontal[ci, cj, 0])
        np.testing.assert_allclose(float(g.mean[ci, cj, 0]), 0.5, atol=1e-6)
        np.testing.assert_allclose(float(g.height[ci, cj, 0]), 0.5, atol=1e-6)

    def test_eviction_when_full(self):
        g = make_grid(k=2)
        ones = jnp.array([True])
        at = jnp.array([[0.0, 0.0]])
        g = merge_points(g, at, jnp.array([0.0]), jnp.array([0.1]), ones, 0,
                         gap_size=0.5)
        g = merge_points(g, at, jnp.array([5.0]), jnp.array([0.9]), ones, 0,
                         gap_size=0.5)
        # cell full; a third distinct level evicts the max-stdev patch (z=5)
        g = merge_points(g, at, jnp.array([10.0]), jnp.array([0.2]), ones, 0,
                         gap_size=0.5)
        ix, iy, _ = g.to_grid(at)
        means = np.sort(np.asarray(g.mean[int(ix[0]), int(iy[0])]))
        np.testing.assert_allclose(means, [0.0, 10.0], atol=1e-6)

    def test_invalid_points_ignored(self):
        g = make_grid()
        g2 = merge_points(g, jnp.array([[0.0, 0.0]]), jnp.array([1.0]),
                          jnp.array([0.1]), jnp.array([False]), 0)
        assert int(g2.valid.sum()) == 0

    def test_clear(self):
        g = make_grid()
        g = merge_points(g, jnp.array([[0.0, 0.0]]), jnp.array([1.0]),
                         jnp.array([0.1]), jnp.array([True]), 3)
        g = g.clear()
        assert int(g.valid.sum()) == 0


class TestColorAndNegative:
    def test_merge_carries_color(self):
        from slam_eslam_tpu.mapping.mls_grid import apply_negative_points

        g = make_grid()
        xy = jnp.array([[0.0, 0.0]])
        color = jnp.array([[1.0, 0.2, 0.0]])
        g = merge_points(g, xy, jnp.array([0.5]), jnp.array([0.1]),
                         jnp.array([True]), 0, color=color)
        found, mean, stdev, c = get_patch(g, jnp.array([[0.0, 0.0, 0.5]]))
        assert bool(found[0])
        np.testing.assert_allclose(np.asarray(c[0]), [1.0, 0.2, 0.0],
                                   atol=1e-6)

    def test_same_cell_colors_fused(self):
        g = make_grid()
        xy = jnp.array([[0.1, 0.1], [0.2, 0.2]])
        color = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
        g = merge_points(g, xy, jnp.array([1.0, 1.0]),
                         jnp.array([0.5, 0.5]), jnp.array([True, True]),
                         0, color=color)
        _, _, _, c = get_patch(g, jnp.array([[0.1, 0.1, 1.0]]))
        np.testing.assert_allclose(np.asarray(c[0]), [0.5, 0.5, 0.0],
                                   atol=1e-5)

    def test_negative_information_removes_contradicted(self):
        from slam_eslam_tpu.mapping.mls_grid import apply_negative_points

        g = make_grid()
        ones = jnp.array([True, True])
        g = merge_points(g, jnp.array([[0.0, 0.0], [1.0, 1.0]]),
                         jnp.array([0.5, 2.0]), jnp.array([0.1, 0.1]),
                         ones, 0, gap_size=0.3)
        # free-space observation passes through (0,0) at z=0.5 -> that
        # patch is contradicted; the distant-level patch survives
        free = jnp.array([[0.0, 0.0, 0.55], [5.0, 5.0, 0.0]])
        g2 = apply_negative_points(g, free, jnp.array([True, True]),
                                   z_margin=0.15)
        f1, _, _, _ = get_patch(g2, jnp.array([[0.0, 0.0, 0.5]]))
        f2, _, _, _ = get_patch(g2, jnp.array([[1.0, 1.0, 2.0]]))
        assert not bool(f1[0])
        assert bool(f2[0])

    def test_negative_far_z_untouched(self):
        from slam_eslam_tpu.mapping.mls_grid import apply_negative_points

        g = make_grid()
        g = merge_points(g, jnp.array([[0.0, 0.0]]), jnp.array([2.0]),
                         jnp.array([0.1]), jnp.array([True]), 0)
        # ray passes well below the bridge patch: patch survives
        free = jnp.array([[0.0, 0.0, 0.2]])
        g2 = apply_negative_points(g, free, jnp.array([True]),
                                   z_margin=0.15)
        f, _, _, _ = get_patch(g2, jnp.array([[0.0, 0.0, 2.0]]))
        assert bool(f[0])


class TestMatchMergeCloud:
    def _flat_grid(self, z=0.0):
        g = make_grid(nx=40, ny=40, res=0.25, origin=(-5.0, -5.0))
        xs, ys = jnp.meshgrid(jnp.arange(40), jnp.arange(40), indexing="ij")
        xy = g.from_grid(xs.ravel(), ys.ravel())
        zz = jnp.full((xy.shape[0],), z)
        sd = jnp.full((xy.shape[0],), 0.05)
        return merge_points(g, xy, zz, sd, jnp.ones((xy.shape[0],), bool), 0)

    def _cloud(self, z=0.0, n=64):
        key = jax.random.PRNGKey(0)
        xy = jax.random.uniform(key, (n, 2), minval=-2.0, maxval=2.0)
        return PatchCloud.create(
            xy=xy, z=jnp.full((n,), z), stdev=jnp.full((n,), 0.05),
            valid=jnp.ones((n,), bool),
        )

    def test_match_consistent_cloud_scores_high(self):
        g = self._flat_grid(0.0)
        c = self._cloud(0.0)
        eye = jnp.eye(2)
        w = match_cloud(g, c, eye, jnp.zeros(2), 0.0, 0.0, sampling=1)
        assert float(w) > 0.95

    def test_match_offset_cloud_scores_low(self):
        g = self._flat_grid(0.0)
        c = self._cloud(2.0)  # 2 m above the map
        eye = jnp.eye(2)
        w = match_cloud(g, c, eye, jnp.zeros(2), 0.0, 0.0, sampling=1,
                        z_window=10.0)
        assert float(w) < 0.05

    def test_match_z_offset_compensates(self):
        g = self._flat_grid(0.0)
        c = self._cloud(2.0)
        eye = jnp.eye(2)
        # particle zPos offset of -2 brings the cloud back onto the map
        w = match_cloud(g, c, eye, jnp.zeros(2), -2.0, 0.0, sampling=1,
                        z_window=10.0)
        assert float(w) > 0.95

    def test_merge_cloud_rotation(self):
        g = make_grid(nx=40, ny=40, res=0.25, origin=(-5.0, -5.0))
        c = PatchCloud.create(
            xy=jnp.array([[2.0, 0.0]]), z=jnp.array([1.0]),
            stdev=jnp.array([0.1]), valid=jnp.array([True]),
        )
        th = jnp.pi / 2
        r = jnp.array([[jnp.cos(th), -jnp.sin(th)], [jnp.sin(th), jnp.cos(th)]])
        g = merge_cloud(g, c, r, jnp.zeros(2), 0.5, 0.0, 0)
        found, mean, _, _ = get_patch(g, jnp.array([[0.0, 2.0, 1.5]]))
        assert bool(found[0])
        np.testing.assert_allclose(mean[0], 1.5, atol=1e-6)

    def test_jit(self):
        g = self._flat_grid(0.0)
        c = self._cloud(0.0)
        f = jax.jit(
            lambda g, c: match_cloud(g, c, jnp.eye(2), jnp.zeros(2), 0.0, 0.0)
        )
        assert float(f(g, c)) > 0.9
