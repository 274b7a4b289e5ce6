"""Tests for observability subsystems: GMM export, terrain fusion,
checkpointing, offline viz."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from slam_eslam_tpu.core import gmm as gmmlib
from slam_eslam_tpu.core.distribution import export_distribution
from slam_eslam_tpu.core.state import BodyContactState, ParticleSet
from slam_eslam_tpu.models import terrain


class TestGMM:
    def test_two_clusters(self):
        key = jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(key, 3)
        a = jax.random.normal(k1, (200, 2)) * 0.1 + jnp.array([0.0, 0.0])
        b = jax.random.normal(k2, (200, 2)) * 0.1 + jnp.array([5.0, 5.0])
        xy = jnp.concatenate([a, b])
        w = jnp.ones((400,))
        means, covs, mix, resp = gmmlib.fit_gmm(k3, xy, w, n_components=2)
        m = np.sort(np.asarray(means)[:, 0])
        np.testing.assert_allclose(m, [0.0, 5.0], atol=0.3)
        np.testing.assert_allclose(np.asarray(mix).sum(), 1.0, rtol=1e-4)
        # covariances recovered at the right scale
        np.testing.assert_allclose(
            np.asarray(covs)[:, 0, 0], 0.01, rtol=1.0
        )

    def test_weighted_fit_ignores_zero_weight(self):
        key = jax.random.PRNGKey(1)
        xy = jnp.array([[0.0, 0.0], [100.0, 100.0]])
        w = jnp.array([1.0, 0.0])
        means, _, _, _ = gmmlib.fit_gmm(key, xy, w, n_components=1)
        np.testing.assert_allclose(np.asarray(means)[0], [0, 0], atol=1e-3)

    def test_export_distribution(self):
        p = ParticleSet.zeros(16)
        cs = BodyContactState.create(np.zeros((4, 3), np.float32))
        d = export_distribution(
            jax.random.PRNGKey(0), p, jnp.array([1.0, 0, 0, 0]), cs
        )
        assert d.gmm_means.shape == (3, 2)
        assert d.particles.n == 16


class TestTerrain:
    def test_rgb_roundtrip(self):
        c = jnp.array([0.7, 0.2, 0.1])
        np.testing.assert_allclose(
            terrain.from_rgb(terrain.to_rgb(c)), c, atol=1e-6
        )

    def test_joint_probability(self):
        a = jnp.array([1.0, 0.0, 0.0])
        b = jnp.array([0.0, 1.0, 0.0])
        assert float(terrain.joint_probability(a, a)) == 1.0
        assert float(terrain.joint_probability(a, b)) == 0.0

    def test_per_point_probability(self):
        gid = jnp.array([-1, 0, 1], jnp.int32)
        colors = jnp.array(
            [[1, 0, 0], [1.0, 0, 0], [1.0, 0, 0]], jnp.float32
        )
        wheel = jnp.array([[1.0, 0, 0], [0.0, 1, 0]], jnp.float32)
        valid = jnp.array([True, False])
        p = terrain.per_point_probability(gid, colors, wheel, valid)
        # ungrouped -> 1; wheel 0 matches visual -> 1; wheel 1 invalid -> 1
        np.testing.assert_allclose(p, [1.0, 1.0, 1.0], atol=1e-5)
        valid = jnp.array([True, True])
        p = terrain.per_point_probability(gid, colors, wheel, valid)
        np.testing.assert_allclose(p, [1.0, 1.0, 0.0], atol=1e-5)


class TestCheckpoint:
    def test_filter_roundtrip(self, tmp_path):
        from slam_eslam_tpu.config import Config, ContactModelConfig
        from slam_eslam_tpu.filter.eslam_filter import EmbodiedSlamFilter
        from slam_eslam_tpu.models import sim as simlib
        from slam_eslam_tpu.utils import checkpoint as ckpt

        cfg = dataclasses.replace(
            Config(), particle_count=8, min_effective=4,
            grid_size=4.0, grid_resolution=0.5, map_pool_blocks=12,
            contact_model=ContactModelConfig(contact_point_radius=0.0),
        )
        f = EmbodiedSlamFilter(config=cfg)
        f.init(pose=(np.zeros(3), 0.0), use_shared_map=False)
        f.update_idx = 7
        path = os.path.join(str(tmp_path), "ckpt")
        ckpt.save_filter(path, f)

        g = EmbodiedSlamFilter(config=cfg)
        g.init(pose=(np.ones(3), 0.3), use_shared_map=False)
        ckpt.restore_filter(path, g)
        np.testing.assert_allclose(
            np.asarray(g.state.particles.xy), np.asarray(f.state.particles.xy)
        )
        np.testing.assert_array_equal(
            np.asarray(g.pool.chain), np.asarray(f.pool.chain)
        )
        assert g.update_idx == 7


class TestViz:
    def test_render_distribution_saves_png(self, tmp_path):
        from slam_eslam_tpu.models import sim as simlib
        from slam_eslam_tpu.viz import render

        p = ParticleSet.zeros(32)
        p = dataclasses.replace(
            p.with_xy(jax.random.normal(jax.random.PRNGKey(0), (32, 2))),
            weight=jnp.full((32,), 1 / 32),
        )
        cs = BodyContactState.create(np.zeros((4, 3), np.float32))
        d = export_distribution(
            jax.random.PRNGKey(1), p, jnp.array([1.0, 0, 0, 0]), cs
        )
        grid = simlib.terrain_grid(
            lambda x, y: 0.1 * np.asarray(x), nx=20, ny=20,
            resolution=0.5, origin=(-5.0, -5.0),
        )
        out = render.render_distribution(
            d, path=os.path.join(str(tmp_path), "dist.png"), grid=grid
        )
        assert os.path.exists(out) and os.path.getsize(out) > 1000

    def test_particle_map_view(self, tmp_path):
        import matplotlib

        matplotlib.use("Agg", force=True)
        import matplotlib.pyplot as plt

        from slam_eslam_tpu.mapping import map_pool as mp
        from slam_eslam_tpu.mapping.mls_grid import MLSGrid
        from slam_eslam_tpu.viz import render

        template = MLSGrid.create(10, 10, 0.5, (-2.5, -2.5), 2)
        pool = mp.MapPool.from_template(template, 2, 4)
        ax = render.draw_particle_map(pool, 0)
        assert ax is not None
        plt.close("all")
