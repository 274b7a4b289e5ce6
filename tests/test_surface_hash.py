"""Surface-hash tests: plane fits, bucketing, sampling, reinjection."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from slam_eslam_tpu.config import Config, SurfaceHashConfig
from slam_eslam_tpu.core.state import BodyContactState
from slam_eslam_tpu.filter import pose_estimator as pe
from slam_eslam_tpu.filter.surface_hash import SurfaceHash, fit_plane
from slam_eslam_tpu.models import sim as simlib
from slam_eslam_tpu.utils import geometry

HCFG = SurfaceHashConfig(use_hash=True, slope_bins=10, angular_steps=4)


def sloped_terrain(x, y):
    return 0.3 * np.asarray(x)


class TestFitPlane:
    def test_exact_plane(self):
        # z = 0.5x - 0.25y + 1
        pts = jnp.array(
            [
                [0, 0, 1.0], [1, 0, 1.5], [0, 1, 0.75], [1, 1, 1.25],
            ],
            jnp.float32,
        )
        sx, sy = fit_plane(pts, jnp.ones(4, bool))
        np.testing.assert_allclose(float(sx), 0.5, atol=1e-4)
        np.testing.assert_allclose(float(sy), -0.25, atol=1e-4)

    def test_masked_fit(self):
        pts = jnp.array(
            [[0, 0, 0.0], [1, 0, 0.5], [0, 1, 0.0], [9, 9, 99.0]],
            jnp.float32,
        )
        sx, sy = fit_plane(pts, jnp.array([True, True, True, False]))
        np.testing.assert_allclose(float(sx), 0.5, atol=1e-3)
        np.testing.assert_allclose(float(sy), 0.0, atol=1e-3)

    def test_reference_smoke_case(self):
        # UnitTest.cpp:121-143 surface_param smoke: fit a plane through
        # a simple sloped triangle and recover the slope
        pts = jnp.array(
            [[0, 0, 0.0], [1, 0, 1.0], [0, 1, 0.0]], jnp.float32
        )
        sx, sy = fit_plane(pts, jnp.ones(3, bool))
        np.testing.assert_allclose(float(sx), 1.0, atol=1e-3)


class TestHashBuild:
    def _grid(self):
        return simlib.terrain_grid(
            sloped_terrain, nx=40, ny=40, resolution=0.25,
            origin=(-5.0, -5.0),
        )

    def test_create_populates(self):
        h = SurfaceHash.create(HCFG, self._grid())
        assert int(h.n_valid) > 0
        # candidates: cells x angles
        assert h.cand_xy.shape[0] == 40 * 40 * 4
        # bucket bookkeeping is consistent
        assert int(jnp.sum(h.bucket_count)) == int(h.n_valid)

    def test_slope_buckets_capture_terrain(self):
        h = SurfaceHash.create(HCFG, self._grid())
        # on a uniform 0.3-slope terrain most candidates land in few
        # buckets; relevance of the true signature must be low
        # (signature common), of a flat signature high (signature absent)
        rel_true = float(h.relevance(jnp.asarray(0.3), jnp.asarray(0.0)))
        rel_flat = float(h.relevance(jnp.asarray(0.0), jnp.asarray(0.9)))
        assert rel_flat > rel_true

    def test_sample_particles(self):
        h = SurfaceHash.create(HCFG, self._grid())
        p = h.sample_particles(jax.random.PRNGKey(0), 64)
        assert p.n == 64
        # sampled z follows terrain + body height at sampled xy
        xy = np.asarray(p.xy)
        z = np.asarray(p.z)
        np.testing.assert_allclose(
            z, sloped_terrain(xy[:, 0], xy[:, 1]) + 0.18, atol=0.15
        )

    def test_sample_bucket_conditioned(self):
        h = SurfaceHash.create(HCFG, self._grid())
        ids, ok = h.sample_bucket(
            jax.random.PRNGKey(1), jnp.asarray(0.3), jnp.asarray(0.0), 32
        )
        assert bool(ok)
        assert np.asarray(h.cand_valid)[np.asarray(ids)].all()

    def test_empty_bucket_flagged(self):
        h = SurfaceHash.create(HCFG, self._grid())
        _, ok = h.sample_bucket(
            jax.random.PRNGKey(1), jnp.asarray(-0.95), jnp.asarray(0.95), 4
        )
        assert not bool(ok)


class TestReinjection:
    def test_reinject_replaces_lowest_weight(self):
        grid = simlib.terrain_grid(
            sloped_terrain, nx=40, ny=40, resolution=0.25,
            origin=(-5.0, -5.0),
        )
        h = SurfaceHash.create(
            dataclasses.replace(HCFG, percentage=0.5), grid
        )
        cfg = Config(particle_count=16)
        state = pe.PoseEstimatorState.create(cfg, 20, key=jax.random.PRNGKey(2))
        particles = pe.init_gaussian(
            jax.random.PRNGKey(3), 16, (0, 0), 0.0, (0.1, 0.1), 0.05, 0, 0.1
        )
        weights = jnp.linspace(0.01, 1.0, 16)
        particles = dataclasses.replace(particles, weight=weights)
        state = dataclasses.replace(state, particles=particles)

        # conformal contact state on the sloped terrain -> signature 0.3
        cs = simlib.conformal_contact_state(
            np.array([0.0, 0.0, 0.2]), 0.0, sloped_terrain
        )
        q = geometry.quat_identity()
        rel = float(h.relevance(*h.signature(cs, q)) ** 3)
        new_state = h.reinject(state, cs, q, cfg)
        w = np.asarray(new_state.particles.weight)
        if rel >= 0.8:
            expect = 16 * 0.5 * rel
            changed = (w != np.asarray(weights)).sum()
            assert changed == int(expect)
            # the lowest-weight particles were the ones replaced
            assert (w[np.argsort(np.asarray(weights))[: int(expect)]]
                    != np.sort(np.asarray(weights))[: int(expect)]).all()
        else:
            np.testing.assert_array_equal(w, np.asarray(weights))

    def test_lost_threshold_gates_on_max_weight(self):
        """``lost_threshold > 0``: a TRACKING filter (max_weight at or
        above the threshold) injects nothing; a LOST one (max_weight 0,
        also the init state) injects the full reference count.  The
        default 0 stays reference-faithful (covered above)."""
        grid = simlib.terrain_grid(
            sloped_terrain, nx=40, ny=40, resolution=0.25,
            origin=(-5.0, -5.0),
        )
        h = SurfaceHash.create(
            dataclasses.replace(HCFG, percentage=0.5,
                                lost_threshold=0.2),
            grid,
        )
        cfg = Config(particle_count=16)
        state = pe.PoseEstimatorState.create(
            cfg, 20, key=jax.random.PRNGKey(2)
        )
        particles = pe.init_gaussian(
            jax.random.PRNGKey(3), 16, (0, 0), 0.0, (0.1, 0.1),
            0.05, 0, 0.1,
        )
        weights = jnp.linspace(0.01, 1.0, 16)
        particles = dataclasses.replace(particles, weight=weights)
        state = dataclasses.replace(state, particles=particles)
        cs = simlib.conformal_contact_state(
            np.array([0.0, 0.0, 0.2]), 0.0, sloped_terrain
        )
        q = geometry.quat_identity()
        rel = float(h.relevance(*h.signature(cs, q)) ** 3)
        if rel < 0.8:  # pragma: no cover - fixture guarantees rel
            return

        healthy = dataclasses.replace(state, max_weight=jnp.asarray(0.9))
        w = np.asarray(h.reinject(healthy, cs, q, cfg).particles.weight)
        np.testing.assert_array_equal(w, np.asarray(weights))

        lost = dataclasses.replace(state, max_weight=jnp.zeros(()))
        w = np.asarray(h.reinject(lost, cs, q, cfg).particles.weight)
        assert (w != np.asarray(weights)).sum() == int(16 * 0.5 * rel)
