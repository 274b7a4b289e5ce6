"""Pose-estimator tests: propagation, weighting, and E2E localisation.

The E2E cases follow the reference's statistical validation style
(``/root/reference/test/testMap.cpp`` batch mode): Monte-Carlo style
trajectories with bounds on estimation error, not bit-exact trajectories.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from slam_eslam_tpu.config import Config, ContactModelConfig, OdometryConfig
from slam_eslam_tpu.filter import pose_estimator as pe
from slam_eslam_tpu.mapping.lookup import shared_grid_lookup
from slam_eslam_tpu.models import odometry as odom
from slam_eslam_tpu.models import sim as simlib
from slam_eslam_tpu.utils import geometry

CFG = Config(
    particle_count=64,
    min_effective=32,
    contact_model=ContactModelConfig(contact_point_radius=0.0),
)


def terrain(x, y):
    return 0.25 * np.sin(1.3 * np.asarray(x)) + 0.2 * np.cos(
        0.9 * np.asarray(y)
    )


class TestWeightingFunction:
    def test_reference_shape(self):
        # PoseEstimator.cpp:104-128
        f = pe.weighting_function
        assert float(f(jnp.asarray(0.05))) == 1.0
        np.testing.assert_allclose(float(f(jnp.asarray(0.95))), 0.05,
                                   rtol=1e-6)
        np.testing.assert_allclose(
            float(f(jnp.asarray(0.5))),
            (1.0 - 0.05) / (0.1 - 0.9) * 0.5 + 1.0 - 0.1 * (1 - 0.05) / (0.1 - 0.9),
            rtol=1e-6,
        )

    def test_spread_variant(self):
        # spread = weightingFunction(max_weight, 0, thr, 0): 1 at 0 weight,
        # 0 above threshold (PoseEstimator.cpp:194)
        f = pe.weighting_function
        np.testing.assert_allclose(
            float(f(jnp.asarray(0.45), 0.0, 0.9, 0.0)), 0.5, rtol=1e-5
        )
        assert float(f(jnp.asarray(0.95), 0.0, 0.9, 0.0)) == 0.0


class TestInit:
    def test_gaussian_statistics(self):
        p = pe.init_gaussian(
            jax.random.PRNGKey(0), 4000, (1.0, 2.0), 0.5, (0.2, 0.3), 0.1,
            0.7, 0.05,
        )
        np.testing.assert_allclose(
            np.mean(np.asarray(p.xy), axis=0), [1, 2], atol=0.02
        )
        np.testing.assert_allclose(
            np.std(np.asarray(p.xy), axis=0), [0.2, 0.3], rtol=0.1
        )
        np.testing.assert_allclose(np.mean(np.asarray(p.yaw)), 0.5, atol=0.02)
        assert float(p.z[0]) == np.float32(0.7)
        assert float(p.z_sigma[0]) == np.float32(0.05)


class TestProject:
    def _state(self, n=64):
        s = pe.PoseEstimatorState.create(
            dataclasses.replace(CFG, particle_count=n), 4
        )
        return s

    def test_propagates_mean_delta(self):
        s = self._state(2000)
        # forge an odometry delta of (0, 0.5) with tiny noise
        o = dataclasses.replace(
            s.odometry,
            delta_xy=jnp.array([0.0, 0.5]),
            sigma_xy=jnp.array([1e-4, 1e-4]),
            sigma_yaw=jnp.asarray(1e-4),
            initialized=jnp.ones((), bool),
        )
        s = dataclasses.replace(s, odometry=o)
        cfg = dataclasses.replace(CFG, slip_factor=0.0, particle_count=2000)
        s2 = pe.project(s, geometry.quat_identity(), cfg)
        np.testing.assert_allclose(
            np.mean(np.asarray(s2.particles.xy), axis=0), [0, 0.5], atol=0.02
        )
        assert int(s2.step) == 1

    def test_rotated_particle_moves_in_its_frame(self):
        s = self._state(4)
        p = dataclasses.replace(
            s.particles, yaw=jnp.full((4,), jnp.pi / 2, jnp.float32)
        )
        o = dataclasses.replace(
            s.odometry,
            delta_xy=jnp.array([0.0, 1.0]),
            sigma_xy=jnp.array([1e-6, 1e-6]),
            sigma_yaw=jnp.asarray(1e-6),
            initialized=jnp.ones((), bool),
        )
        cfg = dataclasses.replace(
            CFG, slip_factor=0.0, particle_count=4, max_yaw_deviation=0.0,
            spread_threshold=0.0,
        )
        s = dataclasses.replace(s, particles=p, odometry=o)
        s2 = pe.project(s, geometry.quat_identity(), cfg)
        # body +y at yaw 90deg -> world -x
        np.testing.assert_allclose(
            np.asarray(s2.particles.xy), [[-1.0, 0.0]] * 4, atol=1e-3
        )

    def test_yaw_penalty(self):
        s = self._state(2)
        p = dataclasses.replace(
            s.particles,
            yaw=jnp.array([0.0, 1.0], jnp.float32),  # 1 rad >> 15 deg
            weight=jnp.array([1.0, 1.0], jnp.float32),
        )
        o = dataclasses.replace(
            s.odometry,
            sigma_xy=jnp.array([1e-6, 1e-6]),
            sigma_yaw=jnp.asarray(1e-6),
        )
        cfg = dataclasses.replace(
            CFG, slip_factor=0.0, particle_count=2, spread_threshold=0.0
        )
        s = dataclasses.replace(s, particles=p, odometry=o)
        s2 = pe.project(s, geometry.quat_identity(), cfg)
        w = np.asarray(s2.particles.weight)
        np.testing.assert_allclose(w, [1.0, 0.7], rtol=1e-5)

    def test_z_sigma_grows(self):
        s = self._state(4)
        o = dataclasses.replace(s.odometry, sigma_z=jnp.asarray(0.1))
        s = dataclasses.replace(s, odometry=o)
        s2 = pe.project(s, geometry.quat_identity(), CFG)
        np.testing.assert_allclose(
            np.asarray(s2.particles.z_sigma),
            np.sqrt(0.1**2 * 2),
            rtol=1e-4,
        )


class TestUpdateE2E:
    """Full project/update loop against a terrain grid."""

    def _setup(self, n_particles=64, spread=0.3):
        grid = simlib.terrain_grid(
            terrain, nx=160, ny=160, resolution=0.1, origin=(-8.0, -8.0)
        )
        lookup = shared_grid_lookup(grid)
        cfg = dataclasses.replace(
            CFG, particle_count=n_particles,
            min_effective=max(2, n_particles // 2),
        )
        sim = simlib.TrajectorySim(terrain, speed=0.06)
        state = pe.PoseEstimatorState.create(cfg, 20)
        particles = pe.init_gaussian(
            jax.random.PRNGKey(7), n_particles,
            sim.position[:2], 0.0, (spread, spread), 0.05,
            sim.position[2], 0.3,
        )
        state = dataclasses.replace(state, particles=particles)
        return grid, lookup, cfg, sim, state

    def test_weights_favor_true_pose(self):
        grid, lookup, cfg, sim, state = self._setup(n_particles=32, spread=0.8)
        cs = sim.contact_state()
        q = geometry.quat_from_yaw(jnp.asarray(sim.yaw))
        state, res = pe.update_weights(state, cs, q, lookup, cfg)
        # the particle nearest the truth should out-weigh the farthest
        d = np.linalg.norm(
            np.asarray(state.particles.xy) - sim.position[:2], axis=1
        )
        w = np.asarray(state.particles.weight)
        valid = ~np.asarray(state.particles.floating)
        assert valid.any()
        near = w[valid][np.argmin(d[valid])]
        far = w[valid][np.argmax(d[valid])]
        assert near > far

    def test_localization_converges(self):
        grid, lookup, cfg, sim, state = self._setup(n_particles=96, spread=0.4)
        odocfg = OdometryConfig()

        @jax.jit
        def step_fn(state, cs, q, delta_xy, dyaw, dz):
            o = dataclasses.replace(
                state.odometry,
                delta_xy=delta_xy,
                delta_yaw=dyaw,
                delta_z=dz,
                sigma_xy=jnp.array([0.01, 0.02]),
                sigma_yaw=jnp.asarray(0.01),
                sigma_z=jnp.asarray(0.01),
                initialized=jnp.ones((), bool),
            )
            state = dataclasses.replace(state, odometry=o)
            state = pe.project(state, q, cfg)
            state, aux = pe.update(state, cs, q, lookup, cfg)
            return state, aux

        errs = []
        for i in range(40):
            (pos, yaw), (d_body, dyaw, dz) = sim.step()
            cs = sim.contact_state(noise=0.005)
            q = geometry.quat_from_yaw(jnp.asarray(yaw, jnp.float32))
            state, aux = step_fn(
                state, cs, q,
                jnp.asarray(d_body, jnp.float32),
                jnp.asarray(dyaw, jnp.float32),
                jnp.asarray(dz, jnp.float32),
            )
            c_pos, _ = pe.centroid(state.particles, q)
            errs.append(np.linalg.norm(np.asarray(c_pos)[:2] - pos[:2]))
        errs = np.array(errs)
        # weighting must pull the cloud toward the truth: the late-window
        # error must be well below the initial 0.4 m spread
        assert errs[-10:].mean() < 0.25, f"ATE too large: {errs[-10:].mean()}"
        # z tracked tightly via the Kalman update
        zerr = abs(float(c_pos[2]) - pos[2])
        assert zerr < 0.15, f"z error {zerr}"

    def test_localization_while_turning(self):
        """Curved trajectory: yaw tracking + body-frame odometry
        composition stay consistent (exercises the R(yaw) delta
        rotation, PoseEstimator.cpp:205)."""
        grid, lookup, cfg, sim, state = self._setup(n_particles=96,
                                                    spread=0.3)
        sim = simlib.TrajectorySim(terrain, speed=0.06, yaw_rate=0.06)

        @jax.jit
        def step_fn(state, cs, q, delta_xy, dyaw, dz):
            o = dataclasses.replace(
                state.odometry,
                delta_xy=delta_xy, delta_yaw=dyaw, delta_z=dz,
                sigma_xy=jnp.array([0.01, 0.02]),
                sigma_yaw=jnp.asarray(0.01),
                sigma_z=jnp.asarray(0.01),
                initialized=jnp.ones((), bool),
            )
            state = dataclasses.replace(state, odometry=o)
            state = pe.project(state, q, cfg)
            state, aux = pe.update(state, cs, q, lookup, cfg)
            return state, aux

        errs, yaw_errs = [], []
        for i in range(35):
            (pos, yaw), (d_body, dyaw, dz) = sim.step()
            cs = sim.contact_state(noise=0.005)
            q = geometry.quat_from_yaw(jnp.asarray(yaw, jnp.float32))
            state, aux = step_fn(
                state, cs, q,
                jnp.asarray(d_body, jnp.float32),
                jnp.asarray(dyaw, jnp.float32),
                jnp.asarray(dz, jnp.float32),
            )
            c_pos, c_q = pe.centroid(state.particles, q)
            errs.append(np.linalg.norm(np.asarray(c_pos)[:2] - pos[:2]))
            cy = float(geometry.yaw_from_quat(c_q))
            yaw_errs.append(abs(np.arctan2(np.sin(cy - yaw),
                                           np.cos(cy - yaw))))
        assert np.mean(errs[-10:]) < 0.3, f"ATE {np.mean(errs[-10:])}"
        assert np.mean(yaw_errs[-10:]) < 0.15

    def test_update_resamples_on_low_ess(self):
        grid, lookup, cfg, sim, state = self._setup(n_particles=32)
        # force degenerate weights
        w = jnp.zeros((32,), jnp.float32).at[0].set(1.0)
        state = dataclasses.replace(
            state, particles=dataclasses.replace(state.particles, weight=w)
        )
        cs = sim.contact_state()
        q = geometry.quat_identity()
        state, aux = pe.update(state, cs, q, lookup, cfg)
        assert bool(aux["resampled"])


class TestCentroid:
    def test_weighted_mean(self):
        from slam_eslam_tpu.core.state import ParticleSet

        p = ParticleSet.zeros(2)
        p = dataclasses.replace(
            p.with_xy(jnp.array([[0.0, 0.0], [1.0, 2.0]])),
            yaw=jnp.array([0.0, 1.0]),
            z=jnp.array([0.0, 4.0]),
            weight=jnp.array([3.0, 1.0]),
        )
        pos, q = pe.centroid(p, geometry.quat_identity())
        np.testing.assert_allclose(pos, [0.25, 0.5, 1.0], atol=1e-6)
        np.testing.assert_allclose(
            geometry.yaw_from_quat(q), 0.25, atol=1e-6
        )
