"""Tests for contact odometry and the Asguard kinematic fixture."""

import jax
import jax.numpy as jnp
import numpy as np

from slam_eslam_tpu.config import OdometryConfig
from slam_eslam_tpu.core.state import BodyContactState
from slam_eslam_tpu.models import asguard
from slam_eslam_tpu.models import odometry as odom
from slam_eslam_tpu.utils import geometry

CFG = OdometryConfig()


def contact_state(points, contact):
    return BodyContactState.create(
        np.asarray(points, np.float32), contact=np.asarray(contact, np.float32)
    )


class TestFootContact:
    def test_stationary(self):
        o = odom.FootContactOdometry.create(2)
        s = contact_state([[0.1, 0, -0.2], [-0.1, 0, -0.2]], [1, 1])
        q = geometry.quat_identity()
        o = odom.update(o, s, q, CFG)
        o = odom.update(o, s, q, CFG)
        np.testing.assert_allclose(o.delta_xy, [0, 0], atol=1e-6)
        np.testing.assert_allclose(float(o.delta_yaw), 0, atol=1e-6)

    def test_forward_motion(self):
        # feet move backward in body frame => body moved forward
        o = odom.FootContactOdometry.create(2)
        q = geometry.quat_identity()
        s1 = contact_state([[0.1, 0.1, -0.2], [-0.1, 0.1, -0.2]], [1, 1])
        s2 = contact_state([[0.1, 0.0, -0.2], [-0.1, 0.0, -0.2]], [1, 1])
        o = odom.update(o, s1, q, CFG)
        o = odom.update(o, s2, q, CFG)
        np.testing.assert_allclose(o.delta_xy, [0.0, 0.1], atol=1e-6)

    def test_first_update_zero_delta(self):
        o = odom.FootContactOdometry.create(2)
        s = contact_state([[0.1, 0.5, -0.2], [-0.1, 0.5, -0.2]], [1, 1])
        o = odom.update(o, s, geometry.quat_identity(), CFG)
        np.testing.assert_allclose(o.delta_xy, [0, 0], atol=1e-6)

    def test_only_contact_feet_count(self):
        o = odom.FootContactOdometry.create(2)
        q = geometry.quat_identity()
        s1 = contact_state([[0, 0.1, -0.2], [0, 5.0, 0.5]], [1, 0])
        s2 = contact_state([[0, 0.0, -0.2], [0, -5.0, 0.5]], [1, 0])
        o = odom.update(o, s1, q, CFG)
        o = odom.update(o, s2, q, CFG)
        np.testing.assert_allclose(o.delta_xy, [0.0, 0.1], atol=1e-6)

    def test_yaw_delta_from_orientation(self):
        o = odom.FootContactOdometry.create(1)
        s = contact_state([[0, 0, -0.2]], [1])
        o = odom.update(o, s, geometry.quat_from_yaw(jnp.asarray(0.1)), CFG)
        o = odom.update(o, s, geometry.quat_from_yaw(jnp.asarray(0.3)), CFG)
        np.testing.assert_allclose(float(o.delta_yaw), 0.2, atol=1e-6)

    def test_z_delta_through_pitch(self):
        # body pitched forward: foot motion along body x maps into world z
        o = odom.FootContactOdometry.create(1)
        q = geometry.quat_from_axis_angle(
            jnp.array([0.0, 1, 0]), jnp.asarray(np.pi / 2)
        )
        s1 = contact_state([[0.1, 0, 0]], [1])
        s2 = contact_state([[0.0, 0, 0]], [1])
        o = odom.update(o, s1, q, CFG)
        o = odom.update(o, s2, q, CFG)
        # removeYaw(pitch 90deg) rotates +x to -z; prev-cur = (0.1,0,0)
        np.testing.assert_allclose(float(o.delta_z), -0.1, atol=1e-5)

    def test_error_model_grows_with_distance(self):
        o = odom.FootContactOdometry.create(1)
        q = geometry.quat_identity()
        s1 = contact_state([[0, 1.0, -0.2]], [1])
        s2 = contact_state([[0, 0.0, -0.2]], [1])
        o = odom.update(o, s1, q, CFG)
        o = odom.update(o, s2, q, CFG)
        expect = CFG.const_error_xy + CFG.dist_error_xy * 1.0
        np.testing.assert_allclose(o.sigma_xy, [expect, expect], rtol=1e-5)

    def test_sample_statistics(self):
        o = odom.FootContactOdometry.create(1)
        q = geometry.quat_identity()
        s1 = contact_state([[0, 0.5, -0.2]], [1])
        s2 = contact_state([[0, 0.0, -0.2]], [1])
        o = odom.update(o, s1, q, CFG)
        o = odom.update(o, s2, q, CFG)
        dxy, dyaw = odom.pose_delta_samples_2d(o, jax.random.PRNGKey(0), 4000)
        np.testing.assert_allclose(
            np.mean(np.asarray(dxy), axis=0), [0.0, 0.5], atol=0.01
        )
        np.testing.assert_allclose(
            np.std(np.asarray(dxy)[:, 1]), float(o.sigma_xy[1]), rtol=0.1
        )
        np.testing.assert_allclose(np.mean(np.asarray(dyaw)), 0.0, atol=0.01)


class TestAsguard:
    def test_contact_state_shape(self):
        cfg = asguard.AsguardConfig()
        s = cfg.contact_state(np.zeros(4))
        assert s.c == asguard.NUM_FEET
        # exactly one contact per wheel
        con = np.asarray(s.contact).reshape(4, 5)
        np.testing.assert_array_equal(con.sum(axis=1), [1, 1, 1, 1])
        gid = np.asarray(s.group_id)
        np.testing.assert_array_equal(
            gid, np.repeat(np.arange(4), 5)
        )

    def test_lowest_foot_down(self):
        cfg = asguard.AsguardConfig()
        feet = cfg.foot_positions(np.zeros(4))
        assert feet[:, 2].min() <= -cfg.wheel_radius + 1e-6

    def test_sim_rolls_forward(self):
        sim = asguard.AsguardSim()
        y0 = sim.position[1]
        for _ in range(20):
            sim.step(wheel_delta=0.1)
        assert sim.position[1] > y0 + 0.2, "robot should roll in +y"
        # feet stay on the ground
        feet = sim._to_world(sim.config.foot_positions(sim.wheel_pos))
        assert abs(feet[:, 2].min()) < 1e-6

    def test_sim_with_odometry_tracks_truth(self):
        # AsguardSim + FootContact odometry: integrated odometry should
        # track the kinematic ground truth on flat ground (the fixture
        # pattern of testMap.cpp:85-104 — odometry updated per substep)
        sim = asguard.AsguardSim()
        o = odom.FootContactOdometry.create(asguard.NUM_FEET)
        q = geometry.quat_identity()
        pos = np.zeros(2)
        o = odom.update(o, sim.contact_state(), q, CFG)

        def on_substep(s):
            nonlocal o, pos
            o = odom.update(o, s.contact_state(), q, CFG)
            pos += np.asarray(o.delta_xy)

        for _ in range(15):
            sim.step(wheel_delta=0.1, on_substep=on_substep)
        err = np.linalg.norm(pos - sim.position[:2])
        assert err < 0.1, f"odometry drift too large: {err}"

    def test_sim_on_slope(self):
        sim = asguard.AsguardSim(terrain=lambda x, y: 0.1 * y)
        for _ in range(20):
            sim.step(wheel_delta=0.1)
        # climbing the slope raises the body
        expected = 0.1 * sim.position[1]
        assert abs(sim.position[2] - expected) < 0.25


class TestRigidAlignment:
    """Contact odometry must recover the exact rigid 2-D motion when
    stance feet are pinned in the world (the defining assumption of
    foot-contact odometry — ``FootContact::getPoseDelta``,
    ``PoseEstimator.cpp:188``), INCLUDING under rotation: the yaw delta
    must be removed from the current points before differencing, or
    turning leaks rotation into translation."""

    def _frames(self, poses, feet_w):
        out = []
        for (x, y, yaw) in poses:
            c, s = np.cos(yaw), np.sin(yaw)
            rel = feet_w - np.array([x, y, 0.0])
            body = np.stack(
                [c * rel[:, 0] + s * rel[:, 1],
                 -s * rel[:, 0] + c * rel[:, 1],
                 rel[:, 2]], axis=-1,
            )
            cs = BodyContactState.create(
                body.astype(np.float32),
                contact=np.ones(len(feet_w), np.float32),
            )
            out.append((cs, geometry.quat_from_yaw(np.float32(yaw))))
        return out

    def test_pure_rotation_yields_zero_translation(self):
        feet = np.array([[0.3, 0.2, 0.0], [-0.3, 0.2, 0.0],
                         [0.3, -0.2, 0.0], [-0.25, -0.18, 0.0]])
        frames = self._frames([(0, 0, 0.0), (0, 0, 0.6)], feet)
        st = odom.FootContactOdometry.create(len(feet))
        for cs, q in frames:
            st = odom.update(st, cs, q, OdometryConfig())
        np.testing.assert_allclose(np.asarray(st.delta_xy), 0.0, atol=1e-5)
        np.testing.assert_allclose(float(st.delta_yaw), 0.6, atol=1e-6)

    def test_turn_plus_translation_recovered(self):
        feet = np.array([[0.3, 0.2, 0.0], [-0.3, 0.2, 0.0],
                         [0.3, -0.2, 0.0], [-0.25, -0.18, 0.0]])
        p1, p2 = (0.4, -0.2, 0.3), (0.55, 0.05, 0.75)
        frames = self._frames([p1, p2], feet)
        st = odom.FootContactOdometry.create(len(feet))
        for cs, q in frames:
            st = odom.update(st, cs, q, OdometryConfig())
        # expected translation in frame 1's yaw-compensated frame
        c, s = np.cos(p1[2]), np.sin(p1[2])
        d_w = np.array([p2[0] - p1[0], p2[1] - p1[1]])
        d_b = np.array([c * d_w[0] + s * d_w[1], -s * d_w[0] + c * d_w[1]])
        np.testing.assert_allclose(
            np.asarray(st.delta_xy), d_b, atol=1e-5
        )
        np.testing.assert_allclose(
            float(st.delta_yaw), p2[2] - p1[2], atol=1e-6
        )
