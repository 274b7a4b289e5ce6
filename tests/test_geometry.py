"""Tests for quaternion / yaw-decomposition geometry utilities."""

import jax.numpy as jnp
import numpy as np
import pytest

from slam_eslam_tpu.utils import geometry as geo


def quat_from_euler(roll, pitch, yaw):
    """zyx (yaw-pitch-roll) composition, for test construction."""
    qz = geo.quat_from_axis_angle(jnp.array([0.0, 0, 1]), jnp.asarray(yaw))
    qy = geo.quat_from_axis_angle(jnp.array([0.0, 1, 0]), jnp.asarray(pitch))
    qx = geo.quat_from_axis_angle(jnp.array([1.0, 0, 0]), jnp.asarray(roll))
    return geo.quat_mul(qz, geo.quat_mul(qy, qx))


class TestQuat:
    def test_mul_identity(self):
        q = quat_from_euler(0.1, -0.2, 0.7)
        np.testing.assert_allclose(
            geo.quat_mul(q, geo.quat_identity()), q, atol=1e-6
        )

    def test_rotate_matches_matrix(self):
        q = quat_from_euler(0.3, 0.2, -1.1)
        v = jnp.array([0.5, -1.0, 2.0])
        np.testing.assert_allclose(
            geo.quat_rotate(q, v), geo.quat_to_matrix(q) @ v, atol=1e-5
        )

    def test_yaw_roundtrip(self):
        for yaw in [-2.5, -0.3, 0.0, 1.0, 3.0]:
            q = geo.quat_from_yaw(jnp.asarray(yaw))
            np.testing.assert_allclose(geo.yaw_from_quat(q), yaw, atol=1e-6)

    def test_yaw_with_tilt(self):
        q = quat_from_euler(0.1, 0.05, 0.8)
        np.testing.assert_allclose(geo.yaw_from_quat(q), 0.8, atol=1e-6)

    def test_remove_yaw(self):
        q = quat_from_euler(0.15, -0.1, 1.3)
        q0 = geo.remove_yaw(q)
        np.testing.assert_allclose(geo.yaw_from_quat(q0), 0.0, atol=1e-6)
        # removing yaw then re-adding it reproduces the rotation
        q_back = geo.quat_mul(geo.quat_from_yaw(jnp.asarray(1.3)), q0)
        np.testing.assert_allclose(np.abs(np.dot(q_back, q)), 1.0, atol=1e-6)

    def test_remove_yaw_batch(self):
        q = jnp.stack([quat_from_euler(0.1, 0.0, y) for y in [0.2, -0.9]])
        q0 = geo.remove_yaw(q)
        np.testing.assert_allclose(geo.yaw_from_quat(q0), [0, 0], atol=1e-6)


class TestRot2d:
    def test_rotate2d(self):
        v = jnp.array([1.0, 0.0])
        np.testing.assert_allclose(
            geo.rotate2d(jnp.asarray(np.pi / 2), v), [0.0, 1.0], atol=1e-6
        )

    def test_rot2d_matches(self):
        th = jnp.asarray(0.7)
        v = jnp.array([0.3, -0.4])
        np.testing.assert_allclose(
            geo.rot2d(th) @ v, geo.rotate2d(th, v), atol=1e-6
        )


class TestPoseMatrix:
    def test_transform_points(self):
        xy = jnp.array([[1.0, 2.0]])
        yaw = jnp.array([np.pi / 2])
        z = jnp.array([0.5])
        r, t = geo.pose_matrix_2p5d(xy, yaw, z)
        pts = jnp.array([[[1.0, 0.0, 0.0]]])  # [N=1, P=1, 3]
        out = geo.transform_points(r, t, pts)
        np.testing.assert_allclose(out[0, 0], [1.0, 3.0, 0.5], atol=1e-6)

    def test_angle_of_rotation(self):
        q = geo.quat_from_axis_angle(jnp.array([0.0, 0, 1]), jnp.asarray(0.4))
        np.testing.assert_allclose(geo.angle_of_rotation(q), 0.4, atol=1e-5)
