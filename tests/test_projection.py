"""Sensor projection pipeline tests (scan/distance-image -> patch cloud)."""

import jax.numpy as jnp
import numpy as np

from slam_eslam_tpu.mapping import projection as proj
from slam_eslam_tpu.utils import geometry


class TestScanToPoints:
    def test_geometry(self):
        scan = proj.LaserScan(
            ranges=jnp.array([1.0, 2.0, 0.0, 100.0]),
            start_angle=jnp.asarray(0.0),
            angular_resolution=jnp.asarray(np.pi / 2),
        )
        pts, valid = proj.scan_to_points(scan, max_range=3.0)
        np.testing.assert_array_equal(
            np.asarray(valid), [True, True, False, False]
        )
        np.testing.assert_allclose(pts[0], [1, 0, 0], atol=1e-6)
        np.testing.assert_allclose(pts[1], [0, 2, 0], atol=1e-6)


class TestDistanceImage:
    def test_backprojection(self):
        img = proj.DistanceImage(
            data=jnp.array([[1.0, 2.0], [jnp.nan, 5.0]]),
            scale_x=jnp.asarray(0.1), scale_y=jnp.asarray(0.1),
            center_x=jnp.asarray(-0.05), center_y=jnp.asarray(-0.05),
        )
        pts, valid = proj.distance_image_to_points(img, max_distance=3.0)
        np.testing.assert_array_equal(
            np.asarray(valid), [True, True, False, False]
        )
        # pixel (0,0): x = -0.05*1, y = -0.05*1, z = 1
        np.testing.assert_allclose(pts[0], [-0.05, -0.05, 1.0], atol=1e-6)
        # pixel (1,0) of row 0: u=1 -> x = (0.1-0.05)*2
        np.testing.assert_allclose(pts[1], [0.1, -0.1, 2.0], atol=1e-6)


class TestFreeSpace:
    def test_samples_lie_on_ray(self):
        pts = jnp.array([[2.0, 0.0, 0.0]])
        free, mask = proj.free_space_points(
            pts, jnp.array([True]), jnp.eye(3), jnp.zeros(3),
            geometry.quat_identity(), samples=4,
        )
        assert free.shape == (4, 3)
        assert bool(mask.all())
        # all samples between origin and hit, on the x-axis
        np.testing.assert_allclose(free[:, 1:], 0.0, atol=1e-6)
        assert (np.asarray(free[:, 0]) > 0.2).all()
        assert (np.asarray(free[:, 0]) < 1.8).all()

    def test_invalid_rays_masked(self):
        pts = jnp.array([[2.0, 0.0, 0.0], [1.0, 1.0, 0.0]])
        _, mask = proj.free_space_points(
            pts, jnp.array([True, False]), jnp.eye(3), jnp.zeros(3),
            geometry.quat_identity(), samples=3,
        )
        np.testing.assert_array_equal(
            np.asarray(mask), [True] * 3 + [False] * 3
        )

    def test_sensor_offset_origin(self):
        pts = jnp.array([[1.0, 0.0, 0.0]])
        free, _ = proj.free_space_points(
            pts, jnp.array([True]), jnp.eye(3),
            jnp.array([0.0, 0.0, 1.0]), geometry.quat_identity(),
            samples=2, min_frac=0.0, max_frac=1.0,
        )
        # ray from (0,0,1) to body point (1,0,1): z stays 1
        np.testing.assert_allclose(free[:, 2], 1.0, atol=1e-6)


class TestProjectPoints:
    def test_identity_transform(self):
        pts = jnp.array([[1.0, 0.0, 0.5]])
        cloud = proj.project_points(
            pts, jnp.array([True]), jnp.eye(3), jnp.zeros(3),
            geometry.quat_identity(),
        )
        np.testing.assert_allclose(cloud.xy[0], [1, 0], atol=1e-6)
        np.testing.assert_allclose(cloud.z[0], 0.5, atol=1e-6)
        # level pose: uncertainty ~ sensor noise + pitch/roll term
        expected = np.sqrt(0.02**2 + (proj.PITCH_ROLL_SIGMA * 1.0) ** 2)
        np.testing.assert_allclose(cloud.stdev[0], expected, rtol=1e-4)

    def test_yaw_removed(self):
        # a pure-yaw body orientation must not rotate the cloud
        # (scanFrame is the yaw-compensated body frame)
        pts = jnp.array([[1.0, 0.0, 0.0]])
        cloud = proj.project_points(
            pts, jnp.array([True]), jnp.eye(3), jnp.zeros(3),
            geometry.quat_from_yaw(jnp.asarray(1.0)),
        )
        np.testing.assert_allclose(cloud.xy[0], [1, 0], atol=1e-5)

    def test_pitch_tilts_points(self):
        pts = jnp.array([[1.0, 0.0, 0.0]])
        q = geometry.quat_from_axis_angle(
            jnp.array([0.0, 1.0, 0.0]), jnp.asarray(np.pi / 4)
        )
        cloud = proj.project_points(
            pts, jnp.array([True]), jnp.eye(3), jnp.zeros(3), q
        )
        np.testing.assert_allclose(
            cloud.z[0], -np.sin(np.pi / 4), atol=1e-5
        )

    def test_uncertainty_grows_with_range(self):
        pts = jnp.array([[1.0, 0.0, 0.0], [5.0, 0.0, 0.0]])
        cloud = proj.project_points(
            pts, jnp.array([True, True]), jnp.eye(3), jnp.zeros(3),
            geometry.quat_identity(),
        )
        assert float(cloud.stdev[1]) > float(cloud.stdev[0])

    def test_sensor_offset_applied(self):
        pts = jnp.array([[0.0, 0.0, 0.0]])
        cloud = proj.project_points(
            pts, jnp.array([True]), jnp.eye(3),
            jnp.array([0.5, 0.0, 0.3]), geometry.quat_identity(),
        )
        np.testing.assert_allclose(cloud.xy[0], [0.5, 0], atol=1e-6)
        np.testing.assert_allclose(cloud.z[0], 0.3, atol=1e-6)
