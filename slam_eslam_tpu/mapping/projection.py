"""Sensor projection pipelines: scans / distance images -> patch clouds.

Rebuilds the envire operator chains the reference assembles at init
(``/root/reference/src/EmbodiedSlamFilter.cpp:137-176``):

* ``ScanMeshing`` (LaserScan -> points, max-range gated,
  ``EmbodiedSlamFilter.cpp:149-153``)           -> ``scan_to_points``
* ``DistanceGridToPointcloud`` (distance image -> points, max-distance
  gated, ``:163-176``)                          -> ``distance_image_to_points``
* ``MLSProjection`` with ``useUncertainty(true)`` (points + uncertain
  transform -> MLS patches, ``:155-160``)        -> ``project_points``

Uncertainty model matches the hard-coded reference values: a 5 deg yaw
error on the sensor-to-body transform and 3 deg pitch/roll error on the
body-to-world transform (``EmbodiedSlamFilter.cpp:322-336``), propagated
to a per-point z standard deviation by first-order (cross-product)
analysis instead of envire's full covariance machinery.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from slam_eslam_tpu.mapping.mls_grid import PatchCloud
from slam_eslam_tpu.utils import geometry

SCAN_ANGLE_SIGMA = 5.0 * jnp.pi / 180.0   # EmbodiedSlamFilter.cpp:323
PITCH_ROLL_SIGMA = 3.0 * jnp.pi / 180.0   # EmbodiedSlamFilter.cpp:332


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["ranges", "start_angle", "angular_resolution"],
    meta_fields=[],
)
@dataclasses.dataclass
class LaserScan:
    """Planar scan (``base::samples::LaserScan`` capability)."""

    ranges: jax.Array             # [R] float32, metres; <=0 = invalid
    start_angle: jax.Array        # []
    angular_resolution: jax.Array  # []


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["data", "scale_x", "scale_y", "center_x", "center_y"],
    meta_fields=[],
)
@dataclasses.dataclass
class DistanceImage:
    """Dense distance image (``base::samples::DistanceImage`` capability):
    pinhole model z = d, x = (u*scale_x + center_x)*d."""

    data: jax.Array      # [H, W] float32 distances; nan/<=0 invalid
    scale_x: jax.Array
    scale_y: jax.Array
    center_x: jax.Array
    center_y: jax.Array


def scan_to_points(scan: LaserScan, max_range, min_range=0.1):
    """Scan line -> points in the scanner frame (x forward, scan in xy).

    Returns ``(points [R, 3], valid [R])``.
    """
    r = scan.ranges
    n = r.shape[0]
    a = scan.start_angle + jnp.arange(n, dtype=r.dtype) * scan.angular_resolution
    valid = (r > min_range) & (r < max_range) & jnp.isfinite(r)
    pts = jnp.stack(
        [r * jnp.cos(a), r * jnp.sin(a), jnp.zeros_like(r)], axis=-1
    )
    return pts, valid


def distance_image_to_points(img: DistanceImage, max_distance):
    """Distance image -> points in the camera frame.

    Returns ``(points [H*W, 3], valid [H*W])``.
    """
    h, w = img.data.shape
    d = img.data.reshape(-1)
    u = jnp.tile(jnp.arange(w, dtype=d.dtype), h)
    v = jnp.repeat(jnp.arange(h, dtype=d.dtype), w)
    x = (u * img.scale_x + img.center_x) * d
    y = (v * img.scale_y + img.center_y) * d
    valid = jnp.isfinite(d) & (d > 0) & (d < max_distance)
    return jnp.stack([x, y, jnp.nan_to_num(d)], axis=-1), valid


def project_points(
    points, valid, sensor2body_rot, sensor2body_trans, orientation,
    sensor_sigma=0.02,
    sensor_angle_sigma=SCAN_ANGLE_SIGMA,
    body_angle_sigma=PITCH_ROLL_SIGMA,
    color=None,
):
    """Points (sensor frame) -> ``PatchCloud`` in the yaw-compensated
    body frame, with propagated z uncertainty.

    The cloud lives in the frame the reference calls ``scanFrame``
    (yaw-compensated body, ``EmbodiedSlamFilter.cpp:138-141``); the
    per-particle transform is applied later by ``match``/``merge``.

    z-variance = sensor noise
               + |(sigma_yaw x p_body)_z|^2      (sensor mount error)
               + |(sigma_pitchroll x p_world)_z|^2 (attitude error).
    """
    p_body = jnp.dot(points, sensor2body_rot.T,
                     precision=jax.lax.Precision.HIGHEST) + sensor2body_trans
    q0 = geometry.remove_yaw(orientation)
    p_w = geometry.quat_rotate(q0[None, :], p_body)

    # first-order rotational error propagation to z
    # sensor yaw error rotates p_body about the sensor z-axis -> after
    # tilting into world, contributes via the body x/y components
    dz_sensor = sensor_angle_sigma * jnp.sqrt(
        p_body[:, 0] ** 2 + p_body[:, 1] ** 2
    ) * jnp.abs(jnp.sin(_tilt_angle(q0)))
    # pitch/roll error rotates p_world about horizontal axes:
    # (delta x p)_z for delta in the xy-plane has magnitude <=
    # sigma * sqrt(x^2 + y^2)
    dz_body = body_angle_sigma * jnp.sqrt(p_w[:, 0] ** 2 + p_w[:, 1] ** 2)
    stdev = jnp.sqrt(sensor_sigma**2 + dz_sensor**2 + dz_body**2)

    return PatchCloud.create(
        xy=p_w[:, :2], z=p_w[:, 2], stdev=stdev, valid=valid, color=color
    )


def free_space_points(points, valid, sensor2body_rot, sensor2body_trans,
                      orientation, samples=6, min_frac=0.15, max_frac=0.85):
    """Free-space samples along sensor rays (negative information).

    For each valid hit point, sample ``samples`` positions along the
    ray between the sensor origin and the hit (fractions in
    [min_frac, max_frac] so neither the sensor housing nor the surface
    itself is erased).  Returns ``(points [P*samples, 3], mask)`` in the
    same yaw-compensated body frame as ``project_points``.
    """
    p_body = jnp.dot(points, sensor2body_rot.T,
                     precision=jax.lax.Precision.HIGHEST) + sensor2body_trans
    q0 = geometry.remove_yaw(orientation)
    p_w = geometry.quat_rotate(q0[None, :], p_body)
    origin = geometry.quat_rotate(q0, sensor2body_trans)

    fr = jnp.linspace(min_frac, max_frac, samples)
    free = origin[None, None, :] + fr[None, :, None] * (
        p_w[:, None, :] - origin[None, None, :]
    )                                                   # [P, S, 3]
    mask = jnp.broadcast_to(valid[:, None], free.shape[:2])
    return free.reshape(-1, 3), mask.reshape(-1)


def texture_colors(img: DistanceImage, texture):
    """Per-point RGB from a texture image aligned with the distance
    image (the ImageRGB24 input, ``EmbodiedSlamFilter.cpp:259-275``).
    ``texture`` [H, W, 3] in [0, 1] -> [H*W, 3] matching
    ``distance_image_to_points`` ordering."""
    h, w = img.data.shape
    return jnp.asarray(texture, jnp.float32).reshape(h * w, 3)


def _tilt_angle(q):
    """Angle between the rotated z-axis and world z (pitch/roll tilt)."""
    z_axis = geometry.quat_rotate(q, jnp.array([0.0, 0.0, 1.0]))
    return jnp.arccos(jnp.clip(z_axis[2], -1.0, 1.0))
