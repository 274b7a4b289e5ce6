"""Contact (foot) odometry.

Rebuild of the capability of Rock's ``odometry::FootContact``
(external to the reference repo; consumed at
``/root/reference/src/PoseEstimator.cpp:184-198`` and
``src/EmbodiedSlamFilter.cpp:357``): given consecutive body contact
states and IMU orientations, estimate the body-frame pose delta, its
error model, and noise-sampled per-particle 2-D deltas.

Principle: a foot in ground contact is stationary in the world, so in the
yaw-compensated (gravity-aligned, heading-preserving) frame the body
translation between two samples is ``R_prev p_prev - R_cur p_cur``
averaged over feet that are in contact in both samples.  The heading
delta comes from the IMU orientation (``getYaw(cur) - getYaw(prev)``).
The error model grows a constant plus per-distance term, matching the
role of ``getPositionError()`` (``PoseEstimator.cpp:192``) and
``getPoseDeltaSample2D()`` (``:198``) — the latter becomes a *vectorised*
sampler producing all N particle deltas in one fused draw instead of N
sequential RNG calls.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from slam_eslam_tpu.config import OdometryConfig
from slam_eslam_tpu.core.state import BodyContactState
from slam_eslam_tpu.utils import geometry


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "prev_points", "prev_contact", "prev_valid", "prev_orientation",
        "initialized", "delta_xy", "delta_yaw", "delta_z", "sigma_xy",
        "sigma_yaw", "sigma_z",
    ],
    meta_fields=[],
)
@dataclasses.dataclass
class FootContactOdometry:
    """Odometry state + last computed delta (a pure-data pytree)."""

    prev_points: jax.Array       # [C, 3] yaw-compensated positions
    prev_contact: jax.Array      # [C]
    prev_valid: jax.Array        # [C]
    prev_orientation: jax.Array  # [4]
    initialized: jax.Array       # [] bool
    # last delta (body/yaw-compensated frame)
    delta_xy: jax.Array          # [2]
    delta_yaw: jax.Array         # []
    delta_z: jax.Array           # []
    # error model (std devs)
    sigma_xy: jax.Array          # [2]
    sigma_yaw: jax.Array         # []
    sigma_z: jax.Array           # []

    @staticmethod
    def create(num_points, dtype=jnp.float32):
        return FootContactOdometry(
            prev_points=jnp.zeros((num_points, 3), dtype),
            prev_contact=jnp.zeros((num_points,), dtype),
            prev_valid=jnp.zeros((num_points,), bool),
            prev_orientation=geometry.quat_identity(dtype),
            initialized=jnp.zeros((), bool),
            delta_xy=jnp.zeros((2,), dtype),
            delta_yaw=jnp.zeros((), dtype),
            delta_z=jnp.zeros((), dtype),
            sigma_xy=jnp.zeros((2,), dtype),
            sigma_yaw=jnp.zeros((), dtype),
            sigma_z=jnp.zeros((), dtype),
        )


def update(
    odo: FootContactOdometry,
    state: BodyContactState,
    orientation,
    cfg: OdometryConfig,
):
    """Advance the odometry with a new contact state + IMU orientation.

    Functional analogue of ``FootContact::update(state, orientation)``
    (call site ``EmbodiedSlamFilter.cpp:357``).  Returns the new state;
    the delta accessors below read from it.
    """
    q = geometry.remove_yaw(orientation)
    pts = geometry.quat_rotate(q[None, :], state.position)
    contact = jnp.nan_to_num(state.contact, nan=1.0)

    both = (
        odo.initialized
        & odo.prev_valid
        & state.valid
        & (odo.prev_contact > cfg.contact_threshold)
        & (contact > cfg.contact_threshold)
    )
    w = jnp.where(both, jnp.minimum(odo.prev_contact, contact), 0.0)
    wsum = jnp.sum(w)

    yaw_prev = geometry.yaw_from_quat(odo.prev_orientation)
    yaw_cur = geometry.yaw_from_quat(orientation)
    dyaw = jnp.where(
        odo.initialized,
        jnp.arctan2(jnp.sin(yaw_cur - yaw_prev), jnp.cos(yaw_cur - yaw_prev)),
        0.0,
    )

    # rigid 2-D alignment: a world-fixed stance foot seen from the two
    # yaw-compensated body frames satisfies t_delta = p_prev - R(dyaw)
    # p_cur — the yaw-delta rotation must be removed from the current
    # points BEFORE differencing, or turning leaks rotation into the
    # translation estimate (worst case |r|*dyaw per update; a closed
    # loop hid the bias because it integrates to zero over 2*pi)
    c_d, s_d = jnp.cos(dyaw), jnp.sin(dyaw)
    pts_rot = jnp.stack(
        [c_d * pts[:, 0] - s_d * pts[:, 1],
         s_d * pts[:, 0] + c_d * pts[:, 1],
         pts[:, 2]], axis=-1,
    )
    disp = odo.prev_points - pts_rot                   # [C, 3]
    mean_disp = jnp.sum(disp * w[:, None], axis=0) / jnp.maximum(wsum, 1e-9)
    mean_disp = jnp.where(wsum > 0, mean_disp, jnp.zeros(3, pts.dtype))

    dist = jnp.linalg.norm(mean_disp[:2])
    sigma_xy = jnp.full(
        (2,), cfg.const_error_xy, pts.dtype
    ) + cfg.dist_error_xy * dist
    sigma_yaw = jnp.asarray(
        cfg.const_error_yaw + cfg.dist_error_yaw * dist, pts.dtype
    )
    sigma_z = jnp.asarray(cfg.const_error_z + cfg.dist_error_z * dist, pts.dtype)

    return dataclasses.replace(
        odo,
        prev_points=pts,
        prev_contact=contact,
        prev_valid=state.valid,
        prev_orientation=orientation,
        initialized=jnp.ones((), bool),
        delta_xy=mean_disp[:2],
        delta_yaw=dyaw,
        delta_z=mean_disp[2],
        sigma_xy=sigma_xy,
        sigma_yaw=sigma_yaw,
        sigma_z=sigma_z,
    )


def pose_delta_samples_2d(odo: FootContactOdometry, key, n):
    """N noise-sampled 2-D pose deltas (``getPoseDeltaSample2D``,
    ``PoseEstimator.cpp:198`` — one fused draw for all particles).

    Returns ``(dxy [n, 2], dyaw [n])``.
    """
    kxy, kyaw = jax.random.split(key)
    dxy = odo.delta_xy + jax.random.normal(
        kxy, (n, 2), odo.delta_xy.dtype
    ) * odo.sigma_xy
    dyaw = odo.delta_yaw + jax.random.normal(
        kyaw, (n,), odo.delta_xy.dtype
    ) * odo.sigma_yaw
    return dxy, dyaw


def position_error(odo: FootContactOdometry):
    """3x3 position error covariance (``FootContact::getPositionError``;
    the filter reads its (2,2) entry for z-variance propagation,
    ``PoseEstimator.cpp:192``)."""
    return jnp.diag(
        jnp.stack(
            [odo.sigma_xy[0] ** 2, odo.sigma_xy[1] ** 2, odo.sigma_z**2]
        )
    )


def z_delta_and_var(odo: FootContactOdometry, orientation):
    """World z displacement + variance for z propagation.

    Mirrors ``PoseEstimator::project``'s use of the odometry
    (``PoseEstimator.cpp:188-192``): the body-frame delta rotated by the
    full orientation gives the world z delta; the variance is the
    odometry's z position error doubled.
    """
    delta_body = jnp.concatenate([odo.delta_xy, odo.delta_z[None]])
    # delta is already in the yaw-compensated world frame; its z component
    # is the world z displacement (a pure yaw leaves z unchanged)
    z_delta = delta_body[2]
    z_var = (odo.sigma_z**2) * 2.0
    return z_delta, z_var
