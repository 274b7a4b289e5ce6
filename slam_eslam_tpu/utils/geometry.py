"""Geometry primitives: quaternions, yaw decomposition, 2-D rotations.

Rebuilds the capability of the Rock ``base-types`` helpers the reference
leans on (``base::getYaw``, ``base::removeYaw``, ``base::Pose2D`` —
used e.g. at ``/root/reference/src/ContactModel.cpp:35``,
``src/PoseEstimator.cpp:186-187``, ``src/PoseParticle.hpp:58-67``)
as pure JAX functions on float32 arrays.

Quaternions are stored as ``[w, x, y, z]`` arrays.  All functions are
shape-polymorphic over leading batch dimensions where noted and are safe
to ``jit`` / ``vmap``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quat_identity(dtype=jnp.float32):
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_mul(q1, q2):
    """Hamilton product ``q1 * q2`` ([..., 4] x [..., 4] -> [..., 4])."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_rotate(q, v):
    """Rotate vector(s) ``v`` [..., 3] by quaternion(s) ``q`` [..., 4]."""
    w = q[..., 0:1]
    u = q[..., 1:4]
    # v' = v + 2 w (u x v) + 2 u x (u x v)
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_from_yaw(yaw):
    """Quaternion for a rotation of ``yaw`` about +Z.  yaw: [...] -> [..., 4]."""
    half = 0.5 * yaw
    zeros = jnp.zeros_like(half)
    return jnp.stack([jnp.cos(half), zeros, zeros, jnp.sin(half)], axis=-1)


def quat_from_axis_angle(axis, angle):
    axis = jnp.asarray(axis, dtype=jnp.result_type(float))
    axis = axis / jnp.linalg.norm(axis)
    half = 0.5 * angle
    return jnp.concatenate(
        [jnp.cos(half)[..., None], jnp.sin(half)[..., None] * axis], axis=-1
    )


def quat_to_matrix(q):
    """[..., 4] -> [..., 3, 3] rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def quat_from_matrix(r):
    """[3, 3] rotation matrix -> [4] unit quaternion (w, x, y, z).

    Branch-free variant of Shepperd's method: compute all four
    candidate constructions and select the best-conditioned one by
    mask (jit-friendly; no data-dependent control flow).
    """
    r = jnp.asarray(r)
    m00, m11, m22 = r[0, 0], r[1, 1], r[2, 2]
    tr = m00 + m11 + m22
    # four squared-magnitude candidates (4q_i^2 - 1 + trace terms)
    qw2 = 1.0 + tr
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22
    cands = jnp.stack([
        jnp.stack([qw2, r[2, 1] - r[1, 2], r[0, 2] - r[2, 0],
                   r[1, 0] - r[0, 1]]),
        jnp.stack([r[2, 1] - r[1, 2], qx2, r[1, 0] + r[0, 1],
                   r[0, 2] + r[2, 0]]),
        jnp.stack([r[0, 2] - r[2, 0], r[1, 0] + r[0, 1], qy2,
                   r[2, 1] + r[1, 2]]),
        jnp.stack([r[1, 0] - r[0, 1], r[0, 2] + r[2, 0],
                   r[2, 1] + r[1, 2], qz2]),
    ])                                                   # [4, 4]
    mags = jnp.stack([qw2, qx2, qy2, qz2])
    best = jnp.argmax(mags)
    q = cands[best] / (2.0 * jnp.sqrt(jnp.maximum(mags[best], 1e-12)))
    # canonical sign: w >= 0
    return jnp.where(q[0] < 0, -q, q)


def yaw_from_quat(q):
    """Heading (rotation about +Z) of the quaternion.

    Matches ``base::getYaw``: the angle of the rotated x-axis projected
    into the xy-plane.
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    # rotated x-axis: col 0 of R
    r00 = 1 - 2 * (y * y + z * z)
    r10 = 2 * (x * y + w * z)
    return jnp.arctan2(r10, r00)


def remove_yaw(q):
    """Strip the heading: returns ``R_z(-yaw(q)) * q`` (``base::removeYaw``).

    The result maps body-frame vectors into a yaw-compensated world frame
    (gravity-aligned, x-axis heading removed).
    """
    yaw = yaw_from_quat(q)
    return quat_mul(quat_from_yaw(-yaw), q)


def rot2d(theta):
    """[...] -> [..., 2, 2] planar rotation matrix."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )


def rotate2d(theta, v):
    """Rotate 2-vector(s) ``v`` [..., 2] by angle(s) ``theta`` [...]."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    x, y = v[..., 0], v[..., 1]
    return jnp.stack([c * x - s * y, s * x + c * y], axis=-1)


def angle_of_rotation(q):
    """Total rotation angle of a quaternion (``Eigen::AngleAxisd(R).angle()``)."""
    w = jnp.clip(jnp.abs(q[..., 0]), 0.0, 1.0)
    return 2.0 * jnp.arccos(w)


def pose_matrix_2p5d(xy, yaw, z):
    """Build the 4x4 particle pose used by the weighting loop.

    Matches ``Eigen::Translation3d(pos) * AngleAxisd(yaw, UnitZ())``
    (``src/PoseEstimator.cpp:279-282``): translation + pure yaw rotation.
    Returns ([..., 3, 3] rotation, [..., 3] translation) as an (R, t) pair —
    we never materialise 4x4 homogeneous matrices on device.
    """
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    r = jnp.stack(
        [c, -s, zero, s, c, zero, zero, zero, one], axis=-1
    ).reshape(yaw.shape + (3, 3))
    t = jnp.concatenate([xy, z[..., None]], axis=-1)
    return r, t


def transform_points(rot, trans, points):
    """Apply (R, t) to points: [..., 3, 3], [..., 3], [..., P, 3] -> [..., P, 3]."""
    return jnp.einsum("...ij,...pj->...pi", rot, points,
                      precision=jax.lax.Precision.HIGHEST) + trans[..., None, :]
