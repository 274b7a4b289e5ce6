"""Synthetic simulation fixtures for tests and benchmarks.

The reference validates statistically against a kinematic simulation
(``/root/reference/test/testMap.cpp:65-104`` and the ``batch`` harness
``:358-435``).  This module provides the equivalents:

* ``terrain_grid``   — prefill an MLS grid from a height function,
* ``conformal_contact_state`` — contact candidates that conform to the
  terrain under the true pose (one contact foot per wheel touching the
  surface), giving a ground-truth-consistent measurement stream for
  localisation ATE tests without a full physics simulator,
* ``TrajectorySim`` — drives pose + contact states along a path.
"""

from __future__ import annotations

import numpy as np

from slam_eslam_tpu.core.state import BodyContactState
from slam_eslam_tpu.mapping import mls_grid
from slam_eslam_tpu.models.asguard import AsguardConfig, FEET_PER_WHEEL, NUM_WHEELS

import jax.numpy as jnp


def terrain_grid(terrain, nx, ny, resolution, origin, stdev=0.02, k=4):
    """Build an MLSGrid sampling ``terrain(x, y)`` at every cell centre."""
    g = mls_grid.MLSGrid.create(nx, ny, resolution, origin, k)
    xs, ys = jnp.meshgrid(jnp.arange(nx), jnp.arange(ny), indexing="ij")
    xy = g.from_grid(xs.ravel(), ys.ravel())
    z = jnp.asarray(
        terrain(np.asarray(xy[:, 0]), np.asarray(xy[:, 1])), jnp.float32
    )
    sd = jnp.full((xy.shape[0],), stdev, jnp.float32)
    return mls_grid.merge_points(
        g, xy, z, sd, jnp.ones((xy.shape[0],), bool), 0
    )


def conformal_contact_state(position, yaw, terrain,
                            config: AsguardConfig = None, noise=0.0,
                            rng=None):
    """Terrain-conformal contact candidates for a true pose.

    For each wheel, the contact foot sits exactly on the terrain under
    its world xy; the remaining feet hang above it (contact 0).  Points
    are expressed in the yaw-compensated body frame (the frame the
    contact model works in after ``setContactPoints`` with a yaw-only
    orientation), i.e. world minus position minus yaw rotation.
    """
    config = config or AsguardConfig()
    rng = rng or np.random.default_rng(0)
    centers = config.wheel_centers()
    c, s = np.cos(yaw), np.sin(yaw)
    rot = np.array([[c, -s], [s, c]])

    positions = np.zeros((NUM_WHEELS * FEET_PER_WHEEL, 3), np.float32)
    contact = np.zeros(NUM_WHEELS * FEET_PER_WHEEL, np.float32)
    group = np.repeat(np.arange(NUM_WHEELS), FEET_PER_WHEEL).astype(np.int32)

    for wheel in range(NUM_WHEELS):
        cw = centers[wheel]
        world_xy = rot @ cw[:2] + position[:2]
        ground = terrain(world_xy[0], world_xy[1])
        for j in range(FEET_PER_WHEEL):
            i = wheel * FEET_PER_WHEEL + j
            if j == 0:
                # stance foot: body-frame z puts it on the terrain
                fz = ground - position[2] + rng.normal() * noise
                contact[i] = 1.0
            else:
                fz = ground - position[2] + 0.05 + 0.03 * j
                contact[i] = 0.0
            positions[i] = [cw[0], cw[1], fz]
    return BodyContactState.create(positions, contact=contact, group_id=group)


class TrajectorySim:
    """Ground-truth pose driver along a parametric path over terrain."""

    def __init__(self, terrain, speed=0.05, yaw_rate=0.0, seed=0):
        self.terrain = terrain
        self.speed = speed
        self.yaw_rate = yaw_rate
        self.rng = np.random.default_rng(seed)
        self.position = np.zeros(3)
        self.yaw = 0.0
        self.position[2] = terrain(0.0, 0.0) + 0.2

    def step(self):
        """Advance one step driving along body +y; returns ground truth
        (position, yaw) and the body-frame odometry delta (dxy, dyaw)."""
        c, s = np.cos(self.yaw), np.sin(self.yaw)
        d_body = np.array([0.0, self.speed])
        self.position[:2] += np.array([[c, -s], [s, c]]) @ d_body
        self.yaw += self.yaw_rate
        new_z = self.terrain(self.position[0], self.position[1]) + 0.2
        dz = new_z - self.position[2]
        self.position[2] = new_z
        return (self.position.copy(), self.yaw), (d_body, self.yaw_rate, dz)

    def contact_state(self, noise=0.0):
        return conformal_contact_state(
            self.position, self.yaw, self.terrain, noise=noise, rng=self.rng
        )
