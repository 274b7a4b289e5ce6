"""OnlineSlam: the full-stack loop in one object.

Combines the three layers this engine adds around the reference's
filter into a single driver:

* ``EmbodiedSlamFilter`` in per-particle-map mode, executed
  device-resident in chunks (``run_stream`` — one dispatch per chunk),
* the keyframe manager (revisit detection + scan-to-map closures),
* the pose-graph backend (incremental robust Gauss-Newton).

Typical use::

    slam = OnlineSlam(config=cfg, laser2body=(rot, trans))
    slam.init(pose=(xyz, yaw))
    for chunk in frame_chunks:          # stacked frame pytrees
        slam.process_chunk(chunk)
    traj, hist = slam.optimize()        # corrected keyframe trajectory

The reference has no equivalent (its loop closure is map re-entry via
per-particle maps + hash relocalisation only) — this is the NEW
capability path (SURVEY §5 / BASELINE stretch config #5) packaged
behind one API.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from slam_eslam_tpu.backend.keyframes import KeyframeManager
from slam_eslam_tpu.config import Config
from slam_eslam_tpu.filter.eslam_filter import EmbodiedSlamFilter
from slam_eslam_tpu.mapping import projection
from slam_eslam_tpu.utils import geometry


class OnlineSlam:
    def __init__(self, config: Config = None, laser2body=None,
                 keyframe_kw=None, mesh=None, camera2body=None,
                 camera_intrinsics=None):
        self.filter = EmbodiedSlamFilter(config=config)
        self.keyframes = KeyframeManager(**(keyframe_kw or {}))
        self.laser2body = laser2body
        self.camera2body = camera2body
        self.camera_intrinsics = camera_intrinsics
        self.mesh = mesh

    def init(self, pose, **kw):
        kw.setdefault("use_shared_map", False)
        self.filter.init(pose=pose, **kw)
        return self

    def process_chunk(self, frames):
        """Run one stacked frame chunk device-resident, then feed every
        mapping-gated frame's (centroid pose, scan cloud) to the
        keyframe manager on the host.  Returns the streaming ``aux``.
        """
        aux = self.filter.run_stream(
            frames, laser2body=self.laser2body, mesh=self.mesh,
            camera2body=self.camera2body,
            camera_intrinsics=self.camera_intrinsics,
        )
        mapped = np.asarray(aux["mapped"])
        if not mapped.any():
            return aux
        cents = np.asarray(aux["centroid"])
        cs, qs, _pos, ranges, scan_meta, _has = frames[:6]
        l_rot = (jnp.eye(3, dtype=jnp.float32) if self.laser2body is None
                 else jnp.asarray(self.laser2body[0], jnp.float32))
        l_trans = (jnp.zeros(3, jnp.float32) if self.laser2body is None
                   else jnp.asarray(self.laser2body[1], jnp.float32))
        for i in np.nonzero(mapped)[0]:
            scan = projection.LaserScan(
                ranges=jnp.asarray(ranges[i]),
                start_angle=jnp.asarray(scan_meta[0][i]),
                angular_resolution=jnp.asarray(scan_meta[1][i]),
            )
            pts, valid = projection.scan_to_points(
                scan, self.filter.config.max_sensor_range
            )
            cloud = projection.project_points(
                pts, valid, l_rot, l_trans, jnp.asarray(qs[i])
            )
            yaw = float(geometry.yaw_from_quat(jnp.asarray(qs[i])))
            pose = np.array([cents[i, 0], cents[i, 1], yaw])
            self.keyframes.maybe_add_keyframe(
                pose, cloud, z=float(cents[i, 2])
            )
        return aux

    def optimize(self, iters=10, incremental=True, robust="dcs", **kw):
        """Incremental robust re-solve of the keyframe graph.  Returns
        ``(trajectory [K, 3], chi2_history)``."""
        return self.keyframes.optimize(
            iters=iters, incremental=incremental, robust=robust, **kw
        )

    @property
    def centroid(self):
        return self.filter.get_centroid()

    def trajectory(self):
        return self.keyframes.trajectory()
