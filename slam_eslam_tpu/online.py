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
                 camera_intrinsics=None, camera_texture=False,
                 odometry_config=None, submap_scans=1, donate=False):
        self.filter = EmbodiedSlamFilter(
            odometry_config=odometry_config, config=config
        )
        self.keyframes = KeyframeManager(**(keyframe_kw or {}))
        self.laser2body = laser2body
        self.camera2body = camera2body
        self.camera_intrinsics = camera_intrinsics
        self.camera_texture = camera_texture
        self.mesh = mesh
        # global frame index of each accepted keyframe (fills as chunks
        # stream through process_chunk; lets callers align keyframes
        # with external references such as ground truth)
        self.keyframe_frames = []
        self._frame_base = 0
        # keyframe clouds are LOCAL MAP extracts, not raw scans: a
        # single scan is a 1-D curve on the ground, and two curves
        # generically intersect at isolated points — areal correlation
        # (scan_align) cannot lock onto them.  The best particle's
        # accumulated MLS map around the keyframe gives areal coverage.
        # `submap_scans` keeps the raw-scan fallback for callers
        # without per-particle maps.
        self.submap_scans = max(1, submap_scans)
        # donate the scan carry per chunk: halves peak pool HBM
        # (stretch-scale per-particle pools)
        self.donate = donate
        self._recent = []  # [(pose_xyyawz, cloud), ...]

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
            camera_texture=self.camera_texture,
            donate=self.donate,
        )
        mapped = np.asarray(aux["mapped"])
        frame_base = self._frame_base
        self._frame_base += mapped.shape[0]
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
            pose = np.array(
                [cents[i, 0], cents[i, 1], yaw, cents[i, 2]]
            )
            self._recent.append((pose, cloud))
            self._recent = self._recent[-self.submap_scans:]
            kf_cloud = self._local_map_cloud(pose)
            if kf_cloud is None:
                kf_cloud = self._submap(pose)
            # probe with the same local-map extract: raw single scans
            # are 1-D ground curves whose areal correlation false-peaks
            # (measured) — the accumulated local map aligns reliably
            added, _closure = self.keyframes.maybe_add_keyframe(
                pose[:3], kf_cloud, z=float(cents[i, 2])
            )
            if added:
                self.keyframe_frames.append(frame_base + int(i))
        return aux

    def _local_map_cloud(self, kf_pose, radius=4.0, max_points=1024):
        """Best particle's accumulated local map as a body-frame
        PatchCloud around ``kf_pose`` (the areal keyframe signature the
        closure alignment needs).  Host-side extraction of a few chain
        blocks; None when no per-particle pool exists."""
        pool = self.filter.pool
        if pool is None:
            return None
        import dataclasses as dc

        from slam_eslam_tpu.mapping.mls_grid import PatchCloud

        best = self.filter.get_best_particle_index()
        chain = np.asarray(pool.chain[best])
        pts = []
        seen_cells = set()
        for b in chain:  # head first: newer grids win
            if b < 0:
                continue
            valid = np.asarray(pool.valid[int(b)]).reshape(
                pool.nx, pool.ny, pool.k
            )
            mean = np.asarray(
                pool.mean[int(b)], np.float32
            ).reshape(pool.nx, pool.ny, pool.k)
            stdev = np.asarray(
                pool.stdev[int(b)], np.float32
            ).reshape(pool.nx, pool.ny, pool.k)
            origin = np.asarray(pool.origin[int(b)])
            ix, iy, sl = np.nonzero(valid)
            wx = origin[0] + (ix + 0.5) * pool.resolution
            wy = origin[1] + (iy + 0.5) * pool.resolution
            for j in range(len(ix)):
                key = (round(float(wx[j]) / pool.resolution),
                       round(float(wy[j]) / pool.resolution))
                if key in seen_cells:
                    continue
                seen_cells.add(key)
                pts.append((wx[j], wy[j], mean[ix[j], iy[j], sl[j]],
                            stdev[ix[j], iy[j], sl[j]]))
        if not pts:
            return None
        a = np.asarray(pts, np.float32)
        d = np.hypot(a[:, 0] - kf_pose[0], a[:, 1] - kf_pose[1])
        a = a[d <= radius]
        if a.shape[0] == 0:
            return None
        if a.shape[0] > max_points:
            a = a[np.linspace(0, a.shape[0] - 1, max_points, dtype=int)]
        # pad to a FIXED size so every keyframe cloud has one shape:
        # scan_align/merge_cloud jit-compile once instead of once per
        # keyframe (match_cloud normalises by the valid count, so
        # padding does not dilute scores) — at stretch scale the
        # per-keyframe recompiles dominated the whole run
        n_pts = a.shape[0]
        if n_pts < max_points:
            a = np.concatenate(
                [a, np.zeros((max_points - n_pts, 4), np.float32)]
            )
        # world -> keyframe body frame (yaw-compensated; z relative to
        # the keyframe's believed z, matching scan clouds)
        c, s = np.cos(kf_pose[2]), np.sin(kf_pose[2])
        rx = a[:, 0] - kf_pose[0]
        ry = a[:, 1] - kf_pose[1]
        return PatchCloud.create(
            xy=jnp.asarray(
                np.stack([c * rx + s * ry, -s * rx + c * ry], 1)
            ),
            z=jnp.asarray(a[:, 2] - kf_pose[3]),
            stdev=jnp.asarray(np.maximum(a[:, 3], 0.01)),
            valid=jnp.asarray(np.arange(max_points) < n_pts),
        )

    def _submap(self, kf_pose):
        """Compose the recent scan clouds into ``kf_pose``'s frame (the
        believed relative transforms between consecutive scans are
        accurate over a few frames even when the absolute pose drifts)."""
        if len(self._recent) == 1:
            return self._recent[-1][1]
        import dataclasses as dc

        ck, sk = np.cos(kf_pose[2]), np.sin(kf_pose[2])
        parts = []
        for pose, cloud in self._recent:
            c, s = np.cos(pose[2]), np.sin(pose[2])
            xy = np.asarray(cloud.xy)
            wx = c * xy[:, 0] - s * xy[:, 1] + pose[0] - kf_pose[0]
            wy = s * xy[:, 0] + c * xy[:, 1] + pose[1] - kf_pose[1]
            parts.append(dc.replace(
                cloud,
                xy=jnp.asarray(
                    np.stack([ck * wx + sk * wy, -sk * wx + ck * wy], 1),
                    jnp.float32,
                ),
                z=cloud.z + np.float32(pose[3] - kf_pose[3]),
            ))
        return dc.replace(
            parts[0],
            xy=jnp.concatenate([p.xy for p in parts]),
            z=jnp.concatenate([p.z for p in parts]),
            stdev=jnp.concatenate([p.stdev for p in parts]),
            valid=jnp.concatenate([p.valid for p in parts]),
            color=None,
        )

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
