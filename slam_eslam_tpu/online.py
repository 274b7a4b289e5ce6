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
                 odometry_config=None, submap_scans=1, donate=False,
                 probe_recent=60):
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
        # keyframe-cloud recency window (in map update counts): the
        # accumulated per-particle map still holds the OUT-leg terrain
        # at drifted coordinates when the robot revisits ground — an
        # unfiltered local-map extract then contains a ghost strip
        # that correlates perfectly at ZERO correction and drags the
        # closure alignment toward "no correction" (round-5 stretch
        # find: systematic 1-2 m along-track closure bias).  Only
        # patches merged within the last ``probe_recent`` map updates
        # enter keyframe/probe clouds; None disables.
        self.probe_recent = probe_recent
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
        n_chunk = mapped.shape[0]
        self._frame_base += n_chunk
        if not mapped.any():
            return aux
        if self.filter.pool is not None:
            # per-particle-map mode: ONE keyframe opportunity per
            # chunk, taken at the end-of-chunk state where the pool,
            # the best-particle index and the best-particle pose are
            # exactly consistent.  (Round-5 find: anchoring mid-chunk
            # keyframes at the centroid — or at any pose other than
            # the one the extracted map lineage believes — mis-places
            # the cloud by the particle-vs-centroid offset and
            # scattered every closure alignment.  Keyframe cadence =
            # chunk travel; size chunks to the desired spacing.)
            bi = self.filter.get_best_particle_index()
            p = self.filter.state.particles
            pose = np.array([float(p.x[bi]), float(p.y[bi]),
                             float(p.yaw[bi]), float(p.z[bi])])
            kf_cloud = self._local_map_cloud(pose)
            if kf_cloud is not None:
                qs = frames[1]
                abs_yaw = float(geometry.yaw_from_quat(
                    jnp.asarray(qs[n_chunk - 1])))
                added, _closure = self.keyframes.maybe_add_keyframe(
                    pose[:3], kf_cloud, z=float(pose[3]),
                    abs_yaw=abs_yaw,
                )
                if added:
                    self.keyframe_frames.append(
                        frame_base + n_chunk - 1)
            return aux
        # shared-map / no-pool mode: per-scan keyframes from composed
        # raw scan submaps
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
            kf_cloud = self._submap(pose)
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
        cur = int(self.filter.update_idx)
        min_uidx = (cur - self.probe_recent
                    if self.probe_recent is not None else 0)
        pts = []
        seen = np.zeros((0,), np.int64)
        for b in chain:  # head first: newer grids win
            if b < 0:
                continue
            shape = (pool.nx, pool.ny, pool.k)
            # ONE device slice per field; valid/update_idx decode from
            # the packed meta word on host (the pool-wide property
            # views would compute over every block per keyframe)
            meta = np.asarray(pool.meta[int(b)]).reshape(shape)
            valid = (meta & 1) != 0
            if min_uidx > 0:
                # recency gate (see ``probe_recent``)
                valid &= (meta >> 2) >= min_uidx
            if not valid.any():
                continue
            mean = np.asarray(
                pool.mean[int(b)], np.float32
            ).reshape(shape)
            stdev = np.asarray(
                pool.stdev[int(b)], np.float32
            ).reshape(shape)
            origin = np.asarray(pool.origin[int(b)])
            ix, iy, sl = np.nonzero(valid)
            wx = (origin[0] + (ix + 0.5) * pool.resolution).astype(
                np.float32)
            wy = (origin[1] + (iy + 0.5) * pool.resolution).astype(
                np.float32)
            key = (np.round(wx / pool.resolution).astype(np.int64)
                   * 1_000_003
                   + np.round(wy / pool.resolution).astype(np.int64))
            # first slot per cell wins within the block; earlier
            # (newer) chain blocks win across blocks
            _, first = np.unique(key, return_index=True)
            keep = np.zeros(len(key), bool)
            keep[first] = True
            if seen.size:
                keep &= ~np.isin(key, seen)
            if not keep.any():
                continue
            seen = np.concatenate([seen, key[keep]])
            pts.append(np.stack([
                wx[keep], wy[keep], mean[ix, iy, sl][keep],
                stdev[ix, iy, sl][keep],
            ], axis=1))
        if not pts:
            return None
        a = np.concatenate(pts).astype(np.float32)
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
