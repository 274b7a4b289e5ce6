"""Keyframe manager tests: keyframe gating, closure detection, graph
correction of a drifted loop."""

import jax
import jax.numpy as jnp
import numpy as np

from slam_eslam_tpu.backend.keyframes import KeyframeManager
from slam_eslam_tpu.mapping.mls_grid import PatchCloud


def terrain(x, y):
    return 0.3 * np.sin(0.9 * np.asarray(x)) + 0.25 * np.cos(
        0.7 * np.asarray(y)
    )


def make_cloud(pose, n=400, key=0):
    """Terrain samples around the TRUE pose, expressed in body frame."""
    rng = np.random.default_rng(key)
    local = rng.uniform(-1.5, 1.5, (n, 2)).astype(np.float32)
    c, s = np.cos(pose[2]), np.sin(pose[2])
    world = np.stack(
        [c * local[:, 0] - s * local[:, 1] + pose[0],
         s * local[:, 0] + c * local[:, 1] + pose[1]], axis=1
    )
    z = terrain(world[:, 0], world[:, 1]).astype(np.float32)
    return PatchCloud.create(
        xy=jnp.asarray(local), z=jnp.asarray(z - pose[3]),
        stdev=jnp.full((n,), 0.05), valid=jnp.ones((n,), bool),
    )


class TestKeyframes:
    def test_distance_gating(self):
        km = KeyframeManager(keyframe_distance=0.5)
        p0 = np.array([0.0, 0.0, 0.0, 0.2])
        added, _ = km.maybe_add_keyframe(p0[:3], make_cloud(p0), z=p0[3])
        assert added
        p1 = np.array([0.2, 0.0, 0.0, 0.2])
        added, _ = km.maybe_add_keyframe(p1[:3], make_cloud(p1), z=p1[3])
        assert not added
        p2 = np.array([0.6, 0.0, 0.0, 0.2])
        added, _ = km.maybe_add_keyframe(p2[:3], make_cloud(p2), z=p2[3])
        assert added
        assert len(km.keyframes) == 2

    def test_loop_closure_on_revisit(self):
        km = KeyframeManager(
            keyframe_distance=0.45, closure_radius=0.8,
            min_separation=3, min_score=0.3,
        )
        # out-and-back path: 0 -> 2.5 m -> back to 0
        xs = list(np.arange(0, 2.6, 0.5)) + list(np.arange(2.0, -0.1, -0.5))
        closures = []
        for i, x in enumerate(xs):
            pose = np.array([x, 0.0, 0.0, 0.2])
            _, cl = km.maybe_add_keyframe(
                pose[:3], make_cloud(pose, key=i), z=pose[3]
            )
            if cl:
                closures.append(cl)
        assert closures, "revisit should produce a loop closure"

    def test_closure_corrects_drifted_trajectory(self):
        km = KeyframeManager(
            keyframe_distance=0.45, closure_radius=1.0,
            min_separation=4, min_score=0.3, closure_info=2000.0,
        )
        # true poses go out and come back; REPORTED poses drift in y
        xs = list(np.arange(0, 3.1, 0.5)) + list(np.arange(2.5, -0.1, -0.5))
        drift_per_kf = 0.06
        drift = 0.0
        reported = []
        for i, x in enumerate(xs):
            true_pose = np.array([x, 0.0, 0.0, 0.2])
            rep = true_pose.copy()
            rep[1] += drift  # drifted belief
            added, cl = km.maybe_add_keyframe(
                rep[:3], make_cloud(true_pose, key=100 + i), z=true_pose[3]
            )
            if added:
                drift += drift_per_kf
                reported.append((rep, true_pose))
        assert km.closures, "expected at least one closure"
        traj, hist = km.optimize(iters=15)
        # the last keyframe's drifted y (~0.6+) must be pulled toward 0
        before = reported[-1][0][1]
        after = traj[len(reported) - 1][1]
        assert abs(after) < abs(before) * 0.6, (
            f"closure did not reduce drift: before={before} after={after}"
        )

    def _drifted_manager(self, **kw):
        km = KeyframeManager(
            keyframe_distance=0.45, closure_radius=1.0,
            min_separation=4, min_score=0.3, closure_info=2000.0, **kw,
        )
        xs = list(np.arange(0, 3.1, 0.5)) + list(np.arange(2.5, -0.1, -0.5))
        drift = 0.0
        for i, x in enumerate(xs):
            true_pose = np.array([x, 0.0, 0.0, 0.2])
            rep = true_pose.copy()
            rep[1] += drift
            added, _ = km.maybe_add_keyframe(
                rep[:3], make_cloud(true_pose, key=100 + i),
                z=true_pose[3],
            )
            if added:
                drift += 0.06
        return km

    def test_incremental_optimize_matches_full(self):
        """Incremental re-solve (fix-mask over the untouched prefix)
        must land within mm of the full re-solve, and skip entirely
        when no new constraints arrived."""
        km_full = self._drifted_manager()
        traj_full, _ = km_full.optimize(iters=15)

        km_inc = self._drifted_manager()
        # mid-traverse solve, then new constraints arrive, then an
        # incremental re-solve of the affected suffix only
        km_inc.optimize(iters=15)
        assert km_inc._optimized_edges == km_inc.builder.n_edges
        traj_a, hist = km_inc.optimize(iters=15, incremental=True)
        assert hist.shape == (0,)  # no new edges -> no-op

        n = len(km_full.keyframes)
        np.testing.assert_allclose(
            traj_a[:n], traj_full[:n], atol=5e-3
        )

    def test_cg_solver_path(self):
        km = self._drifted_manager()
        traj_dense, _ = km.optimize(iters=15)
        km2 = self._drifted_manager()
        traj_cg, _ = km2.optimize(iters=15, solver="cg", cg_iters=64)
        n = len(km.keyframes)
        np.testing.assert_allclose(traj_cg[:n], traj_dense[:n], atol=1e-3)
