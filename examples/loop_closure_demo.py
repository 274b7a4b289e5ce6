"""Integrated demo: particle-filter odometry front-end + pose-graph
loop-closure back-end.

The robot drives an out-and-back path. The filter front-end tracks with
contact odometry only (no map — odometry-grade drift accumulates); the
keyframe manager stores terrain-sampled scan clouds, detects the
revisit, aligns against the first keyframe's grid, and the pose-graph
optimisation pulls the drifted trajectory back onto itself.

Run:  python examples/loop_closure_demo.py [--cpu]
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    from slam_eslam_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from slam_eslam_tpu.backend.keyframes import KeyframeManager
    from slam_eslam_tpu.mapping.mls_grid import PatchCloud

    def terrain(x, y):
        return 0.3 * np.sin(0.9 * np.asarray(x)) + 0.25 * np.cos(
            0.7 * np.asarray(y)
        )

    rng = np.random.default_rng(0)

    def scan_cloud(true_pose, n=400):
        local = rng.uniform(-1.5, 1.5, (n, 2)).astype(np.float32)
        c, s = np.cos(true_pose[2]), np.sin(true_pose[2])
        world = np.stack(
            [c * local[:, 0] - s * local[:, 1] + true_pose[0],
             s * local[:, 0] + c * local[:, 1] + true_pose[1]], axis=1,
        )
        z = terrain(world[:, 0], world[:, 1]).astype(np.float32)
        return PatchCloud.create(
            xy=jnp.asarray(local), z=jnp.asarray(z - 0.2),
            stdev=jnp.full((n,), 0.05), valid=jnp.ones((n,), bool),
        )

    km = KeyframeManager(
        keyframe_distance=0.45, closure_radius=1.0, min_separation=4,
        min_score=0.3, closure_info=2000.0,
    )

    # out-and-back ground truth with odometry drift in the belief
    xs = list(np.arange(0, 3.1, 0.5)) + list(np.arange(2.5, -0.1, -0.5))
    drift_per_kf = 0.06
    drift = 0.0
    believed, truths = [], []
    for i, x in enumerate(xs):
        true_pose = np.array([x, 0.0, 0.0])
        belief = true_pose + np.array([0.0, drift, 0.0])
        added, closure = km.maybe_add_keyframe(
            belief, scan_cloud(true_pose), z=0.2
        )
        if added:
            drift += drift_per_kf
            believed.append(belief)
            truths.append(true_pose)
            mark = f"  closure {closure}" if closure else ""
            print(f"kf {len(believed) - 1:2d}  belief=({belief[0]:5.2f},"
                  f"{belief[1]:5.2f})  truth=({x:4.1f},0.00){mark}")

    print(f"\nclosures: {km.closures}")
    traj, hist = km.optimize(iters=15)
    err_before = np.abs(np.array(believed)[:, 1]).max()
    err_after = np.abs(traj[: len(believed), 1]).max()
    print(f"max |y| drift before optimisation: {err_before:.3f} m")
    print(f"max |y| drift after  optimisation: {err_after:.3f} m")
    print(f"chi2: {float(hist[0]):.4f} -> {float(hist[-1]):.4f}")


if __name__ == "__main__":
    main()
