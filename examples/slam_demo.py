"""Full SLAM demo: per-particle mapping + laser scans + localisation.

Runs the EmbodiedSlamFilter in per-particle-map mode over a synthetic
world: the robot rolls forward (kinematic Asguard sim), contact updates
localise against each particle's own map while simulated laser scans of
the surrounding terrain merge into the per-particle maps.  Renders the
best particle's map and the particle cloud to PNG.

Run:  python examples/slam_demo.py [--steps 20] [--particles 24] [--cpu]
"""

import argparse
import dataclasses
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--particles", type=int, default=24)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="/tmp/slam_demo")
    ap.add_argument(
        "--snapshot-every", type=int, default=0, dest="snapshot_every",
        help="render the running filter every N steps (the offline "
        "analog of the reference's 10 Hz live viz; frames land in "
        "--out/frames)",
    )
    args = ap.parse_args()

    from slam_eslam_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from slam_eslam_tpu.config import Config, ContactModelConfig
    from slam_eslam_tpu.filter.eslam_filter import EmbodiedSlamFilter
    from slam_eslam_tpu.mapping import projection as proj
    from slam_eslam_tpu.models.asguard import AsguardSim
    from slam_eslam_tpu.viz import render

    def terrain(x, y):
        return 0.15 * np.sin(0.6 * np.asarray(x)) + 0.1 * np.cos(
            0.5 * np.asarray(y)
        )

    cfg = dataclasses.replace(
        Config(),
        particle_count=args.particles,
        min_effective=args.particles // 2,
        grid_size=10.0,
        grid_resolution=0.25,
        map_pool_blocks=args.particles + 16,
        map_chain_length=3,
        contact_model=ContactModelConfig(
            contact_point_radius=0.0, min_contacts=2
        ),
    )

    f = EmbodiedSlamFilter(config=cfg)
    sim = AsguardSim(terrain=terrain)
    f.init(
        pose=(np.array([0.0, 0.0, sim.position[2]]), 0.0),
        use_shared_map=False,
    )
    q = np.array([1.0, 0, 0, 0], np.float32)

    def make_scan(s):
        """Simulate a forward-looking laser: rays in the body xy-plane
        intersected with the terrain (coarse ray-march)."""
        n_rays = 64
        angles = np.linspace(-np.pi / 2, np.pi / 2, n_rays) + np.pi / 2
        ranges = np.full(n_rays, np.inf, np.float32)
        h0 = 0.3  # scanner height above body origin
        origin = s.position + [0, 0, h0]
        for i, a in enumerate(angles):
            d_world = np.array([np.cos(a + s.yaw), np.sin(a + s.yaw), -0.15])
            d_world /= np.linalg.norm(d_world)
            for t in np.arange(0.3, 4.0, 0.05):
                p = origin + t * d_world
                if p[2] <= terrain(p[0], p[1]):
                    ranges[i] = t
                    break
        return proj.LaserScan(
            ranges=jnp.asarray(ranges),
            start_angle=jnp.asarray(np.pi / 2 - np.pi / 2),
            angular_resolution=jnp.asarray(np.pi / (n_rays - 1)),
        )

    # scanner mounted level, pitched slightly down toward the ground
    pitch = 0.15
    laser_rot = np.array(
        [
            [np.cos(pitch), 0, np.sin(pitch)],
            [0, 1, 0],
            [-np.sin(pitch), 0, np.cos(pitch)],
        ]
    )
    # rotate scanner x to body y (forward)
    swap = np.array([[0.0, -1, 0], [1, 0, 0], [0, 0, 1]])
    laser2body = (swap @ laser_rot, np.array([0.0, 0.1, 0.3]))

    recorder = None
    if args.snapshot_every:
        from slam_eslam_tpu.viz.snapshots import SnapshotRecorder

        recorder = SnapshotRecorder(
            os.path.join(args.out, "frames"), every=args.snapshot_every
        )

    for i in range(args.steps):
        sim.step(
            wheel_delta=0.3,
            on_substep=lambda s: f.update_contact(
                (q, s.position.astype(np.float64)), s.contact_state()
            ),
        )
        mapped = f.update_scan(
            (q, sim.position.astype(np.float64)), make_scan(sim), laser2body
        )
        if recorder is not None:
            recorder.maybe(f, truth=sim.position)
        c_pos, _ = f.get_centroid()
        err = np.linalg.norm(np.asarray(c_pos)[:2] - sim.position[:2])
        print(
            f"step {i:3d}  truth y={sim.position[1]:6.2f}  "
            f"xy_err={err:6.3f}  mapped={'*' if mapped else ' '}  "
            f"map_patches={int(jnp.sum(f.pool.valid))}"
        )

    os.makedirs(args.out, exist_ok=True)
    best = f.get_best_particle_index()
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(14, 7))
    render.draw_particle_map(f.pool, best, ax=axes[0])
    axes[0].set_title(f"best particle ({best}) map")
    render.draw_particles(f.state.particles, ax=axes[1], best_index=best)
    axes[1].set_title("particle cloud")
    out = os.path.join(args.out, "slam_demo.png")
    fig.savefig(out, dpi=110, bbox_inches="tight")
    print(f"saved {out}")


if __name__ == "__main__":
    main()
