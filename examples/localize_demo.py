"""End-to-end localisation demo through the public API.

Builds a synthetic terrain MLS map, drives a ground-truth trajectory,
and runs the particle filter (project -> contact-likelihood update ->
resample) against it, reporting per-step pose error.

Run:  python examples/localize_demo.py [--steps 40] [--particles 96]
"""

import argparse
import dataclasses
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--particles", type=int, default=96)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()

    if args.cpu:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    import jax.numpy as jnp

    from slam_eslam_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from slam_eslam_tpu import Config, ContactModelConfig
    from slam_eslam_tpu.filter import pose_estimator as pe
    from slam_eslam_tpu.mapping.lookup import shared_grid_lookup
    from slam_eslam_tpu.models import sim as simlib
    from slam_eslam_tpu.utils import geometry

    def terrain(x, y):
        return 0.25 * np.sin(1.3 * np.asarray(x)) + 0.2 * np.cos(
            0.9 * np.asarray(y)
        )

    print(f"devices: {jax.devices()}")
    cfg = dataclasses.replace(
        Config(),
        particle_count=args.particles,
        min_effective=args.particles // 2,
        contact_model=ContactModelConfig(contact_point_radius=0.0),
    )

    grid = simlib.terrain_grid(
        terrain, nx=160, ny=160, resolution=0.1, origin=(-8.0, -8.0)
    )
    lookup = shared_grid_lookup(grid)
    sim = simlib.TrajectorySim(terrain, speed=0.06)

    state = pe.PoseEstimatorState.create(cfg, 20)
    particles = pe.init_gaussian(
        jax.random.PRNGKey(7), cfg.particle_count,
        sim.position[:2], 0.0, (0.4, 0.4), 0.05, sim.position[2], 0.3,
    )
    state = dataclasses.replace(state, particles=particles)

    @jax.jit
    def step_fn(state, cs, q, delta_xy, dyaw, dz):
        o = dataclasses.replace(
            state.odometry,
            delta_xy=delta_xy, delta_yaw=dyaw, delta_z=dz,
            sigma_xy=jnp.array([0.01, 0.02]),
            sigma_yaw=jnp.asarray(0.01),
            sigma_z=jnp.asarray(0.01),
            initialized=jnp.ones((), bool),
        )
        state = dataclasses.replace(state, odometry=o)
        state = pe.project(state, q, cfg)
        state, aux = pe.update(state, cs, q, lookup, cfg)
        pos, quat = pe.centroid(state.particles, q)
        return state, pos, aux["ess"], aux["resampled"]

    print(f"{'step':>4} {'xy_err':>8} {'z_err':>8} {'ess':>7} rs")
    errs = []
    t0 = time.time()
    for i in range(args.steps):
        (pos, yaw), (d_body, dyaw, dz) = sim.step()
        cs = sim.contact_state(noise=0.005)
        q = geometry.quat_from_yaw(jnp.asarray(yaw, jnp.float32))
        state, c_pos, ess, rs = step_fn(
            state, cs, q,
            jnp.asarray(d_body, jnp.float32),
            jnp.asarray(dyaw, jnp.float32),
            jnp.asarray(dz, jnp.float32),
        )
        xy_err = float(np.linalg.norm(np.asarray(c_pos)[:2] - pos[:2]))
        z_err = abs(float(c_pos[2]) - pos[2])
        errs.append((xy_err, z_err))
        if i % 5 == 0 or i == args.steps - 1:
            print(f"{i:>4} {xy_err:8.3f} {z_err:8.3f} {float(ess):7.1f} "
                  f"{'*' if bool(rs) else ' '}")
    errs = np.array(errs)
    dt = time.time() - t0
    print(f"\nfinal-10 mean xy ATE: {errs[-10:, 0].mean():.3f} m "
          f"(initial spread 0.40 m)")
    print(f"final-10 mean z  ATE: {errs[-10:, 1].mean():.3f} m")
    print(f"{args.steps} steps in {dt:.1f}s "
          f"({args.steps * cfg.particle_count / dt:.0f} particle-updates/s, "
          f"includes host-side sim + compile)")


if __name__ == "__main__":
    main()
