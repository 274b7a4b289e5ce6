"""Per-step query-cloud spread over the bench trajectory (tier sizing).

Runs the exact bench.py filter configuration but outputs, per step, the
x/y cell extents of the contact-query cloud (the quantity the auto
lookup's tier/fallback test measures) plus the ESS — the data that
picks ``Config.lookup_tiers``.

Usage: python tools/probe_spread.py [--particles 100000] [--steps 150]
"""

import argparse
import dataclasses
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=100_000)
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--contact-cap", type=int, default=8,
                    dest="contact_cap")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    from slam_eslam_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from slam_eslam_tpu.config import Config, ContactModelConfig
    from slam_eslam_tpu.filter import pose_estimator as pe
    from slam_eslam_tpu.filter.step import cfg_odo
    from slam_eslam_tpu.mapping.lookup import make_lookup
    from slam_eslam_tpu.models import contact_model as cm
    from slam_eslam_tpu.models import odometry as odom
    from slam_eslam_tpu.models import sim as simlib
    from slam_eslam_tpu.utils import geometry

    n = args.particles
    cfg = dataclasses.replace(
        Config(), particle_count=n, min_effective=n // 5,
        contact_model=ContactModelConfig(contact_point_radius=0.0),
    )

    def terrain(x, y):
        return 0.25 * np.sin(1.3 * np.asarray(x)) + 0.2 * np.cos(
            0.9 * np.asarray(y)
        )

    grid = simlib.terrain_grid(
        terrain, nx=400, ny=400, resolution=0.05, origin=(-10.0, -10.0)
    )
    lookup = make_lookup(cfg, grid)
    res = 0.05

    state = pe.PoseEstimatorState.create(cfg, args.contact_cap)
    particles = pe.init_gaussian(
        jax.random.PRNGKey(0), n, (0.0, 0.0), 0.0, (0.3, 0.3), 0.05,
        0.2, 0.3,
    )
    state = dataclasses.replace(state, particles=particles)

    sim = simlib.TrajectorySim(terrain, speed=0.05)
    css, qs = [], []
    for _ in range(args.steps):
        (pos, yaw), _ = sim.step()
        cs = sim.contact_state(noise=0.005).compact(args.contact_cap)
        css.append(cs)
        qs.append(np.asarray(geometry.quat_from_yaw(np.float32(yaw))))
    contact_states = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *css
    )
    orientations = jnp.asarray(np.stack(qs), jnp.float32)

    def one_step(state, inp):
        cs, q = inp
        state = dataclasses.replace(
            state, odometry=odom.update(state.odometry, cs, q,
                                        cfg_odo(cfg)))
        state = pe.project(state, q, cfg)
        # query cloud = rotated contact points at every particle (the
        # same construction as evaluate_pose_batch's fold path)
        cstate = cm.set_contact_points(cs, q)
        p = state.particles
        rot, trans = p.pose_matrix()
        px = cstate.position[:, 0][:, None]
        py = cstate.position[:, 1][:, None]
        pz = cstate.position[:, 2][:, None]
        wx = (rot[:, 0, 0][None] * px + rot[:, 0, 1][None] * py
              + rot[:, 0, 2][None] * pz + trans[:, 0][None])
        wy = (rot[:, 1, 0][None] * px + rot[:, 1, 1][None] * py
              + rot[:, 1, 2][None] * pz + trans[:, 1][None])
        act = (cstate.valid & ~(cstate.contact < cm.CONTACT_THRESHOLD))
        big = 1e9
        wxv = jnp.where(act[:, None], wx, big)
        wyv = jnp.where(act[:, None], wy, big)
        sx = (jnp.max(jnp.where(act[:, None], wx, -big))
              - jnp.min(wxv)) / res
        sy = (jnp.max(jnp.where(act[:, None], wy, -big))
              - jnp.min(wyv)) / res
        state, aux = pe.update(state, cs, q, lookup, cfg)
        return state, (sx, sy, aux["ess"], aux["resampled"])

    @jax.jit
    def run(state, cs, qs):
        return jax.lax.scan(one_step, state, (cs, qs))

    t0 = time.time()
    _, (sx, sy, ess, rs) = run(state, contact_states, orientations)
    jax.block_until_ready(sy)
    print(f"compile+run: {time.time() - t0:.1f}s")
    sx, sy = np.asarray(sx), np.asarray(sy)
    print("step sx_cells sy_cells ess resampled")
    for i in range(args.steps):
        print(f"{i:4d} {sx[i]:8.1f} {sy[i]:8.1f} "
              f"{np.asarray(ess)[i]:10.0f} {int(np.asarray(rs)[i])}")
    for lim in (24, 32, 48, 64, 96):
        frac = float(np.mean((sx < 128) & (sy < lim)))
        print(f"# fits (128, {lim}): {frac * 100:.0f}% of steps")


if __name__ == "__main__":
    main()