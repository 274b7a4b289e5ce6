"""Log-record-and-replay demo: native IO runtime + filter.

Phase 1 records a simulated traverse (contact states, orientations,
ground-truth poses) into the binary log via the C++ writer; phase 2
replays it through the EmbodiedSlamFilter using the asynchronous
prefetching feeder — the deployment-shaped pipeline: disk -> C++
prefetch thread -> host decode -> device filter.

Run:  python examples/replay_demo.py [--steps 15] [--cpu]
"""

import argparse
import dataclasses
import os
import tempfile
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=15)
    ap.add_argument("--particles", type=int, default=48)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    from slam_eslam_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from slam_eslam_tpu.config import Config, ContactModelConfig
    from slam_eslam_tpu.filter.eslam_filter import EmbodiedSlamFilter
    from slam_eslam_tpu.io import logio
    from slam_eslam_tpu.models import sim as simlib
    from slam_eslam_tpu.models.asguard import AsguardSim
    from slam_eslam_tpu.utils import geometry

    def terrain(x, y):
        return 0.15 * np.sin(0.7 * np.asarray(x)) + 0.12 * np.cos(
            0.5 * np.asarray(y)
        )

    path = os.path.join(tempfile.mkdtemp(), "traverse.eslg")

    # ---- phase 1: record -------------------------------------------------
    sim = AsguardSim(terrain=terrain)
    t0 = time.time()
    with logio.LogWriter(path) as w:

        def record(s):
            ts = int((time.time() - t0) * 1e9)
            w.write_contact_state(s.contact_state(), ts)
            w.write_orientation([1.0, 0, 0, 0], ts)
            w.write_pose(s.position, [1.0, 0, 0, 0], ts)

        record(sim)
        for _ in range(args.steps):
            sim.step(wheel_delta=0.3, on_substep=record)
    n_rec = args.steps * 10 + 1
    print(f"recorded {n_rec} frames -> {path} "
          f"({os.path.getsize(path) / 1024:.0f} KiB)")

    # ---- phase 2: replay through the filter ------------------------------
    cfg = dataclasses.replace(
        Config(),
        particle_count=args.particles,
        min_effective=args.particles // 2,
        contact_model=ContactModelConfig(
            contact_point_radius=0.0, min_contacts=2
        ),
    )
    grid = simlib.terrain_grid(
        terrain, nx=64, ny=64, resolution=0.25, origin=(-8.0, -8.0)
    )
    f = EmbodiedSlamFilter(config=cfg)

    errs = []
    with logio.LogReader(path) as reader:
        with logio.AsyncFeeder(reader, slots=8) as feeder:
            cs = q = truth = None
            initialized = False
            for rec_type, ts, payload in feeder:
                if rec_type == logio.CONTACT_STATE:
                    cs = logio.decode_contact_state(payload)
                elif rec_type == logio.ORIENTATION:
                    q = logio.decode_orientation(payload)
                elif rec_type == logio.POSE:
                    truth, _ = logio.decode_pose(payload)
                    if not initialized:
                        f.init(pose=(truth.astype(np.float64), 0.0),
                               shared_grid=grid, use_shared_map=True)
                        initialized = True
                        continue
                    f.update_contact((q, truth.astype(np.float64)), cs)
                    c_pos, _ = f.get_centroid()
                    errs.append(
                        np.linalg.norm(np.asarray(c_pos)[:2] - truth[:2])
                    )
    errs = np.asarray(errs)
    print(f"replayed {len(errs)} frames; "
          f"final-20 mean xy err {errs[-20:].mean():.3f} m")


if __name__ == "__main__":
    main()
