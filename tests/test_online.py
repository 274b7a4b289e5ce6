"""OnlineSlam wrapper: streaming filter + keyframes + backend in one loop."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from slam_eslam_tpu.config import Config, ContactModelConfig
from slam_eslam_tpu.filter import streaming
from slam_eslam_tpu.models.asguard import AsguardSim
from slam_eslam_tpu.online import OnlineSlam


def terrain(x, y):
    return 0.3 * np.sin(0.9 * np.asarray(x)) + 0.25 * np.cos(
        0.7 * np.asarray(y)
    )


N_RAYS = 48
SCAN_META = (
    jnp.asarray(-np.pi / 2, jnp.float32),
    jnp.asarray(np.pi / N_RAYS, jnp.float32),
)


class TestOnlineSlam:
    def test_end_to_end_chunks(self):
        n = 32
        cfg = dataclasses.replace(
            Config(), particle_count=n, min_effective=n // 2,
            grid_size=10.0, grid_resolution=0.25,
            map_pool_blocks=n + 16, map_chain_length=3,
            # permissive mapping gate so keyframes accumulate quickly
            contact_model=ContactModelConfig(
                contact_point_radius=0.0, min_contacts=2
            ),
        )
        slam = OnlineSlam(
            config=cfg,
            keyframe_kw=dict(keyframe_distance=0.1, closure_radius=0.6,
                             min_separation=3, min_score=0.05),
        )
        sim = AsguardSim(terrain=terrain)
        slam.init(pose=(np.array([0.0, 0.0, sim.position[2]]), 0.0))
        q = np.array([1.0, 0, 0, 0], np.float32)

        frames = []

        def cb(s):
            frames.append((s.contact_state(), jnp.asarray(q),
                           jnp.asarray(s.position, jnp.float32),
                           jnp.full((N_RAYS,), 2.0, jnp.float32),
                           SCAN_META, jnp.asarray(True)))

        total_mapped = 0
        for chunk in range(2):
            frames.clear()
            for _ in range(3):
                sim.step(wheel_delta=0.3, on_substep=cb)
            aux = slam.process_chunk(streaming.stack_frames(frames))
            total_mapped += int(np.asarray(aux["mapped"]).sum())

        assert total_mapped > 0
        assert len(slam.keyframes.keyframes) >= 2

        traj, hist = slam.optimize(iters=5)
        assert traj.shape[1] == 3
        assert np.isfinite(traj[: len(slam.keyframes.keyframes)]).all()
        # second call with nothing new: incremental no-op
        traj2, hist2 = slam.optimize(iters=5)
        assert hist2.shape == (0,)
        np.testing.assert_allclose(traj, traj2)
