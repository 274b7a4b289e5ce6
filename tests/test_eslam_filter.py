"""Orchestrator tests: gating, mapping updates, full SLAM loop."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from slam_eslam_tpu.config import Config, ContactModelConfig, SurfaceHashConfig
from slam_eslam_tpu.filter.eslam_filter import EmbodiedSlamFilter
from slam_eslam_tpu.mapping import projection as proj
from slam_eslam_tpu.models import sim as simlib
from slam_eslam_tpu.utils import geometry


def terrain(x, y):
    return 0.2 * np.sin(np.asarray(x)) + 0.15 * np.cos(0.8 * np.asarray(y))


def small_config(n=32, **kw):
    kw.setdefault("contact_model", ContactModelConfig(contact_point_radius=0.0))
    return dataclasses.replace(
        Config(),
        particle_count=n,
        min_effective=n // 2,
        grid_size=8.0,
        grid_resolution=0.25,
        map_pool_blocks=n + 16,
        map_chain_length=3,
        **kw,
    )


def shared_filter(n=32, **kw):
    f = EmbodiedSlamFilter(config=small_config(n, **kw))
    grid = simlib.terrain_grid(
        terrain, nx=64, ny=64, resolution=0.25, origin=(-8.0, -8.0)
    )
    f.init(pose=(np.array([0.0, 0.0, 0.2]), 0.0), shared_grid=grid,
           use_shared_map=True)
    return f


class TestInit:
    def test_shared_requires_grid(self):
        f = EmbodiedSlamFilter(config=small_config())
        with pytest.raises(ValueError):
            f.init(pose=(np.zeros(3), 0.0), use_shared_map=True)

    def test_per_particle_creates_pool(self):
        f = EmbodiedSlamFilter(config=small_config())
        f.init(pose=(np.zeros(3), 0.0), use_shared_map=False)
        assert f.pool is not None
        assert f.pool.n == 32
        np.testing.assert_array_equal(
            np.asarray(f.state.particles.map_id), np.arange(32)
        )

    def test_initial_spread_follows_config(self):
        f = shared_filter(n=512)
        xy = np.asarray(f.state.particles.xy)
        np.testing.assert_allclose(xy.std(axis=0), [0.1, 0.1], rtol=0.3)


class TestContactUpdateGating:
    def test_first_update_fires_measurement(self):
        f = shared_filter()
        sim = simlib.TrajectorySim(terrain, speed=0.05)
        sim.step()
        cs = sim.contact_state()
        q = np.asarray(geometry.quat_from_yaw(jnp.asarray(sim.yaw)))
        # gate pose initialised 1000 m away -> first call must update
        assert f.update_contact((q, sim.position), cs) is True

    def test_small_motion_gated_off(self):
        f = shared_filter()
        sim = simlib.TrajectorySim(terrain, speed=0.05)
        sim.step()
        cs = sim.contact_state()
        q = np.asarray(geometry.quat_from_yaw(jnp.asarray(sim.yaw)))
        f.update_contact((q, sim.position), cs)
        # 1 mm of motion: below the 0.1 m / 10 deg gate
        pos2 = sim.position + np.array([0.001, 0, 0])
        assert f.update_contact((q, pos2), cs) is False

    def test_terrain_labels_force_update(self):
        f = shared_filter()
        sim = simlib.TrajectorySim(terrain, speed=0.05)
        sim.step()
        cs = sim.contact_state()
        q = np.asarray(geometry.quat_from_yaw(jnp.asarray(sim.yaw)))
        f.update_contact((q, sim.position), cs)
        # empty label set does NOT force the update (ltc.size() > 0,
        # EmbodiedSlamFilter.cpp:360)
        assert f.update_contact(
            (q, sim.position), cs, terrain_classifications=[]
        ) is False
        # a per-wheel classification forces it
        assert f.update_contact(
            (q, sim.position), cs,
            terrain_classifications=[(0, [1.0, 0.0, 0.0])],
        ) is True


class TestSlamLoopShared:
    def test_localizes_over_trajectory(self):
        """Drive the orchestrator with the rolling kinematic sim at
        substep rate (the reference harness updates odometry inside the
        substep loop, ``testMap.cpp:86-97``); the contact odometry then
        observes real foot displacement and the measurement gate fires
        on accumulated motion."""
        from slam_eslam_tpu.models.asguard import AsguardSim

        def gentle(x, y):
            return 0.15 * np.sin(0.7 * np.asarray(x)) + 0.12 * np.cos(
                0.5 * np.asarray(y)
            )

        f = EmbodiedSlamFilter(config=small_config(n=64))
        grid = simlib.terrain_grid(
            gentle, nx=64, ny=64, resolution=0.25, origin=(-8.0, -8.0)
        )
        sim = AsguardSim(terrain=gentle)
        f.init(
            pose=(np.array([0.0, 0.0, sim.position[2]]), 0.0),
            shared_grid=grid, use_shared_map=True,
        )
        q = np.array([1.0, 0, 0, 0], np.float32)
        errs = []

        def frame(s):
            cs = s.contact_state()
            f.update_contact((q, s.position.astype(np.float64)), cs)

        for i in range(30):
            sim.step(wheel_delta=0.3, on_substep=frame)
            c_pos, _ = f.get_centroid()
            errs.append(
                np.linalg.norm(np.asarray(c_pos)[:2] - sim.position[:2])
            )
        # bounded error: the filter must track the traverse (~1.4 m)
        # without diverging from its 0.1 m initial spread
        assert np.mean(errs[-8:]) < 0.3, f"ATE {np.mean(errs[-8:])}"
        # z tracked against the map
        c_pos, _ = f.get_centroid()
        assert abs(float(c_pos[2]) - sim.position[2]) < 0.2

    def test_best_particle_index(self):
        f = shared_filter()
        i = f.get_best_particle_index()
        assert 0 <= i < 32


class TestHashInit:
    def test_global_init_from_hash(self):
        """use_hash: particles sample the whole-map candidate set
        (``EmbodiedSlamFilter.cpp:93-98,110-115``) instead of the
        Gaussian around the start pose."""
        from slam_eslam_tpu.config import SurfaceHashConfig

        def sloped(x, y):
            return 0.25 * np.asarray(x) * 0.5

        f = EmbodiedSlamFilter(config=small_config(n=64))
        grid = simlib.terrain_grid(
            sloped, nx=64, ny=64, resolution=0.25, origin=(-8.0, -8.0)
        )
        f.init(
            pose=(np.zeros(3), 0.0), shared_grid=grid,
            use_shared_map=True,
            hash_config=SurfaceHashConfig(
                use_hash=True, slope_bins=10, angular_steps=4
            ),
        )
        xy = np.asarray(f.state.particles.xy)
        # global spread, not the 0.1 m Gaussian
        assert xy.std(axis=0).max() > 1.0
        assert f.hash is not None
        # reinjection path runs without error on the next update
        sim = simlib.TrajectorySim(sloped, speed=0.06)
        sim.step()
        q = np.asarray(geometry.quat_from_yaw(jnp.asarray(sim.yaw)))
        f.update_contact((q, sim.position), sim.contact_state())


class TestSlipUpdate:
    def test_terrain_match_outweighs_mismatch(self):
        """use_slip_update: joint visual/proprioceptive terrain
        probability multiplies into the weights
        (``ContactModel.cpp:207-208,226-260``)."""
        from slam_eslam_tpu.config import ContactModelConfig as CMC
        from slam_eslam_tpu.models import terrain as terr

        def run(labels):
            cfg = small_config(
                n=16,
                contact_model=CMC(
                    contact_point_radius=0.0, use_slip_update=True,
                    min_contacts=2,
                ),
            )
            f = EmbodiedSlamFilter(config=cfg)
            grid = simlib.terrain_grid(
                terrain, nx=64, ny=64, resolution=0.25, origin=(-8.0, -8.0)
            )
            # paint the whole map as class 0
            grid = dataclasses.replace(
                grid,
                color=jnp.broadcast_to(
                    jnp.array([1.0, 0, 0]), grid.color.shape
                ),
            )
            f.init(pose=(np.array([0.0, 0.0, 0.35]), 0.0),
                   shared_grid=grid, use_shared_map=True)
            sim = simlib.TrajectorySim(terrain, speed=0.05)
            sim.step()
            cs = sim.contact_state()
            q = np.asarray(geometry.quat_from_yaw(jnp.asarray(sim.yaw)))
            f.update_contact((q, sim.position), cs,
                             terrain_classifications=labels)
            return np.asarray(f.state.particles.mprob)

        match = run([(w, [1.0, 0, 0]) for w in range(4)])
        mismatch = run([(w, [0.0, 1.0, 0]) for w in range(4)])
        valid = match > 0
        assert (match[valid] > mismatch[valid]).all()


class TestScanMapping:
    def _scan(self):
        # a flat 180-degree scan at 2 m
        n = 64
        return proj.LaserScan(
            ranges=jnp.full((n,), 2.0),
            start_angle=jnp.asarray(-np.pi / 2),
            angular_resolution=jnp.asarray(np.pi / n),
        )

    def test_scan_gated_and_merged_per_particle(self):
        f = EmbodiedSlamFilter(config=small_config(n=8))
        f.init(pose=(np.zeros(3), 0.0), use_shared_map=False)
        q = np.array([1.0, 0, 0, 0], np.float32)
        lb = (np.eye(3), np.zeros(3))
        assert f.update_scan((q, np.zeros(3)), self._scan(), lb) is True
        # patches landed in every particle's active grid
        assert int(jnp.sum(f.pool.valid)) > 0
        assert f.update_idx == 1
        # second scan immediately after: gated off
        assert f.update_scan((q, np.zeros(3)), self._scan(), lb) is False
        # after moving past the mapping threshold it fires again
        assert f.update_scan(
            (q, np.array([0.05, 0, 0])), self._scan(), lb
        ) is True

    def test_visual_update_weights(self):
        cfg = small_config(n=8, use_visual_update=True)
        f = EmbodiedSlamFilter(config=cfg)
        f.init(pose=(np.zeros(3), 0.0), use_shared_map=False)
        q = np.array([1.0, 0, 0, 0], np.float32)
        lb = (np.eye(3), np.zeros(3))
        f.update_scan((q, np.zeros(3)), self._scan(), lb)
        w0 = np.asarray(f.state.particles.weight).copy()
        # move one particle far off before the next scan: its match
        # score drops, weight discounted relative to the others
        p = f.state.particles
        xy = p.xy.at[0, 1].add(5.0)
        z = p.z.at[0].add(3.0)
        f.state = dataclasses.replace(
            f.state, particles=dataclasses.replace(p.with_xy(xy), z=z)
        )
        f.update_scan((q, np.array([0.06, 0, 0])), self._scan(), lb)
        w1 = np.asarray(f.state.particles.weight)
        assert w1[0] / w0[0] < w1[1] / w0[1]


class TestDistanceImageMapping:
    def test_camera_update_merges(self):
        f = EmbodiedSlamFilter(config=small_config(n=8))
        f.init(pose=(np.zeros(3), 0.0), use_shared_map=False)
        img = proj.DistanceImage(
            data=jnp.full((8, 8), 1.5),
            scale_x=jnp.asarray(0.1), scale_y=jnp.asarray(0.1),
            center_x=jnp.asarray(-0.4), center_y=jnp.asarray(-0.4),
        )
        q = np.array([1.0, 0, 0, 0], np.float32)
        # camera looks forward: camera z -> body x
        r = np.array([[0, 0, 1], [1, 0, 0], [0, 1, 0]], float).T
        assert f.update_distance_image(
            (q, np.zeros(3)), img, (r, np.zeros(3))
        ) is True
        assert int(jnp.sum(f.pool.valid)) > 0

    def test_featurecloud_stub(self):
        f = shared_filter()
        assert f.update_featurecloud(None) is False

    def test_texture_colors_reach_map(self):
        """ImageRGB24 texture path: colours ride the distance-image
        merge into the shared map (EmbodiedSlamFilter.cpp:259-275)."""
        f = shared_filter(n=8)
        img = proj.DistanceImage(
            data=jnp.full((4, 4), 1.0),
            scale_x=jnp.asarray(0.1), scale_y=jnp.asarray(0.1),
            center_x=jnp.asarray(-0.2), center_y=jnp.asarray(-0.2),
        )
        texture = np.tile([0.9, 0.1, 0.0], (4, 4, 1))
        q = np.array([1.0, 0, 0, 0], np.float32)
        r = np.array([[0, 0, 1], [1, 0, 0], [0, 1, 0]], float).T
        assert f.update_distance_image(
            (q, np.zeros(3)), img, (r, np.zeros(3)), texture=texture
        ) is True
        from slam_eslam_tpu.mapping import mls_grid

        # the merged patches carry the texture colour
        colored = np.asarray(f.shared_grid.color)[
            np.asarray(f.shared_grid.valid)
        ]
        touched = colored[(colored**2).sum(-1) > 0]
        assert len(touched) > 0
        np.testing.assert_allclose(touched[0], [0.9, 0.1, 0.0], atol=0.05)

    def test_no_negative_information_on_camera_path(self):
        """The reference enables negative information ONLY on the laser
        MLSProjection (``EmbodiedSlamFilter.cpp:160``); the camera
        ``distMlsOp`` does NOT (``:172-176``) — a phantom patch in the
        camera's free-space corridor must SURVIVE a distance-image
        update even with ``grid_use_negative_information=True``.
        (The laser-path behavior is covered by
        ``test_streaming.TestNegativeInformationE2E``.)"""
        cfg = small_config(n=8, grid_use_negative_information=True)
        f = EmbodiedSlamFilter(config=cfg)
        grid = simlib.terrain_grid(
            terrain, nx=64, ny=64, resolution=0.25, origin=(-8.0, -8.0)
        )
        # plant a phantom patch floating above the terrain ahead of the
        # robot (in the camera's view corridor)
        import jax.numpy as jnpp
        from slam_eslam_tpu.mapping import mls_grid

        phantom_xy = jnpp.array([[0.0, 0.6]])
        grid = mls_grid.merge_points(
            grid, phantom_xy, jnpp.array([0.9]), jnpp.array([0.05]),
            jnpp.array([True]), 0, gap_size=0.3,
        )
        f.init(pose=(np.array([0.0, 0.0, 0.85]), 0.0), shared_grid=grid,
               use_shared_map=True)
        img = proj.DistanceImage(
            data=jnp.full((6, 6), 1.6),
            scale_x=jnp.asarray(0.08), scale_y=jnp.asarray(0.08),
            center_x=jnp.asarray(-0.2), center_y=jnp.asarray(-0.2),
        )
        q = np.array([1.0, 0, 0, 0], np.float32)
        # camera z -> body +y (forward), camera y (down) -> body -z
        cam = np.array([[1.0, 0, 0], [0, 0, 1], [0, -1, 0]])
        f.update_distance_image((q, np.zeros(3)), img, (cam, np.zeros(3)))
        found, _, _, _ = mls_grid.get_patch(
            f.shared_grid,
            jnpp.array([[0.0, 0.6, 0.9]]), 0.1,
        )
        assert bool(found[0]), (
            "camera path must not erase patches (laser-only feature)"
        )
