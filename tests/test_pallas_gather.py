"""Pallas windowed-gather kernel tests (interpreter mode on CPU).

The kernel must agree exactly with the reference jnp gather path for
in-window queries, and report misses outside the window.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slam_eslam_tpu.mapping import mls_grid
from slam_eslam_tpu.models import sim as simlib
from slam_eslam_tpu.ops import pallas_gather as pg


def terrain(x, y):
    return 0.3 * np.sin(np.asarray(x)) + 0.2 * np.cos(0.7 * np.asarray(y))


@pytest.fixture(scope="module")
def packed():
    grid = simlib.terrain_grid(
        terrain, nx=128, ny=128, resolution=0.1, origin=(-6.4, -6.4)
    )
    return mls_grid.PackedLookup.from_grid(grid)


class TestWindowGather:
    def test_matches_direct_indexing(self):
        key = jax.random.PRNGKey(0)
        w, c = 16, 8
        table = jax.random.normal(key, (w, w, c))
        lx = jax.random.randint(jax.random.PRNGKey(1), (100,), 0, w)
        ly = jax.random.randint(jax.random.PRNGKey(2), (100,), 0, w)
        out = pg.window_gather(table, lx, ly, tile=64, interpret=True,
                               mxu_dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(table[lx, ly]), rtol=1e-6
        )

    def test_bf16_within_rounding(self):
        # default bf16 MXU path: exact selection, values rounded to bf16
        key = jax.random.PRNGKey(0)
        w, c = 16, 8
        table = jax.random.normal(key, (w, w, c))
        lx = jax.random.randint(jax.random.PRNGKey(1), (64,), 0, w)
        ly = jax.random.randint(jax.random.PRNGKey(2), (64,), 0, w)
        out = pg.window_gather(table, lx, ly, tile=64, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(table[lx, ly]),
            rtol=1e-2, atol=1e-2,
        )

    def test_padding_handled(self):
        # Q not a multiple of the tile
        table = jnp.arange(4 * 4 * 8, dtype=jnp.float32).reshape(4, 4, 8)
        lx = jnp.array([0, 3, 2], jnp.int32)
        ly = jnp.array([1, 0, 2], jnp.int32)
        out = pg.window_gather(table, lx, ly, tile=256, interpret=True)
        np.testing.assert_allclose(out, np.asarray(table[lx, ly]))


class TestFusedSelect:
    """The fused z-select kernel must reproduce the packed-lookup
    semantics (slot selection included) for every stage variant."""

    @pytest.mark.parametrize("stage1", ["onehot", "dg"])
    @pytest.mark.parametrize("stage2", ["matmul", "fold", "dg"])
    def test_matches_packed_lookup(self, packed, stage1, stage2):
        key = jax.random.PRNGKey(3)
        pts = jnp.concatenate(
            [
                jax.random.uniform(key, (300, 2), minval=-1.5, maxval=1.5),
                jax.random.uniform(
                    jax.random.PRNGKey(4), (300, 1), minval=-0.6,
                    maxval=0.6,
                ),
            ],
            axis=1,
        )
        ref = mls_grid.get_patch_packed(packed, pts, 3.0)
        out = pg.windowed_get_patch_fused(
            packed, pts, 3.0, window=64, interpret=True,
            mxu_dtype=jnp.float32, stage1=stage1, stage2=stage2,
        )
        f = np.asarray(ref[0])
        np.testing.assert_array_equal(np.asarray(out[0]), f)
        np.testing.assert_allclose(
            np.asarray(out[1])[f], np.asarray(ref[1])[f], rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(out[2])[f], np.asarray(ref[2])[f], rtol=1e-6
        )

    @pytest.mark.parametrize("window", [(128, 32), (128, 64), (32, 128)])
    def test_rectangular_windows(self, packed, window):
        """Rectangular windows (cheaper at equal area: the one-hot K dim
        pads to 128 regardless) must match the packed lookup for
        queries inside the window."""
        key = jax.random.PRNGKey(7)
        pts = jnp.concatenate(
            [
                jax.random.uniform(key, (300, 2), minval=-0.7,
                                   maxval=0.7),
                jax.random.uniform(
                    jax.random.PRNGKey(8), (300, 1), minval=-0.6,
                    maxval=0.6,
                ),
            ],
            axis=1,
        )
        ref = mls_grid.get_patch_packed(packed, pts, 3.0)
        out = pg.windowed_get_patch_fused(
            packed, pts, 3.0, window=window, interpret=True,
            mxu_dtype=jnp.float32,
        )
        f = np.asarray(ref[0])
        np.testing.assert_array_equal(np.asarray(out[0]), f)
        np.testing.assert_allclose(
            np.asarray(out[1])[f], np.asarray(ref[1])[f], rtol=1e-6
        )

    @pytest.mark.parametrize("window,layout", [
        (64, "q_lanes"), ((128, 64), "q_lanes"),
        (64, "q_flat"), ((128, 64), "q_flat"),
    ])
    def test_q_lanes_layout(self, packed, window, layout):
        """The transposed (queries-on-lanes) kernels — per-block
        (q_lanes) and full-tile-row (q_flat) — must match the
        sublane-layout kernel exactly."""
        pts = jnp.concatenate(
            [
                jax.random.uniform(jax.random.PRNGKey(11), (777, 2),
                                   minval=-0.7, maxval=0.7),
                jax.random.uniform(jax.random.PRNGKey(12), (777, 1),
                                   minval=-0.6, maxval=0.6),
            ],
            axis=1,
        )
        a = pg.windowed_get_patch_fused(
            packed, pts, 3.0, window=window, interpret=True,
            mxu_dtype=jnp.float32,
        )
        b = pg.windowed_get_patch_fused(
            packed, pts, 3.0, window=window, interpret=True,
            mxu_dtype=jnp.float32, layout=layout,
        )
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]))
        np.testing.assert_allclose(np.asarray(a[2]), np.asarray(b[2]))

    def test_q_lanes_bf16_rows_identical(self, packed):
        """rows_f32=False keeps stage-1 rows in mxu_dtype — exact, since
        rows are one-hot copies of the already-rounded table: outputs
        must be bit-identical to the f32-rows kernel."""
        pts = jnp.concatenate(
            [
                jax.random.uniform(jax.random.PRNGKey(21), (513, 2),
                                   minval=-0.7, maxval=0.7),
                jax.random.uniform(jax.random.PRNGKey(22), (513, 1),
                                   minval=-0.6, maxval=0.6),
            ],
            axis=1,
        )
        for dt in (jnp.float32, jnp.bfloat16):
            a = pg.windowed_get_patch_fused(
                packed, pts, 3.0, window=64, interpret=True,
                mxu_dtype=dt, layout="q_lanes", rows_f32=True,
            )
            b = pg.windowed_get_patch_fused(
                packed, pts, 3.0, window=64, interpret=True,
                mxu_dtype=dt, layout="q_lanes", rows_f32=False,
            )
            np.testing.assert_array_equal(np.asarray(a[0]),
                                          np.asarray(b[0]))
            np.testing.assert_array_equal(np.asarray(a[1]),
                                          np.asarray(b[1]))
            np.testing.assert_array_equal(np.asarray(a[2]),
                                          np.asarray(b[2]))

    def test_center_subsample(self, packed):
        """Subsampled window centring must not change results for a
        compact cloud (the centring error is << window half-size)."""
        pts = jnp.concatenate(
            [
                jax.random.uniform(jax.random.PRNGKey(9), (500, 2),
                                   minval=-0.5, maxval=0.5),
                jnp.zeros((500, 1)),
            ],
            axis=1,
        )
        a = pg.windowed_get_patch_fused(
            packed, pts, 3.0, window=64, interpret=True,
            mxu_dtype=jnp.float32,
        )
        b = pg.windowed_get_patch_fused(
            packed, pts, 3.0, window=64, interpret=True,
            mxu_dtype=jnp.float32, center_subsample=31,
        )
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]))

    def test_multi_slot_z_window_selection(self):
        """Cells with several patches must resolve to the |mean-z|-argmin
        slot within the z-window, like get_patch/get_patch_packed."""
        k = 4
        data = jnp.full((16, 16, 2 * k), -1.0)
        # cell (3, 5): slots at z = 0.0, 1.5, 4.0 (stdevs 0.1, 0.2, 0.3)
        data = data.at[3, 5, :3].set(jnp.array([0.0, 1.5, 4.0]))
        data = data.at[3, 5, k:k + 3].set(jnp.array([0.1, 0.2, 0.3]))
        packed = mls_grid.PackedLookup(
            data=data, origin=jnp.zeros(2), resolution=1.0
        )
        pts = jnp.array([
            [3.5, 5.5, 0.2],   # nearest slot 0
            [3.5, 5.5, 1.2],   # nearest slot 1
            [3.5, 5.5, 3.4],   # nearest slot 2
            [3.5, 5.5, 9.0],   # all beyond z_window=3 -> miss
            [8.5, 8.5, 0.0],   # empty cell -> miss
        ])
        found, mean, stdev, _ = pg.windowed_get_patch_fused(
            packed, pts, 3.0, window=16, interpret=True,
            mxu_dtype=jnp.float32,
        )
        np.testing.assert_array_equal(
            np.asarray(found), [True, True, True, False, False]
        )
        np.testing.assert_allclose(np.asarray(mean)[:3], [0.0, 1.5, 4.0])
        np.testing.assert_allclose(np.asarray(stdev)[:3], [0.1, 0.2, 0.3])

    def test_lookup_factory_fused_default(self, packed):
        lookup = pg.windowed_grid_lookup(packed, interpret=True)
        pts = jnp.zeros((4, 5, 3))
        found, mean, stdev, color = lookup(None, pts)
        assert found.shape == (4, 5)
        assert color.shape == (4, 5, 3)


class TestWindowedGetPatch:
    def test_matches_packed_lookup_in_window(self, packed):
        key = jax.random.PRNGKey(3)
        # compact cloud near the origin (tracking regime)
        pts = jnp.concatenate(
            [
                jax.random.uniform(key, (500, 2), minval=-1.5, maxval=1.5),
                jax.random.uniform(
                    jax.random.PRNGKey(4), (500, 1), minval=-0.6,
                    maxval=0.6,
                ),
            ],
            axis=1,
        )
        ref = mls_grid.get_patch_packed(packed, pts, 3.0)
        out = pg.windowed_get_patch(
            packed, pts, 3.0, window=64, interpret=True,
            mxu_dtype=jnp.float32,
        )
        np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(ref[0]))
        f = np.asarray(ref[0])
        np.testing.assert_allclose(
            np.asarray(out[1])[f], np.asarray(ref[1])[f], rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(out[2])[f], np.asarray(ref[2])[f], rtol=1e-6
        )
        # default bf16 path: selection identical, values within rounding
        out16 = pg.windowed_get_patch(
            packed, pts, 3.0, window=64, interpret=True
        )
        np.testing.assert_array_equal(
            np.asarray(out16[0]), np.asarray(ref[0])
        )
        np.testing.assert_allclose(
            np.asarray(out16[1])[f], np.asarray(ref[1])[f],
            rtol=1e-2, atol=5e-3,
        )

    def test_out_of_window_misses(self, packed):
        # a compact cloud at the origin plus one far outlier: the window
        # centres on the cloud (mean cell), so the outlier must miss
        # (documented window semantics) while cloud points hit
        near = jnp.tile(jnp.array([[0.1, 0.1, 0.2]]), (20, 1))
        far = jnp.array([[6.0, 6.0, 0.0]])
        pts = jnp.concatenate([near, far])
        # 16 cells @ 0.1 m = 1.6 m window
        out = pg.windowed_get_patch(
            packed, pts, 3.0, window=16, interpret=True
        )
        found = np.asarray(out[0])
        assert found[:20].all()
        assert not found[20]

    def test_batched_shape(self, packed):
        pts = jnp.zeros((7, 5, 3))
        out = pg.windowed_get_patch(packed, pts, 3.0, window=16,
                                    interpret=True)
        assert out[0].shape == (7, 5)
        assert out[3].shape == (7, 5, 3)

    def test_lookup_factory_in_update(self, packed):
        """End-to-end: the windowed lookup drives update_weights."""
        import dataclasses

        from slam_eslam_tpu.config import Config, ContactModelConfig
        from slam_eslam_tpu.filter import pose_estimator as pe
        from slam_eslam_tpu.utils import geometry

        cfg = dataclasses.replace(
            Config(), particle_count=16, min_effective=8,
            contact_model=ContactModelConfig(contact_point_radius=0.0),
        )
        lookup = pg.windowed_grid_lookup(packed, interpret=True)
        state = pe.PoseEstimatorState.create(cfg, 20)
        particles = pe.init_gaussian(
            jax.random.PRNGKey(5), 16, (0.0, 0.0), 0.0, (0.2, 0.2),
            0.05, terrain(0, 0) + 0.2, 0.3,
        )
        state = dataclasses.replace(state, particles=particles)
        sim = simlib.TrajectorySim(terrain, speed=0.05)
        sim.step()
        cs = sim.contact_state()
        q = geometry.quat_identity()
        new_state, res = pe.update_weights(state, cs, q, lookup, cfg)
        assert bool(res.measurement_valid.any())


class TestDirectSelectVariant:
    def test_flat_direct_matches_flat(self):
        """The direct-select flat kernel (no stage-2 matmul) must match
        the selector-matmul flat kernel bit for bit in interpret mode."""
        import numpy as np

        from slam_eslam_tpu.ops import pallas_gather as pg

        rng = np.random.default_rng(3)
        wx = wy = 16
        k = 4
        c = 2 * k
        table = rng.normal(size=(wx, wy, c)).astype(np.float32)
        # stdev channels: some negative = invalid slots
        table[..., k:] = rng.uniform(-0.2, 0.4, size=(wx, wy, k))
        q = 96
        lx = jnp.asarray(rng.integers(0, wx, q), jnp.int32)
        ly = jnp.asarray(rng.integers(0, wy, q), jnp.int32)
        z = jnp.asarray(rng.normal(size=q).astype(np.float32))
        base = pg.window_select_flat(
            jnp.asarray(table), lx, ly, z, z_window=1.0, tile=1024,
            interpret=True, mxu_dtype=jnp.float32,
        )
        direct = pg.window_select_flat(
            jnp.asarray(table), lx, ly, z, z_window=1.0, tile=1024,
            interpret=True, mxu_dtype=jnp.float32, direct_select=True,
        )
        f = np.asarray(base[0])
        assert f.sum() > 0
        np.testing.assert_array_equal(f, np.asarray(direct[0]))
        np.testing.assert_allclose(
            np.asarray(base[1])[f], np.asarray(direct[1])[f], rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(base[2])[f], np.asarray(direct[2])[f], rtol=1e-6
        )
