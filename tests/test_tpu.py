"""TPU-backend parity tests for the compiled Mosaic kernels.

The regular suite runs the Pallas kernels in INTERPRET mode on CPU
(`tests/conftest.py` forces the CPU backend); the compiled TPU path —
the production default for per-particle SLAM — needs hardware.  Run on
a TPU host with::

    SLAM_TPU_TESTS=1 python -m pytest tests/test_tpu.py -q

(one TPU process at a time; first run compiles via the remote helper,
repeats hit the persistent cache).  These tests cover the
``make_chain_lookup`` / ``merge_cloud_all`` kernel='pallas' paths the
streaming SLAM loop uses by default on TPU (``Config.chain_kernel`` /
``Config.merge_kernel`` = 'auto').
"""

import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    not os.environ.get("SLAM_TPU_TESTS")
    or jax.default_backend() not in ("tpu", "axon"),
    reason="TPU-backend kernel tests: SLAM_TPU_TESTS=1 on a TPU host",
)


@pytest.fixture(scope="module", autouse=True)
def _cache():
    from slam_eslam_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()


def _pool(n=256, b=None, nx=40, ny=40, k=4, chain_len=3, seed=0):
    from slam_eslam_tpu.mapping import map_pool as mp

    b = b or n + 16
    rng = np.random.default_rng(seed)
    shape = (b, nx, ny * k)
    return mp.MapPool(
        mean=jnp.asarray(rng.normal(size=shape).astype(np.float32)),
        stdev=jnp.asarray(
            (0.01 + 0.2 * rng.random(shape)).astype(np.float32)
        ),
        height=jnp.zeros(shape, jnp.float32),
        meta=jnp.asarray(
            ((rng.random(shape) < 0.5).astype(np.int32)) | 2
        ),
        color=None,
        origin=jnp.asarray((rng.normal(size=(b, 2)) * 2).astype(np.float32)),
        allocated=jnp.ones((b,), bool),
        chain=jnp.asarray(
            np.where(
                rng.random((n, chain_len)) < 0.8,
                rng.integers(0, b, size=(n, chain_len)),
                -1,
            ).astype(np.int32)
        ),
        resolution=0.25,
        nx=nx, ny=ny, k=k,
    )


class TestCompiledChainLookup:
    def test_matches_xla_gather(self):
        """Compiled Mosaic chain lookup == the XLA gather, at a
        production-like shape (the default per-particle measurement
        path, ``PoseEstimator.hpp:97-105`` equivalent)."""
        from slam_eslam_tpu.mapping import map_pool as mp

        pool = _pool()
        rng = np.random.default_rng(1)
        pts = jnp.asarray(
            rng.normal(size=(pool.n, 8, 3)).astype(np.float32) * 3.0
        )

        @jax.jit
        def kern(pool, pts):
            lk = mp.make_chain_lookup(pool, kernel="pallas")
            return lk(jnp.arange(pool.n), pts)[:3]

        @jax.jit
        def ref(pool, pts):
            lk = mp.chain_lookup(pool)
            f, m, s, _ = jax.vmap(lk)(jnp.arange(pool.n), pts)
            return f, m, s

        kf, km, ks = jax.block_until_ready(kern(pool, pts))
        rf, rm, rs = jax.block_until_ready(ref(pool, pts))
        f = np.asarray(rf)
        assert f.sum() > 0, "fixture produced no hits"
        np.testing.assert_array_equal(f, np.asarray(kf))
        np.testing.assert_allclose(
            np.asarray(km)[f], np.asarray(rm)[f], rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(ks)[f], np.asarray(rs)[f], rtol=1e-6
        )


class TestCompiledMerge:
    def _run_both(self, pool, cloud):
        from slam_eslam_tpu.mapping import map_pool as mp

        xy = jnp.zeros((pool.n, 2))
        yaw = jnp.zeros(pool.n)
        zo = jnp.zeros(pool.n)
        zs = jnp.full((pool.n,), 0.01)
        pool = dataclasses.replace(
            pool,
            chain=pool.chain.at[:, 0].set(
                jnp.arange(pool.n, dtype=jnp.int32)
            ),
        )
        outs = {}
        for kernel in ("pallas", "xla"):
            out = jax.jit(
                lambda pl_, kernel=kernel: mp.merge_cloud_all(
                    pl_, xy, yaw, zo, zs, cloud, 7, kernel=kernel
                )
            )(pool)
            outs[kernel] = jax.block_until_ready(out)
        return outs

    def test_single_point_cells_exact(self):
        """One point per cell: no accumulation-order freedom — the
        compiled Mosaic merge must agree with the XLA dedup+scatter
        bitwise on flags and to f32 round-off on values."""
        from slam_eslam_tpu.mapping.mls_grid import PatchCloud

        pool = _pool(n=64)
        rng = np.random.default_rng(2)
        p = 64
        # snap points to DISTINCT cell centres
        cells = rng.choice(40 * 40, size=p, replace=False)
        cx, cy = cells // 40, cells % 40
        # distinct cells in particle 0's block; other blocks' origins
        # shift all points uniformly, which preserves distinctness
        xy = np.stack([(cx + 0.5) * 0.25, (cy + 0.5) * 0.25], 1)
        xy += np.asarray(pool.origin[0])
        cloud = PatchCloud.create(
            xy=jnp.asarray(xy.astype(np.float32)),
            z=jnp.asarray(rng.normal(size=(p,)).astype(np.float32)),
            stdev=jnp.full((p,), 0.05),
            valid=jnp.ones((p,), bool),
        )
        outs = self._run_both(pool, cloud)
        np.testing.assert_array_equal(
            np.asarray(outs["pallas"].meta), np.asarray(outs["xla"].meta)
        )
        v = np.asarray(outs["xla"].valid) != 0
        for fld in ("mean", "stdev", "height"):
            np.testing.assert_allclose(
                np.asarray(getattr(outs["pallas"], fld))[v],
                np.asarray(getattr(outs["xla"], fld))[v],
                rtol=1e-6, atol=1e-7, err_msg=fld,
            )

    def test_multi_point_cells_statistical(self):
        """Random multi-point clouds: the kernel accumulates per-cell
        sums in MXU order, the XLA path in segment-sum order — f32
        associativity allows ~1-ulp value drift, which can flip a
        fuse/gap/insert branch when a distance sits exactly on the
        threshold.  Require: >= 99.9% of slots bitwise-identical flags,
        matching slots value-close, and identical patch counts +- 0.1%."""
        from slam_eslam_tpu.mapping.mls_grid import PatchCloud

        pool = _pool(n=64)
        rng = np.random.default_rng(3)
        p = 256
        cloud = PatchCloud.create(
            xy=jnp.asarray(rng.normal(size=(p, 2)).astype(np.float32) * 3),
            z=jnp.asarray(rng.normal(size=(p,)).astype(np.float32)),
            stdev=jnp.full((p,), 0.05),
            valid=jnp.ones((p,), bool),
        )
        outs = self._run_both(pool, cloud)
        ma = np.asarray(outs["pallas"].meta)
        mb = np.asarray(outs["xla"].meta)
        agree = (ma == mb).mean()
        assert agree >= 0.999, f"meta agreement {agree:.6f} < 99.9%"
        both = ((ma & 1) != 0) & ((mb & 1) != 0) & (ma == mb)
        for fld in ("mean", "stdev"):
            a = np.asarray(getattr(outs["pallas"], fld))[both]
            b = np.asarray(getattr(outs["xla"], fld))[both]
            close = np.isclose(a, b, rtol=1e-4, atol=1e-5).mean()
            assert close >= 0.999, f"{fld}: only {close:.6f} close"
        na, nb = int((ma & 1).sum()), int((mb & 1).sum())
        assert abs(na - nb) <= max(1, int(0.001 * nb)), (na, nb)


class TestCompiledContactFold:
    def test_fold_matches_unfolded_on_tpu(self):
        """Compiled-Mosaic parity for the contact-fold kernel
        (ops.pallas_gather._fused_select_contact_kernel): the folded
        per-particle weighting stats must match the unfolded XLA path
        to bf16-table accuracy (both use the same bf16 window gather;
        the fold adds only the ~5e-5-rel Mills approximation)."""
        import dataclasses as dc

        from slam_eslam_tpu.config import Config, ContactModelConfig
        from slam_eslam_tpu.core.state import BodyContactState
        from slam_eslam_tpu.filter import pose_estimator as pe
        from slam_eslam_tpu.mapping.lookup import make_lookup
        from slam_eslam_tpu.models import contact_model as cm
        from slam_eslam_tpu.models import sim as simlib

        def terrain(x, y):
            return 0.3 * np.sin(np.asarray(x)) + 0.2 * np.cos(
                0.7 * np.asarray(y))

        grid = simlib.terrain_grid(
            terrain, nx=128, ny=128, resolution=0.1, origin=(-6.4, -6.4))
        n = 512
        cs = BodyContactState.create(
            np.array([[0.2, 0.1, -0.1], [-0.2, 0.1, -0.12],
                      [0.2, -0.1, -0.09], [-0.2, -0.1, -0.11],
                      [0.0, 0.2, -0.1], [0.0, -0.2, -0.1],
                      [0.1, 0.0, -0.1], [-0.1, 0.0, -0.1]], np.float32),
            group_id=np.array([0, 0, 1, 1, 2, 2, 3, 3], np.int32),
        )
        key = jax.random.PRNGKey(3)
        xy = jax.random.uniform(key, (n, 2), minval=-1.5, maxval=1.5)
        z = jnp.asarray(terrain(np.asarray(xy[:, 0]),
                                np.asarray(xy[:, 1])), jnp.float32)
        rot = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (n, 3, 3))
        trans = jnp.concatenate([xy, (z + 0.1)[:, None]], axis=-1)
        meas_var = jnp.full((n,), 0.09, jnp.float32)

        out = {}
        for fold in (True, False):
            cmc = ContactModelConfig(
                contact_point_radius=0.0, min_contacts=2,
                fold_lookup=fold)
            cfg = Config(lookup_mode="auto", lookup_window=32,
                         contact_model=cmc)
            lookup = make_lookup(cfg, grid, tile=1024)
            bound = pe.bind_lookup(lookup, None)
            out[fold] = jax.jit(
                lambda r, t, m, b=bound, c=cmc: cm.evaluate_pose_batch(
                    cs, r, t, m, b, c))(rot, trans, meas_var)
        a, b = out[True], out[False]
        np.testing.assert_array_equal(
            np.asarray(a.measurement_valid),
            np.asarray(b.measurement_valid))
        np.testing.assert_array_equal(
            np.asarray(a.n_contacts), np.asarray(b.n_contacts))
        # bf16 window gather dominates the tolerance budget on TPU
        np.testing.assert_allclose(
            np.asarray(a.weight), np.asarray(b.weight), rtol=2e-2,
            atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(a.z_delta), np.asarray(b.z_delta), rtol=2e-2,
            atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(a.pose_var), np.asarray(b.pose_var), rtol=2e-2,
            atol=1e-4)
