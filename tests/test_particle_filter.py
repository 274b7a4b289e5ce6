"""Tests for the generic particle-filter core.

Mirrors the reference test strategy (``/root/reference/test/UnitTest.cpp``):
a synthetic 1-D tracking fixture exercising project/update/resample cycles
with no robot or map dependencies, plus direct statistical checks of the
resampling schemes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slam_eslam_tpu.core import filter as pf


class TestNormalizeWeights:
    def test_basic(self):
        w = jnp.array([1.0, 2.0, 1.0])
        wn, ess = pf.normalize_weights(w)
        np.testing.assert_allclose(np.sum(wn), 1.0, rtol=1e-6)
        np.testing.assert_allclose(wn, [0.25, 0.5, 0.25], rtol=1e-6)
        # ess = 1 / (0.0625 + 0.25 + 0.0625) = 1/0.375
        np.testing.assert_allclose(ess, 1.0 / 0.375, rtol=1e-5)

    def test_degenerate_sum_resets_uniform(self):
        # ParticleFilter.hpp:51-59 — zero/negative total -> uniform reset
        w = jnp.zeros(4)
        wn, ess = pf.normalize_weights(w)
        np.testing.assert_allclose(wn, [0.25] * 4, rtol=1e-6)
        np.testing.assert_allclose(ess, 4.0, rtol=1e-5)

    def test_nan_sum_resets_uniform(self):
        w = jnp.array([jnp.nan, 1.0])
        wn, _ = pf.normalize_weights(w)
        np.testing.assert_allclose(wn, [0.5, 0.5], rtol=1e-6)

    def test_uniform_ess_equals_n(self):
        w = jnp.full(100, 0.3)
        _, ess = pf.normalize_weights(w)
        np.testing.assert_allclose(ess, 100.0, rtol=1e-4)


class TestResampling:
    @pytest.mark.parametrize(
        "scheme", [pf.resample_stratified, pf.resample_systematic,
                   pf.resample_multinomial]
    )
    def test_counts_proportional_to_weights(self, scheme):
        key = jax.random.PRNGKey(0)
        w = jnp.array([0.1, 0.4, 0.2, 0.3])
        counts = np.zeros(4)
        f = jax.jit(lambda k: scheme(k, w, 2000))
        for i in range(50):
            idx = f(jax.random.fold_in(key, i))
            counts += np.bincount(np.asarray(idx), minlength=4)
        frac = counts / counts.sum()
        np.testing.assert_allclose(frac, np.asarray(w), atol=0.01)

    def test_stratified_deterministic_weight(self):
        # a single unit-weight particle must always be selected
        key = jax.random.PRNGKey(1)
        w = jnp.array([0.0, 1.0, 0.0])
        idx = pf.resample_stratified(key, w, 50)
        assert np.all(np.asarray(idx) == 1)

    def test_systematic_low_variance(self):
        # systematic resampling of uniform weights returns a permutation-free
        # near-identity mapping: every particle appears exactly once
        key = jax.random.PRNGKey(2)
        n = 64
        w = jnp.full(n, 1.0 / n)
        idx = np.asarray(pf.resample_systematic(key, w, n))
        assert sorted(idx.tolist()) == list(range(n))

    def test_jit_compatible(self):
        f = jax.jit(lambda k, w: pf.resample_systematic(k, w, 16))
        idx = f(jax.random.PRNGKey(0), jnp.full(16, 1 / 16))
        assert idx.shape == (16,)

    @pytest.mark.parametrize("n,block", [(500, 64), (5000, 128),
                                         (20000, 128), (4096, 256)])
    def test_wide_search_matches_bisection(self, n, block):
        """The two-level wide search (production lowering) must return
        the binary search's indices, up to ±1 where a position collides
        within 1 ulp of a non-monotone dip of the float cumsum (both
        answers are statistically equivalent there; the reference's
        sequential walk is a third)."""
        for seed in range(3):
            kw, kp = jax.random.split(jax.random.PRNGKey(seed))
            logw = 3.0 * jax.random.normal(kw, (n,))
            w = jax.nn.softmax(logw)
            u = jax.random.uniform(kp, (n,))
            positions = (jnp.arange(n, dtype=jnp.float32) + u) / n
            a = np.asarray(pf._resample_from_positions(
                w, positions, method="bisect"))
            b = np.asarray(pf._resample_from_positions(
                w, positions, block=block))
            d = np.abs(a.astype(np.int64) - b)
            assert d.max() <= 1
            assert (d > 0).mean() < 1e-3

    def test_wide_search_degenerate_and_unsorted(self):
        # all mass on one particle; multinomial (unsorted positions)
        n = 3000
        w = jnp.zeros(n).at[1234].set(1.0)
        u = jax.random.uniform(jax.random.PRNGKey(3), (n,))
        idx = np.asarray(pf._resample_from_positions(w, u))
        assert np.all(idx == 1234)
        # unsorted positions through both paths
        w2 = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(4),
                                              (n,)))
        a = np.asarray(pf._resample_from_positions(
            w2, u, method="bisect"))
        b = np.asarray(pf._resample_from_positions(
            w2, u, positions_sorted=False))
        assert np.abs(a.astype(np.int64) - b).max() <= 1

    def test_best_particle_index(self):
        assert int(pf.best_particle_index(jnp.array([0.1, 0.7, 0.2]))) == 1

    def test_take_gathers_pytree(self):
        tree = {"a": jnp.arange(5.0), "b": jnp.arange(10.0).reshape(5, 2)}
        out = pf.take(tree, jnp.array([4, 0]))
        np.testing.assert_allclose(out["a"], [4.0, 0.0])
        np.testing.assert_allclose(out["b"][0], [8.0, 9.0])


class TestSingleValueTracking:
    """1-D tracking fixture, modelled on ``UnitTest.cpp:24-119``.

    A scalar position/velocity state tracks a sinusoid-accelerated point;
    asserts particle-count stability and that the tracked estimate stays
    near ground truth.
    """

    def test_tracking(self):
        key = jax.random.PRNGKey(42)
        n = 100
        key, k1, k2 = jax.random.split(key, 3)
        pos = jax.random.normal(k1, (n,)) * 0.5
        vel = jax.random.normal(k2, (n,)) * 0.1
        weight = jnp.full((n,), 1.0 / n)

        @jax.jit
        def step(carry, t):
            pos, vel, weight, key = carry
            key, kp, km, kr = jax.random.split(key, 4)
            # truth: sinusoid-accelerated point
            true_pos = jnp.sin(t * 0.1) * 2.0
            # project: integrate velocity + process noise
            kp1, kp2 = jax.random.split(kp)
            vel = vel + jax.random.normal(kp1, (n,)) * 0.3
            pos = pos + vel * 0.1 + jax.random.normal(kp2, (n,)) * 0.1
            # update: Gaussian likelihood of noisy measurement
            meas = true_pos + jax.random.normal(km, ()) * 0.1
            lik = jnp.exp(-((pos - meas) ** 2) / (2 * 0.2**2))
            weight = weight * lik
            weight, ess = pf.normalize_weights(weight)
            # resample when ESS drops below half
            idx = pf.resample_systematic(kr, weight, n)
            do = ess < n / 2
            pos = jnp.where(do, pos[idx], pos)
            vel = jnp.where(do, vel[idx], vel)
            weight = jnp.where(do, jnp.full((n,), 1.0 / n), weight)
            est = jnp.sum(pos * weight)
            return (pos, vel, weight, key), (est, true_pos)

        carry = (pos, vel, weight, key)
        carry, (est, truth) = jax.lax.scan(step, carry, jnp.arange(200.0))
        pos, vel, weight, _ = carry
        assert pos.shape == (n,)  # particle count stable (UnitTest.cpp:117)
        err = np.abs(np.asarray(est[50:]) - np.asarray(truth[50:]))
        assert err.mean() < 0.3, f"tracking error too large: {err.mean()}"
