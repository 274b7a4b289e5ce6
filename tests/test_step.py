"""Tests for the fused filter-step builders (gating, scan runner)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as g
from slam_eslam_tpu.filter import step as steplib


class TestFilterStepGate:
    def test_gate_skips_measurement(self):
        cfg, lookup, state, cs, q = g._build(32, nx=32, ny=32)
        fn = steplib.make_filter_step(cfg, lookup)
        below = (np.float32(0.0), np.float32(0.0))
        above = (np.float32(1.0), np.float32(0.0))
        s_skip, aux_skip = fn(state, cs, q, below)
        s_do, aux_do = fn(state, cs, q, above)
        assert not bool(aux_skip["updated"])
        assert bool(aux_do["updated"])
        # skipped step leaves weights at the propagation-only values;
        # the measurement step changes them
        assert not np.allclose(
            np.asarray(s_skip.particles.weight),
            np.asarray(s_do.particles.weight),
        )

    def test_angle_gate(self):
        cfg, lookup, state, cs, q = g._build(16, nx=32, ny=32)
        fn = steplib.make_filter_step(cfg, lookup)
        _, aux = fn(state, cs, q, (np.float32(0.0), np.float32(1.0)))
        assert bool(aux["updated"])  # 1 rad > 10 deg threshold


class TestScanRunner:
    def test_runs_trajectory(self):
        cfg, lookup, state, cs, q = g._build(32, nx=32, ny=32)
        t = 4
        css = jax.tree_util.tree_map(
            lambda a: jnp.stack([a] * t), cs
        )
        qs = jnp.stack([jnp.asarray(q)] * t)
        run = steplib.make_scan_runner(cfg, lookup)
        out_state, cents = run(state, css, qs)
        assert cents.shape == (t, 3)
        assert int(out_state.step) == t
        assert np.isfinite(np.asarray(cents)).all()
