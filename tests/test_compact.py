"""Contact-state compaction must preserve evaluate_pose results."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from slam_eslam_tpu.config import ContactModelConfig
from slam_eslam_tpu.core.state import BodyContactState
from slam_eslam_tpu.models import contact_model as cm


def lookup(pts):
    z = 0.1 * jnp.sin(pts[..., 0]) + 0.05 * jnp.cos(pts[..., 1])
    return (
        jnp.ones(pts.shape[:-1], bool),
        z,
        jnp.full(pts.shape[:-1], 0.3),
        jnp.zeros(pts.shape[:-1] + (3,)),
    )


class TestCompact:
    def _state(self):
        rng = np.random.default_rng(3)
        pos = rng.normal(0, 0.4, (20, 3)).astype(np.float32)
        contact = np.zeros(20, np.float32)
        # 6 active points spread over 3 groups
        contact[[0, 3, 7, 11, 12, 18]] = 1.0
        gid = np.repeat(np.arange(4), 5).astype(np.int32)
        return BodyContactState.create(pos, contact=contact, group_id=gid)

    def test_results_identical(self):
        state = self._state()
        compact = state.compact(8)
        assert compact.c == 8
        cfg = ContactModelConfig(contact_point_radius=0.0, min_contacts=2)
        rot = jnp.eye(3)[None].repeat(4, 0)
        trans = jnp.asarray(
            np.random.default_rng(0).normal(0, 0.3, (4, 3)), jnp.float32
        )
        mv = jnp.full((4,), 0.5)
        full = cm.evaluate_pose_batch(state, rot, trans, mv, lookup, cfg)
        comp = cm.evaluate_pose_batch(compact, rot, trans, mv, lookup, cfg)
        for f in ["measurement_valid", "weight", "z_delta", "z_var",
                  "pose_var", "n_contacts"]:
            a, b = np.asarray(getattr(full, f)), np.asarray(getattr(comp, f))
            mask = (
                np.isfinite(a) if a.dtype.kind == "f" else np.ones_like(a, bool)
            )
            np.testing.assert_allclose(
                a[mask], b[mask], rtol=1e-5, atol=1e-7, err_msg=f
            )

    def test_keeps_actives_when_over_cap(self):
        state = self._state()
        compact = state.compact(4)  # fewer than 6 actives: keeps first 4
        con = np.asarray(compact.contact)
        assert (con >= 0.2).sum() == 4

    def test_preserves_group_runs(self):
        state = self._state()
        compact = state.compact(8)
        gid = np.asarray(compact.group_id)
        # group ids stay sorted runs (0..3 order preserved)
        assert (np.diff(gid) >= 0).all()
