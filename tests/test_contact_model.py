"""Contact-model tests with scripted fake map backends.

Mirrors ``/root/reference/test/testContactModel.cpp`` — the fake
4-quadrant MLS access (``:8-38``), the transform-correctness case
(``:69-126``), exact-value weighting cases (``:128-190``), lowest-point
heuristics (``:193-279``), group selection (``:281-324``) and map-absence
invalidation (``:326-362``).

Note: the upstream assertions encode a superseded version of the model
(pre-dating the ratio-averaging rewrite at ``ContactModel.cpp:160-186``
and the ``contactPointRadius`` offset); several of them cannot hold
against the current reference code.  The exact values asserted here are
closed forms of the *current* reference semantics, with
``contact_point_radius = 0`` where exact zeros are expected.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from slam_eslam_tpu.config import ContactModelConfig
from slam_eslam_tpu.core.state import BodyContactState
from slam_eslam_tpu.models import contact_model as cm
from slam_eslam_tpu.utils import geometry

CFG0 = ContactModelConfig(contact_point_radius=0.0)


class FakeMLSAccess:
    """4-quadrant scripted map (testContactModel.cpp:8-38): quadrant index
    = (y>0)*2 + (x>0); records every queried position."""

    def __init__(self, z, stddev, res=None):
        self.z = np.asarray(z, np.float32)
        self.stddev = np.asarray(stddev, np.float32)
        self.res = None if res is None else np.asarray(res, bool)
        self.points = []

    def __call__(self, pts):
        self.points.append(np.asarray(pts))
        idx = (pts[..., 1] > 0).astype(jnp.int32) * 2 + (
            pts[..., 0] > 0
        ).astype(jnp.int32)
        mean = jnp.asarray(self.z)[idx]
        stdev = jnp.asarray(self.stddev)[idx]
        found = (
            jnp.ones(idx.shape, bool)
            if self.res is None
            else jnp.asarray(self.res)[idx]
        )
        color = jnp.zeros(pts.shape[:-1] + (3,))
        return found, mean, stdev, color


def square_state(zs=(0, 0, 0, 0), contact=0.5, group_id=-1):
    """Four contact candidates at (+-1, +-1)."""
    pos = np.array(
        [[-1, -1, zs[0]], [1, -1, zs[1]], [-1, 1, zs[2]], [1, 1, zs[3]]],
        np.float32,
    )
    gid = (
        np.full(4, group_id, np.int32)
        if np.isscalar(group_id)
        else np.asarray(group_id, np.int32)
    )
    con = (
        np.full(4, contact, np.float32)
        if np.isscalar(contact)
        else np.asarray(contact, np.float32)
    )
    return BodyContactState.create(pos, contact=con, group_id=gid)


def identity_pose():
    return jnp.eye(3), jnp.zeros(3)


class TestTransform:
    def test_passes_valid_global_position_to_map(self):
        # testContactModel.cpp:69-104 — translation applied to queries
        state = BodyContactState.create(
            np.array([[1, 0, 0], [-1, 0, 0]], np.float32),
            contact=np.array([0.5, 0.5]),
        )
        state = cm.set_contact_points(state, geometry.quat_identity())
        access = FakeMLSAccess([0] * 4, [0] * 4)
        rot = jnp.eye(3)
        trans = jnp.array([0.25, 0.0, 0.0])
        cm.evaluate_pose(state, rot, trans, 1.0, access, CFG0)
        pts = access.points[0]
        np.testing.assert_allclose(pts[0], [1.25, 0, 0], atol=1e-6)
        np.testing.assert_allclose(pts[1], [-0.75, 0, 0], atol=1e-6)

    def test_rotation_applied(self):
        # testContactModel.cpp:105-125 — translation + yaw
        state = BodyContactState.create(
            np.array([[1, 0, 0], [-1, 0, 0]], np.float32),
            contact=np.array([0.5, 0.5]),
        )
        state = cm.set_contact_points(state, geometry.quat_identity())
        access = FakeMLSAccess([0] * 4, [0] * 4)
        th = np.pi / 2
        rot = jnp.array(
            [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0],
             [0, 0, 1]], jnp.float32,
        )
        trans = jnp.array([0.25, 0.0, 0.0])
        cm.evaluate_pose(state, rot, trans, 1.0, access, CFG0)
        pts = access.points[0]
        np.testing.assert_allclose(pts[0], [0.25, 1, 0], atol=1e-6)
        np.testing.assert_allclose(pts[1], [0.25, -1, 0], atol=1e-6)

    def test_orientation_prerotation(self):
        # setContactPoints applies removeYaw(orientation)
        # (ContactModel.cpp:34-40): pure yaw is stripped entirely...
        state = BodyContactState.create(
            np.array([[1, 0, 0]], np.float32), contact=np.array([1.0])
        )
        q = geometry.quat_from_yaw(jnp.asarray(np.pi / 2))
        rotated = cm.set_contact_points(state, q)
        np.testing.assert_allclose(rotated.position[0], [1, 0, 0], atol=1e-6)
        # ...while pitch tilts the candidates
        qp = geometry.quat_from_axis_angle(jnp.array([0.0, 1, 0]),
                                           jnp.asarray(np.pi / 2))
        rotated = cm.set_contact_points(state, qp)
        np.testing.assert_allclose(rotated.position[0], [0, 0, -1], atol=1e-6)


class TestEvaluatePoseNoGroup:
    def test_flat_map_exact_values(self):
        # testContactModel.cpp:128-170 scenario (current semantics):
        # zdiff=0, zvar=2 per point -> delta=0, zVar=0.5, weight=1
        state = cm.set_contact_points(square_state(), geometry.quat_identity())
        access = FakeMLSAccess([0] * 4, [1] * 4)
        rot, trans = identity_pose()
        res = cm.evaluate_pose(state, rot, trans, 1.0, access, CFG0)
        assert bool(res.measurement_valid)
        assert int(res.n_contacts) == 4
        np.testing.assert_allclose(float(res.z_delta), 0.0, atol=1e-6)
        np.testing.assert_allclose(float(res.z_var), 0.5, rtol=1e-5)
        np.testing.assert_allclose(float(res.weight), 1.0, rtol=1e-5)
        # per-point environment contacts at the map surface
        ok = np.asarray(res.cp_ok)
        assert ok.sum() == 4
        np.testing.assert_allclose(np.asarray(res.cp_zvar)[ok], 2.0, rtol=1e-5)

    def test_huge_stdev_points_dominated(self):
        # testContactModel.cpp:171-189 scenario: one tight point pins the
        # estimate; 1e9-stdev points contribute ~nothing to d1/d2
        state = cm.set_contact_points(square_state(), geometry.quat_identity())
        access = FakeMLSAccess([0, -0.12, -0.12, -0.12], [1, 1e9, 1e9, 1e9])
        rot, trans = identity_pose()
        res = cm.evaluate_pose(state, rot, trans, 1.0, access, CFG0)
        assert bool(res.measurement_valid)
        np.testing.assert_allclose(float(res.z_delta), 0.0, atol=1e-6)
        np.testing.assert_allclose(float(res.z_var), 2.0, rtol=1e-4)
        np.testing.assert_allclose(float(res.weight), 1.0, rtol=1e-4)

    def test_radius_offset(self):
        # contactPointRadius shifts queries down (ContactModel.cpp:147)
        state = cm.set_contact_points(square_state(), geometry.quat_identity())
        access = FakeMLSAccess([0] * 4, [1] * 4)
        rot, trans = identity_pose()
        cfg = ContactModelConfig(contact_point_radius=0.05)
        res = cm.evaluate_pose(state, rot, trans, 1.0, access, cfg)
        np.testing.assert_allclose(float(res.z_delta), 0.05, atol=1e-5)

    def test_contact_threshold_gates_points(self):
        # points below contact prob 0.2 are skipped (ContactModel.cpp:136,154)
        state = cm.set_contact_points(
            square_state(contact=[0.5, 0.1, 0.5, 0.1]),
            geometry.quat_identity(),
        )
        access = FakeMLSAccess([0] * 4, [1] * 4)
        rot, trans = identity_pose()
        res = cm.evaluate_pose(state, rot, trans, 1.0, access, CFG0)
        assert int(res.n_contacts) == 2
        assert not bool(res.measurement_valid)  # below min_contacts=3

    def test_zero_meas_var_rejected(self):
        # ContactModel.cpp:122-123
        state = cm.set_contact_points(square_state(), geometry.quat_identity())
        access = FakeMLSAccess([0] * 4, [1] * 4)
        rot, trans = identity_pose()
        with pytest.raises(ValueError):
            cm.evaluate_pose(state, rot, trans, 0.0, access, CFG0)


class TestLowestPoint:
    def test_without_groups(self):
        # testContactModel.cpp:193-236 — no groups: all points selected,
        # contact probabilities unchanged
        state = square_state(zs=(0.1, -0.1, 0.1, -0.1),
                             contact=[1, 2, 3, 4], group_id=-1)
        state = cm.set_contact_points(state, geometry.quat_identity())
        pts, mask, new_contact = cm.lowest_point_per_group(state)
        assert np.asarray(mask).sum() == 4
        np.testing.assert_allclose(new_contact, [1, 2, 3, 4])

    def test_with_groups(self):
        # testContactModel.cpp:238-279 — lowest per wheel selected;
        # heuristic rewrites contacts to {0,1,0,1}
        state = square_state(zs=(0.1, -0.1, 0.1, -0.1),
                             contact=[1, 2, 3, 4], group_id=[0, 0, 1, 1])
        state = cm.set_contact_points(state, geometry.quat_identity())
        pts, mask, new_contact = cm.lowest_point_per_group(state)
        np.testing.assert_array_equal(
            np.asarray(mask), [False, True, False, True]
        )
        np.testing.assert_allclose(new_contact, [0, 1, 0, 1])


class TestEvaluatePoseGroup:
    def test_group_selection(self):
        # testContactModel.cpp:281-324 scenario: groups {0,0},{1,1};
        # within each group the tight (stdev 1) member dominates the
        # ratio average; representative point = dominant member.
        state = square_state(zs=(0.1, -0.1, 0.1, -0.1),
                             contact=np.nan, group_id=[0, 0, 1, 1])
        state = cm.set_contact_points(state, geometry.quat_identity())
        access = FakeMLSAccess([-0.1] * 4, [1e9, 1, 1e9, 1])
        rot, trans = identity_pose()
        cfg = dataclasses.replace(CFG0, min_contacts=2)
        res = cm.evaluate_pose(state, rot, trans, 1.0, access, cfg)
        assert bool(res.measurement_valid)
        assert int(res.n_contacts) == 2
        ok = np.asarray(res.cp_ok)
        cp = np.asarray(res.cp_point)[ok]
        np.testing.assert_allclose(cp[0], [1, -1, -0.1], atol=1e-6)
        np.testing.assert_allclose(cp[1], [1, 1, -0.1], atol=1e-6)
        # dominated averages: zdiff ~ 0 (sub-mm in f32 — the 1e18-scale
        # variance terms cost precision); zvar blown up by the 1e9
        # member's ratio-weighted contribution (current reference semantics)
        np.testing.assert_allclose(float(res.z_delta), 0.0, atol=5e-4)
        zvars = np.asarray(res.cp_zvar)[ok]
        expected_zvar = (1e18 * 2.41788e-9 + 2 * 1.70954) / 1.70954
        np.testing.assert_allclose(zvars, expected_zvar, rtol=1e-3)
        np.testing.assert_allclose(float(res.weight), 1.0, rtol=1e-4)

    def test_map_absence_invalidates_group(self):
        # testContactModel.cpp:326-362 — a missing patch for an active
        # member kills its whole group: only 1 contact point remains
        state = square_state(zs=(0.1, -0.1, 0.1, -0.1),
                             contact=np.nan, group_id=[0, 0, 1, 1])
        state = cm.set_contact_points(state, geometry.quat_identity())
        access = FakeMLSAccess(
            [-0.1] * 4, [1e9, 1, 1e9, 1], res=[True, True, True, False]
        )
        rot, trans = identity_pose()
        cfg = dataclasses.replace(CFG0, min_contacts=2)
        res = cm.evaluate_pose(state, rot, trans, 1.0, access, cfg)
        assert int(res.n_contacts) == 1

    def test_inactive_miss_does_not_invalidate(self):
        # a sub-threshold-contact member missing the map must not kill
        # the group (only active members are queried)
        state = square_state(zs=(0.1, -0.1, 0.1, -0.1),
                             contact=[0.1, 1.0, 0.1, 1.0],
                             group_id=[0, 0, 1, 1])
        state = cm.set_contact_points(state, geometry.quat_identity())
        access = FakeMLSAccess(
            [-0.1] * 4, [1] * 4, res=[False, True, False, True]
        )
        rot, trans = identity_pose()
        cfg = dataclasses.replace(CFG0, min_contacts=2)
        res = cm.evaluate_pose(state, rot, trans, 1.0, access, cfg)
        assert int(res.n_contacts) == 2


class TestBatchEquivalence:
    """evaluate_pose_batch must match vmap(evaluate_pose) exactly."""

    def test_matches_vmap(self):
        import jax

        state = cm.set_contact_points(
            square_state(zs=(0.1, -0.1, 0.1, -0.1),
                         contact=[0.5, 1.0, np.nan, 0.1],
                         group_id=[0, 0, 1, -1]),
            geometry.quat_identity(),
        )
        z = jnp.array([0.0, -0.1, 0.2, 0.1], jnp.float32)
        sd = jnp.array([0.5, 1.0, 0.3, 2.0], jnp.float32)
        res_map = jnp.array([True, True, False, True])

        def lookup(pts):
            idx = (pts[..., 1] > 0).astype(jnp.int32) * 2 + (
                pts[..., 0] > 0
            ).astype(jnp.int32)
            return (
                res_map[idx], z[idx], sd[idx],
                jnp.zeros(pts.shape[:-1] + (3,)),
            )

        n = 8
        key = jax.random.PRNGKey(0)
        yaw = jax.random.uniform(key, (n,), minval=-1.0, maxval=1.0)
        trans = jax.random.normal(jax.random.PRNGKey(1), (n, 3)) * 0.3
        c, s = jnp.cos(yaw), jnp.sin(yaw)
        zero, one = jnp.zeros_like(c), jnp.ones_like(c)
        rot = jnp.stack(
            [c, -s, zero, s, c, zero, zero, zero, one], -1
        ).reshape(n, 3, 3)
        mv = jnp.full((n,), 0.8)
        cfg = dataclasses.replace(CFG0, min_contacts=2)

        single = jax.vmap(
            lambda r, t, m: cm.evaluate_pose(state, r, t, m, lookup, cfg)
        )(rot, trans, mv)
        batch = cm.evaluate_pose_batch(
            state, rot, trans, mv, lookup, cfg, with_debug_points=True
        )
        ok = np.asarray(single.cp_ok)
        np.testing.assert_array_equal(ok, np.asarray(batch.cp_ok))
        np.testing.assert_allclose(
            np.asarray(single.cp_point)[ok], np.asarray(batch.cp_point)[ok],
            rtol=1e-5, atol=1e-6,
        )
        for field in ["measurement_valid", "weight", "z_delta", "z_var",
                      "pose_var", "n_contacts", "cp_zdiff"]:
            a = np.asarray(getattr(single, field))
            b = np.asarray(getattr(batch, field))
            if a.dtype == bool or a.dtype.kind == "i":
                np.testing.assert_array_equal(a, b, err_msg=field)
            else:
                mask = np.isfinite(a)
                np.testing.assert_array_equal(
                    np.isfinite(b), mask, err_msg=field
                )
                np.testing.assert_allclose(
                    a[mask], b[mask], rtol=2e-5, atol=1e-6, err_msg=field
                )


class TestLikelihoodRatio:
    def test_symmetric_point(self):
        # at z=0: pdf/cdf = 2 * pdf(0) = 2 / (sigma_c * sqrt(2*pi))
        r = cm.contact_likelihood_ratio(jnp.asarray(0.0), 1.0, 0.33)
        np.testing.assert_allclose(
            float(r), 2.0 / (0.33 * np.sqrt(2 * np.pi)), rtol=1e-5
        )

    def test_deep_tail_finite(self):
        # boost underflows cdf -> inf ratio; log-space stays finite.
        # asymptotically pdf/cdf -> |z| / sigma_c^2 = 30 / 0.33^2 ~ 275
        r = cm.contact_likelihood_ratio(jnp.asarray(-30.0), 1.0, 0.33)
        assert np.isfinite(float(r))
        np.testing.assert_allclose(float(r), 30.0 / 0.33**2, rtol=0.05)

    def test_monotone_decreasing(self):
        z = jnp.linspace(-2, 2, 41)
        r = cm.contact_likelihood_ratio(z, 1.0, 0.33)
        assert np.all(np.diff(np.asarray(r)) < 0)


class TestKalmanZUpdate:
    def _result(self, z_delta, z_var, pose_var, n=4):
        return cm.ContactEvalResult(
            measurement_valid=jnp.asarray(True),
            weight=jnp.asarray(1.0),
            z_delta=jnp.asarray(z_delta),
            z_var=jnp.asarray(z_var),
            pose_var=jnp.asarray(pose_var),
            n_contacts=jnp.asarray(n, jnp.int32),
            cp_point=jnp.zeros((4, 3)),
            cp_zdiff=jnp.zeros(4),
            cp_zvar=jnp.ones(4),
            cp_prob=jnp.ones(4),
            cp_ok=jnp.ones(4, bool),
        )

    def test_accepted_update(self):
        # ContactModel.cpp:319-340 closed form
        res = self._result(z_delta=0.1, z_var=0.5, pose_var=0.4)
        acc, z, var = cm.update_z_position_estimate(res, 1.0, 1.0)
        assert bool(acc)
        pose_var = 0.4 / 4
        delta_var = 1.0 - pose_var
        gain = 1.0 / (1.0 + 0.5)
        np.testing.assert_allclose(float(z), 1.0 + gain * 0.1, rtol=1e-5)
        var_gain = delta_var / (delta_var + 0.5)
        np.testing.assert_allclose(
            float(var), pose_var + (1 - var_gain) * delta_var, rtol=1e-5
        )

    def test_outlier_rejected(self):
        # |z_delta| / sqrt(delta_var) > 1 -> reject, state unchanged
        res = self._result(z_delta=5.0, z_var=0.5, pose_var=0.0)
        acc, z, var = cm.update_z_position_estimate(res, 1.0, 1.0)
        assert not bool(acc)
        np.testing.assert_allclose(float(z), 1.0)
        np.testing.assert_allclose(float(var), 1.0)


class TestChitta:
    def test_matches_reference_formula(self):
        # ContactModel.cpp:342-361: anchor min zdiff, sum squares of rest
        zd = jnp.array([0.3, 0.1, 0.2, 0.0])
        ok = jnp.ones(4, bool)
        w, z_delta, z_var = cm.evaluate_weight_chitta(zd, jnp.ones(4), ok, 0.5)
        np.testing.assert_allclose(float(z_delta), 0.0, atol=1e-7)
        z_t = 0.3**2 + 0.1**2 + 0.2**2
        np.testing.assert_allclose(float(w), np.exp(-z_t / 1.0), rtol=1e-5)
        np.testing.assert_allclose(float(z_var), 0.5)
