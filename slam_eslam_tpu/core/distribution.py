"""Exported pose distribution (the filter's observable state).

Rebuild of ``eslam::PoseDistribution``
(``/root/reference/src/PoseParticle.hpp:88-114``): the particle cloud,
a 2-D GMM summary, the current (yaw-compensated) orientation, and the
body contact state — everything the viz layer renders and the logging
layer records.  Debug contact/slip payloads (``cpoints``/``spoints``,
``PoseParticle.hpp:78-82``) ride along when ``log_debug`` is enabled
(``Configuration.hpp:203-206``).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from slam_eslam_tpu.core import gmm as gmmlib
from slam_eslam_tpu.core.state import BodyContactState, ParticleSet


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "time", "particles", "gmm_means", "gmm_covs", "gmm_weights",
        "orientation", "body_state", "cpoints", "cpoint_mask",
    ],
    meta_fields=[],
)
@dataclasses.dataclass
class PoseDistribution:
    time: jax.Array          # [] float64/float32 seconds
    particles: ParticleSet
    gmm_means: jax.Array     # [K, 2]
    gmm_covs: jax.Array      # [K, 2, 2]
    gmm_weights: jax.Array   # [K]
    orientation: jax.Array   # [4]
    body_state: BodyContactState
    # optional debug contact points per particle ([N, S, 3] + mask) —
    # zero-size arrays when log_debug is off
    cpoints: jax.Array
    cpoint_mask: jax.Array


def export_distribution(
    key,
    particles: ParticleSet,
    orientation,
    body_state: BodyContactState,
    time=0.0,
    n_components=3,
    eval_result=None,
):
    """Build the distribution (optionally with debug contact points from
    the last ``ContactEvalResult`` batch)."""
    means, covs, mix, _ = gmmlib.fit_gmm(
        key, particles.xy, particles.weight, n_components
    )
    if eval_result is not None:
        cpoints = eval_result.cp_point
        cmask = eval_result.cp_ok
    else:
        n = particles.n
        cpoints = jnp.zeros((n, 0, 3), jnp.float32)
        cmask = jnp.zeros((n, 0), bool)
    return PoseDistribution(
        time=jnp.asarray(time, jnp.float32),
        particles=particles,
        gmm_means=means,
        gmm_covs=covs,
        gmm_weights=mix,
        orientation=jnp.asarray(orientation, jnp.float32),
        body_state=body_state,
        cpoints=cpoints,
        cpoint_mask=cmask,
    )
