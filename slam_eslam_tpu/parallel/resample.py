"""Distributed systematic resampling over a device mesh.

The reference resamples with a sequential cumulative-sum walk on one
core (``/root/reference/src/ParticleFilter.hpp:85-108``).  Sharded over
a ``('dp',)`` mesh the exact same statistics are preserved with:

1. ``psum`` of per-shard weight sums  -> global normaliser + ESS,
2. one shared scalar uniform draw     -> identical global stratum
   positions ``(k + u) / N`` on every shard (systematic scheme),
3. ``all_gather`` of the [N] weight vector (4 B/particle — cheap even
   at 1M particles) -> every shard runs the same searchsorted and
   learns the *global* source index of each of its local output slots,
4. an index gather of the particle pytree — cross-shard particle
   migration that XLA lowers to all-to-all-style collectives over ICI.

Two call styles:

* ``resample_sharded``  — plain jit + sharding constraints; XLA derives
  the collectives (the default; composes with the rest of the step).
* ``resample_shard_map`` — explicit ``shard_map`` with hand-placed
  ``psum``/``all_gather`` (the performance-controlled path; also the
  executable documentation of the comm pattern).

Both return ``(indices, ess)`` computed from *normalised* weights; the
caller gathers its pytrees (particles + map-chain ids migrate together,
keeping particle/map consistency — SURVEY hard-part #3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

if hasattr(jax, "shard_map"):  # jax>=0.6
    shard_map = jax.shard_map
else:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def resample_sharded(key, weights, mesh):
    """jit+constraint formulation: identical math to the single-chip
    ``core.filter.resample_systematic``; sharding makes XLA insert the
    collectives."""
    from slam_eslam_tpu.core import filter as pf

    if mesh is not None:
        weights = jax.lax.with_sharding_constraint(
            weights, NamedSharding(mesh, P("dp"))
        )
    w, ess = pf.normalize_weights(weights)
    idx = pf.resample_systematic(key, w, w.shape[0])
    return idx, ess


def resample_shard_map(key, weights, mesh):
    """Explicit collective formulation (see module docstring)."""
    n = weights.shape[0]
    u = jax.random.uniform(key, (), weights.dtype)

    def local(w_local):
        axis = "dp"
        n_local = w_local.shape[0]
        shard = jax.lax.axis_index(axis)

        # 1. global normalisation + ESS via psum
        total = jax.lax.psum(jnp.sum(w_local), axis)
        ok = (total > 0) & jnp.isfinite(total)
        w_norm = jnp.where(
            ok, w_local / jnp.where(ok, total, 1.0), 1.0 / n
        )
        ess = 1.0 / jax.lax.psum(jnp.sum(w_norm * w_norm), axis)

        # 2-3. identical global positions; all-gathered weights
        w_all = jax.lax.all_gather(w_norm, axis, tiled=True)   # [N]
        cumsum = jnp.cumsum(w_all)
        cumsum = cumsum.at[-1].set(jnp.maximum(cumsum[-1], 1.0 + 1e-6))
        k = (
            shard * n_local
            + jnp.arange(n_local, dtype=w_all.dtype)
        )
        positions = (k + u) / n
        idx = jnp.searchsorted(cumsum, positions, side="left")
        idx = jnp.clip(idx, 0, n - 1).astype(jnp.int32)
        return idx, ess[None]

    idx, ess = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("dp"),),
        out_specs=(P("dp"), P("dp")),
    )(weights)
    return idx, ess[0]
