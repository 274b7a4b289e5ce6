"""Offline visualisation (matplotlib) — the viz-capability layer.

Replaces the reference's Qt/OSG stack (``/root/reference/viz/``) with
headless rendering for notebooks/logs.  Capability parity:

* particle cloud with weight scaling and floating/contact colouring
  (``viz/ParticleVisualization.cpp:121-128``: floating = red, contact =
  grey, inspected = cyan; marker size plays the role of the
  weight-scaled cylinder height ``:128``),
* GMM uncertainty ellipses (``:98-109``),
* single-particle map inspection (``viz/MapVizEventFilter.hpp``,
  ``EslamWidget::viewMap``) — render one particle's grid chain,
* MLS grid heightmaps and reference/centroid trajectories
  (``viz/EslamWidget.cpp:16-42``).

All functions draw onto a supplied/created matplotlib Axes and return
it; callers save or show.
"""

from __future__ import annotations

import numpy as np


def _ax(ax):
    if ax is None:
        import matplotlib

        matplotlib.use("Agg", force=False)
        import matplotlib.pyplot as plt

        _, ax = plt.subplots(figsize=(7, 7))
    return ax


def draw_particles(particles, ax=None, best_index=None, scale=2000.0):
    """Particle cloud: size ~ weight, red = floating, grey = in contact,
    cyan = inspected/best."""
    ax = _ax(ax)
    xy = np.asarray(particles.xy)
    w = np.asarray(particles.weight)
    floating = np.asarray(particles.floating)
    sizes = 4.0 + scale * w / max(w.sum(), 1e-12) / len(w) * 100.0
    colors = np.where(floating, "red", "grey").astype(object)
    if best_index is not None:
        colors[int(best_index)] = "cyan"
    ax.scatter(xy[:, 0], xy[:, 1], s=sizes, c=list(colors), alpha=0.6,
               edgecolors="none")
    # heading ticks
    yaw = np.asarray(particles.yaw)
    ax.quiver(xy[:, 0], xy[:, 1], np.cos(yaw), np.sin(yaw),
              scale=60, width=0.002, alpha=0.3)
    ax.set_aspect("equal")
    return ax


def draw_gmm(means, covs, weights, ax=None, n_sigma=2.0):
    """GMM uncertainty ellipses (eigendecomposition of each covariance)."""
    from matplotlib.patches import Ellipse

    ax = _ax(ax)
    means = np.asarray(means)
    covs = np.asarray(covs)
    weights = np.asarray(weights)
    for mean, cov, w in zip(means, covs, weights):
        vals, vecs = np.linalg.eigh(cov)
        angle = np.degrees(np.arctan2(vecs[1, 1], vecs[0, 1]))
        e = Ellipse(
            mean, 2 * n_sigma * np.sqrt(max(vals[1], 0)),
            2 * n_sigma * np.sqrt(max(vals[0], 0)),
            angle=angle, fill=False, color="blue",
            alpha=min(1.0, 0.2 + w),
        )
        ax.add_patch(e)
    return ax


def draw_grid(grid, ax=None, cmap="terrain"):
    """MLS grid heightmap (top patch mean per cell; invalid = NaN)."""
    ax = _ax(ax)
    mean = np.asarray(grid.mean)
    valid = np.asarray(grid.valid)
    # top patch = max mean among valid slots
    z = np.where(valid, mean, -np.inf).max(axis=-1)
    z = np.where(np.isfinite(z), z, np.nan)
    origin = np.asarray(grid.origin)
    extent = [
        origin[0], origin[0] + grid.nx * grid.resolution,
        origin[1], origin[1] + grid.ny * grid.resolution,
    ]
    im = ax.imshow(z.T, origin="lower", extent=extent, cmap=cmap,
                   interpolation="nearest")
    ax.figure.colorbar(im, ax=ax, shrink=0.8, label="height [m]")
    return ax


def draw_particle_map(pool, particle_index, ax=None, cmap="terrain"):
    """Inspect one particle's map: composite its grid chain head-first
    (the single-map view of ``MapVizEventFilter``)."""
    ax = _ax(ax)
    chain = np.asarray(pool.chain[particle_index])
    drawn = False
    for level in range(len(chain) - 1, -1, -1):
        b = chain[level]
        if b < 0:
            continue
        shape = (pool.nx, pool.ny, pool.k)
        mean = np.asarray(pool.mean[b]).reshape(shape)
        valid = np.asarray(pool.valid[b]).reshape(shape)
        z = np.where(valid, mean, -np.inf).max(axis=-1)
        z = np.where(np.isfinite(z), z, np.nan)
        origin = np.asarray(pool.origin[b])
        extent = [
            origin[0], origin[0] + pool.nx * pool.resolution,
            origin[1], origin[1] + pool.ny * pool.resolution,
        ]
        im = ax.imshow(z.T, origin="lower", extent=extent, cmap=cmap,
                       interpolation="nearest")
        drawn = True
    if drawn:
        ax.figure.colorbar(im, ax=ax, shrink=0.8, label="height [m]")
    return ax


def draw_trajectories(reference=None, centroid=None, ax=None):
    """Reference vs centroid trajectory overlay (EslamWidget's two
    trajectory plugins)."""
    ax = _ax(ax)
    if reference is not None:
        r = np.asarray(reference)
        ax.plot(r[:, 0], r[:, 1], "g-", label="reference", linewidth=1.5)
    if centroid is not None:
        c = np.asarray(centroid)
        ax.plot(c[:, 0], c[:, 1], "b--", label="centroid", linewidth=1.5)
    ax.legend()
    ax.set_aspect("equal")
    return ax


def render_distribution(dist, path=None, grid=None):
    """One-call snapshot: grid + particles + GMM; optionally saved."""
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 8))
    if grid is not None:
        draw_grid(grid, ax=ax)
    draw_particles(dist.particles, ax=ax)
    draw_gmm(dist.gmm_means, dist.gmm_covs, dist.gmm_weights, ax=ax)
    if path:
        fig.savefig(path, dpi=110, bbox_inches="tight")
        plt.close(fig)
        return path
    return fig
