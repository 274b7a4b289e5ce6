"""Map-lookup adapters: the seam between the contact model and maps.

The reference injects the map as a callback
(``boost::function<bool(Vector3d, SurfacePatch&)>`` —
``/root/reference/src/ContactModel.hpp:115-118``, bound to
``GridAccess::get`` at ``src/PoseEstimator.cpp:291``).  Here the seam is
a batched function ``lookup(map_id, points [C, 3]) -> (found, mean,
stdev, color)`` vmapped over particles.
"""

from __future__ import annotations

from slam_eslam_tpu.mapping import mls_grid


def shared_grid_lookup(grid, z_window=3.0, packed=True):
    """All particles query one shared grid (useSharedMap mode,
    ``EmbodiedSlamFilter.cpp:73-101``); ``map_id`` is ignored.

    With ``packed`` (default) the grid is repacked into the
    single-gather ``PackedLookup`` layout — XLA hoists the (loop-
    invariant) packing out of scans; colour is not available on this
    path, so pass ``packed=False`` when the slip/terrain update needs
    patch colours.
    """
    if isinstance(grid, mls_grid.PackedLookup) or packed:
        pl = (
            grid
            if isinstance(grid, mls_grid.PackedLookup)
            else mls_grid.PackedLookup.from_grid(grid)
        )

        def lookup(map_id, points):
            del map_id
            return mls_grid.get_patch_packed(pl, points, z_window)

        lookup.batched = True  # shape-polymorphic over [N, C, 3]
        return lookup

    def lookup(map_id, points):
        del map_id
        return mls_grid.get_patch(grid, points, z_window)

    lookup.batched = True
    return lookup


def make_lookup(cfg, grid, mesh=None, **kernel_kw):
    """Config-driven shared-map lookup factory — THE production seam.

    Dispatches on ``cfg.lookup_mode``:

    * ``"gather"`` — exact XLA full-grid gather (``shared_grid_lookup``);
    * ``"window"`` — the Pallas VMEM-window kernel (fast; queries beyond
      the window miss — tracking-regime benches only);
    * ``"auto"``   — window kernel with on-device spread detection that
      falls back to the full gather when the query cloud's bounding box
      exceeds the window (e.g. after hash relocalisation).  Default.

    The slip/terrain update needs patch colours, which only the unpacked
    gather carries — ``use_slip_update`` forces the gather path.
    ``grid`` may be an ``MLSGrid`` or a prebuilt ``PackedLookup``; it may
    be a traced value (map state travelling as a jit argument).
    """
    mode = cfg.lookup_mode
    if mode not in ("gather", "window", "auto"):
        raise ValueError(f"unknown lookup_mode {mode!r}")
    use_slip = cfg.contact_model.use_slip_update
    if mode == "gather" or use_slip:
        return shared_grid_lookup(
            grid, cfg.mls_z_window, packed=not use_slip
        )
    from slam_eslam_tpu.ops.pallas_gather import windowed_grid_lookup

    return windowed_grid_lookup(
        grid, z_window=cfg.mls_z_window, window=cfg.lookup_window,
        mesh=mesh, fallback=(mode == "auto"),
        tiers=(cfg.lookup_tiers if mode == "auto" else ()), **kernel_kw,
    )
