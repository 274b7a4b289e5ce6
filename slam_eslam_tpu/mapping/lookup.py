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
