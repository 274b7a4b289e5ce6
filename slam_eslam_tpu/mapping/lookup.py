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


def shared_grid_lookup(grid: mls_grid.MLSGrid, z_window=3.0):
    """All particles query one shared grid (useSharedMap mode,
    ``EmbodiedSlamFilter.cpp:73-101``); ``map_id`` is ignored."""

    def lookup(map_id, points):
        del map_id
        return mls_grid.get_patch(grid, points, z_window)

    return lookup
