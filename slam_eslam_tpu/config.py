"""Configuration for the TPU-native embodied-SLAM engine.

Mirrors the semantics of the reference configuration structs
(``/root/reference/src/Configuration.hpp:83-213``), re-expressed as frozen
Python dataclasses so that every tunable is a static (trace-time) constant
for XLA.  Defaults are identical to the reference constructor defaults.

One intentional deviation: the reference ``UpdateThreshold::test(Affine3d)``
passes its arguments swapped (angle into the distance slot,
``Configuration.hpp:23-26``).  We implement the evidently-intended semantics
(distance compared against distance, angle against angle).
"""

from __future__ import annotations

import dataclasses
import math


@dataclasses.dataclass(frozen=True)
class UpdateThreshold:
    """Distance/angle gate for triggering an update.

    Reference: ``src/Configuration.hpp:12-30``.  ``test`` returns True when
    either the travelled distance or rotated angle exceeds its threshold.
    """

    distance: float = 0.0
    angle: float = 0.0

    def test(self, distance, angle):
        """Return a (traced) boolean: does the motion exceed the gate?"""
        return (distance > self.distance) | (angle > self.angle)


@dataclasses.dataclass(frozen=True)
class SurfaceHashConfig:
    """Terrain-signature hash configuration.

    Reference: ``src/Configuration.hpp:32-49``.
    """

    use_hash: bool = False
    period: int = 10            # steps between hash-based reinjections
    percentage: float = 0.05    # fraction of particles eligible for replacement
    avg_factor: float = 0.1     # weight factor (x avg weight) of respawned particles
    slope_bins: int = 20        # hash bins per slope axis
    angular_steps: int = 16     # heading discretisation of the hash
    # Health gate (deviation from the reference, which reinjects on
    # every period tick regardless of filter state,
    # PoseEstimator.cpp:130-182): when > 0, the replacement count is
    # scaled by the same collapsed-max-weight ramp that drives recovery
    # spreading (weighting_function(max_weight, 0, lost_threshold, 0)) —
    # a tracking filter (max_weight >= lost_threshold) injects nothing,
    # a lost one (max_weight -> 0) injects the full percentage.
    # Rationale: on signature-ambiguous terrain unconditional injection
    # teleports surviving candidates into the cloud and the centroid
    # walks (measured: 33.4 m vs 3-5 m ATE on the 100 m stretch route);
    # gating on the reference's own lost signal keeps the
    # kidnapped-robot insurance without the steady-state poisoning.
    # 0 = reference-faithful unconditional injection.
    lost_threshold: float = 0.0


@dataclasses.dataclass(frozen=True)
class ContactModelConfig:
    """Contact measurement-model configuration.

    Reference: ``src/Configuration.hpp:51-81``.
    """

    use_slip_update: bool = False
    use_shape_update: bool = True
    # minimum number of valid contact groups for a height measurement;
    # particles below this are "floating".
    min_contacts: int = 3
    contact_likelihood_correction: float = 0.33
    contact_point_radius: float = 0.01
    # weighting variant: "ratio" = the default ContactModel
    # (``ContactModel.cpp:262-317``); "chitta" = the literature-based
    # alternative model class (``ChittaContactModel``,
    # ``src/ContactModel.hpp:168-173``, ``ContactModel.cpp:342-361``)
    weighting: str = "ratio"
    # fold the likelihood ratio + group reductions into the Pallas
    # window kernel when the lookup supports it (``lookup.fold``) and
    # neither slip/terrain probabilities nor debug points are requested
    # — semantics-preserving to ~5e-5 rel (the in-kernel Mills-ratio
    # approximation; see ops.pallas_gather._mills_ratio)
    fold_lookup: bool = True


@dataclasses.dataclass(frozen=True)
class OdometryConfig:
    """Contact-odometry noise model.

    The reference consumes the external Rock ``odometry`` package
    (``manifest.xml:9-15``); its ``Configuration`` carries a seed plus
    constant and per-distance error growth terms used by
    ``getPoseDeltaSample2D()`` (``src/PoseEstimator.cpp:198``).  We rebuild
    the capability: a Gaussian error model whose standard deviation is
    ``const_error + dist_error * |delta|`` per axis (x, y, theta), plus a
    vertical term used for the z-variance propagation
    (``src/PoseEstimator.cpp:192``).
    """

    seed: int = 42
    # standard deviations, constant part [m, m, rad]
    const_error_xy: float = 0.002
    const_error_yaw: float = 0.002
    # standard deviations, growth per metre travelled
    dist_error_xy: float = 0.05
    dist_error_yaw: float = 0.05
    # vertical error growth (feeds z variance propagation)
    const_error_z: float = 0.002
    dist_error_z: float = 0.05
    # contact probability above which a point counts as "in contact"
    contact_threshold: float = 0.5


@dataclasses.dataclass(frozen=True)
class Config:
    """Top-level filter configuration.

    Reference: ``src/Configuration.hpp:83-213`` (identical defaults).
    """

    seed: int = 42
    particle_count: int = 250
    min_effective: int = 50
    # initial sampling spread: rotational (rx, ry, rz) and translational parts
    initial_rotation_error: tuple = (0.0, 0.0, 0.1)
    initial_translation_error: tuple = (0.1, 0.1, 1.0)
    measurement_error: float = 0.1
    discount_factor: float = 0.9
    spread_threshold: float = 0.9
    spread_translation_factor: float = 0.1
    spread_rotation_factor: float = 0.05
    slip_factor: float = 0.05
    max_yaw_deviation: float = 15.0 * math.pi / 180.0
    measurement_threshold: UpdateThreshold = UpdateThreshold(0.1, 10 * math.pi / 180.0)
    mapping_threshold: UpdateThreshold = UpdateThreshold(0.02, 5 * math.pi / 180.0)
    mapping_camera_threshold: UpdateThreshold = UpdateThreshold(1.0, 30 * math.pi / 180.0)
    grid_size: float = 20.0
    grid_resolution: float = 0.05
    grid_threshold: float = 0.5
    grid_patch_thickness: float = 0.1
    grid_gap_size: float = 1.5
    grid_use_negative_information: bool = False
    max_sensor_range: float = 3.0
    use_visual_update: bool = False
    contact_model: ContactModelConfig = ContactModelConfig()
    log_debug: bool = False
    log_particle_period: int = 100

    # ---- TPU-native additions (no reference counterpart) ----
    # wrap-safe centroid yaw: the reference's getCentroid takes a plain
    # weighted mean of yaw (``PoseEstimator.cpp:368``), which breaks at
    # the +-pi wrap; True switches to the circular mean
    # atan2(sum w sin, sum w cos).  Default False = faithful.
    wrap_safe_centroid: bool = False
    # shared-map lookup path: "gather" = XLA full-grid gather;
    # "window" = Pallas VMEM-window kernel (fast, but queries beyond
    # the window miss); "auto" = window kernel with an on-device
    # spread-detection fallback to the full gather (production default)
    lookup_mode: str = "auto"
    # window size in cells for the Pallas lookup (int or (wx, wy)).
    # Kernel cost scales with the Y extent only (stage 1 contracts over
    # x on the MXU, whose K dim pads to 128 anyway — x width up to 128
    # is FREE; BENCH.md round-3 sweep: 128x64 = 3.96 ns/q == 64x64,
    # 128x96 = 4.44 < 96x96 = 4.47).  y = 96 @ 0.05 m = 4.8 m covers a
    # 100k-particle tracking cloud with sigma ~0.3 m at +-8 sigma
    # (64 sits at the +-4.5 sigma extreme -> the auto fallback fires
    # most steps); x = 128 halves fallback triggers at no cost.
    lookup_window: tuple = (128, 96)
    # adaptive window tiers for the auto fold lookup: smaller windows
    # tried (smallest first) before ``lookup_window``, chosen on device
    # from the query cloud's bounding box (same spread test as the
    # gather fallback).  The fold kernel's stage-1 one-hot matmul costs
    # ~wy*2K*wx MACs per particle, so each tier is a proportional MXU
    # saving when it fits.  Sizing measured on the bench trajectory
    # (tools/probe_spread.py, 100k particles): the steady-state query
    # cloud is ~45x57 cells -> (128, 64) fits 84% of steps (1.5x less
    # MXU work); (128, 32) covers converged-localisation clouds
    # (~16-20 cells).  Spread steps (init, post-relocalisation) fall
    # through to ``lookup_window`` and then the exact gather.
    # () disables tiering (single-window behaviour).
    lookup_tiers: tuple = ((128, 32), (128, 64))
    # number of patch slots per MLS cell (fixed-shape patch lists)
    mls_patches_per_cell: int = 4
    # z search window (m) for MLSMap::getPatch (reference passes 3.0,
    # src/PoseEstimator.hpp:101)
    mls_z_window: float = 3.0
    # map-pool capacity for per-particle maps (copy-on-write blocks)
    map_pool_blocks: int = 8
    # carry patch colours in the per-particle map pool (needed by the
    # slip/terrain fusion and texture paths in SLAM mode; False saves
    # 1.5x patch memory + merge traffic)
    map_pool_color: bool = True
    # storage dtype of the pool's float patch fields: 'float32' (exact)
    # or 'bfloat16' (10 bytes/patch-slot instead of 16 — the setting
    # that fits 100k-particle per-particle SLAM on one v5e chip; all
    # fusion arithmetic stays f32, values round once on store)
    map_pool_dtype: str = "float32"
    # max grids chained per particle map (MLSMap grid chain)
    map_chain_length: int = 4
    # block-allocation locality ranges: the pool's block axis is split
    # into this many equal ranges and a particle only ever allocates
    # from its own range (range = particle_index * shards // N).  On a
    # 'dp' mesh with shards == mesh size, every fresh block is homed on
    # its particle's device (particle/block co-location), so merges and
    # head lookups stay shard-local; chain tails may still reference
    # remote blocks after resampling migration (bounded cross-ICI
    # gathers).  The allocation pattern depends only on this value —
    # never on the actual device count — so runs are bit-identical
    # across mesh sizes.  1 = global allocation (single-chip default).
    map_pool_shards: int = 1
    # per-particle map-pool kernel selection (scan merges AND chain
    # lookups): 'pallas' = the per-block streaming kernels
    # (ops.pallas_merge / ops.pallas_chain — DMA each particle's
    # blocks through VMEM via scalar-prefetched index maps, one-hot MXU
    # accumulation/gather, no XLA gather/scatter); 'xla' = the
    # gather/scatter formulations; 'auto' = pallas on TPU for
    # colourless pools, xla otherwise.  On a mesh, merges run the
    # kernel shard-locally when map_pool_shards == mesh size; chain
    # lookups fall back to 'xla' (chain tails may be remote).
    merge_kernel: str = "auto"
    # particles per Pallas-merge grid step (merge_blocks_grouped):
    # > 1 streams G active blocks per step through a stacked VMEM image
    # via manual DMA, amortising the kernel's ~2 us/step fixed Mosaic
    # overhead G-fold (tools/probe_merge_overhead.py).  1 = the
    # original per-block kernel.
    merge_group: int = 1
    # per-particle map-CHAIN lookup kernel (the measurement update's
    # ``MLSMap::getPatch`` path, ``PoseEstimator.hpp:97-105``):
    # 'pallas' = ops.pallas_chain block streaming; 'xla' = the vmapped
    # gather; 'auto' = pallas on the TPU backend for colour-free pools,
    # xla otherwise.  Separate from ``merge_kernel`` so an explicit
    # merge-kernel choice on a CPU run cannot silently route chain
    # lookups through interpret-mode Pallas (advisor round 2).
    chain_kernel: str = "auto"
