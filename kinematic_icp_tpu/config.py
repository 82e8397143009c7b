"""Configuration for the TPU-native Kinematic-ICP pipeline.

Mirrors the reference `kinematic_icp::pipeline::Config`
(/root/reference/cpp/kinematic_icp/pipeline/KinematicICP.hpp:38-60) plus the
TPU-specific static-shape capacities that replace the reference's dynamically
sized ``std::vector``/``robin_map`` state.  Everything here is *static* under
``jax.jit`` — a given ``Config`` value produces one compiled step function.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional


@dataclasses.dataclass(frozen=True)
class Config:
    """Algorithm parameters (defaults = reference KinematicICP.hpp:38-60).

    Note the reference ships YAML that overrides two defaults
    (ros/config/kinematic_icp_ros.yaml): ``deskew: true`` and
    ``max_num_threads: 1``.  We keep the C++ struct defaults here and let the
    YAML loader override, exactly like the reference's 3-tier config system.
    """

    # Preprocessing
    max_range: float = 100.0
    min_range: float = 0.0
    # Mapping parameters
    voxel_size: float = 1.0
    max_points_per_voxel: int = 20
    # Correspondence threshold parameters
    use_adaptive_threshold: bool = True
    fixed_threshold: float = 1.0  # ignored if use_adaptive_threshold
    # Registration parameters
    max_num_iterations: int = 10
    convergence_criterion: float = 0.001
    use_adaptive_odometry_regularization: bool = True
    fixed_regularization: float = 0.0  # ignored if use_adaptive_odometry_regularization
    # Motion compensation
    deskew: bool = False

    # ------------------------------------------------------------------
    # TPU-specific static-shape capacities (no reference equivalent; they
    # replace dynamic containers with fixed-capacity padded arrays).
    # ------------------------------------------------------------------
    #: padded per-scan point capacity (input bucket size)
    max_points: int = 65536
    #: capacity of the 0.5*voxel_size downsampled cloud (map-update cloud)
    max_downsampled: int = 16384
    #: capacity of the 1.5*voxel_size downsampled cloud (ICP source keypoints)
    max_source: int = 8192
    #: number of slots in the device voxel hash table (power of two)
    map_capacity: int = 1 << 18
    #: max linear-probe distance in the open-addressing table (the default
    #: table runs at <1% load, where 4-slot windows never overflow)
    max_probes: int = 4
    #: candidate voxels fetched per NN query (27 = the reference's full
    #: neighborhood; smaller values prune by exact point-to-box lower
    #: bounds, trading a principled approximation for ~27/V fewer gathers;
    #: 10 measures indistinguishable ATE from 27 on synthetic sequences —
    #: 8 is ~8% faster end-to-end at ~+3 mm ATE)
    neighbor_candidates: int = 10
    #: re-gather candidates on every GN iteration (reference behavior)
    #: instead of re-selecting within per-frame cached candidates
    exact_gn_reassociation: bool = False
    #: with exact_gn_reassociation: re-gather only the V nearest voxels by
    #: box lower bound per iteration, PLUS a per-frame exactness
    #: certificate (no skipped voxel could have supplied a better or
    #: tie-breaking sub-tau neighbor) with a lax.cond fallback to the
    #: full-27 loop on violation — bit-identical results to the full
    #: re-gather at a fraction of the gather bytes when certificates hold.
    #: 0 (default) disables pruning (always full 27).
    exact_prune_candidates: int = 0
    #: keep only the top-M candidates per voxel (ranked at the initial
    #: guess) for GN re-selection; 0 (default) keeps all
    #: max_points_per_voxel.  Measured on synthetic sequences the reduction
    #: costs more than it saves and degrades ATE (GN pose updates move far
    #: enough to change NN winners) — available for experimentation only.
    gn_candidates_per_voxel: int = 0
    #: GN solver lowering: "pallas" fuses the whole candidate-cached loop
    #: into one TPU kernel (ops/pallas_gn.py — removes ~25 us/iteration of
    #: fusion-launch overhead), "xla" uses the lax.while_loop lowering,
    #: "auto" picks pallas on TPU and xla elsewhere.  NOTE the Pallas
    #: kernel engages only when its candidate planes fit scoped VMEM
    #: (registration.pallas_gn_fits): the STOCK Config (27x20 candidate
    #: rows x max_source=8192) does NOT fit, so "auto" silently takes the
    #: XLA path — the bench configs (max_source=1024) do fit.  With
    #: exact_gn_reassociation the kernel runs the crossing-certified exact
    #: path (fallback to the XLA full-27 loop on certificate violation);
    #: exact_prune_candidates applies only to the XLA lowering.
    gn_backend: str = "auto"
    #: which point survives per voxel in the wide-frame (packed-word)
    #: downsample: "first" = first in input order (reference semantics,
    #: the input index rides the grouping sort as a tie-break key) or
    #: "min" = smallest quantized offset (drops the index operand — the
    #: grouping sort gets ~25% cheaper — and is permutation-INVARIANT:
    #: the representative no longer depends on sensor packet order at
    #: all).  Both are within the reference's own input-order sensitivity
    #: (chaos floor); bench.py reports both modes.
    downsample_tiebreak: str = "first"

    def __post_init__(self):
        b = self.map_capacity // self.max_probes
        assert b * self.max_probes == self.map_capacity and (
            b & (b - 1)) == 0, (
            "map_capacity must be max_probes x a power-of-two bucket count")
        assert self.gn_backend in ("auto", "pallas", "xla"), self.gn_backend
        assert self.downsample_tiebreak in ("first", "min"), (
            self.downsample_tiebreak)

    def map_resolution(self) -> float:
        """Derived parameter (reference KinematicICP.hpp:46)."""
        return self.voxel_size / math.sqrt(self.max_points_per_voxel)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class ServerConfig:
    """Ingestion/serving-layer parameters.

    Mirrors the ROS-parameter surface of the reference
    `LidarOdometryServer` (LidarOdometryServer.cpp:40-46,127-130) minus the
    tf-frame plumbing that a pure-array pipeline does not need.
    """

    lidar_odom_frame: str = "odom_lidar"
    wheel_odom_frame: str = "odom"
    base_frame: str = "base_link"
    publish_odom_tf: bool = True
    invert_odom_tf: bool = True
    tf_timeout: float = 0.0
    position_covariance: float = 0.1
    orientation_covariance: float = 0.1
    #: skip registration when wheel-odometry delta is below this
    #: (reference LidarOdometryServer.cpp:202)
    stationary_gate: float = 1e-3


def load_yaml_config(path: str) -> tuple[Config, ServerConfig]:
    """Load a reference-style ROS parameter YAML.

    Accepts the exact file the reference ships
    (ros/config/kinematic_icp_ros.yaml) — including the ROS
    ``<node>: ros__parameters:`` nesting — as well as a flat mapping.
    """
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    # Unwrap ROS nesting: {node_name: {ros__parameters: {...}}}
    params = raw
    if len(raw) == 1:
        inner = next(iter(raw.values()))
        if isinstance(inner, dict) and "ros__parameters" in inner:
            params = inner["ros__parameters"]
    if "ros__parameters" in params:
        params = params["ros__parameters"]

    cfg_fields = {f.name for f in dataclasses.fields(Config)}
    srv_fields = {f.name for f in dataclasses.fields(ServerConfig)}
    cfg_kw = {k: v for k, v in params.items() if k in cfg_fields}
    srv_kw = {k: v for k, v in params.items() if k in srv_fields}
    cfg = Config(**cfg_kw)
    # Reference guard: max_range < min_range => min_range = 0
    # (LidarOdometryServer.cpp:98-102)
    if cfg.max_range < cfg.min_range:
        cfg = cfg.replace(min_range=0.0)
    return cfg, ServerConfig(**srv_kw)
