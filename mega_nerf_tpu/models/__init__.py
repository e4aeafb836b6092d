"""Model layer (L1): NeRF MLPs, coarse/fine cascades, spatial mixtures.

Flax linen modules with explicit, unpacked inputs (xyz / view dirs /
appearance indices as separate arguments — the reference packs them into one
tensor, `mega_nerf/models/nerf.py:115-123`; we keep them separate so the
renderer and Pallas kernels can lay them out freely).
"""

from mega_nerf_tpu.models.nerf import NeRF, NeRFConfig, frequency_encode
from mega_nerf_tpu.models.cascade import Cascade
from mega_nerf_tpu.models.mega import (
    cluster_weights,
    mega_apply,
    mega_apply_ray_routed,
    mega_apply_routed,
    ray_route_capacity,
    ray_route_plan,
)
from mega_nerf_tpu.models.factory import (
    ModelBundle,
    make_nerf,
    make_bg_nerf,
    nerf_config_from_hparams,
)

__all__ = [
    "NeRF",
    "NeRFConfig",
    "frequency_encode",
    "Cascade",
    "cluster_weights",
    "mega_apply",
    "mega_apply_ray_routed",
    "mega_apply_routed",
    "ray_route_capacity",
    "ray_route_plan",
    "ModelBundle",
    "make_nerf",
    "make_bg_nerf",
    "nerf_config_from_hparams",
]
