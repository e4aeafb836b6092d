"""Pure tensor ops (L0): ray generation, sampling, compositing, SH, metrics.

All functions are pure jnp functions with static shapes — safe under jit,
vmap, and shard_map. Parity targets live in the reference's
`mega_nerf/ray_utils.py`, `mega_nerf/rendering.py` (sampling/compositing
helpers), `mega_nerf/spherical_harmonics.py`, and `mega_nerf/metrics.py`.
"""

from mega_nerf_tpu.ops.rays import get_ray_directions, get_rays
from mega_nerf_tpu.ops.sampling import expand_and_perturb_z_vals, sample_pdf, sample_cdf
from mega_nerf_tpu.ops.compositing import (
    composite_weights,
    composite_weights_merge,
    composite_weights_merge_grouped,
    composite_weights_union,
)
from mega_nerf_tpu.ops.geometry import intersect_sphere, depth2pts_outside
from mega_nerf_tpu.ops.sh import eval_sh
from mega_nerf_tpu.ops.metrics import psnr, ssim

__all__ = [
    "get_ray_directions",
    "get_rays",
    "expand_and_perturb_z_vals",
    "sample_pdf",
    "sample_cdf",
    "composite_weights",
    "composite_weights_merge",
    "composite_weights_merge_grouped",
    "composite_weights_union",
    "intersect_sphere",
    "depth2pts_outside",
    "eval_sh",
    "psnr",
    "ssim",
]
