"""Sparse voxel octree (PlenOctree-style) for baking merged models.

Replaces the reference's external `svox` C++/CUDA dependency
(`create_octree.py:30-38`) with a host-side numpy N3Tree plus jax compute
kernels for the heavy passes (grid sigma eval, per-voxel camera-weight
culling, leaf-sample averaging).
"""

from mega_nerf_tpu.octree.n3tree import N3Tree
from mega_nerf_tpu.octree.grid_weight import grid_weight_render_max

__all__ = ["N3Tree", "grid_weight_render_max"]
