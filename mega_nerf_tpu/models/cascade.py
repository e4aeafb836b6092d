"""Coarse/fine cascade: two independent NeRF MLPs sharing one architecture.

Parity target: reference `mega_nerf/models/cascade.py`. The `use_coarse`
selector is a static Python bool, so under jit each branch compiles
separately and there is no runtime dispatch.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from mega_nerf_tpu.models.nerf import NeRF, NeRFConfig


class Cascade(nn.Module):
    config: NeRFConfig

    def setup(self):
        self.coarse = NeRF(self.config, name="coarse")
        self.fine = NeRF(self.config, name="fine")

    def __call__(
        self,
        use_coarse: bool,
        xyz: jnp.ndarray,
        dirs: Optional[jnp.ndarray] = None,
        image_indices: Optional[jnp.ndarray] = None,
        sigma_noise: Optional[jnp.ndarray] = None,
        sigma_only: bool = False,
    ) -> jnp.ndarray:
        net = self.coarse if use_coarse else self.fine
        return net(xyz, dirs, image_indices, sigma_noise, sigma_only)

    def init_all(self, xyz, dirs=None, image_indices=None):
        """Touch both branches so `.init` materializes coarse AND fine params."""
        return (
            self.coarse(xyz, dirs, image_indices),
            self.fine(xyz, dirs, image_indices),
        )
