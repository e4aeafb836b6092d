"""Model factory: build foreground/background model bundles from hparams.

Parity target: reference `mega_nerf/models/model_utils.py` (get_nerf /
get_bg_nerf / _get_single_nerf_inner). A `ModelBundle` wraps the Flax module
with a uniform functional surface the renderer consumes:

    apply(params, typ, xyz, dirs, image_indices, sigma_noise, sigma_only)

where `typ` is 'coarse' or 'fine' (ignored by non-cascade models), and `xyz`
follows the reference's input-width contract: 3 (fg), 4 (bg inverted-sphere),
or routing-prefixed 6/7/8 for MegaNeRF mixtures (real-world coords prepended
for routing, reference `rendering.py:52-56`, `models/mega_nerf.py:36`).
"""

from __future__ import annotations

import dataclasses
from argparse import Namespace
from typing import Any, Optional

import jax
import jax.numpy as jnp

from mega_nerf_tpu.models.cascade import Cascade
from mega_nerf_tpu.models.mega import (
    cluster_weights,
    mega_apply,
    mega_apply_ray_routed,
    mega_apply_routed,
    ray_route_capacity,
)
from mega_nerf_tpu.models.nerf import NeRF, NeRFConfig


def nerf_config_from_hparams(
    hparams: Namespace, appearance_count: int, layer_dim: int, xyz_dim: int
) -> NeRFConfig:
    """Reference `_get_single_nerf_inner` (`model_utils.py:56-69`)."""
    sh_deg = getattr(hparams, "sh_deg", None)
    rgb_dim = 3 * ((sh_deg + 1) ** 2) if sh_deg is not None else 3
    return NeRFConfig(
        pos_xyz_dim=getattr(hparams, "pos_xyz_dim", 12),
        pos_dir_dim=getattr(hparams, "pos_dir_dim", 4),
        layers=getattr(hparams, "layers", 8),
        skip_layers=tuple(getattr(hparams, "skip_layers", (4,))),
        layer_dim=layer_dim,
        appearance_dim=getattr(hparams, "appearance_dim", 48),
        affine_appearance=getattr(hparams, "affine_appearance", False),
        appearance_count=appearance_count,
        rgb_dim=rgb_dim,
        xyz_dim=xyz_dim,
        shifted_softplus=getattr(hparams, "shifted_softplus", True),
        compute_dtype=getattr(hparams, "compute_dtype", "float32"),
        ref_packed_dirs=getattr(hparams, "ref_packed_dirs", False),
    )


@dataclasses.dataclass
class ModelBundle:
    """A model + its functional apply/init surface.

    For MegaNeRF mixtures (`centroids is not None`), `params` carries a
    leading submodule axis on every leaf and apply routes points by centroid
    distance with `boundary_margin` blending.
    """

    module: Any  # NeRF | Cascade
    config: NeRFConfig
    cascade: bool = False
    centroids: Optional[jnp.ndarray] = None
    boundary_margin: float = 1.0
    cluster_dim_start: int = 0
    xyz_real: bool = False  # input = [routing_xyz(3) | model_input(xyz_dim)]
    pretrained_params: Optional[Any] = None  # set by container loading
    # Mixture evaluation strategy: "dense" = every submodule on every point
    # (mega_apply), "routed" = sorted-gather block routing
    # (mega_apply_routed), "ray" = ray-granularity one-hot capacity
    # dispatch (mega_apply_ray_routed — needs per-ray support masks from
    # the caller; falls back to dense where none are supplied), "auto" =
    # routed above 8 submodules — the crossover where the dense blend's
    # K× FLOPs dominate the router's sort/scatter overhead (the reference
    # ships 8- and 25-submodule models, `README.md:39-51`).
    routing: str = "auto"
    routing_max_experts: int = 4

    @property
    def is_mega(self) -> bool:
        return self.centroids is not None

    @property
    def use_routed(self) -> bool:
        if not self.is_mega:
            return False
        if self.routing == "auto":
            # Measured on-chip (scripts/routing_bench.py, v5e, paper model
            # scale, PERF.md round 4): the dense blend is MLP-throughput
            # bound (~6.3M pts in 76 ms at BOTH K=8 and K=25 with
            # K-scaled chunks) and beats the sorted-gather routed path
            # even at K=25 (4,232 vs 2,220 rays/s) — the routed path's
            # per-point argsort + row gathers/scatters run on the scalar
            # core at ~50x below MLP throughput. Routed only pays once
            # K x FLOPs outgrow that overhead; no shipped config (max
            # K=25) reaches the crossover, so auto stays dense through
            # K=32 and routes only beyond.
            return int(self.centroids.shape[0]) > 32
        return self.routing == "routed"

    @property
    def use_ray_routed(self) -> bool:
        """Ray-granularity routed serving (mega_apply_ray_routed) — an
        opt-in that needs host-side per-ray support masks, so it engages
        in Runner.render_image (which builds them), not in `apply`."""
        return self.is_mega and self.routing == "ray"

    @property
    def eval_submodule_cost(self) -> int:
        """Per-point MLP evaluation multiplier at query time — sizes the
        eval chunk cap (runtime.runner._eval_chunk_cap)."""
        if not self.is_mega:
            return 1
        k = int(self.centroids.shape[0])
        if self.use_routed:
            m = 1 if self.boundary_margin == 1 else self.routing_max_experts
            return min(m, k)
        return k

    def init(self, key: jax.Array):
        cfg = self.config
        xyz = jnp.zeros((1, cfg.xyz_dim))
        dirs = jnp.zeros((1, 3)) if cfg.pos_dir_dim > 0 else None
        idx = jnp.zeros((1,), jnp.int32) if cfg.appearance_dim > 0 else None
        if self.cascade:
            init_one = lambda kk: self.module.init(
                kk, xyz, dirs, idx, method=self.module.init_all
            )["params"]
        else:
            init_one = lambda kk: self.module.init(kk, xyz, dirs, idx)["params"]
        if self.is_mega:
            keys = jax.random.split(key, self.centroids.shape[0])
            return jax.vmap(init_one)(keys)
        return init_one(key)

    def _single_apply(self, params, typ, xyz, dirs, image_indices, sigma_noise,
                      sigma_only):
        if self.cascade:
            return self.module.apply(
                {"params": params}, typ == "coarse", xyz, dirs, image_indices,
                sigma_noise, sigma_only,
            )
        return self.module.apply(
            {"params": params}, xyz, dirs, image_indices, sigma_noise, sigma_only
        )

    def apply(
        self,
        params,
        typ: str,
        xyz: jnp.ndarray,
        dirs: Optional[jnp.ndarray] = None,
        image_indices: Optional[jnp.ndarray] = None,
        sigma_noise: Optional[jnp.ndarray] = None,
        sigma_only: bool = False,
    ) -> jnp.ndarray:
        if not self.is_mega:
            return self._single_apply(
                params, typ, xyz, dirs, image_indices, sigma_noise, sigma_only
            )

        if self.xyz_real:
            routing_pts, model_in = xyz[..., :3], xyz[..., 3:]
        else:
            routing_pts, model_in = xyz[..., :3], xyz
        weights = cluster_weights(
            routing_pts, self.centroids, self.boundary_margin, self.cluster_dim_start
        )
        if self.use_routed:
            return mega_apply_routed(
                lambda p, *a: self._single_apply(p, typ, *a),
                params,
                weights,
                model_in,
                dirs,
                image_indices,
                sigma_noise,
                sigma_only,
                max_experts=(
                    1 if self.boundary_margin == 1
                    else self.routing_max_experts
                ),
            )
        return mega_apply(
            lambda p, *a: self._single_apply(p, typ, *a),
            params,
            weights,
            model_in,
            dirs,
            image_indices,
            sigma_noise,
            sigma_only,
        )

    def apply_ray_routed(
        self,
        params,
        typ: str,
        xyz: jnp.ndarray,  # (R, S, D) ray-structured points
        rays_d: Optional[jnp.ndarray],  # (R, 3) per-ray view dirs or None
        image_indices: Optional[jnp.ndarray],  # (R,) or None
        support: jnp.ndarray,  # (R, Kv) bool per-ray (virtual-)cell support
        capacity: int,
        sigma_only: bool = False,
        cell_ids: Optional[jnp.ndarray] = None,  # (Kv,) virtual->cell map
    ) -> jnp.ndarray:
        """Ray-granularity routed mixture apply (mega_apply_ray_routed):
        exact vs `apply` whenever `support` covers every nonzero-weight
        cell along each ray (cell_cull.ray_support_masks is such a
        conservative superset) and `capacity` >= the max per-column ray
        count (models.ray_route_plan load-balances skewed supports into
        `cell_ids` virtual experts). Eval-only (sigma noise unsupported);
        returns (R, S, O)."""
        assert self.is_mega
        return mega_apply_ray_routed(
            lambda p, *a: self._single_apply(p, typ, *a),
            params,
            self.centroids,
            self.boundary_margin,
            self.cluster_dim_start,
            xyz,
            rays_d,
            image_indices,
            support,
            capacity,
            sigma_only,
            xyz_real=self.xyz_real,
            cell_ids=cell_ids,
        )


def _make_bundle(
    hparams: Namespace,
    appearance_count: int,
    layer_dim: int,
    xyz_dim: int,
) -> ModelBundle:
    cfg = nerf_config_from_hparams(hparams, appearance_count, layer_dim, xyz_dim)
    use_cascade = getattr(hparams, "use_cascade", False)
    centroid_meta = getattr(hparams, "_mega_centroid_metadata", None)

    if centroid_meta is not None:
        # Joint MegaNeRF training (reference --train_mega_nerf,
        # `model_utils.py:37-42`): one mixture, hard assignment.
        centroids = jnp.asarray(centroid_meta["centroids"])
        cluster_2d = bool(centroid_meta["cluster_2d"])
        module = NeRF(cfg)
        return ModelBundle(
            module=module,
            config=cfg,
            cascade=False,
            centroids=centroids,
            boundary_margin=1.0,
            cluster_dim_start=1 if cluster_2d else 0,
            xyz_real=(xyz_dim == 4),
            routing=getattr(hparams, "mega_routing", "auto"),
            routing_max_experts=getattr(hparams, "routing_max_experts", 4),
        )

    if use_cascade:
        return ModelBundle(module=Cascade(cfg), config=cfg, cascade=True)
    return ModelBundle(module=NeRF(cfg), config=cfg)


def _container_bundles(hparams: Namespace):
    """Load (and cache on hparams) the merged-container bundles
    (reference `model_utils.py:22-29`)."""
    cached = getattr(hparams, "_container_bundles", None)
    if cached is None:
        from mega_nerf_tpu.models.container import (
            container_to_bundles,
            load_container,
        )

        cached = container_to_bundles(
            load_container(hparams.container_path), hparams
        )
        hparams._container_bundles = cached
    return cached


def make_nerf(hparams: Namespace, appearance_count: int) -> ModelBundle:
    """Foreground model (reference `model_utils.py:12-13`)."""
    if getattr(hparams, "container_path", None) is not None:
        return _container_bundles(hparams)[0]
    return _make_bundle(hparams, appearance_count, getattr(hparams, "layer_dim", 256), 3)


def make_bg_nerf(hparams: Namespace, appearance_count: int) -> ModelBundle:
    """Background model — xyz_dim 4 for the NeRF++ inverted-sphere coordinate
    (reference `model_utils.py:16-17`)."""
    if getattr(hparams, "container_path", None) is not None:
        bg = _container_bundles(hparams)[1]
        if bg is None:
            raise ValueError("container has no background submodules")
        return bg
    return _make_bundle(
        hparams, appearance_count, getattr(hparams, "bg_layer_dim", 256), 4
    )
