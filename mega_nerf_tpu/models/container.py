"""Merged MegaNeRF container: save/load in viewer-compatible formats.

Parity target: reference `models/mega_nerf_container.py` + the merge flow
(`merge_submodules.py`). A container bundles K foreground (and optionally K
background) submodule weight sets with the spatial metadata needed for
routing: centroids, grid_dim, min/max position, need_viewdir,
need_appearance_embedding, cluster_2d.

Two formats:
- **TorchScript** (`.pt` via torch.jit.save): the reference's interchange
  format with the Mega-NeRF-Dynamic viewer. We both import (read the
  reference's published merged models for eval parity) and export (via the
  `TorchNeRF` mirror) this format.
- **Native dict** (torch.save of numpy state dicts + metadata): loads
  without TorchScript, convenient for our own pipelines.

`load_container` sniffs the format. `container_to_bundles` turns a loaded
container into ready-to-render ModelBundles with stacked Flax params.
"""

from __future__ import annotations

import dataclasses
from argparse import Namespace
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import jax
import numpy as np

from mega_nerf_tpu.models.factory import ModelBundle, nerf_config_from_hparams
from mega_nerf_tpu.models.nerf import NeRF, NeRFConfig
from mega_nerf_tpu.models.torch_interop import (
    appearance_count_from_state,
    flax_params_from_torch_state,
)

NATIVE_FORMAT = "mega_nerf_tpu_container_v1"


@dataclasses.dataclass
class ContainerData:
    centroids: np.ndarray  # (K, 3)
    grid_dim: Tuple[int, int]
    min_position: np.ndarray
    max_position: np.ndarray
    need_viewdir: bool
    need_appearance_embedding: bool
    cluster_2d: bool
    fg_states: List[Dict[str, np.ndarray]]  # torch-named numpy state dicts
    bg_states: List[Dict[str, np.ndarray]]


def save_native_container(path, data: ContainerData) -> None:
    import torch

    payload = {
        "format": NATIVE_FORMAT,
        "centroids": np.asarray(data.centroids, np.float32),
        "grid_dim": list(data.grid_dim),
        "min_position": np.asarray(data.min_position, np.float32),
        "max_position": np.asarray(data.max_position, np.float32),
        "need_viewdir": data.need_viewdir,
        "need_appearance_embedding": data.need_appearance_embedding,
        "cluster_2d": data.cluster_2d,
        "fg_states": data.fg_states,
        "bg_states": data.bg_states,
    }
    torch.save(payload, Path(path))


def save_torchscript_container(path, data: ContainerData, hparams) -> None:
    """Export a TorchScript container via the TorchNeRF mirror
    (the reference viewer's format, `merge_submodules.py:70-77`)."""
    import torch
    from torch import nn

    from mega_nerf_tpu.models.torch_nerf import torch_nerf_from_state

    class _Container(nn.Module):
        def __init__(self):
            super().__init__()
            for i, st in enumerate(data.fg_states):
                cfg = _cfg_for_state(hparams, st, xyz_dim=3)
                setattr(self, f"sub_module_{i}", torch_nerf_from_state(cfg, st))
            for i, st in enumerate(data.bg_states):
                cfg = _cfg_for_state(hparams, st, xyz_dim=4,
                                     layer_dim=getattr(hparams, "bg_layer_dim", 256))
                setattr(self, f"bg_sub_module_{i}", torch_nerf_from_state(cfg, st))
            self.centroids = torch.from_numpy(
                np.asarray(data.centroids, np.float32)
            )
            self.grid_dim = torch.IntTensor(list(data.grid_dim))
            self.min_position = torch.from_numpy(
                np.asarray(data.min_position, np.float32)
            )
            self.max_position = torch.from_numpy(
                np.asarray(data.max_position, np.float32)
            )
            self.need_viewdir = data.need_viewdir
            self.need_appearance_embedding = data.need_appearance_embedding
            self.cluster_2d = data.cluster_2d

    torch.jit.save(torch.jit.script(_Container().eval()), str(path))


def _cfg_for_state(hparams, state, xyz_dim: int, layer_dim: Optional[int] = None
                   ) -> NeRFConfig:
    cfg = nerf_config_from_hparams(
        hparams,
        appearance_count_from_state(state) or 1,
        layer_dim or getattr(hparams, "layer_dim", 256),
        xyz_dim,
    )
    return cfg


def load_container(path) -> ContainerData:
    """Load either a native-dict or a TorchScript container."""
    import torch

    path = Path(path)
    try:
        payload = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(payload, dict) and payload.get("format") == NATIVE_FORMAT:
            return ContainerData(
                centroids=np.asarray(payload["centroids"], np.float32),
                grid_dim=tuple(payload["grid_dim"]),
                min_position=np.asarray(payload["min_position"], np.float32),
                max_position=np.asarray(payload["max_position"], np.float32),
                need_viewdir=bool(payload["need_viewdir"]),
                need_appearance_embedding=bool(
                    payload["need_appearance_embedding"]
                ),
                cluster_2d=bool(payload["cluster_2d"]),
                fg_states=payload["fg_states"],
                bg_states=payload["bg_states"],
            )
    except Exception:
        pass

    # TorchScript container (reference format).
    container = torch.jit.load(str(path), map_location="cpu")
    centroids = container.centroids.numpy()
    k = centroids.shape[0]

    def states(prefix: str) -> List[Dict[str, np.ndarray]]:
        out = []
        for i in range(k):
            name = f"{prefix}{i}"
            if not hasattr(container, name):
                break
            module = getattr(container, name)
            out.append(
                {key: val.detach().numpy() for key, val in
                 module.state_dict().items()}
            )
        return out

    return ContainerData(
        centroids=centroids,
        grid_dim=tuple(int(x) for x in container.grid_dim),
        min_position=container.min_position.numpy(),
        max_position=container.max_position.numpy(),
        need_viewdir=bool(container.need_viewdir),
        need_appearance_embedding=bool(container.need_appearance_embedding),
        cluster_2d=bool(container.cluster_2d),
        fg_states=states("sub_module_"),
        bg_states=states("bg_sub_module_"),
    )


def _normalize_torchscript_keys(state: Dict[str, np.ndarray],
                                layers: int) -> Dict[str, np.ndarray]:
    """Map OUR TorchNeRF mirror names back to reference names if needed
    (containers we exported then re-imported)."""
    if not any(k.startswith("trunk.") for k in state):
        return state
    out = {}
    inv = {
        "sigma_head": "sigma",
        "trunk_final": "xyz_encoding_final",
        "rgb_head": "rgb",
        "appearance": "embedding_a",
        "affine": "affine",
    }
    for k, v in state.items():
        if k.startswith("trunk."):
            _, i, p = k.split(".")
            out[f"xyz_encodings.{i}.0.{p}"] = v
        elif k.startswith("dir_a."):
            out[k.replace("dir_a.", "dir_a_encoding.0.")] = v
        else:
            head = k.split(".")[0]
            out[k.replace(head, inv[head], 1)] = v
    return out


def container_to_bundles(
    data: ContainerData, hparams: Namespace
) -> Tuple[ModelBundle, Optional[ModelBundle]]:
    """ContainerData -> (fg_bundle, bg_bundle) with stacked pretrained params
    attached as `.pretrained_params` (reference `model_utils.py:22-29`)."""
    boundary_margin = getattr(hparams, "boundary_margin", 1.15)
    cluster_dim_start = 1 if data.cluster_2d else 0

    def build(states, xyz_dim, layer_dim, xyz_real):
        states = [
            _normalize_torchscript_keys(s, getattr(hparams, "layers", 8))
            for s in states
        ]
        appearance_count = max(
            (appearance_count_from_state(s) for s in states), default=0
        )
        cfg = nerf_config_from_hparams(
            hparams, appearance_count or 1, layer_dim, xyz_dim
        )
        # Honor the container's own architecture flags (the reference's
        # model_utils consumes them, model_utils.py:22-29): a container
        # trained without viewdirs / appearance must load even when the CLI
        # is left at defaults (pos_dir_dim=4, appearance_dim=48).
        overrides = {}
        if not data.need_viewdir and cfg.pos_dir_dim > 0:
            overrides["pos_dir_dim"] = 0
        if not data.need_appearance_embedding and cfg.appearance_dim > 0:
            overrides["appearance_dim"] = 0
        if overrides:
            cfg = dataclasses.replace(cfg, **overrides)
        module = NeRF(cfg)
        stacked = jax.tree.map(
            lambda *xs: np.stack(xs),
            *[flax_params_from_torch_state(cfg, s) for s in states],
        )
        bundle = ModelBundle(
            module=module,
            config=cfg,
            cascade=False,
            centroids=np.asarray(data.centroids, np.float32),
            boundary_margin=boundary_margin,
            cluster_dim_start=cluster_dim_start,
            xyz_real=xyz_real,
            routing=getattr(hparams, "mega_routing", "auto"),
            routing_max_experts=getattr(hparams, "routing_max_experts", 4),
        )
        bundle.pretrained_params = jax.tree.map(lambda x: np.asarray(x), stacked)
        return bundle

    fg = build(data.fg_states, 3, getattr(hparams, "layer_dim", 256), False)
    bg = None
    if data.bg_states:
        bg = build(
            data.bg_states, 4, getattr(hparams, "bg_layer_dim", 256), True
        )
    return fg, bg
