"""Scriptable torch mirror of the NeRF MLP — the container interchange shim.

The Mega-NeRF-Dynamic viewer ecosystem consumes merged models as TorchScript
modules (`torch.jit.save` of a container whose `sub_module_{i}` children take
the packed `[xyz | dirs? | img_idx?]` input, reference
`merge_submodules.py:70-77`). To export our Flax-trained weights into that
world we need a torch module with the same forward *semantics*; this is that
module, written for torch.jit.script on CPU.

It is an export/import shim only — no training, no device code; the JAX
models in `mega_nerf_tpu.models.nerf` are the real implementation.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import torch
import torch.nn.functional as F
from torch import nn

from mega_nerf_tpu.models.nerf import NeRFConfig


class TorchNeRF(nn.Module):
    def __init__(
        self,
        pos_xyz_dim: int,
        pos_dir_dim: int,
        layers: int,
        skip_layers: List[int],
        layer_dim: int,
        appearance_dim: int,
        affine_appearance: bool,
        appearance_count: int,
        rgb_dim: int,
        xyz_dim: int,
        shifted_softplus: bool,
        ref_packed_dirs: bool = False,
    ):
        super().__init__()
        self.xyz_dim = xyz_dim
        self.pos_xyz_dim = pos_xyz_dim
        self.pos_dir_dim = pos_dir_dim
        self.skip_layers = skip_layers
        self.shifted_softplus = shifted_softplus
        self.affine_appearance = affine_appearance
        self.rgb_dim = rgb_dim
        self.has_appearance_input = appearance_dim > 0
        # Column range of the view direction in the packed input. Proper
        # packing puts dirs right after xyz; the reference quirk
        # (nerf.py:146) reads x[:, -4:-1], which for appearance-less models
        # shifts one column left. See NeRFConfig.ref_packed_dirs.
        if ref_packed_dirs and appearance_dim == 0:
            self.dir_start = xyz_dim - 1
        else:
            self.dir_start = xyz_dim

        in_xyz = xyz_dim * (1 + 2 * pos_xyz_dim)
        trunk = []
        for i in range(layers):
            if i == 0:
                trunk.append(nn.Linear(in_xyz, layer_dim))
            elif i in skip_layers:
                trunk.append(nn.Linear(layer_dim + in_xyz, layer_dim))
            else:
                trunk.append(nn.Linear(layer_dim, layer_dim))
        self.trunk = nn.ModuleList(trunk)
        self.sigma_head = nn.Linear(layer_dim, 1)

        self.use_dir_branch = pos_dir_dim > 0 or (
            appearance_dim > 0 and not affine_appearance
        )
        in_dir = 3 * (1 + 2 * pos_dir_dim) if pos_dir_dim > 0 else 0
        embed_in_branch = appearance_dim if (
            appearance_dim > 0 and not affine_appearance
        ) else 0
        if self.use_dir_branch:
            self.trunk_final = nn.Linear(layer_dim, layer_dim)
            self.dir_a = nn.Linear(layer_dim + in_dir + embed_in_branch,
                                   layer_dim // 2)
            self.rgb_head = nn.Linear(layer_dim // 2, rgb_dim)
        else:
            self.trunk_final = nn.Linear(1, 1)  # unused placeholder
            self.dir_a = nn.Linear(1, 1)
            self.rgb_head = nn.Linear(layer_dim, rgb_dim)

        self.has_appearance = appearance_dim > 0
        if appearance_dim > 0:
            self.appearance = nn.Embedding(appearance_count, appearance_dim)
        else:
            self.appearance = nn.Embedding(1, 1)  # unused placeholder
        if affine_appearance:
            self.affine = nn.Linear(appearance_dim, 12)
        else:
            self.affine = nn.Linear(1, 1)  # unused placeholder

    def _encode(self, x: torch.Tensor, num_freqs: int) -> torch.Tensor:
        out = [x]
        for k in range(num_freqs):
            f = float(2 ** k)
            out.append(torch.sin(f * x))
            out.append(torch.cos(f * x))
        return torch.cat(out, -1)

    def forward(self, x: torch.Tensor, sigma_only: bool = False,
                sigma_noise: Optional[torch.Tensor] = None) -> torch.Tensor:
        h = self._encode(x[:, : self.xyz_dim], self.pos_xyz_dim)
        enc = h
        for i, layer in enumerate(self.trunk):
            if i in self.skip_layers:
                h = torch.cat([enc, h], -1)
            h = F.relu(layer(h))

        sigma = self.sigma_head(h)
        if sigma_noise is not None:
            sigma = sigma + sigma_noise
        if self.shifted_softplus:
            sigma = F.softplus(sigma - 1)
        else:
            sigma = F.relu(sigma)
        if sigma_only:
            return sigma

        if self.use_dir_branch:
            branch = [self.trunk_final(h)]
            if self.pos_dir_dim > 0:
                branch.append(
                    self._encode(
                        x[:, self.dir_start : self.dir_start + 3],
                        self.pos_dir_dim,
                    )
                )
            if self.has_appearance and not self.affine_appearance:
                branch.append(self.appearance(x[:, -1].long()))
            rgb = self.rgb_head(F.relu(self.dir_a(torch.cat(branch, -1))))
        else:
            rgb = self.rgb_head(h)

        if self.affine_appearance and self.has_appearance:
            t = self.affine(self.appearance(x[:, -1].long())).view(-1, 3, 4)
            rgb = (t[:, :, :3] @ rgb.unsqueeze(-1) + t[:, :, 3:]).squeeze(-1)

        if self.rgb_dim == 3:
            rgb = torch.sigmoid(rgb)
        return torch.cat([rgb, sigma], -1)


# Rename map: our torch-mirror param names <- reference torch state names.
def _mirror_key(ref_key: str, layers: int) -> str:
    if ref_key.startswith("xyz_encodings."):
        parts = ref_key.split(".")
        return f"trunk.{parts[1]}.{parts[3]}"
    return {
        "sigma.weight": "sigma_head.weight",
        "sigma.bias": "sigma_head.bias",
        "xyz_encoding_final.weight": "trunk_final.weight",
        "xyz_encoding_final.bias": "trunk_final.bias",
        "dir_a_encoding.0.weight": "dir_a.weight",
        "dir_a_encoding.0.bias": "dir_a.bias",
        "rgb.weight": "rgb_head.weight",
        "rgb.bias": "rgb_head.bias",
        "embedding_a.weight": "appearance.weight",
        "affine.weight": "affine.weight",
        "affine.bias": "affine.bias",
    }[ref_key]


def torch_nerf_from_state(
    cfg: NeRFConfig, state: Dict[str, np.ndarray]
) -> TorchNeRF:
    """Build a TorchNeRF mirror and load reference-named weights into it."""
    model = TorchNeRF(
        cfg.pos_xyz_dim, cfg.pos_dir_dim, cfg.layers, list(cfg.skip_layers),
        cfg.layer_dim, cfg.appearance_dim, cfg.affine_appearance,
        cfg.appearance_count, cfg.rgb_dim, cfg.xyz_dim, cfg.shifted_softplus,
        cfg.ref_packed_dirs,
    )
    renamed = {
        _mirror_key(k, cfg.layers): torch.from_numpy(
            np.ascontiguousarray(np.asarray(v, dtype=np.float32))
        )
        for k, v in state.items()
    }
    missing, unexpected = model.load_state_dict(renamed, strict=False)
    # Placeholders (unused trunk_final/dir_a/appearance/affine) may stay
    # at init; everything present in `state` must land.
    assert not unexpected, unexpected
    return model.eval()
