"""Bidirectional parameter conversion: Flax trees <-> reference torch naming.

The reference serializes everything as torch state dicts with the module
naming of `mega_nerf/models/nerf.py` (xyz_encodings.{i}.0.weight, sigma.*,
xyz_encoding_final.*, dir_a_encoding.0.*, rgb.*, embedding_a.weight,
affine.*; Cascade prefixes coarse./fine.). Converting faithfully means:

- our framework can LOAD the reference's published training checkpoints and
  merged TorchScript containers (the real parity path — measure their
  pretrained models under our eval protocol, BASELINE.md);
- our merge tool can EXPORT containers the Mega-NeRF-Dynamic viewer
  ecosystem understands.

torch Linear stores weight as (out, in); Flax Dense kernel is (in, out) —
transposed on the way through. nn.Embed and nn.Embedding agree on
(count, dim).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from mega_nerf_tpu.models.nerf import NeRFConfig

# (flax_module, flax_param, torch_key, transpose)
_Entry = Tuple[str, str, str, bool]


def _single_entries(cfg: NeRFConfig) -> List[_Entry]:
    entries: List[_Entry] = []
    for i in range(cfg.layers):
        entries.append((f"trunk_{i}", "kernel", f"xyz_encodings.{i}.0.weight", True))
        entries.append((f"trunk_{i}", "bias", f"xyz_encodings.{i}.0.bias", False))
    entries.append(("sigma", "kernel", "sigma.weight", True))
    entries.append(("sigma", "bias", "sigma.bias", False))
    if cfg.uses_dir_branch:
        entries.append(("trunk_final", "kernel", "xyz_encoding_final.weight", True))
        entries.append(("trunk_final", "bias", "xyz_encoding_final.bias", False))
        entries.append(("dir_a", "kernel", "dir_a_encoding.0.weight", True))
        entries.append(("dir_a", "bias", "dir_a_encoding.0.bias", False))
    entries.append(("rgb", "kernel", "rgb.weight", True))
    entries.append(("rgb", "bias", "rgb.bias", False))
    if cfg.appearance_dim > 0:
        entries.append(("appearance", "embedding", "embedding_a.weight", False))
    if cfg.affine_appearance:
        entries.append(("affine", "kernel", "affine.weight", True))
        entries.append(("affine", "bias", "affine.bias", False))
    return entries


def flax_params_from_torch_state(
    cfg: NeRFConfig, state: Dict[str, np.ndarray], cascade: bool = False
) -> Dict:
    """torch state dict (numpy values, `module.` prefix already stripped) ->
    Flax params tree matching our NeRF/Cascade modules."""

    def build(prefix: str) -> Dict:
        params: Dict[str, Dict[str, np.ndarray]] = {}
        for mod, name, torch_key, transpose in _single_entries(cfg):
            arr = np.asarray(state[prefix + torch_key], dtype=np.float32)
            if transpose:
                arr = arr.T
            params.setdefault(mod, {})[name] = arr
        return params

    if cascade:
        return {"coarse": build("coarse."), "fine": build("fine.")}
    return build("")


def torch_state_from_flax_params(
    cfg: NeRFConfig, params: Dict, cascade: bool = False
) -> Dict[str, np.ndarray]:
    """Flax params tree -> torch-named state dict of numpy arrays."""

    def emit(tree: Dict, prefix: str, out: Dict[str, np.ndarray]) -> None:
        for mod, name, torch_key, transpose in _single_entries(cfg):
            arr = np.asarray(tree[mod][name], dtype=np.float32)
            if transpose:
                arr = arr.T
            out[prefix + torch_key] = np.ascontiguousarray(arr)

    out: Dict[str, np.ndarray] = {}
    if cascade:
        emit(params["coarse"], "coarse.", out)
        emit(params["fine"], "fine.", out)
    else:
        emit(params, "", out)
    return out


def strip_module_prefix(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Drop DDP's 'module.' prefix (reference handles this at every load
    site, e.g. `model_utils.py:47`)."""
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in state.items()
    }


def appearance_count_from_state(state: Dict[str, np.ndarray]) -> int:
    for key in ("embedding_a.weight", "coarse.embedding_a.weight"):
        if key in state:
            return int(np.asarray(state[key]).shape[0])
    return 0
