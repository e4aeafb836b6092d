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


def adam_state_from_torch_opt(
    cfg: NeRFConfig,
    param_names: List[str],
    torch_opt: Dict,
    template_opt_state,
    cascade: bool = False,
):
    """Reference torch Adam `state_dict()` -> optax opt state.

    The reference checkpoints `checkpoint['optimizers']['nerf'|'bg_nerf']`
    (reference `runner.py:519-538`, loaded at `runner.py:181-184`). Torch
    keys moments by PARAM INDEX in `model.parameters()` order, which equals
    the state-dict key order for the reference NeRF (it registers no
    buffers) — so `param_names` (the checkpoint's model_state_dict keys,
    `module.` prefix stripped) positionally names each moment entry, and
    the same name->Flax-tree conversion used for weights transposes
    exp_avg/exp_avg_sq into mu/nu (moments share their param's layout).

    `template_opt_state` must come from `optimizer.init(params)` for the
    matching architecture; its ScaleByAdamState is replaced with the
    imported count/mu/nu and any schedule counts are set to the Adam step
    so the per-step exponential LR decay resumes where the reference job
    left off. Non-transferable remainder of the reference training state:
    the torch/numpy/python RNG triple (reference `runner.py:526-528`) has
    no jax equivalent — resumed runs draw fresh sample jitter.
    """
    import jax.numpy as jnp
    import optax

    indices: List[int] = []
    for group in torch_opt.get("param_groups", []):
        indices.extend(int(i) for i in group.get("params", []))
    state = torch_opt.get("state", {})

    exp_avg: Dict[str, np.ndarray] = {}
    exp_avg_sq: Dict[str, np.ndarray] = {}
    steps: List[int] = []
    for pos, idx in enumerate(indices):
        if pos >= len(param_names):
            raise ValueError(
                f"torch optimizer has {len(indices)} params but the model "
                f"state dict only names {len(param_names)}"
            )
        name = param_names[pos]
        entry = state.get(idx, state.get(str(idx)))
        if entry is None:
            raise ValueError(
                f"torch optimizer state missing param {idx} ({name}) — "
                "was this checkpoint saved before any optimizer step?"
            )
        exp_avg[name] = np.asarray(entry["exp_avg"], np.float32)
        exp_avg_sq[name] = np.asarray(entry["exp_avg_sq"], np.float32)
        steps.append(int(np.asarray(entry["step"]).item()))

    count = jnp.asarray(max(steps) if steps else 0, jnp.int32)
    mu = flax_params_from_torch_state(cfg, exp_avg, cascade)
    nu = flax_params_from_torch_state(cfg, exp_avg_sq, cascade)

    def convert(element):
        if isinstance(element, optax.ScaleByAdamState):
            return element._replace(count=count, mu=mu, nu=nu)
        if isinstance(element, optax.ScaleByScheduleState):
            return element._replace(count=count)
        return element

    if isinstance(template_opt_state, tuple) and not hasattr(
        template_opt_state, "_fields"
    ):
        return tuple(convert(e) for e in template_opt_state)
    return convert(template_opt_state)
