"""Checkpoint save/restore with full RNG and data-stream state.

Parity target: reference `runner.py:519-538` (_save_checkpoint) +
`runner.py:42-50,173-188` (restore). A checkpoint captures: model params
(fg + optional bg), optimizer states, iteration, the jax PRNG key, the numpy
bit-generator state, and the dataset stream position — enough for bitwise
resume like the reference's torch/np/random RNG triple.

Format: a directory-free single file — flax msgpack for the array pytree +
pickle for the aux python state, concatenated with a small header. Written
atomically (tmp + rename).
"""

from __future__ import annotations

import pickle
import struct
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import numpy as np
from flax import serialization

_MAGIC = b"MNTPU001"


def is_native_checkpoint(path) -> bool:
    """True for our MNTPU001 format; False for anything else (e.g. the
    reference's torch `{iter}.pt` training checkpoints, which Runner also
    accepts via --ckpt_path)."""
    try:
        with open(path, "rb") as f:
            return f.read(len(_MAGIC)) == _MAGIC
    except OSError:
        return False


def save_checkpoint(path, array_state: Any, aux_state: Dict[str, Any]) -> None:
    """array_state: pytree of arrays (params/opt); aux_state: picklable dict."""
    path = Path(path)
    packed = serialization.to_bytes(array_state)
    aux = pickle.dumps(aux_state)
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<QQ", len(packed), len(aux)))
        f.write(packed)
        f.write(aux)
    tmp.rename(path)


def load_checkpoint(path, array_template: Any) -> Tuple[Any, Dict[str, Any]]:
    """Restore (array_state, aux_state); template supplies pytree structure."""
    path = Path(path)
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        assert magic == _MAGIC, f"not a mega_nerf_tpu checkpoint: {path}"
        n_packed, n_aux = struct.unpack("<QQ", f.read(16))
        packed = f.read(n_packed)
        aux = f.read(n_aux)
    array_state = serialization.from_bytes(array_template, packed)
    return array_state, pickle.loads(aux)


def load_checkpoint_raw(path) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Restore (array_state_as_nested_dict, aux_state) WITHOUT a pytree
    template — shapes/dtypes come from the msgpack payload itself. Dataclass
    pytrees (e.g. TrainState) come back as plain nested dicts."""
    path = Path(path)
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        assert magic == _MAGIC, f"not a mega_nerf_tpu checkpoint: {path}"
        n_packed, n_aux = struct.unpack("<QQ", f.read(16))
        packed = f.read(n_packed)
        aux = f.read(n_aux)
    return serialization.msgpack_restore(packed), pickle.loads(aux)


def load_checkpoint_aux(path) -> Dict[str, Any]:
    """Read only the aux (python) state without needing an array template."""
    path = Path(path)
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        assert magic == _MAGIC, f"not a mega_nerf_tpu checkpoint: {path}"
        n_packed, n_aux = struct.unpack("<QQ", f.read(16))
        f.seek(n_packed, 1)
        aux = f.read(n_aux)
    return pickle.loads(aux)


def rng_state_to_aux(key: np.ndarray, np_rng: np.random.Generator) -> Dict[str, Any]:
    return {
        "jax_key_data": np.asarray(key),
        "np_rng_state": np_rng.bit_generator.state,
    }


def rng_state_from_aux(aux: Dict[str, Any]) -> Tuple[Optional[np.ndarray], Optional[np.random.Generator]]:
    key = aux.get("jax_key_data")
    rng = None
    if "np_rng_state" in aux:
        rng = np.random.default_rng()
        rng.bit_generator.state = aux["np_rng_state"]
    return key, rng
