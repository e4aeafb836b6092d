"""Model fusion: merge per-submodule experiment checkpoints into a container.

Parity target: reference `scripts/merge_submodules.py`. For each centroid i,
finds the newest experiment version under `{ckpt_prefix}{i}/` containing a
`models/{train_iterations}` checkpoint, loads the fg (and bg) weights, and
assembles a MegaNeRF container with the centroid metadata from
create_cluster_masks' params.pt. Reads both our `.ckpt` checkpoints and the
reference's torch `{iter}.pt` checkpoints; writes the native container plus
(with `--torchscript`) the viewer-compatible TorchScript format. Ends with
the same smoke test: a forward pass on a ones-input through the merged
mixture.
"""

from __future__ import annotations

import sys
from argparse import Namespace
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax.numpy as jnp

from mega_nerf_tpu.data.torch_io import load_pt
from mega_nerf_tpu.models.container import (
    ContainerData,
    container_to_bundles,
    save_native_container,
    save_torchscript_container,
)
from mega_nerf_tpu.models.factory import nerf_config_from_hparams
from mega_nerf_tpu.models.torch_interop import (
    appearance_count_from_state,
    strip_module_prefix,
    torch_state_from_flax_params,
)
from mega_nerf_tpu.opts import get_opts_base, parse_opts


def _get_merge_opts() -> Namespace:
    parser = get_opts_base()
    parser.add_argument('--ckpt_prefix', type=str, required=True)
    parser.add_argument('--centroid_path', type=str, required=True)
    parser.add_argument('--output', type=str, required=True)
    parser.add_argument('--torchscript', default=False, action='store_true',
                        help='also write a TorchScript container for the viewer')
    return parse_opts(parser, known_only=True)


def load_submodule_states(checkpoint_path: Path, hparams: Namespace):
    """-> (fg_state, bg_state | None) as torch-named numpy dicts, from either
    our .ckpt format or a reference torch checkpoint."""
    if checkpoint_path.suffix == ".ckpt":
        from mega_nerf_tpu.runtime import checkpoints as ckpt_io

        raw, _ = ckpt_io.load_checkpoint_raw(checkpoint_path)
        fg_params = raw["fg_params"]
        bg_params = raw.get("bg_params")
        # Shapes come from the payload; configs only describe structure.
        appearance_count = 1
        if hparams.appearance_dim > 0:
            emb = (fg_params.get("appearance") or
                   fg_params.get("fine", {}).get("appearance"))
            appearance_count = int(np.asarray(emb["embedding"]).shape[0])
        cascade = hparams.use_cascade
        fg_cfg = nerf_config_from_hparams(
            hparams, appearance_count, hparams.layer_dim, 3
        )
        fg_state = torch_state_from_flax_params(fg_cfg, fg_params, cascade)
        bg_state = None
        if bg_params:
            bg_cfg = nerf_config_from_hparams(
                hparams, appearance_count, hparams.bg_layer_dim, 4
            )
            bg_state = torch_state_from_flax_params(bg_cfg, bg_params, cascade)
        return fg_state, bg_state

    loaded = load_pt(checkpoint_path)
    fg_state = strip_module_prefix(loaded["model_state_dict"])
    bg_state = (
        strip_module_prefix(loaded["bg_model_state_dict"])
        if "bg_model_state_dict" in loaded
        else None
    )
    return fg_state, bg_state


def find_checkpoint(centroid_path: Path, train_iterations: int) -> Path:
    """Newest version dir containing the final-iteration checkpoint
    (reference `merge_submodules.py:33-46`); tries our .ckpt then .pt."""
    if not centroid_path.exists():
        raise Exception(f"{centroid_path} not found")
    versions = sorted(
        (int(x.name) for x in centroid_path.iterdir() if x.name.isdigit()),
        reverse=True,
    )
    for version in versions:
        for suffix in (".ckpt", ".pt"):
            ckpt = (
                centroid_path / str(version) / "models"
                / f"{train_iterations}{suffix}"
            )
            if ckpt.exists():
                return ckpt
    raise Exception(
        f"Could not find {train_iterations}.ckpt/.pt in {centroid_path}"
    )


def main(hparams: Namespace) -> None:
    ckpt_prefix = Path(hparams.ckpt_prefix)
    centroid_metadata = load_pt(hparams.centroid_path)
    centroids = np.asarray(centroid_metadata["centroids"], np.float32)

    fg_states, bg_states = [], []
    for i in range(len(centroids)):
        centroid_path = ckpt_prefix.parent / f"{ckpt_prefix.name}{i}"
        ckpt = find_checkpoint(centroid_path, hparams.train_iterations)
        print(f"centroid {i}: {ckpt}")
        fg_state, bg_state = load_submodule_states(ckpt, hparams)
        fg_states.append(fg_state)
        if bg_state is not None:
            bg_states.append(bg_state)

    data = ContainerData(
        centroids=centroids,
        grid_dim=tuple(int(x) for x in centroid_metadata["grid_dim"]),
        min_position=np.asarray(centroid_metadata["min_position"], np.float32),
        max_position=np.asarray(centroid_metadata["max_position"], np.float32),
        need_viewdir=hparams.pos_dir_dim > 0,
        need_appearance_embedding=hparams.appearance_dim > 0,
        cluster_2d=bool(centroid_metadata["cluster_2d"]),
        fg_states=fg_states,
        bg_states=bg_states,
    )
    save_native_container(hparams.output, data)
    print(f"Wrote native container to {hparams.output}")
    if hparams.torchscript:
        ts_path = str(hparams.output) + ".ts"
        save_torchscript_container(ts_path, data, hparams)
        print(f"Wrote TorchScript container to {ts_path}")

    # Smoke test (reference merge_submodules.py:80-97): ones-input forward
    # through the merged mixture.
    fg, bg = container_to_bundles(data, hparams)
    xyz = jnp.ones((1, 3))
    dirs = jnp.ones((1, 3)) if hparams.pos_dir_dim > 0 else None
    idx = (
        jnp.zeros((1,), jnp.int32) if hparams.appearance_dim > 0 else None
    )
    out = fg.apply(fg.pretrained_params, "fine", xyz, dirs, idx)
    print(f"fg test eval: {out}")
    if bg is not None:
        bg_xyz = jnp.ones((1, 7))
        out = bg.apply(bg.pretrained_params, "fine", bg_xyz, dirs, idx)
        print(f"bg test eval: {out}")


if __name__ == '__main__':
    main(_get_merge_opts())
