"""Wrap a single checkpoint as a one-submodule container (centroid at origin).

Parity target: reference `scripts/convert_to_container.py`.
"""

from __future__ import annotations

import sys
from argparse import Namespace
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax.numpy as jnp

from mega_nerf_tpu.models.container import (
    ContainerData,
    container_to_bundles,
    save_native_container,
    save_torchscript_container,
)
from mega_nerf_tpu.opts import get_opts_base, parse_opts


def _get_convert_opts() -> Namespace:
    parser = get_opts_base()
    parser.add_argument('--output', type=str, required=True)
    parser.add_argument('--torchscript', default=False, action='store_true')
    return parse_opts(parser, known_only=True)


def main(hparams: Namespace) -> None:
    from scripts.merge_submodules import load_submodule_states

    assert hparams.ckpt_path is not None
    fg_state, bg_state = load_submodule_states(Path(hparams.ckpt_path), hparams)

    data = ContainerData(
        centroids=np.zeros((1, 3), np.float32),
        grid_dim=(1, 1),
        min_position=np.zeros(3, np.float32),
        max_position=np.ones(3, np.float32),
        need_viewdir=hparams.pos_dir_dim > 0,
        need_appearance_embedding=hparams.appearance_dim > 0,
        cluster_2d=False,
        fg_states=[fg_state],
        bg_states=[bg_state] if bg_state is not None else [],
    )
    save_native_container(hparams.output, data)
    print(f"Wrote native container to {hparams.output}")
    if hparams.torchscript:
        save_torchscript_container(str(hparams.output) + ".ts", data, hparams)
        print(f"Wrote TorchScript container to {hparams.output}.ts")

    fg, bg = container_to_bundles(data, hparams)
    dirs = jnp.ones((1, 3)) if hparams.pos_dir_dim > 0 else None
    idx = jnp.zeros((1,), jnp.int32) if hparams.appearance_dim > 0 else None
    print(f"fg test eval: {fg.apply(fg.pretrained_params, 'fine', jnp.ones((1, 3)), dirs, idx)}")
    if bg is not None:
        print(f"bg test eval: {bg.apply(bg.pretrained_params, 'fine', jnp.ones((1, 7)), dirs, idx)}")


if __name__ == '__main__':
    main(_get_convert_opts())
