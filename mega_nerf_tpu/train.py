"""Training entry point: `python -m mega_nerf_tpu.train --config_file ...`.

Parity target: reference `mega_nerf/train.py`. `--detect_anomalies` maps to
jax's nan debugging instead of torch autograd anomaly mode.
"""

from __future__ import annotations

from argparse import Namespace

import jax

from mega_nerf_tpu.opts import get_opts_base, parse_opts
from mega_nerf_tpu.runtime.runner import Runner


def _get_train_opts() -> Namespace:
    parser = get_opts_base()
    parser.add_argument('--exp_name', type=str, required=True,
                        help='experiment name')
    parser.add_argument('--dataset_path', type=str, required=True)
    return parse_opts(parser)


def main(hparams: Namespace) -> None:
    if hparams.detect_anomalies:
        jax.config.update("jax_debug_nans", True)
    Runner(hparams).train()


if __name__ == '__main__':
    main(_get_train_opts())
