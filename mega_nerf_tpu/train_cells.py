"""One-program multi-submodule training entry point.

The TPU-native replacement for the reference's parscript fan-out
(`/root/reference/parscripts/run_8.txt`: one `train.py` process per
submodule per GPU). All K submodules train in ONE SPMD program over a
(cell, data) device mesh; per-cell checkpoints land in the
`{exp_name}{i}/{version}/models/` layout that `scripts/merge_submodules.py`
consumes.

    python -m mega_nerf_tpu.train_cells \
        --config_file configs/mega-nerf/rubble.yaml \
        --exp_name exps/rubble-sub --dataset_path ... \
        --cluster_mask_path masks_root --cell_axis 8 --data_axis 4

`--cluster_mask_path` is the masks ROOT (params.pt + per-cell dirs 0..K-1);
`--exp_name` is the per-cell prefix (cell i writes `{exp_name}{i}/`).
"""

from argparse import Namespace

from mega_nerf_tpu.opts import get_opts_base, parse_opts
from mega_nerf_tpu.runtime.cell_runner import CellRunner


def _get_train_opts() -> Namespace:
    parser = get_opts_base()
    parser.add_argument(
        "--exp_name", type=str, required=True,
        help="per-cell experiment prefix: cell i writes {exp_name}{i}/"
    )
    parser.add_argument("--dataset_path", type=str, required=True)
    return parse_opts(parser)


def main(hparams: Namespace) -> None:
    assert hparams.cluster_mask_path is not None, (
        "cell-parallel training needs --cluster_mask_path (the masks root "
        "written by scripts/create_cluster_masks.py)"
    )
    if hparams.detect_anomalies:
        import jax

        jax.config.update("jax_debug_nans", True)
    CellRunner(hparams).train()


if __name__ == "__main__":
    main(_get_train_opts())
