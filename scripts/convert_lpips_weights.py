"""Convert published LPIPS weights to the framework's per-net .npz format.

The reference evaluates LPIPS through the `lpips` pip package, which bundles
the linear-head calibration weights and downloads torchvision backbones
(reference `mega_nerf/metrics.py:13-26`). This image has no network egress,
so the weights must be converted on a machine that has them and dropped into
`mega_nerf_tpu/ops/lpips_weights/{net}.npz` (or a dir pointed to by
MEGA_NERF_TPU_LPIPS_WEIGHTS):

    python scripts/convert_lpips_weights.py --net vgg --out lpips_weights/

Key contract (asserted by ops/lpips.py::validate_weights): torchvision
backbone state-dict names verbatim (`features.{i}.weight/bias`, Fire modules
as `features.{i}.{squeeze,expand1x1,expand3x3}.*`) plus `lin.{i}.weight` for
the LPIPS heads. tests/test_lpips.py pins this contract against a torch
replica, so converted real weights slot in unchanged.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from mega_nerf_tpu.ops.lpips import expected_keys

_TORCHVISION_CTORS = {
    "vgg": ("vgg16", "VGG16_Weights.IMAGENET1K_V1"),
    "alex": ("alexnet", "AlexNet_Weights.IMAGENET1K_V1"),
    "squeeze": ("squeezenet1_1", "SqueezeNet1_1_Weights.IMAGENET1K_V1"),
}


def convert(net: str, out_dir: Path) -> Path:
    import lpips as lpips_pkg  # noqa: F401  (provides the lin weights)
    import torch
    import torchvision

    model_name, weights_enum = _TORCHVISION_CTORS[net]
    backbone = getattr(torchvision.models, model_name)(weights="IMAGENET1K_V1")
    state = {
        k: v.detach().cpu().numpy()
        for k, v in backbone.state_dict().items()
        if k.startswith("features.")
    }

    lin_model = lpips_pkg.LPIPS(net=net).eval()
    for i, lin in enumerate(lin_model.lins):
        # lins.{i}.model = Sequential(Dropout, Conv2d) -> take the conv.
        state[f"lin.{i}.weight"] = (
            lin.model[1].weight.detach().cpu().numpy()
        )

    expected = expected_keys(net)
    state = {k: v for k, v in state.items() if k in expected}
    missing = sorted(set(expected) - set(state))
    assert not missing, f"missing keys after conversion: {missing}"
    for k, shape in expected.items():
        assert tuple(state[k].shape) == shape, (k, state[k].shape, shape)

    out_dir.mkdir(parents=True, exist_ok=True)
    out = out_dir / f"{net}.npz"
    np.savez(out, **{k: np.asarray(v, np.float32) for k, v in state.items()})
    print(f"wrote {out} ({len(state)} arrays)")
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--net", choices=["vgg", "alex", "squeeze", "all"],
                    default="all")
    ap.add_argument("--out", type=str,
                    default=str(Path(__file__).parent.parent
                                / "mega_nerf_tpu/ops/lpips_weights"))
    args = ap.parse_args()
    nets = ["vgg", "alex", "squeeze"] if args.net == "all" else [args.net]
    for net in nets:
        convert(net, Path(args.out))
