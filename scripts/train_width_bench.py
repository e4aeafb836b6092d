"""Training-throughput sweep over trunk widths (single chip).

Measures the same donated chained train step as the driver's `bench.py`
but at the non-flagship model families (reference `configs/`):
8x512 (25-submodule family), 8x2048 (`mega-nerf-dense` / `nerf` families,
reference `opts.py --layer_dim`). Purpose: back the fused-kernel VMEM
gate (`render/pallas_mlp.py::supports_fused_kernels`) with measured
numbers and an MXU-utilization estimate, so "XLA is/isn't at roofline at
8x2048" is a profiler-backed finding rather than a guess.

The per-ray train FLOP estimate counts the fg trunk/heads (and bg when
enabled) at fwd+bwd ~= 3x fwd, times coarse+fine points per ray — the
utilization column is that estimate divided by the v5e bf16 peak
(197 TFLOP/s).

Usage: python scripts/train_width_bench.py [--widths 512 2048]
       [--batch 512] [--coarse 256] [--fine 512] [--no_bg] [--pallas auto]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

V5E_BF16_PEAK_TFLOPS = 197.0


def train_flops_per_ray(width: int, coarse: int, fine: int,
                        with_bg: bool) -> float:
    """fwd+bwd FLOPs per ray for the 8-layer skip-trunk NeRF at `width`."""
    enc = 128  # packed frequency-encode tile feeding the first layer

    def fwd_per_point(d: int) -> float:
        trunk = (
            2 * enc * d          # layer 1: enc -> d
            + 6 * 2 * d * d      # layers 2-8 minus the skip layer
            + 2 * (d + enc) * d  # skip layer: concat(enc, h) -> d
        )
        heads = 2 * d * d + 2 * (d + enc) * (d // 2) + 2 * (d // 2) * 3
        return trunk + heads

    pts = coarse + fine
    per_point = fwd_per_point(width) * 3.0  # bwd ~= 2x fwd
    total = pts * per_point
    if with_bg:
        # NeRF++ background: same trunk at bg_layer_dim == width, its own
        # sample counts — render_rays runs the bg model hierarchically too:
        # a coarse pass at coarse_samples//2 plus (when fine_samples > 0) a
        # fine pass at fine_samples//2 points per ray (rendering.py:674).
        bg_pts = coarse // 2 + (fine // 2 if fine > 0 else 0)
        total += bg_pts * per_point
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--widths", type=int, nargs="+", default=[512, 2048])
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--coarse", type=int, default=256)
    ap.add_argument("--fine", type=int, default=512)
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--no_bg", action="store_true")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize MLP activations in the backward "
                         "pass — required to fit the 8x2048 fg+bg family "
                         "(mega-nerf-dense) in 16 GB HBM at batch 512")
    ap.add_argument("--pallas", type=str, default="auto",
                    choices=["auto", "true", "false"])
    args = ap.parse_args()

    from bench import run_bench_steps

    use_pallas = {"auto": "auto", "true": True, "false": False}[args.pallas]
    rows = []
    for width in args.widths:
        rays_per_sec = run_bench_steps(
            batch_size=args.batch, n_steps=args.steps, use_pallas=use_pallas,
            layer_dim=width, coarse_samples=args.coarse,
            fine_samples=args.fine, with_bg=not args.no_bg,
            remat=args.remat,
        )
        fpr = train_flops_per_ray(width, args.coarse, args.fine,
                                  not args.no_bg)
        tflops = rays_per_sec * fpr / 1e12
        rows.append({
            "width": width,
            "rays_per_sec": round(rays_per_sec, 1),
            "est_tflops": round(tflops, 1),
            "est_mxu_util": round(tflops / V5E_BF16_PEAK_TFLOPS, 3),
        })
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"metric": "train_width_sweep", "batch": args.batch,
                      "coarse": args.coarse, "fine": args.fine,
                      "bg": not args.no_bg, "rows": rows}))


if __name__ == "__main__":
    main()
