"""Config/flag system: argparse layered under YAML config files.

Parity target: reference `mega_nerf/opts.py` (configargparse +
YAMLConfigFileParser). Same flag surface and defaults, same config-file
semantics: keys in the YAML are long option names (including negated
store_false flags like `no_bg_nerf: true`), CLI flags override the file.
Implemented on stdlib argparse + pyyaml so no extra dependency is needed.

TPU-specific additions (not in the reference): `--compute_dtype` selects the
MXU matmul precision (bfloat16/float32; replaces torch AMP), and
`--cells_per_batch`/mesh flags configure SPMD sharding (see
`mega_nerf_tpu.parallel`).
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional

import yaml


def get_opts_base() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(add_help=True)
    parser.add_argument('--config_file', type=str, default=None,
                        help='YAML config file; keys are long option names')

    parser.add_argument('--dataset_type', type=str, default='filesystem',
                        choices=['filesystem', 'memory'])
    parser.add_argument('--chunk_paths', type=str, nargs='+', default=None,
                        help='scratch dirs for shuffled ray chunks')
    parser.add_argument('--num_chunks', type=int, default=200)
    parser.add_argument('--disk_flush_size', type=int, default=10000000)
    parser.add_argument('--train_every', type=int, default=1)

    parser.add_argument('--cluster_mask_path', type=str, default=None)

    parser.add_argument('--ckpt_path', type=str, default=None)
    parser.add_argument('--container_path', type=str, default=None)

    parser.add_argument('--near', type=float, default=1)
    parser.add_argument('--far', type=float, default=None)
    parser.add_argument('--ray_altitude_range', nargs='+', type=float, default=None)
    parser.add_argument('--coarse_samples', type=int, default=256)
    parser.add_argument('--fine_samples', type=int, default=512)

    parser.add_argument('--train_scale_factor', type=int, default=1)
    parser.add_argument('--val_scale_factor', type=int, default=4)

    parser.add_argument('--pos_xyz_dim', type=int, default=12)
    parser.add_argument('--pos_dir_dim', type=int, default=4)
    parser.add_argument('--layers', type=int, default=8)
    parser.add_argument('--skip_layers', type=int, nargs='+', default=[4])
    parser.add_argument('--layer_dim', type=int, default=256)
    parser.add_argument('--bg_layer_dim', type=int, default=256)
    parser.add_argument('--appearance_dim', type=int, default=48)
    parser.add_argument('--affine_appearance', default=False, action='store_true')

    parser.add_argument('--use_cascade', default=False, action='store_true')

    parser.add_argument('--train_mega_nerf', type=str, default=None)
    parser.add_argument('--boundary_margin', type=float, default=1.15)
    parser.add_argument('--all_val', default=False, action='store_true')
    parser.add_argument('--cluster_2d', default=False, action='store_true')

    parser.add_argument('--sh_deg', type=int, default=None)

    parser.add_argument('--no_center_pixels', dest='center_pixels',
                        default=True, action='store_false')
    parser.add_argument('--no_shifted_softplus', dest='shifted_softplus',
                        default=True, action='store_false')

    parser.add_argument('--batch_size', type=int, default=1024)
    parser.add_argument('--image_pixel_batch_size', type=int, default=64 * 1024)
    parser.add_argument('--model_chunk_size', type=int, default=32 * 1024)

    parser.add_argument('--perturb', type=float, default=1.0)
    parser.add_argument('--noise_std', type=float, default=1.0)

    parser.add_argument('--lr', type=float, default=5e-4)
    parser.add_argument('--lr_decay_factor', type=float, default=0.1)

    parser.add_argument('--no_bg_nerf', dest='bg_nerf', default=True,
                        action='store_false')

    parser.add_argument('--ellipse_scale_factor', type=float, default=1.1)
    parser.add_argument('--no_ellipse_bounds', dest='ellipse_bounds',
                        default=True, action='store_false')

    parser.add_argument('--train_iterations', type=int, default=500000)
    parser.add_argument('--val_interval', type=int, default=500001)
    parser.add_argument('--ckpt_interval', type=int, default=10000)

    parser.add_argument('--no_resume_ckpt_state', dest='resume_ckpt_state',
                        default=True, action='store_false')

    # --no_amp / --detect_anomalies accepted for CLI parity; on TPU mixed
    # precision is the bf16 compute_dtype (no GradScaler) and anomaly
    # detection is jax_debug_nans.
    parser.add_argument('--no_amp', dest='amp', default=True, action='store_false')
    parser.add_argument('--detect_anomalies', default=False, action='store_true')
    parser.add_argument('--random_seed', type=int, default=42)

    # --- TPU-native flags (new) ---
    parser.add_argument('--profile_steps', type=int, default=0,
                        help='capture a jax.profiler trace of this many train '
                             'steps (starting at step 10) into {exp}/profile')
    parser.add_argument('--ref_packed_dirs', default=False, action='store_true',
                        help='replicate the reference packed-input direction '
                             'quirk for parity with its appearance-less '
                             'pretrained models (see NeRFConfig.ref_packed_dirs)')
    parser.add_argument('--render_dispatch_depth', type=int, default=2,
                        help='image-render chunks kept in flight: the device '
                             'computes chunk i+1 while chunk i streams back '
                             'to the host (Runner.render_image). 1 = the '
                             'reference\'s serial dispatch->readback loop')
    parser.add_argument('--no_cell_cull', dest='cell_cull', default=True,
                        action='store_false',
                        help='disable exact per-chunk submodule culling for '
                             'merged MegaNeRF rendering (render/cell_cull.py: '
                             'drops submodules whose routing weight is '
                             'provably zero everywhere in a ray chunk\'s '
                             'sample box — identical images, fewer MLP '
                             'passes). Escape hatch; outputs are exact '
                             'either way')
    parser.add_argument('--bake_cell_cull', type=str, default='auto',
                        choices=['auto', 'on', 'off'],
                        help='submodule culling for the octree bake\'s point '
                             'probes (scripts/create_octree.py). Separate '
                             'from --no_cell_cull because the bake measured '
                             'the OPPOSITE way from serving: warm-cache '
                             'cull-on baked 1.39x SLOWER at K=8 (83.4 s vs '
                             '60.0 s, PERF.md round 5 — per-bucket compiles '
                             '+ param slicing outweigh the probe MLP '
                             'savings; the K=25 bake measured slower '
                             'culled as well). auto = off at every '
                             'measured K; on = opt-in')
    parser.add_argument('--occupancy_path', type=str, default=None,
                        help='baked octree .npz (scripts/create_octree.py) '
                             'to tighten each eval ray\'s fg sampling '
                             'interval to the occupied span '
                             '(render/ray_bounds.py) — an opt-in LOSSY '
                             'serving mode: reduce --coarse_samples/'
                             '--fine_samples at unchanged sampling density '
                             'and measure the PSNR delta '
                             '(scripts/occupancy_bench.py)')
    parser.add_argument('--occupancy_thresh', type=float, default=-1.0,
                        help='leaf sigma threshold when rasterizing the '
                             'occupancy grid from --occupancy_path; '
                             'negative (default) = auto: the sigma at '
                             'which one grid-voxel crossing adds 1% alpha')
    parser.add_argument('--occupancy_dilate', type=int, default=1,
                        help='6-neighbor dilation steps on the occupancy '
                             'grid (absorbs interpolation bleed at cell '
                             'boundaries)')
    parser.add_argument('--occupancy_probes', type=int, default=128,
                        help='host-side probe points per ray when '
                             'tightening bounds against the occupancy grid')
    parser.add_argument('--occupancy_mode', type=str, default='near',
                        choices=['near', 'both'],
                        help="'near' (default): tighten only the fg entry "
                             "point — measured quality-neutral (skips the "
                             "empty air above the scene, keeps the "
                             "sub-threshold fog tail baseline sampling "
                             "picks up). 'both': tighten both ends and "
                             "collapse all-miss rays — maximum shrink, "
                             "measured ~1 dB PSNR cost (PERF.md round 5)")
    parser.add_argument('--ref_bg_sampling', default=False, action='store_true',
                        help='replicate the reference bg fine-sampling quirk '
                             '(descending-order coarse weights paired with '
                             'ascending bins) so continued reference '
                             'checkpoints train under the exact bg sampling '
                             'distribution they were trained with (see '
                             'RenderSettings.ref_bg_sampling)')
    parser.add_argument('--compute_dtype', type=str, default='bfloat16',
                        choices=['bfloat16', 'float32'],
                        help='MXU matmul precision (params stay float32)')
    parser.add_argument('--remat', default=False, action='store_true',
                        help='rematerialize MLP activations in the backward '
                             'pass (jax.checkpoint): ~33%% more FLOPs for '
                             '~10x less activation HBM — enables bigger '
                             'batches on HBM-bound chips')
    parser.add_argument('--no_pallas', dest='use_pallas', default='auto',
                        action='store_false',
                        help='disable the fused Pallas MLP eval kernel '
                             '(default "auto": on for TPU render/eval '
                             'paths, 1.43x over the XLA lowering on v5e)')
    parser.add_argument('--distortion_loss_weight', type=float, default=0.0,
                        help='Mip-NeRF 360 distortion regularizer on the '
                             'coarse pass (TPU framework extension, not in '
                             'the reference): penalizes spread-out or '
                             'floating density along rays — useful against '
                             'merge-time floaters in per-cell training. '
                             '0 disables (default, reference-parity '
                             'behavior); try 1e-3..1e-2')
    parser.add_argument('--eval_compositor', type=str, default='auto',
                        choices=['auto', 'merge_grouped', 'merge', 'union'],
                        help='coarse+fine compositor for eval renders: '
                             'two-level grouped merge (cheapest), '
                             'sort-free pairwise merge, or masked union; '
                             'auto probes the serving compiler once per '
                             'candidate (render/compositor_probe.py) '
                             'because one libtpu build faults on the '
                             'composed merge+Pallas eval graph')
    parser.add_argument('--mega_routing', type=str, default='auto',
                        choices=['auto', 'dense', 'routed', 'ray'],
                        help='merged-mixture evaluation strategy: dense '
                             'blend (KxN point evals), sorted-gather '
                             'block routing (measured ~50x below MLP '
                             'throughput — escape hatch only), or "ray" '
                             '= ray-granularity one-hot capacity dispatch '
                             '(models/mega.mega_apply_ray_routed: whole '
                             'rays routed to their support cells, '
                             'measured 2.11x dense at K=25 — PERF.md '
                             'round 5; exact, with a per-image '
                             'expected-cost gate falling back to dense). '
                             'auto = dense through K=32')
    parser.add_argument('--ray_routing_gate', type=float, default=0.45,
                        help='with --mega_routing ray: route an image only '
                             'when its plan\'s dense-equivalent submodule '
                             'cost is below this fraction of K (else fall '
                             'back to dense). Measured on-chip at K=25: '
                             'plan cost 0.17K won 2.11x, 0.64K LOST 2.07x '
                             '(padding + dispatch overhead exceed the thin '
                             'MLP saving) — PERF.md round 5')
    parser.add_argument('--routing_max_experts', type=int, default=4,
                        help='max nonzero-weight submodules per point the '
                             'routed path covers (boundary_margin blends; '
                             '4 covers a 2D grid corner)')
    parser.add_argument('--data_axis', type=int, default=None,
                        help='data-parallel mesh size (default: all devices)')
    parser.add_argument('--cell_axis', type=int, default=1,
                        help='cell-parallel mesh size for multi-submodule training')

    return parser


def _apply_config_file(parser: argparse.ArgumentParser, config_path: str,
                       argv: List[str]) -> None:
    """Layer YAML values under CLI flags, configargparse-style.

    YAML keys are long option names. For store_true/store_false flags a
    truthy value applies the flag's const (so `no_bg_nerf: true` sets
    bg_nerf=False, matching the reference configs).
    """
    with open(config_path) as f:
        values = yaml.safe_load(f) or {}

    by_flag = {}
    for action in parser._actions:
        for opt in action.option_strings:
            if opt.startswith('--'):
                by_flag[opt[2:]] = action

    explicit = {a.strip('-').split('=')[0] for a in argv if a.startswith('--')}

    for key, value in values.items():
        action = by_flag.get(key)
        if action is None:
            raise ValueError(f'Unknown config key: {key!r} in {config_path}')
        if key in explicit:
            continue  # CLI wins
        if isinstance(action, (argparse._StoreTrueAction, argparse._StoreFalseAction)):
            if _as_bool(value):
                parser.set_defaults(**{action.dest: action.const})
        else:
            parser.set_defaults(**{action.dest: value})


def _as_bool(v) -> bool:
    if isinstance(v, bool):
        return v
    return str(v).strip().lower() in ('1', 'true', 'yes', 'on')


def parse_opts(parser: argparse.ArgumentParser,
               args: Optional[List[str]] = None,
               known_only: bool = False) -> argparse.Namespace:
    """Parse CLI args with optional YAML config layering."""
    argv = list(sys.argv[1:] if args is None else args)
    pre, _ = parser.parse_known_args(argv)
    if pre.config_file:
        _apply_config_file(parser, pre.config_file, argv)
    if known_only:
        return parser.parse_known_args(argv)[0]
    return parser.parse_args(argv)
