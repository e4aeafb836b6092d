"""Fused NeRF MLP evaluation as a Pallas TPU kernel.

The XLA path evaluates the MLP through ~20 separate HLO ops per layer with
activation round-trips to HBM between fusions. This kernel fuses the whole
per-point pipeline — frequency encoding, the skip-connection trunk, the
sigma head, the view/appearance branch, and the color head — into ONE
VMEM-resident program:

- all weights live in VMEM for the entire grid (~1.3 MB bf16 for the paper
  config; 16 MB budget);
- each grid step streams a block of pre-encoded points in, runs 10 matmuls
  on the MXU with VPU nonlinearities in between, and writes only the
  4-float rgb+sigma result back to HBM — trunk activations never leave the
  chip (frequency encoding itself runs outside in XLA: on (block, 3)
  inputs it only uses 3 of 128 vector lanes in-kernel and cost 4x);
- feature dims are padded to lane multiples (75 -> 128 for the position
  encoding, 27 -> 128 for the direction encoding) with zero weight rows so
  results are bit-identical to the unpadded math.

Scope: plain NeRF forward (rgb_dim == 3, optional dirs/appearance) — the
eval/render hot path. Training uses the differentiable fused kernels in
`pallas_train.py` (custom VJP whose backward remats activations in VMEM),
which share this file's packing/padding helpers; `interpret=True` keeps the
kernels testable on CPU.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mega_nerf_tpu.models.nerf import NeRFConfig

LANE = 128

# Escape hatch: set False to force separate position/direction encoding
# streams (the pre-packing layout) — used to bisect kernel regressions.
DIR_PACK_ENABLED = True


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def supports_fused_kernels(cfg: NeRFConfig, train: bool = False) -> bool:
    """Whether the fused eval/train kernels cover this architecture on TPU.

    - The in-kernel row-slice offsets (skip split at enc_pad, dir_a splits
      at layer_dim / +dir_pad) must be Mosaic sublane-aligned, which holds
      when layer_dim is lane-aligned. CPU interpret mode has no such
      restriction (tests run tiny dims).
    - The whole weight set must be VMEM-resident for the entire grid. EVAL
      holds bf16 weights: an 8x2048 model (the `mega-nerf-dense` / `nerf`
      families) is ~74 MB against the 100 MB scoped-VMEM budget, so the
      eval gate reaches 2048 channels (`eval_block_for` shrinks the point
      block to keep activations inside the remainder). The TRAIN backward
      additionally holds f32 weights AND f32 grad accumulators —
      ~270 MB at 8x2048 — so training past 1024 channels falls back to
      XLA.
    - Architecture limits (rgb-only head, no affine appearance) are shared
      by pack_params."""
    # The 2048-channel eval budget assumes bf16 weights (pack_params casts
    # to cfg.dtype): an f32 --compute_dtype run would need ~148 MB of
    # resident weights against the 100 MB scoped-VMEM limit, so f32 keeps
    # the 1024 gate and falls back to XLA above it.
    bf16 = cfg.dtype == jnp.bfloat16
    max_dim = 1024 if (train or not bf16) else 2048
    return (
        cfg.rgb_dim == 3
        and not cfg.affine_appearance
        and (
            jax.default_backend() != "tpu"
            or (cfg.layer_dim % LANE == 0 and cfg.layer_dim <= max_dim)
        )
    )


def eval_block_for(cfg: NeRFConfig, block: int = 1024) -> int:
    """Point-block size for the eval kernel: halve past 1024 channels so
    the (block, layer_dim) f32 activation tiles fit VMEM next to the
    resident bf16 weight set."""
    return min(block, 512) if cfg.layer_dim > 1024 else block


def choose_block(m: int, block: int) -> Tuple[int, int]:
    """Pick a block size dividing the padded point count -> (block, m_pad)."""
    block = min(block, m) if m % block != 0 else block
    m_pad = _round_up(m, block)
    return block, m_pad


def pad_points(x: Optional[jnp.ndarray], m_pad: int) -> Optional[jnp.ndarray]:
    """Tile the last row up to m_pad rows (kernel grids need m % block == 0)."""
    if x is None or x.shape[0] == m_pad:
        return x
    return jnp.concatenate(
        [x, jnp.tile(x[-1:], (m_pad - x.shape[0], 1))], axis=0
    )


@dataclasses.dataclass
class PackedMLP:
    """Padded weight arrays + static layout facts for the kernel."""

    config: NeRFConfig
    enc_pad: int  # padded position-encoding width
    dir_pad: int  # padded SEPARATE direction-encoding width (0 if unused
    #   or if the direction encoding is packed into the enc tile)
    app_pad: int  # padded appearance width (0 if unused)
    enc_in: int  # live position-encoding columns
    dir_in: int  # live direction-encoding columns (0 if no dir branch)
    # When True, the direction encoding lives in the enc tile's padding
    # columns [enc_in, enc_in + dir_in) and the dir-branch matmul reads the
    # SAME tile (its weight rows are placed to match, zero rows elsewhere):
    # one encode pass and one HBM stream instead of two, at zero extra
    # FLOPs — the dir weight block spanned a full lane tile anyway.
    dir_packed: bool
    trunk_kernels: Tuple[jnp.ndarray, ...]  # per layer, padded (in, 256)
    trunk_biases: Tuple[jnp.ndarray, ...]  # (1, 256)
    sigma_kernel: jnp.ndarray  # (256, LANE) — col 0 real
    sigma_bias: jnp.ndarray  # (1, LANE)
    final_kernel: Optional[jnp.ndarray]  # (256, 256)
    final_bias: Optional[jnp.ndarray]
    dir_a_kernel: Optional[jnp.ndarray]  # (256+dir_pad+app_pad, branch)
    dir_a_bias: Optional[jnp.ndarray]
    rgb_kernel: jnp.ndarray  # (branch|256, LANE) — cols 0..2 real
    rgb_bias: jnp.ndarray  # (1, LANE)


def pack_params(cfg: NeRFConfig, params: Dict[str, Any],
                cast: bool = True,
                dir_pack: Optional[bool] = None) -> PackedMLP:
    """Flax NeRF params -> zero-padded, lane-aligned kernel weights.

    Matmul weights are stored pre-cast to the compute dtype (bf16 on TPU) to
    halve their VMEM footprint; biases stay f32 (they add into the f32
    matmul accumulators). `cast=False` keeps weights f32 — used by the
    differentiable training path (pallas_train.py), where the padding ops
    must be transparently reversible by JAX's AD (cotangents come back f32)
    and the kernels cast to the compute dtype internally.
    """
    assert cfg.rgb_dim == 3, "pallas path supports rgb output only"
    assert not cfg.affine_appearance, "affine appearance not fused yet"
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    wdt = (lambda a: jnp.asarray(a, cfg.dtype)) if cast else f32

    enc_in = cfg.xyz_dim * (1 + 2 * cfg.pos_xyz_dim)
    enc_pad = _round_up(enc_in, LANE)
    dir_in = 3 * (1 + 2 * cfg.pos_dir_dim) if cfg.pos_dir_dim > 0 else 0
    # Pack the direction encoding into the enc tile's padding when it fits
    # with one column to spare (the training sigma noise rides in the first
    # free column). Covers the whole reference config family: fg 75+27+1,
    # bg (xyz_dim=4) 100+27+1 <= 128. `dir_pack` overrides the fit rule
    # (pallas_train passes False: the packed TRAIN kernels hang this
    # environment's terminal-side libtpu build — fixed in newer libtpu;
    # see fused_nerf_train_apply. The eval kernel is proven everywhere).
    if dir_pack is None:
        dir_pack = DIR_PACK_ENABLED
    dir_packed = dir_pack and dir_in > 0 and enc_in + dir_in + 1 <= enc_pad
    dir_pad = _round_up(dir_in, LANE) if (dir_in and not dir_packed) else 0
    app_pad = _round_up(cfg.appearance_dim, LANE) if (
        cfg.appearance_dim > 0 and not cfg.affine_appearance
    ) else 0

    trunk_kernels = []
    trunk_biases = []
    d = cfg.layer_dim
    for i in range(cfg.layers):
        k = f32(params[f"trunk_{i}"]["kernel"])
        b = f32(params[f"trunk_{i}"]["bias"])[None, :]
        if i == 0:
            padded = jnp.zeros((enc_pad, d), jnp.float32).at[:enc_in].set(k)
        elif i in cfg.skip_layers:
            # Input layout in-kernel: [enc (enc_pad) | h (d)].
            padded = (
                jnp.zeros((enc_pad + d, d), jnp.float32)
                .at[:enc_in].set(k[:enc_in])
                .at[enc_pad:].set(k[enc_in:])
            )
        else:
            padded = k
        trunk_kernels.append(padded)
        trunk_biases.append(b)

    sigma_kernel = (
        jnp.zeros((d, LANE), jnp.float32)
        .at[:, :1].set(f32(params["sigma"]["kernel"]))
    )
    sigma_bias = jnp.zeros((1, LANE), jnp.float32).at[0, 0].set(
        f32(params["sigma"]["bias"])[0]
    )

    final_kernel = final_bias = dir_a_kernel = dir_a_bias = None
    if cfg.uses_dir_branch:
        final_kernel = f32(params["trunk_final"]["kernel"])
        final_bias = f32(params["trunk_final"]["bias"])[None, :]
        branch = cfg.layer_dim // 2
        k = f32(params["dir_a"]["kernel"])
        # In-kernel input layout: [final (d) | dir tile | app (app_pad)].
        # The dir tile is the enc tile itself when dir_packed (rows for the
        # position-encoding columns stay zero), else the separate dir_enc.
        dir_block = enc_pad if dir_packed else dir_pad
        dir_off = enc_in if dir_packed else 0
        rows = d + dir_block + app_pad
        dir_a_kernel = jnp.zeros((rows, branch), jnp.float32).at[:d].set(k[:d])
        off_src = d
        if dir_in:
            dir_a_kernel = dir_a_kernel.at[
                d + dir_off : d + dir_off + dir_in
            ].set(k[off_src : off_src + dir_in])
            off_src += dir_in
        if app_pad:
            dir_a_kernel = dir_a_kernel.at[
                d + dir_block : d + dir_block + cfg.appearance_dim
            ].set(k[off_src : off_src + cfg.appearance_dim])
        dir_a_bias = f32(params["dir_a"]["bias"])[None, :]
        rgb_in = branch
    else:
        rgb_in = d

    rgb_kernel = (
        jnp.zeros((rgb_in, LANE), jnp.float32)
        .at[:, :3].set(f32(params["rgb"]["kernel"]))
    )
    rgb_bias = jnp.zeros((1, LANE), jnp.float32).at[0, :3].set(
        f32(params["rgb"]["bias"])
    )

    return PackedMLP(
        config=cfg,
        enc_pad=enc_pad,
        dir_pad=dir_pad,
        app_pad=app_pad,
        enc_in=enc_in,
        dir_in=dir_in,
        dir_packed=dir_packed,
        trunk_kernels=tuple(wdt(k) for k in trunk_kernels),
        trunk_biases=tuple(trunk_biases),
        sigma_kernel=wdt(sigma_kernel),
        sigma_bias=sigma_bias,
        final_kernel=wdt(final_kernel) if final_kernel is not None else None,
        final_bias=final_bias,
        dir_a_kernel=wdt(dir_a_kernel) if dir_a_kernel is not None else None,
        dir_a_bias=dir_a_bias,
        rgb_kernel=wdt(rgb_kernel),
        rgb_bias=rgb_bias,
    )


@dataclasses.dataclass(frozen=True)
class EncodeLayout:
    """Static per-column description of a packed frequency encoding tile.

    Shared by the XLA pre-encode path (`_freq_encode_groups`) and the
    in-kernel encode (`_mlp_kernel` with `encode` set): column `col` holds
    `sin(x[colsrc[col]] * scale[col] + phase[col])` when `kind[col] == 1`,
    the raw coordinate when 0. Hashable (arrays as tuples) so it can ride
    a jit-static kernel closure."""

    d_total: int
    live_cols: int
    groups: Tuple[Tuple[int, int], ...]  # ((d, num_freqs), ...)
    colsrc: Tuple[int, ...]
    scale: Tuple[float, ...]
    phase: Tuple[float, ...]
    kind: Tuple[int, ...]

    def np_arrays(self):
        return (
            np.asarray(self.colsrc, np.int32),
            np.asarray(self.scale, np.float32),
            np.asarray(self.phase, np.float32),
            np.asarray(self.kind, np.int32),
        )



def encode_layout(
    groups: Tuple[Tuple[int, int], ...], out_width: int
) -> EncodeLayout:
    """((d, num_freqs), ...) -> column layout of the packed encode tile."""
    colsrc = np.full((out_width,), -1, np.int32)  # source coordinate per col
    scale = np.zeros((out_width,), np.float32)
    kind = np.zeros((out_width,), np.int32)  # 0 = linear/pad, 1 = trig
    phase = np.zeros((out_width,), np.float32)  # pi/2 turns sin into cos
    col = 0
    base = 0
    for d, num_freqs in groups:
        for c in range(d):
            colsrc[col] = base + c
            scale[col] = 1.0
            col += 1
        for k in range(num_freqs):
            for trig in (1, 2):
                for c in range(d):
                    colsrc[col] = base + c
                    scale[col] = 2.0 ** k
                    kind[col] = 1
                    if trig == 2:
                        phase[col] = np.float32(np.pi / 2)
                    col += 1
        base += d
    assert col <= out_width
    return EncodeLayout(
        d_total=base,
        live_cols=col,
        groups=tuple((int(d), int(nf)) for d, nf in groups),
        colsrc=tuple(int(v) for v in colsrc),
        scale=tuple(float(v) for v in scale),
        phase=tuple(float(v) for v in phase),
        kind=tuple(int(v) for v in kind),
    )


def _freq_encode_groups(
    x: jnp.ndarray,
    groups: Tuple[Tuple[int, int], ...],
    out_width: int,
    extra: Optional[jnp.ndarray] = None,
    extra_col: Optional[int] = None,
) -> jnp.ndarray:
    """Frequency-encode one or more coordinate groups into ONE lane tile.

    x: (B, sum of group dims) — the groups' coordinates concatenated.
    groups: ((d, num_freqs), ...) — each group's standard encoding
    [x, sin(2^0 x), cos(2^0 x), ...] is laid out back to back, so packing
    the position and direction encodings into a single 128-lane tile costs
    one fused pass instead of two and feeds the fused kernels as one HBM
    stream (the matmul weight rows are placed to match — see pack_params's
    dir_packed layout).
    """
    b, d_total = x.shape
    assert d_total == sum(d for d, _ in groups)
    layout = encode_layout(groups, out_width)
    colsrc, scale, phase, kind = layout.np_arrays()
    col = layout.live_cols
    # One fused full-width elementwise pass in f32 (see _freq_encode_block).
    xf = x.astype(jnp.float32)
    colv = jnp.asarray(colsrc)[None, :]
    xp = jnp.zeros((b, out_width), jnp.float32)
    for c in range(d_total):
        xp = jnp.where(colv == c, xf[:, c : c + 1], xp)
    xp = xp * jnp.asarray(scale)[None, :] + jnp.asarray(phase)[None, :]
    kindv = jnp.asarray(kind)[None, :]
    out = jnp.where(kindv == 1, jnp.sin(xp), xp)
    if extra is not None:
        assert extra_col is not None and col <= extra_col < out_width, (
            extra_col, col, out_width)
        ecol = np.arange(out_width, dtype=np.int32)[None, :]
        out = jnp.where(
            jnp.asarray(ecol == extra_col),
            extra.reshape(b, 1).astype(out.dtype), out,
        )
    return out


def _freq_encode_block(x: jnp.ndarray, num_freqs: int, out_width: int,
                       extra: Optional[jnp.ndarray] = None,
                       extra_col: Optional[int] = None) -> jnp.ndarray:
    """(B, d) -> (B, out_width) [x, sin(2^k x), cos(2^k x), ..., zeros].

    `extra`/`extra_col` stash a per-point (B,) scalar stream (the training
    sigma noise) into one of the zero padding columns: a separate (B, 1)
    array is physically (B, 128)-tiled on TPU — 128x the HBM traffic of the
    packed 1-D stream — while this select fuses into the encode epilogue
    that writes the (B, out_width) tile anyway. The kernel slices the
    column back out; the zero-padded weight rows make it invisible to the
    matmuls.

    Lane-wide formulation: the naive per-frequency loop operates on (B, d)
    arrays — d of 128 vector lanes live — and when its result must be
    MATERIALIZED (it feeds a custom call, so XLA cannot fuse it into a
    matmul operand) the sin/concat chain alone cost ~320ms for 3.1M points.
    Everything is ONE fused full-width elementwise pass in f32:
    - coordinates are spread across lanes by constant-mask selects and
      scaled by exact power-of-two multiplies (an earlier (B, d) @
      (d, out_width) HIGHEST-precision projection was 6 bf16 MXU passes
      over a contraction dim padded d -> 128, ~1 ms/step per pass; the
      default-precision dot truncates f32 to bf16, and an 8-bit-mantissa
      position times 2^11 is off by whole radians before the sin);
    - f32 throughout: bf16 sin quantizes positions coarser than scene
      detail at high frequencies;
    - cosine columns are sin(2^k x + pi/2): a select between full-width
      sin and cos expressions makes XLA evaluate BOTH transcendentals on
      every lane. The phase add costs one f32 rounding of the argument
      (<= ulp(2^k x)/2 ~ 1.2e-4 for |x| <= 1.5 at 2^11 — an order below
      the bf16 cast the encoding feeds anyway).
    """
    return _freq_encode_groups(
        x, ((x.shape[1], num_freqs),), out_width, extra, extra_col
    )


def _mlp_kernel(cfg: NeRFConfig, enc_pad: int, dir_pad: int, app_pad: int,
                dir_packed: bool, compute_dtype,
                encode: Optional[EncodeLayout], *refs):
    """Kernel body. refs = [enc|raw, (dir_enc), (app), weights..., out].

    `dir_pad` is the dir weight-row block width; with `dir_packed` there is
    no separate dir_enc stream — the dir-branch matmul reads the enc tile
    (dir_pad == enc_pad) and the weight rows are laid out to match.

    Frequency encoding placement, two modes:
    - `encode is None`: the encoding arrives PRE-COMPUTED in XLA
      (lane-padded, compute dtype). That pass materializes a (M, 128)
      tile to HBM that the kernel immediately re-reads.
    - `encode` set (eval path): the first ref holds RAW coordinates
      ((block, 8) f32 — xyz|dirs packed) and the encoding is computed
      HERE, lane-wide: per-coordinate column broadcasts via constant-mask
      selects, one scale multiply, one full-width sin. The per-column
      colsrc/scale/phase/kind constants are emitted as COMPILE-TIME
      literal arrays from the static `encode` layout (round 3 passed them
      as a runtime (8, enc_pad) input tile — "kernels can't close over
      arrays" is true of TRACED arrays, not numpy literals — which kept
      Mosaic from folding the masks and made the in-kernel encode ~25
      runtime VPU ops/element, measured SLOWER than the XLA pre-encode).
      Lane-wide keeps every op on all 128 lanes (the naive in-kernel
      encode on (block, 3) vectors used 3 lanes and collapsed throughput
      4x — measured 30ms vs 7.6ms at block=4096) while cutting the input
      stream from 256 B/point (bf16 tile) to 32 B/point and deleting the
      XLA pass's HBM round-trip entirely; the VPU encode overlaps the
      MXU-bound trunk.
    """
    it = iter(refs)
    enc_ref = next(it)
    dir_enc_ref = (
        next(it) if (cfg.pos_dir_dim > 0 and not dir_packed) else None
    )
    app_ref = next(it) if app_pad else None

    trunk = [(next(it), next(it)) for _ in range(cfg.layers)]
    sigma_k, sigma_b = next(it), next(it)
    if cfg.uses_dir_branch:
        final_k, final_b = next(it), next(it)
        dir_a_k, dir_a_b = next(it), next(it)
    rgb_k, rgb_b = next(it), next(it)
    out_ref = next(it)

    cd = compute_dtype
    if encode is not None:
        # In-kernel encode from COMPILE-TIME constants. Pallas kernels may
        # not capture constant ARRAYS ("pass them as inputs" — the round-3
        # variant did exactly that and the runtime meta tile kept Mosaic
        # from folding anything), but iota arithmetic against Python-int
        # group bounds expresses the same per-lane constants foldably:
        # within a group (d coords, nf freqs) starting at column g0, block
        # j = (lane-g0)//d is [raw | k0-sin | k0-cos | k1-sin | ...], the
        # source coordinate is (lane-g0) mod d, the scale is 2^((j-1)//2)
        # (built EXACTLY by bit-casting (k+127)<<23 — exp2 would round),
        # and the phase is pi/2 on odd j-1 (cos columns). Bit-identical to
        # the XLA pre-encode: the scale multiply is by a power of two and
        # the select/sin chain is the same f32 math.
        raw = enc_ref[...].astype(jnp.float32)  # (B, raw_width)
        b = raw.shape[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, enc_pad), 1)
        xp = jnp.zeros((b, enc_pad), jnp.float32)
        scale = jnp.ones((1, enc_pad), jnp.float32)
        phase = jnp.zeros((1, enc_pad), jnp.float32)
        kind = jnp.zeros((1, enc_pad), jnp.bool_)
        g0 = 0
        base = 0
        for d, nf in encode.groups:
            width = d * (1 + 2 * nf)
            rel = jnp.maximum(lane - g0, 0)
            in_g = (lane >= g0) & (lane < g0 + width)
            j = rel // d
            r = rel - j * d
            for c in range(d):
                xp = jnp.where(
                    in_g & (r == c), raw[:, base + c : base + c + 1], xp
                )
            k = jnp.maximum(j - 1, 0) // 2
            pow2k = jax.lax.bitcast_convert_type(
                (k + 127) << 23, jnp.float32
            )
            trig = in_g & (j >= 1)
            scale = jnp.where(trig, pow2k, scale)
            phase = jnp.where(
                trig & ((j - 1) % 2 == 1), jnp.float32(np.pi / 2), phase
            )
            kind = kind | trig
            g0 += width
            base += d
        xp = xp * scale + phase
        enc = jnp.where(kind, jnp.sin(xp), xp).astype(cd)
    else:
        enc = enc_ref[...].astype(cd)
    h = enc
    for i, (k_ref, b_ref) in enumerate(trunk):
        if i in cfg.skip_layers:
            # Split matmul instead of concat([enc, h]) @ K — avoids
            # materializing the concatenated activation every grid step.
            k = k_ref[...].astype(cd)
            h = (
                jnp.dot(enc, k[:enc_pad], preferred_element_type=jnp.float32)
                + jnp.dot(h, k[enc_pad:], preferred_element_type=jnp.float32)
                + b_ref[...]
            )
        else:
            h = jnp.dot(
                h, k_ref[...].astype(cd), preferred_element_type=jnp.float32
            ) + b_ref[...]
        h = jnp.maximum(h, 0.0).astype(cd)

    sigma = (
        jnp.dot(h, sigma_k[...].astype(cd), preferred_element_type=jnp.float32)
        + sigma_b[...]
    )  # (B, LANE), col 0 real
    if cfg.shifted_softplus:
        sigma = jax.nn.softplus(sigma - 1.0)
    else:
        sigma = jnp.maximum(sigma, 0.0)

    if cfg.uses_dir_branch:
        final = (
            jnp.dot(h, final_k[...].astype(cd),
                    preferred_element_type=jnp.float32)
            + final_b[...]
        ).astype(cd)
        d_model = final.shape[-1]
        ka = dir_a_k[...].astype(cd)
        acc = jnp.dot(final, ka[:d_model], preferred_element_type=jnp.float32)
        if cfg.pos_dir_dim > 0:
            dir_enc = enc if dir_packed else dir_enc_ref[...].astype(cd)
            acc = acc + jnp.dot(
                dir_enc, ka[d_model : d_model + dir_pad],
                preferred_element_type=jnp.float32,
            )
        if app_pad:
            app = app_ref[...].astype(cd)
            acc = acc + jnp.dot(
                app, ka[d_model + dir_pad : d_model + dir_pad + app.shape[-1]],
                preferred_element_type=jnp.float32,
            )
        branch = jnp.maximum(acc + dir_a_b[...], 0.0).astype(cd)
        rgb_pre = (
            jnp.dot(branch, rgb_k[...].astype(cd),
                    preferred_element_type=jnp.float32)
            + rgb_b[...]
        )
    else:
        rgb_pre = (
            jnp.dot(h, rgb_k[...].astype(cd),
                    preferred_element_type=jnp.float32)
            + rgb_b[...]
        )
    rgb = jax.nn.sigmoid(rgb_pre)  # (B, LANE), cols 0..2 real

    # Pack sigma into lane 3 of the rgb tile via an iota-select and write the
    # FULL (B, LANE) tile. A narrow (B, 4) output block forces Mosaic into
    # per-row relayouts that dominate the whole kernel (measured 48.6ms vs
    # 4.2ms for 524k points — 11x); the caller slices [:, :4] outside.
    lane = jax.lax.broadcasted_iota(jnp.int32, rgb.shape, 1)
    out = jnp.where(lane == 3, sigma[:, :1], rgb)
    out_ref[...] = out.astype(out_ref.dtype)


def fused_nerf_eval(
    packed: PackedMLP,
    xyz: jnp.ndarray,  # (M, xyz_dim)
    dirs: Optional[jnp.ndarray] = None,  # (M, 3)
    app_embed: Optional[jnp.ndarray] = None,  # (M, appearance_dim) pre-gathered
    block: int = 1024,
    interpret: Optional[bool] = None,
    encode_in_kernel: Optional[bool] = None,
) -> jnp.ndarray:
    """-> (M, 4) [rgb, sigma]; bit-compatible with the Flax NeRF forward.

    Takes raw xyz/dirs; by default the frequency encodings are computed in
    XLA (f32 transcendentals, one fused wide elementwise pass) and the
    lane-padded tile is streamed into the kernel.

    `encode_in_kernel=True` instead streams the raw coordinates ((M, 8)
    f32) and computes the encode inside the kernel from COMPILE-TIME
    per-column constants (see `_mlp_kernel`). History: the round-3
    variant passed the constants as a runtime (8, enc_pad) meta-tile
    input, which kept Mosaic from folding the masks and measured SLOWER
    end to end (367 vs 331 ms) despite cutting input HBM 8x; this
    compile-time-literal rework removes that penalty — measure per
    deployment (`scripts/eval_bench.py --encode_in_kernel`).
    Replicates the reference packed-dirs quirk when cfg.ref_packed_dirs.
    """
    cfg = packed.config
    m = xyz.shape[0]
    assert m % block == 0, (m, block)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    grid = (m // block,)
    point_spec = lambda width: pl.BlockSpec(
        (block, width), lambda i: (i, 0), memory_space=pl.ANY if interpret else pltpu.VMEM,
    )
    weight_spec = lambda arr: pl.BlockSpec(
        arr.shape, lambda i: (0, 0), memory_space=pl.ANY if interpret else pltpu.VMEM,
    )

    dir_coords = None
    if cfg.pos_dir_dim > 0:
        assert dirs is not None
        if cfg.ref_packed_dirs and cfg.appearance_dim == 0:
            dir_coords = jnp.concatenate([xyz[:, -1:], dirs[:, :2]], axis=-1)
        else:
            dir_coords = dirs

    if encode_in_kernel is None:
        encode_in_kernel = False  # measured slower on v5e — see docstring
    layout = None
    if encode_in_kernel:
        assert packed.dir_packed or cfg.pos_dir_dim == 0, (
            "in-kernel encode needs the single-tile (dir_packed) layout"
        )
        if cfg.pos_dir_dim > 0:
            groups = ((xyz.shape[1], cfg.pos_xyz_dim),
                      (dir_coords.shape[1], cfg.pos_dir_dim))
            raw = jnp.concatenate(
                [xyz.astype(jnp.float32), dir_coords.astype(jnp.float32)],
                axis=-1,
            )
        else:
            groups = ((xyz.shape[1], cfg.pos_xyz_dim),)
            raw = xyz.astype(jnp.float32)
        layout = encode_layout(groups, packed.enc_pad)
        raw_w = _round_up(layout.d_total, 8)
        raw = jnp.pad(raw, ((0, 0), (0, raw_w - layout.d_total)))
        # The per-column constants live INSIDE the kernel as compile-time
        # literals (see _mlp_kernel) — raw coordinates are the only input.
        inputs = [raw]
        in_specs = [point_spec(raw_w)]
    elif packed.dir_packed:
        # Position + direction encodings in ONE pass and ONE stream.
        enc = _freq_encode_groups(
            jnp.concatenate(
                [xyz.astype(jnp.float32), dir_coords.astype(jnp.float32)],
                axis=-1,
            ),
            ((xyz.shape[1], cfg.pos_xyz_dim),
             (dir_coords.shape[1], cfg.pos_dir_dim)),
            packed.enc_pad,
        ).astype(cfg.dtype)
        inputs = [enc]
        in_specs = [point_spec(packed.enc_pad)]
    else:
        enc = _freq_encode_block(
            xyz.astype(jnp.float32), cfg.pos_xyz_dim, packed.enc_pad
        ).astype(cfg.dtype)
        inputs = [enc]
        in_specs = [point_spec(packed.enc_pad)]
        if cfg.pos_dir_dim > 0:
            dir_enc = _freq_encode_block(
                dir_coords.astype(jnp.float32), cfg.pos_dir_dim,
                packed.dir_pad,
            ).astype(cfg.dtype)
            inputs.append(dir_enc)
            in_specs.append(point_spec(packed.dir_pad))
    if packed.app_pad:
        assert app_embed is not None
        inputs.append(app_embed.astype(cfg.dtype))
        in_specs.append(point_spec(app_embed.shape[1]))

    weights = []
    for k, b in zip(packed.trunk_kernels, packed.trunk_biases):
        weights += [k, b]
    weights += [packed.sigma_kernel, packed.sigma_bias]
    if cfg.uses_dir_branch:
        weights += [packed.final_kernel, packed.final_bias,
                    packed.dir_a_kernel, packed.dir_a_bias]
    weights += [packed.rgb_kernel, packed.rgb_bias]
    inputs.extend(weights)
    in_specs.extend(weight_spec(w) for w in weights)

    kernel = partial(
        _mlp_kernel, cfg, packed.enc_pad,
        packed.enc_pad if packed.dir_packed else packed.dir_pad,
        packed.app_pad, packed.dir_packed, cfg.dtype, layout,
    )
    compiler_params = None
    if not interpret:
        # Default scoped-VMEM budget is 16 MB; the f32 paper config at
        # block=2048 needs ~20 MB (measured on v5e). Raise it — v5e has
        # 128 MB of VMEM and this kernel is its sole occupant.
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block, LANE), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, LANE), jnp.float32),
        interpret=interpret,
        compiler_params=compiler_params,
    )(*inputs)
    return out[:, :4]  # [r, g, b, sigma]
