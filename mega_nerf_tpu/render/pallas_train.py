"""Fused NeRF MLP training path: Pallas forward + custom-VJP backward.

The XLA training step spends ~85% of device time in the MLP forward and
backward; the fused eval kernel (pallas_mlp.py) runs the same forward 2x
faster than XLA's lowering by keeping every activation VMEM-resident. This
module extends that to training:

- the FORWARD kernel is the eval kernel plus the sigma-noise add: all
  output nonlinearities (shifted-softplus/relu, rgb sigmoid) run in-kernel
  on full 128-lane tiles — done outside in XLA they compile to narrow
  (m, 4)-shaped fusions worth ~5 ms/step of profile tail.
- the BACKWARD kernel RECOMPUTES the forward activations block-by-block in
  VMEM (rematerialization: ~1 extra forward of FLOPs instead of streaming
  8 layers of activations through HBM twice) and accumulates weight
  gradients across grid steps into VMEM-resident f32 accumulators
  (constant-index output blocks are kept live by the Mosaic pipeline;
  program_id 0 zero-initializes them).

Only input gradients that exist are emitted: d(appearance embedding) per
point. Positions, directions, and sigma noise carry no parameter
gradients, so their cotangents are returned as zeros and pruned by JAX.

Parity: same network semantics as `models/nerf.py::NeRF.__call__`
(reference `mega_nerf/models/nerf.py:115-160`); gradient equality against
the Flax path is tested in tests/test_pallas_train.py.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mega_nerf_tpu.models.nerf import NeRFConfig
from mega_nerf_tpu.render.pallas_mlp import (
    LANE,
    PackedMLP,
    _freq_encode_block,
    _freq_encode_groups,
    choose_block,
    pack_params,
    pad_points,
    supports_fused_kernels,
)


def _dT(a, b, cd):
    """(B, x)^T @ (B, y) -> (x, y), f32 accumulate."""
    return lax.dot_general(
        a.astype(cd), b.astype(cd), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _d_rhsT(a, w, cd):
    """(B, y) @ W^T for W (x, y) -> (B, x), f32 accumulate."""
    return lax.dot_general(
        a.astype(cd), w.astype(cd), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _dot(a, w, cd):
    return jnp.dot(a.astype(cd), w.astype(cd),
                   preferred_element_type=jnp.float32)


def _forward_core(cfg: NeRFConfig, enc_pad: int, enc, dir_enc, app, ws):
    """Shared fwd compute. Returns (hs, sigma_pre, final, branch, rgb_pre)."""
    cd = cfg.dtype
    it = iter(ws)
    trunk = [(next(it), next(it)) for _ in range(cfg.layers)]
    sigma_k, sigma_b = next(it), next(it)
    if cfg.uses_dir_branch:
        final_k, final_b = next(it), next(it)
        dir_a_k, dir_a_b = next(it), next(it)
    rgb_k, rgb_b = next(it), next(it)

    h = enc
    hs = []
    for i, (k, b) in enumerate(trunk):
        if i in cfg.skip_layers:
            pre = (_dot(enc, k[:enc_pad], cd) + _dot(h, k[enc_pad:], cd) + b)
        else:
            pre = _dot(h, k, cd) + b
        h = jnp.maximum(pre, 0.0).astype(cd)
        hs.append(h)

    sigma_pre = _dot(h, sigma_k, cd) + sigma_b  # (B, LANE) col 0 real

    final = branch = None
    if cfg.uses_dir_branch:
        final = (_dot(h, final_k, cd) + final_b).astype(cd)
        d = final.shape[-1]
        dir_pad = dir_enc.shape[-1] if dir_enc is not None else 0
        acc = _dot(final, dir_a_k[:d], cd)
        if dir_enc is not None:
            acc = acc + _dot(dir_enc, dir_a_k[d : d + dir_pad], cd)
        if app is not None:
            acc = acc + _dot(
                app, dir_a_k[d + dir_pad : d + dir_pad + app.shape[-1]], cd
            )
        branch = jnp.maximum(acc + dir_a_b, 0.0).astype(cd)
        rgb_pre = _dot(branch, rgb_k, cd) + rgb_b
    else:
        rgb_pre = _dot(h, rgb_k, cd) + rgb_b
    return hs, sigma_pre, final, branch, rgb_pre


def _noise_lanes(enc_raw, noise_col):
    """(B, LANE) f32 noise broadcast from the enc tile's noise column.

    A (B, 1) slice + broadcast of the (now cfg.dtype) tile trips a Mosaic
    relayout bug on the deployed Nov-2025 libtpu ("Non-singleton logical
    dimension is replicated in destination but not in source" on the
    derived i1 masks); a one-hot matmul select (the house rule for
    gathers) sidesteps layout inference entirely and is exact: 1.0 * x
    single-term sums under f32 accumulation."""
    sel = (
        lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0) == noise_col
    ).astype(enc_raw.dtype)
    return lax.dot(enc_raw, sel, preferred_element_type=jnp.float32)


def _sigma_activate(cfg, sigma_pre, noise):
    """Noise add + density activation, full-lane (col 0 is the live one)."""
    s = sigma_pre + noise  # (B, LANE) + (B, LANE) (_noise_lanes) or scalar 0
    if cfg.shifted_softplus:
        return jax.nn.softplus(s - 1.0)
    return jnp.maximum(s, 0.0)


def _train_fwd_kernel(cfg, enc_pad, dir_pad, dir_packed, app_w, noise_col,
                      *refs):
    it = iter(refs)
    # cfg.dtype tile; noise rides in padding column noise_col (values are
    # pre-rounded to cfg.dtype, so reading them here is exact)
    enc_raw = next(it)[...]
    enc = enc_raw.astype(cfg.dtype)
    if dir_packed:
        dir_enc = enc  # dir encoding packed into the enc tile's padding
    else:
        dir_enc = next(it)[...].astype(cfg.dtype) if dir_pad else None
    app = next(it)[...].astype(cfg.dtype) if app_w else None
    # Sigma noise is stashed in a zero-weight padding lane of enc (see
    # _freq_encode_block): a separate (B, 1) input would stream a full
    # (B, 128) physical tile per pass. 0.0 when training without noise.
    noise = _noise_lanes(enc_raw, noise_col) if noise_col is not None else 0.0
    n_w = 2 * cfg.layers + 2 + (4 if cfg.uses_dir_branch else 0) + 2
    ws = [next(it)[...] for _ in range(n_w)]
    out_ref = next(it)

    _, sigma_pre, _, _, rgb_pre = _forward_core(
        cfg, enc_pad, enc, dir_enc, app, ws
    )
    # Activations live IN the kernel: outside, sigmoid/softplus on (m, 4)-
    # shaped arrays compile to narrow-lane XLA fusions (~5 ms/step of the
    # profile tail); here they run on full (B, LANE) tiles for free.
    sigma = _sigma_activate(cfg, sigma_pre, noise)
    rgb = jax.nn.sigmoid(rgb_pre)
    lane = lax.broadcasted_iota(jnp.int32, rgb.shape, 1)
    out = jnp.where(lane == 3, sigma[:, :1], rgb)
    out_ref[...] = out.astype(out_ref.dtype)


def _train_bwd_kernel(cfg, enc_pad, dir_pad, dir_packed, app_w, noise_col,
                      *refs):
    cd = cfg.dtype
    it = iter(refs)
    enc_raw = next(it)[...]  # cfg.dtype tile (see _train_fwd_kernel)
    enc = enc_raw.astype(cd)
    if dir_packed:
        dir_enc = enc
    else:
        dir_enc = next(it)[...].astype(cd) if dir_pad else None
    app = next(it)[...].astype(cd) if app_w else None
    noise = _noise_lanes(enc_raw, noise_col) if noise_col is not None else 0.0
    # Raw output cotangent, masked into rgb/sigma lanes HERE: masking outside
    # the kernel cost two extra (m, 128) f32 XLA passes (~2.4 ms/step).
    # Ships in cfg.dtype (halves the HBM stream); full-tile upcast here so
    # all downstream mask/derivative math keeps its proven f32 layouts.
    g = next(it)[...].astype(jnp.float32)  # (B, LANE)
    lane_g = lax.broadcasted_iota(jnp.int32, g.shape, 1)
    g_rgb_out = jnp.where(lane_g < 3, g, 0.0)    # lanes 0..2 live
    g_sigma_out = jnp.where(lane_g == 0, g[:, 3:4], 0.0)  # lane 0 live
    n_w = 2 * cfg.layers + 2 + (4 if cfg.uses_dir_branch else 0) + 2
    ws = [next(it)[...] for _ in range(n_w)]
    outs = list(it)  # gradient output refs (+ optional d_app first)

    oit = iter(outs)
    d_app_ref = next(oit) if app_w else None
    grad_refs = list(oit)  # aligned with ws order

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in grad_refs:
            r[...] = jnp.zeros_like(r)

    hs, sigma_pre, final, branch, rgb_pre = _forward_core(
        cfg, enc_pad, enc, dir_enc, app, ws
    )
    h_last = hs[-1]

    # Activation backwards, recomputed full-lane from the pre-activations:
    # d sigmoid = g * s(1-s); d softplus(x-1) = g * sigmoid(x-1).
    rgb_s = jax.nn.sigmoid(rgb_pre)
    g_rgb = g_rgb_out * rgb_s * (1.0 - rgb_s)
    if cfg.shifted_softplus:
        g_sigma = g_sigma_out * jax.nn.sigmoid(sigma_pre + noise - 1.0)
    else:
        # mask in f32 so g_sigma (and its bias-grad row sum) accumulate
        # in f32 even with a cfg.dtype cotangent
        g_sigma = g_sigma_out * (
            (sigma_pre + noise).astype(jnp.float32) > 0
        ).astype(jnp.float32)

    wit = iter(range(n_w))
    trunk_idx = [(next(wit), next(wit)) for _ in range(cfg.layers)]
    sig_ki, sig_bi = next(wit), next(wit)
    if cfg.uses_dir_branch:
        fin_ki, fin_bi = next(wit), next(wit)
        da_ki, da_bi = next(wit), next(wit)
    rgb_ki, rgb_bi = next(wit), next(wit)

    # sigma head
    grad_refs[sig_ki][...] += _dT(h_last, g_sigma, cd)
    grad_refs[sig_bi][...] += jnp.sum(g_sigma, axis=0, keepdims=True)
    d_h = _d_rhsT(g_sigma, ws[sig_ki], cd)  # (B, d)

    if cfg.uses_dir_branch:
        d = final.shape[-1]
        # rgb head
        grad_refs[rgb_ki][...] += _dT(branch, g_rgb, cd)
        grad_refs[rgb_bi][...] += jnp.sum(g_rgb, axis=0, keepdims=True)
        d_branch = _d_rhsT(g_rgb, ws[rgb_ki], cd)
        # relu masks compared in f32: Mosaic has no bf16 vector cmpf.
        d_a_pre = (d_branch * (branch.astype(jnp.float32) > 0)).astype(cd)
        # dir_a packed input rows: [final | dir_enc | app]
        ka = ws[da_ki]
        grad_refs[da_ki][:d] += _dT(final, d_a_pre, cd)
        if dir_pad:
            grad_refs[da_ki][d : d + dir_pad] += _dT(dir_enc, d_a_pre, cd)
        if app_w:
            grad_refs[da_ki][d + dir_pad : d + dir_pad + app_w] += _dT(
                app, d_a_pre, cd
            )
            d_app_ref[...] = _d_rhsT(
                d_a_pre, ka[d + dir_pad : d + dir_pad + app_w], cd
            ).astype(d_app_ref.dtype)
        grad_refs[da_bi][...] += jnp.sum(d_a_pre, axis=0, keepdims=True)
        d_final = _d_rhsT(d_a_pre, ka[:d], cd)
        # final layer (no activation)
        grad_refs[fin_ki][...] += _dT(h_last, d_final, cd)
        grad_refs[fin_bi][...] += jnp.sum(d_final, axis=0, keepdims=True)
        d_h = d_h + _d_rhsT(d_final, ws[fin_ki], cd)
    else:
        grad_refs[rgb_ki][...] += _dT(h_last, g_rgb, cd)
        grad_refs[rgb_bi][...] += jnp.sum(g_rgb, axis=0, keepdims=True)
        d_h = d_h + _d_rhsT(g_rgb, ws[rgb_ki], cd)

    # trunk, last layer to first
    for i in reversed(range(cfg.layers)):
        ki, bi = trunk_idx[i]
        d_pre = (d_h * (hs[i].astype(jnp.float32) > 0)).astype(cd)
        grad_refs[bi][...] += jnp.sum(d_pre, axis=0, keepdims=True)
        h_in = enc if i == 0 else hs[i - 1]
        if i in cfg.skip_layers:
            grad_refs[ki][:enc_pad] += _dT(enc, d_pre, cd)
            grad_refs[ki][enc_pad:] += _dT(h_in, d_pre, cd)
            d_h = _d_rhsT(d_pre, ws[ki][enc_pad:], cd)
        else:
            grad_refs[ki][...] += _dT(h_in, d_pre, cd)
            if i > 0:
                d_h = _d_rhsT(d_pre, ws[ki], cd)


def _weights_tuple(packed: PackedMLP) -> Tuple[jnp.ndarray, ...]:
    ws = []
    for k, b in zip(packed.trunk_kernels, packed.trunk_biases):
        ws += [k, b]
    ws += [packed.sigma_kernel, packed.sigma_bias]
    if packed.config.uses_dir_branch:
        ws += [packed.final_kernel, packed.final_bias,
               packed.dir_a_kernel, packed.dir_a_bias]
    ws += [packed.rgb_kernel, packed.rgb_bias]
    return tuple(ws)


@functools.lru_cache(maxsize=32)
def _make_train_fn(cfg: NeRFConfig, enc_pad: int, dir_pad: int,
                   dir_packed: bool, app_w: int, block: int, interpret: bool,
                   noise_col: Optional[int]):
    """custom_vjp'd fused apply: (ws, enc, dir_enc, app) -> (m, LANE).

    Sigma noise travels inside enc at padding column `noise_col` (None =
    no noise); the output cotangent goes to the backward kernel raw, with
    the rgb/sigma lane masking done in-kernel. With `dir_packed` there is
    no dir_enc operand (pass None): the direction encoding lives in the
    enc tile and `dir_pad` is the dir weight-row block width (== enc_pad).
    """

    def fwd_call(ws, enc, dir_enc, app):
        m = enc.shape[0]
        grid = (m // block,)
        point = lambda w: pl.BlockSpec((block, w), lambda i: (i, 0))
        whole = lambda a: pl.BlockSpec(a.shape, lambda i: tuple(
            0 for _ in a.shape))
        inputs = [enc]
        specs = [point(enc_pad)]
        if dir_pad and not dir_packed:
            inputs.append(dir_enc); specs.append(point(dir_pad))
        if app_w:
            inputs.append(app); specs.append(point(app_w))
        inputs.extend(ws)
        specs.extend(whole(w) for w in ws)
        return pl.pallas_call(
            functools.partial(
                _train_fwd_kernel, cfg, enc_pad, dir_pad, dir_packed, app_w,
                noise_col,
            ),
            grid=grid,
            in_specs=specs,
            out_specs=pl.BlockSpec((block, LANE), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((m, LANE), jnp.float32),
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(*inputs)

    def bwd_call(ws, enc, dir_enc, app, g):
        m = enc.shape[0]
        grid = (m // block,)
        point = lambda w: pl.BlockSpec((block, w), lambda i: (i, 0))
        whole = lambda a: pl.BlockSpec(a.shape, lambda i: tuple(
            0 for _ in a.shape))
        inputs = [enc]
        specs = [point(enc_pad)]
        if dir_pad and not dir_packed:
            inputs.append(dir_enc); specs.append(point(dir_pad))
        if app_w:
            inputs.append(app); specs.append(point(app_w))
        inputs.append(g)
        specs.append(point(LANE))
        inputs.extend(ws)
        specs.extend(whole(w) for w in ws)

        out_shapes = []
        out_specs = []
        if app_w:
            out_shapes.append(jax.ShapeDtypeStruct((m, app_w), jnp.float32))
            out_specs.append(point(app_w))
        for w in ws:
            out_shapes.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
            out_specs.append(whole(w))
        outs = pl.pallas_call(
            functools.partial(
                _train_bwd_kernel, cfg, enc_pad, dir_pad, dir_packed, app_w,
                noise_col,
            ),
            grid=grid,
            in_specs=specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(*inputs)
        if app_w:
            return outs[0], tuple(outs[1:])
        return None, tuple(outs)

    # The rgb+sigma column slice lives INSIDE the custom_vjp: outside it,
    # XLA transposes the slice into an explicit f32 (m, 4) -> (m, LANE)
    # pad that wrote 268 MB per pass (pad.94/.102/.110 in the round-5
    # profile, ~1.6 ms/step). Here the cotangent arrives as the packed
    # (m, 4) array and is expanded directly in cfg.dtype — half the bytes,
    # and exact for the weight-grad matmuls, which cast every operand to
    # cfg.dtype anyway (_dT/_d_rhsT). The activation-derivative products
    # still run in f32 (g upcasts against the f32 sigmoid terms); only
    # the per-element cotangent value is rounded once.
    @jax.custom_vjp
    def apply(ws, enc, dir_enc, app):
        return fwd_call(ws, enc, dir_enc, app)[:, :4]

    def apply_fwd(ws, enc, dir_enc, app):
        return fwd_call(ws, enc, dir_enc, app)[:, :4], (ws, enc, dir_enc, app)

    def apply_bwd(res, g):
        ws, enc, dir_enc, app = res
        g_full = jnp.pad(g.astype(cfg.dtype), ((0, 0), (0, LANE - 4)))
        d_app, d_ws = bwd_call(ws, enc, dir_enc, app, g_full)
        return (
            d_ws,
            jnp.zeros_like(enc),
            None if dir_enc is None else jnp.zeros_like(dir_enc),
            None if app is None else d_app,
        )

    apply.defvjp(apply_fwd, apply_bwd)
    return apply


# Same coverage rule for forward-only and training kernels.
supports_fused_train = functools.partial(supports_fused_kernels, train=True)


def fused_nerf_train_apply(
    cfg: NeRFConfig,
    params: Dict[str, Any],
    xyz: jnp.ndarray,
    dirs: Optional[jnp.ndarray],
    app_embed: Optional[jnp.ndarray],  # (M, appearance_dim), pre-gathered
    sigma_noise: Optional[jnp.ndarray],  # (M,) or (M, 1), or None
    block: int = 1024,
    interpret: Optional[bool] = None,
    dir_pack: Optional[bool] = None,
) -> jnp.ndarray:
    """Differentiable fused forward -> (M, 4) [sigmoid rgb, activated sigma].

    Drop-in for the Flax NeRF `apply` on the training path; gradients flow
    to `params` (through the padding done by `pack_params(cast=False)`)
    and to `app_embed`.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    # dir_pack default: probed per compiler build. The packed-dir TRAIN
    # kernels hang one deployed libtpu's Mosaic compiler (Nov 2025 build)
    # on v5e; the same kernels AOT-compile in seconds against the newer
    # local libtpu (Jan 2026) — a since-fixed compiler bug, bisected via
    # axon's chipless local_only registration. The eval kernel with the
    # identical packed layout compiles and runs everywhere.
    # `compositor_probe.train_dir_pack_choice` gates the known-bad build
    # off without probing and probes anything newer once (cached), so the
    # measured-faster packed layout turns on automatically the moment the
    # serving compiler upgrades. `MNTPU_TRAIN_DIR_PACK=0|1` overrides.
    if dir_pack is None:
        from mega_nerf_tpu.render.compositor_probe import (
            train_dir_pack_choice,
        )

        dir_pack = train_dir_pack_choice()
    packed = pack_params(cfg, params, cast=False, dir_pack=dir_pack)
    m = xyz.shape[0]
    block, m_pad = choose_block(m, block)

    # Noise rides in the first zero-padding column of enc (exact f32; the
    # column's weight rows are zero, so the matmuls never see it). A
    # standalone (M, 1) array would tile to (M, 128) physically in HBM.
    noise_col = None
    if sigma_noise is not None:
        noise_col = packed.enc_in + packed.dir_in if packed.dir_packed \
            else packed.enc_in
        assert noise_col < packed.enc_pad, (noise_col, packed.enc_pad)
    noise_flat = None if sigma_noise is None \
        else sigma_noise.astype(jnp.float32).reshape(m)
    dir_coords = None
    if cfg.pos_dir_dim > 0:
        assert dirs is not None
        if cfg.ref_packed_dirs and cfg.appearance_dim == 0:
            dir_coords = jnp.concatenate([xyz[:, -1:], dirs[:, :2]], axis=-1)
        else:
            dir_coords = dirs
    dir_enc = None
    # Encode math runs in f32 (sin arguments need the precision) but the
    # tiles ship in cfg.dtype, exactly like the eval path: the kernels
    # cast them to cfg.dtype on entry anyway, so an f32 tile was pure HBM
    # waste — ~1.4 GB/step at the paper config (each tile is written once
    # and read twice: forward + the backward's remat). The noise column
    # stays exact because _model_eval pre-rounds noise values to
    # cfg.dtype (callers passing their own noise should do the same for
    # bit-equality with the XLA path).
    if packed.dir_packed:
        # Position + direction encodings in ONE pass and ONE stream (see
        # pack_params's dir_packed layout).
        enc = _freq_encode_groups(
            jnp.concatenate(
                [xyz.astype(jnp.float32), dir_coords.astype(jnp.float32)],
                axis=-1,
            ),
            ((xyz.shape[1], cfg.pos_xyz_dim),
             (dir_coords.shape[1], cfg.pos_dir_dim)),
            packed.enc_pad,
            extra=noise_flat,
            extra_col=noise_col,
        ).astype(cfg.dtype)
    else:
        enc = _freq_encode_block(
            xyz.astype(jnp.float32), cfg.pos_xyz_dim, packed.enc_pad,
            extra=noise_flat,
            extra_col=noise_col,
        ).astype(cfg.dtype)
        if cfg.pos_dir_dim > 0:
            dir_enc = _freq_encode_block(
                dir_coords.astype(jnp.float32), cfg.pos_dir_dim,
                packed.dir_pad,
            ).astype(cfg.dtype)
    app_w = 0
    if cfg.appearance_dim > 0 and not cfg.affine_appearance:
        assert app_embed is not None
        app_w = app_embed.shape[-1]

    fn = _make_train_fn(
        cfg, packed.enc_pad,
        packed.enc_pad if packed.dir_packed else packed.dir_pad,
        packed.dir_packed, app_w, block, interpret, noise_col,
    )
    out = fn(
        _weights_tuple(packed),
        pad_points(enc, m_pad),
        pad_points(dir_enc, m_pad),
        pad_points(app_embed.astype(jnp.float32), m_pad) if app_w else None,
    )[:m]
    return out  # (m, 4): [sigmoid rgb, activated sigma] (sliced in-vjp)
