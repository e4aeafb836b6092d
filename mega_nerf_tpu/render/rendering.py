"""Hierarchical coarse->fine volume renderer with NeRF++ fg/bg decomposition.

Parity target: reference `mega_nerf/rendering.py:15-393` (`render_rays`,
`_get_results`, `_inference`). Redesigned for XLA:

- **Static shapes everywhere.** The reference gathers the subset of rays
  whose far bound exceeds the foreground ellipsoid exit (`rendering.py:37`)
  and runs the background model only on those. Here the background is
  evaluated densely for *all* rays and its contribution is masked by
  `has_bg = far > fg_far` — identical output, no dynamic shapes, and the
  extra FLOPs vectorize onto the MXU.
- **No model chunking inside the renderer.** The reference loops
  `model_chunk_size` slices in Python (`rendering.py:289,311`); under jit
  XLA tiles the batched MLP itself. Host-level chunking only happens at the
  whole-image eval loop.
- **Explicit PRNG.** Stratified perturbation, hierarchical sampling, and the
  uniform sigma noise (`rendering.py:294,321`) consume split jax keys.
- **No dead-submodule hack.** The reference forwards empty batches so DDP's
  all-reduce doesn't hang (`rendering.py:143-171`, `models/mega_nerf.py:51-59`);
  jitted SPMD programs always touch all parameters, so absent rays simply
  produce zero gradients. The trainer uses the returned `bg_rays_present`
  scalar to skip the background optimizer step like the reference does
  (`runner.py:268-272`).

Known deviation: for background fine sampling the reference pairs
ascending-z bins with compositing weights computed in *descending*-z order
(`rendering.py:213-216` vs `271-273`), effectively reversing the sampling
PDF across bins. We align weights to bins (flipping the weights back), which
places the background fine samples where the coarse pass actually found
density.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from mega_nerf_tpu.models.factory import ModelBundle
from mega_nerf_tpu.ops.compositing import (
    composite_weights,
    composite_weights_merge,
    composite_weights_merge_grouped,
    composite_weights_union,
)
from mega_nerf_tpu.ops.geometry import depth2pts_outside, intersect_sphere
from mega_nerf_tpu.ops.sampling import expand_and_perturb_z_vals, sample_pdf
from mega_nerf_tpu.ops.sh import eval_sh

INF_DELTA = 1e10


@dataclasses.dataclass(frozen=True)
class RenderSettings:
    """Static (hashable) rendering configuration — safe as a jit closure."""

    coarse_samples: int = 256
    fine_samples: int = 512
    use_cascade: bool = False
    perturb: float = 1.0
    sh_deg: Optional[int] = None
    sigma_noise: bool = True  # uniform [0,1) density noise during training
    # Rematerialize MLP activations in the backward pass (jax.checkpoint):
    # trades ~33% more FLOPs for ~10x less activation HBM traffic. Useful for
    # big batches / long sample counts on HBM-bandwidth-bound chips.
    remat: bool = False
    # Use the fused Pallas MLP kernels for model evaluation: pallas_mlp.py
    # for eval/render, pallas_train.py (custom VJP) for training. Mega
    # mixtures, SH heads, and affine appearance fall back to XLA
    # automatically. "auto" (default) = on TPU backends, where the full
    # render path measures 1.43x faster than the tuned XLA lowering and the
    # train step 1.12x; True = always, even on CPU where the kernels run in
    # slow interpret mode (testing); False = XLA.
    use_pallas: Any = "auto"
    # Coarse+fine compositor for the EVAL path: "merge_grouped" = two-level
    # grouped cross terms (cheapest), "merge" = sort-free two-sorted-lists
    # merge (4.5x cheaper than union), "union" = O((Sa+Sb)^2) masked union,
    # "auto" = best candidate the serving compiler can lower — decided once
    # per compiler build by `render.compositor_probe` (a known-bad libtpu
    # crashes on the composed merge graph; see _inference). Train always
    # uses the pairwise merge (proven stable at train shapes).
    eval_compositor: Any = "auto"
    # Use the two-level grouped inverse-CDF bracketing on the TRAIN path
    # too, via the SAME size heuristic as eval (grouped engages at >= 64
    # cdf entries; below that the dense bracketing is already cheap and
    # this flag is a no-op — at the paper config coarse_samples=256 it
    # does engage). Off by default: the driver's bench must never meet a
    # lowering unproven against the deployed compiler — flip after an
    # on-chip A/B (see bench.py's MNTPU_TRAIN_GROUPED_CDF hook).
    train_grouped_cdf: bool = False
    # Use the grouped-cross-terms coarse+fine compositor
    # (composite_weights_merge_grouped) on the TRAIN path instead of the
    # pairwise merge. Gradient equality with the pairwise form is pinned in
    # tests/test_ops_compositing.py; off by default for the same
    # proven-lowering-first policy as train_grouped_cdf (A/B hook:
    # MNTPU_TRAIN_GROUPED_MERGE in bench.py). Ignored when perturb > 1
    # (unsorted lists -> union fallback, as for the pairwise merge).
    train_grouped_merge: bool = False
    # Reproduce the reference's bg fine-sampling quirk exactly: the
    # reference computes bg coarse compositing weights in DESCENDING-z
    # order but pairs them with ASCENDING-z bins when building the fine
    # sampling CDF (`/root/reference/mega_nerf/rendering.py:213-216` vs
    # `271-273`), effectively reversing the sampling PDF across bins. Our
    # default flips the weights back into bin order (module docstring —
    # fine samples land where the coarse pass found density). Set this
    # (--ref_bg_sampling) when continuing training from reference
    # checkpoints, so the bg sampling distribution matches the one they
    # were trained under, like ref_packed_dirs does for input packing.
    ref_bg_sampling: bool = False
    get_depth: bool = False
    get_depth_variance: bool = False
    get_bg_fg_rgb: bool = False
    # Mip-NeRF 360 distortion regularizer weight (> 0 emits a per-ray
    # `distortion_coarse` term for the trainer; an anti-floater lever for
    # spatially-partitioned training, beyond the reference). 0 = off.
    distortion_loss_weight: float = 0.0

    @classmethod
    def from_hparams(cls, hparams, **overrides) -> "RenderSettings":
        kw = dict(
            coarse_samples=getattr(hparams, "coarse_samples", 256),
            fine_samples=getattr(hparams, "fine_samples", 512),
            use_cascade=getattr(hparams, "use_cascade", False),
            perturb=getattr(hparams, "perturb", 1.0),
            sh_deg=getattr(hparams, "sh_deg", None),
            remat=getattr(hparams, "remat", False),
            use_pallas=getattr(hparams, "use_pallas", "auto"),
            eval_compositor=getattr(hparams, "eval_compositor", "auto"),
            ref_bg_sampling=getattr(hparams, "ref_bg_sampling", False),
            distortion_loss_weight=getattr(
                hparams, "distortion_loss_weight", 0.0
            ),
        )
        kw.update(overrides)
        return cls(**kw)


_LOGGED_MLP_PATHS = set()


def _log_mlp_path(message: str) -> None:
    """Print each distinct compiled-path decision once per process."""
    if message not in _LOGGED_MLP_PATHS:
        _LOGGED_MLP_PATHS.add(message)
        from mega_nerf_tpu.runtime.logging import main_print

        main_print(message)


def _supports_fused(bundle, train: bool = False) -> bool:
    """Eval/train fused-kernel eligibility for this bundle's architecture.

    Mega mixtures and duck-typed test fakes (no `cascade` attr) are out;
    real bundles additionally need the kernel shape coverage
    (pallas_mlp.supports_fused_kernels: rgb head, no affine appearance,
    lane-aligned layer_dim on TPU; the train gate stops at 1024 channels
    where eval reaches 2048 — see that docstring)."""
    if getattr(bundle, "is_mega", True):
        return False
    if not hasattr(bundle, "cascade") or not hasattr(bundle, "config"):
        return False
    from mega_nerf_tpu.render.pallas_mlp import supports_fused_kernels

    return supports_fused_kernels(bundle.config, train=train)


def _app_embed_per_ray(cfg, params, image_indices, n, s):
    """(n,) ray indices -> (n*s, app_dim) embeddings, f32.

    One-hot matmul at RAY granularity (not a row gather — see
    models.nerf.OneHotEmbed — and not per-point either: the (n*s, count)
    one-hot costs ~2ms of pure HBM traffic per 786k-point pass, s-fold
    more than the per-ray one), then broadcast across the sample axis."""
    table = jnp.asarray(params["appearance"]["embedding"])
    # Clamp like nn.Embed's take(mode="clip") — see models.nerf.OneHotEmbed.
    image_indices = jnp.clip(image_indices, 0, table.shape[0] - 1)
    one_hot = jax.nn.one_hot(image_indices, table.shape[0], dtype=cfg.dtype)
    app = jnp.dot(
        one_hot, table.astype(cfg.dtype), preferred_element_type=jnp.float32
    )  # (n, app_dim)
    return jnp.broadcast_to(
        app[:, None], (n, s, app.shape[-1])
    ).reshape(n * s, app.shape[-1])


def _pallas_eval(bundle, params, flat_xyz, dirs, app_embed,
                 block: int = 1024):
    """Inference via the fused Pallas MLP kernel (render/pallas_mlp.py),
    padding the point count to a block multiple."""
    from mega_nerf_tpu.render.pallas_mlp import (
        choose_block,
        fused_nerf_eval,
        pack_params,
        pad_points,
    )

    from mega_nerf_tpu.render.pallas_mlp import eval_block_for

    packed = pack_params(bundle.config, params)
    m = flat_xyz.shape[0]
    block, m_pad = choose_block(m, eval_block_for(bundle.config, block))
    out = fused_nerf_eval(
        packed,
        pad_points(flat_xyz, m_pad),
        pad_points(dirs, m_pad),
        pad_points(app_embed, m_pad),
        block=block,
    )
    return out[:m]


def _pallas_gate(
    bundle: ModelBundle, settings: RenderSettings, train: bool
) -> Tuple[bool, str]:
    """Would this bundle's MLP passes compile to the fused Pallas kernels?

    "auto" engages only where Mosaic compiles natively; on CPU the
    kernels would run in (slow) interpret mode, so fall back to XLA
    there unless explicitly forced with use_pallas=True. The verdict is
    static per compiled fn (all inputs are trace-time constants), so the
    compositor gate below can rely on it.
    """
    if not settings.use_pallas:
        return False, "disabled (--no_pallas)"
    if settings.use_pallas != True and jax.default_backend() != "tpu":  # noqa: E712
        return False, f"non-TPU backend ({jax.default_backend()})"
    if settings.sh_deg is not None:
        return False, "SH output head"
    if not _supports_fused(bundle, train=train):
        return False, (
            "architecture outside kernel coverage (mega mixture, affine "
            "appearance, or layer_dim gate — see pallas_mlp.supports_fused_kernels)"
        )
    return True, ""


def _model_eval(
    bundle: ModelBundle,
    params,
    typ: str,
    settings: RenderSettings,
    xyz: jnp.ndarray,  # (N, S, D)
    rays_d: jnp.ndarray,  # (N, 1, 3)
    image_indices: Optional[jnp.ndarray],  # (N,)
    train: bool,
    key: Optional[jax.Array],
    ray_routing: Optional[Tuple[jnp.ndarray, int]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Evaluate the MLP on all samples -> (rgbs (N,S,3), sigmas (N,S)).

    Mirrors the reference chunk loop body (`rendering.py:285-334`) without
    chunking; applies the SH head + sigmoid when sh_deg is set
    (`rendering.py:301-306`).

    `ray_routing = (support (N, K) bool, capacity int)` routes whole rays
    to their supported submodules via one-hot capacity dispatch
    (models/mega.mega_apply_ray_routed) instead of the dense K-way blend —
    eval-only, mega bundles only; exact under the support/capacity
    contract documented there.
    """
    n, s, d = xyz.shape
    flat_xyz = xyz.reshape(n * s, d)
    dirs = jnp.broadcast_to(rays_d, (n, s, 3)).reshape(n * s, 3)
    use_dirs = bundle.config.pos_dir_dim > 0
    idx = None
    if bundle.config.appearance_dim > 0:
        assert image_indices is not None
        idx = jnp.broadcast_to(image_indices[:, None], (n, s)).reshape(n * s)

    sigma_noise = None
    if train and key is not None and settings.sigma_noise:
        # Uniform [0,1) pre-activation density noise (rendering.py:294,321).
        # Generated 1-D (packed lanes): a (n*s, 1) array is physically
        # (n*s, 128)-tiled on TPU, which made the RNG alone ~3 ms/step.
        # Rounded to the compute dtype: the fused train kernels carry the
        # noise in a padding column of the (now compute-dtype) encode tile
        # (pallas_train.fused_nerf_train_apply), and pre-rounding keeps
        # the fused and XLA paths applying bit-identical noise. Rounded
        # uniforms are still uniform regularization noise; the f32 encode
        # tiles they forced cost ~1.4 GB/step of HBM traffic.
        sigma_noise = (
            jax.random.uniform(key, (n * s,))
            .astype(getattr(bundle.config, "dtype", jnp.float32))
            .astype(jnp.float32)
        )

    pallas_ok, why = _pallas_gate(bundle, settings, train)
    # Trace-time, once per distinct path: a user benchmarking a config that
    # silently fell back to XLA would otherwise report "Pallas" numbers that
    # aren't (the gates are static, so this is exact for the compiled fn).
    _log_mlp_path(
        f"MLP path [{typ}/{'train' if train else 'eval'}]: "
        + ("pallas-fused" if pallas_ok else f"XLA ({why})")
    )
    # Cascade bundles hold two independent NeRFs under "coarse"/"fine"
    # (models/cascade.py); the fused kernels just take the right subtree.
    p_kernel = None
    if pallas_ok:
        p_kernel = params[typ] if bundle.cascade else params
    if pallas_ok and train:
        # Differentiable fused path (render/pallas_train.py): the kernels
        # cover the piecewise-linear network; noise + activations are
        # applied in XLA inside fused_nerf_train_apply.
        from mega_nerf_tpu.render.pallas_train import fused_nerf_train_apply

        app_embed = None
        if bundle.config.appearance_dim > 0:
            app_embed = _app_embed_per_ray(
                bundle.config, p_kernel, image_indices, n, s
            )
        out = fused_nerf_train_apply(
            bundle.config, p_kernel, flat_xyz, dirs if use_dirs else None,
            app_embed, sigma_noise,
        )
    elif pallas_ok and not train and sigma_noise is None:
        app_embed = None
        if bundle.config.appearance_dim > 0:
            app_embed = _app_embed_per_ray(
                bundle.config, p_kernel, image_indices, n, s
            ).astype(bundle.config.dtype)
        out = _pallas_eval(bundle, p_kernel, flat_xyz,
                           dirs if use_dirs else None, app_embed)
    elif (
        ray_routing is not None
        and bundle.is_mega
        and not train
        and sigma_noise is None
    ):
        support, cap = ray_routing[0], ray_routing[1]
        cells = ray_routing[2] if len(ray_routing) > 2 else None
        out = bundle.apply_ray_routed(
            params, typ, xyz,
            rays_d[:, 0, :] if use_dirs else None,
            image_indices if bundle.config.appearance_dim > 0 else None,
            support, cap, cell_ids=cells,
        ).reshape(n * s, -1)
    else:
        apply_fn = lambda p, x, d, i, sn: bundle.apply(p, typ, x, d, i, sn)
        if settings.remat:
            apply_fn = jax.checkpoint(apply_fn)
        out = apply_fn(
            params, flat_xyz, dirs if use_dirs else None, idx,
            None if sigma_noise is None else sigma_noise[:, None],
        )

    if settings.sh_deg is not None:
        rgb_dim = 3 * (settings.sh_deg + 1) ** 2
        coeffs = out[:, :rgb_dim].reshape(n * s, 3, (settings.sh_deg + 1) ** 2)
        rgb = jax.nn.sigmoid(eval_sh(settings.sh_deg, coeffs, dirs))
        out = jnp.concatenate([rgb, out[:, rgb_dim:]], axis=-1)

    out = out.reshape(n, s, out.shape[-1])
    return out[..., :3], out[..., 3]


def _inference(
    results: Dict[str, jnp.ndarray],
    typ: str,
    bundle: ModelBundle,
    params,
    settings: RenderSettings,
    rays_d: jnp.ndarray,
    image_indices: Optional[jnp.ndarray],
    xyz: jnp.ndarray,
    z_vals: jnp.ndarray,
    last_delta: jnp.ndarray,  # (N, 1)
    composite_rgb: bool,
    get_depth: bool,
    get_depth_variance: bool,
    get_weights: bool,
    get_bg_lambda: bool,
    flip: bool,
    depth_real: Optional[jnp.ndarray],
    train: bool,
    key: Optional[jax.Array],
    ray_routing: Optional[Tuple[jnp.ndarray, int]] = None,
) -> None:
    """One sampling level: MLP eval + (optional coarse merge) + compositing.

    Parity: reference `_inference` (`rendering.py:251-393`). The coarse raw
    outputs are stashed in `results` under zvals/raw_rgb/raw_sigma/_coarse
    and merged into the fine pass by a descending/ascending sort, exactly as
    the reference does for the non-cascade path (`rendering.py:336-350`).
    """
    merge_prev = "zvals_coarse" in results

    if flip and not merge_prev:
        xyz = jnp.flip(xyz, axis=-2)
        z_vals = jnp.flip(z_vals, axis=-1)
        if depth_real is not None:
            depth_real = jnp.flip(depth_real, axis=-1)

    rgbs, sigmas = _model_eval(
        bundle, params, typ, settings, xyz, rays_d, image_indices, train, key,
        ray_routing=ray_routing,
    )

    if merge_prev:
        # Merge the coarse and fine sample sets WITHOUT sorting: every
        # consumer below (rgb/depth/variance sums) is order-invariant, so
        # order-dependent quantities come from a masked-reduction
        # compositor instead of the reference's sort + payload gathers
        # (`rendering.py:336-350`, ~90ms/step on TPU). Both lists arrive
        # pre-sorted in composite order (sample_cdf emits ascending fine
        # depths, flipped for the descending bg pass in _get_results), so
        # the two-sorted-lists merge applies: prefix sums within each list
        # + O(Sa*Sb) cross terms, 4.5x cheaper than the O((Sa+Sb)^2)
        # unsorted union. perturb > 1 voids the coarse list's sortedness
        # (jitter escapes the stratification bins) -> union fallback.
        #
        # EVAL is gated per compiler build: at eval batch sizes
        # (16384-ray image chunks) the merge's (N, Sa, Sb) masked reduces,
        # composed next to the Pallas eval kernels' custom calls, crash
        # one deployed libtpu outright — an XLA:TPU lowering fault that is
        # context-dependent (the identical reduces pass standalone at the
        # same shapes, and pass composed with the XLA MLP path). Train
        # (batch ~1024, fused custom-VJP kernels) is proven stable
        # everywhere; eval asks `compositor_probe.merge_eval_ok`, which
        # version-gates the known-bad build and AOT-probes any other
        # serving compiler once (guarded subprocess, cached verdict).
        if train:
            if settings.perturb > 1.0:
                compositor = "union"
            elif settings.train_grouped_merge:
                compositor = "merge_grouped"
            else:
                compositor = "merge"
        elif settings.eval_compositor == "auto":
            from mega_nerf_tpu.render.compositor_probe import (
                eval_compositor_choice,
            )

            compositor = eval_compositor_choice()
        else:
            compositor = settings.eval_compositor
        if compositor == "merge_grouped":
            cw = composite_weights_merge_grouped(
                z_vals, sigmas,
                results["zvals_coarse"], results["raw_sigma_coarse"],
                last_delta, flip=flip,
            )
        elif compositor == "merge":
            cw = composite_weights_merge(
                z_vals, sigmas,
                results["zvals_coarse"], results["raw_sigma_coarse"],
                last_delta, flip=flip,
            )
        else:
            cw = composite_weights_union(
                jnp.concatenate([z_vals, results["zvals_coarse"]], axis=-1),
                jnp.concatenate([sigmas, results["raw_sigma_coarse"]], axis=1),
                last_delta, flip=flip,
            )
        z_vals = jnp.concatenate([z_vals, results["zvals_coarse"]], axis=-1)
        rgbs = jnp.concatenate([rgbs, results["raw_rgb_coarse"]], axis=1)
        sigmas = jnp.concatenate([sigmas, results["raw_sigma_coarse"]], axis=1)
        if depth_real is not None:
            depth_real = jnp.concatenate(
                [depth_real, results["depth_real_coarse"]], axis=-1
            )
    else:
        cw = composite_weights(sigmas, z_vals, last_delta, flip=flip)
    weights = cw.weights

    if get_bg_lambda:
        results[f"bg_lambda_{typ}"] = cw.bg_lambda
    if get_weights:
        results[f"weights_{typ}"] = weights
    if (
        settings.distortion_loss_weight > 0
        and typ == "coarse"
        and not flip
        and not merge_prev
    ):
        # Mip-NeRF 360 distortion regularizer (beyond the reference — an
        # anti-floater lever for per-cell training, where a submodule can
        # hide view-consistent density in rarely-triangulated space; off
        # by default). Coarse pass only: its z ascend per ray, so the
        # O(S^2) pairwise |s_i - s_j| collapses to exclusive cumsums —
        # sum_ij w_i w_j |s_i-s_j| = 2 sum_i w_i (s_i W_<i - (ws)_<i).
        span = z_vals[:, -1:] - z_vals[:, :1] + 1e-8
        s = (z_vals - z_vals[:, :1]) / span
        d = jnp.concatenate(
            [s[:, 1:] - s[:, :-1], jnp.zeros_like(s[:, :1])], axis=-1
        )
        cum_w = jnp.cumsum(weights, axis=-1) - weights
        cum_ws = jnp.cumsum(weights * s, axis=-1) - weights * s
        results["distortion_coarse"] = (
            2.0 * jnp.sum(weights * (s * cum_w - cum_ws), axis=-1)
            + jnp.sum(weights**2 * d, axis=-1) / 3.0
        )

    if composite_rgb:
        results[f"rgb_{typ}"] = jnp.sum(weights[..., None] * rgbs, axis=1)
    else:
        results[f"zvals_{typ}"] = z_vals
        results[f"raw_rgb_{typ}"] = rgbs
        results[f"raw_sigma_{typ}"] = sigmas
        if depth_real is not None:
            results[f"depth_real_{typ}"] = depth_real

    if get_depth or get_depth_variance:
        w = jax.lax.stop_gradient(weights)
        z = jax.lax.stop_gradient(depth_real if depth_real is not None else z_vals)
        depth_map = jnp.sum(w * z, axis=1)
        if get_depth:
            results[f"depth_{typ}"] = depth_map
        if get_depth_variance:
            zz = jax.lax.stop_gradient(z_vals)
            results[f"depth_variance_{typ}"] = jnp.sum(
                w * jnp.square(zz - depth_map[:, None]), axis=-1
            )


def _get_results(
    bundle: ModelBundle,
    params,
    settings: RenderSettings,
    rays_d: jnp.ndarray,
    image_indices: Optional[jnp.ndarray],
    xyz_coarse: jnp.ndarray,
    z_vals: jnp.ndarray,
    last_delta: jnp.ndarray,
    get_depth: bool,
    get_depth_variance: bool,
    get_bg_lambda: bool,
    flip: bool,
    depth_real: Optional[jnp.ndarray],
    xyz_fine_fn,
    fine_samples: int,
    train: bool,
    key: Optional[jax.Array],
    ray_routing: Optional[Tuple[jnp.ndarray, int]] = None,
) -> Dict[str, jnp.ndarray]:
    """Coarse pass + hierarchical fine pass (reference `rendering.py:176-248`)."""
    results: Dict[str, jnp.ndarray] = {}

    k_noise_c = k_sample = k_noise_f = None
    if key is not None:
        k_noise_c, k_sample, k_noise_f = jax.random.split(key, 3)

    capped = last_delta[:, 0] < INF_DELTA
    z_max = jnp.max(z_vals, axis=-1)
    last_delta_c = last_delta - jnp.where(capped, z_max, 0.0)[:, None]

    _inference(
        results,
        "coarse",
        bundle,
        params,
        settings,
        rays_d,
        image_indices,
        xyz_coarse,
        z_vals,
        last_delta_c,
        # The reference only composites coarse when cascading
        # (rendering.py:204); we also composite when there is no fine pass at
        # all so coarse-only configs still produce rgb_coarse.
        composite_rgb=settings.use_cascade or fine_samples == 0,
        get_depth=(fine_samples == 0) and get_depth,
        get_depth_variance=(fine_samples == 0) and get_depth_variance,
        get_weights=fine_samples > 0,
        get_bg_lambda=get_bg_lambda and (settings.use_cascade or fine_samples == 0),
        flip=flip,
        depth_real=depth_real,
        train=train,
        key=k_noise_c,
        ray_routing=ray_routing,
    )

    if fine_samples == 0:
        return results

    z_vals_mid = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
    weights_c = jax.lax.stop_gradient(results.pop("weights_coarse"))[:, 1:-1]
    if flip and not settings.ref_bg_sampling:
        # Deviation from the reference (see module docstring): weights were
        # computed in descending-z order; flip them back to align with the
        # ascending bins before building the sampling CDF.
        # `ref_bg_sampling=True` skips the flip, reproducing the
        # reference's reversed bg sampling PDF bit-for-bit.
        weights_c = jnp.flip(weights_c, axis=-1)
    perturb = settings.perturb if train else 0.0
    # grouped bracketing: ~9x less VPU work (19% of eval device time at the
    # paper config, PERF.md round-3 profile). Train keeps the proven dense
    # reduces until the grouped einsum lowering is validated against the
    # deployed compiler next to the fused custom-VJP train kernels — the
    # driver's bench must never meet an unproven pattern first
    # (settings.train_grouped_cdf opts in for the A/B).
    fine_z_vals = sample_pdf(
        z_vals_mid, weights_c, fine_samples, det=(perturb == 0), key=k_sample,
        grouped=None if (not train or settings.train_grouped_cdf) else False,
    )
    fine_z_vals = jax.lax.stop_gradient(fine_z_vals)
    if flip:
        # sample_cdf emits ascending depths; the bg pass composites in
        # descending order, and the merge compositor needs the fine list
        # sorted in composite order like the (already descending) coarse
        # stash. Flipping HERE means xyz/rgb/sigma are computed in the
        # flipped order directly — no payload reordering later.
        fine_z_vals = jnp.flip(fine_z_vals, axis=-1)

    if settings.use_cascade:
        fine_z_vals = jnp.sort(
            jnp.concatenate([z_vals, fine_z_vals], axis=-1), axis=-1
        )

    xyz_fine, depth_real_fine = xyz_fine_fn(fine_z_vals)

    z_max_f = jnp.max(fine_z_vals, axis=-1)
    last_delta_f = last_delta - jnp.where(capped, z_max_f, 0.0)[:, None]

    _inference(
        results,
        "fine",
        bundle,
        params,
        settings,
        rays_d,
        image_indices,
        xyz_fine,
        fine_z_vals,
        last_delta_f,
        composite_rgb=True,
        get_depth=get_depth,
        get_depth_variance=get_depth_variance,
        get_weights=False,
        get_bg_lambda=get_bg_lambda,
        flip=flip,
        depth_real=depth_real_fine,
        train=train,
        key=k_noise_f,
        ray_routing=ray_routing,
    )

    for k in ("zvals_coarse", "raw_rgb_coarse", "raw_sigma_coarse",
              "depth_real_coarse"):
        results.pop(k, None)
    return results


def render_rays(
    fg: ModelBundle,
    bg: Optional[ModelBundle],
    fg_params,
    bg_params,
    rays: jnp.ndarray,  # (N, 8)
    image_indices: Optional[jnp.ndarray],  # (N,)
    settings: RenderSettings,
    sphere_center: Optional[jnp.ndarray] = None,
    sphere_radius: Optional[jnp.ndarray] = None,
    train: bool = False,
    key: Optional[jax.Array] = None,
    fg_bounds: Optional[jnp.ndarray] = None,  # (N, 2) tightened fg interval
    fg_ray_support: Optional[jnp.ndarray] = None,  # (N, Kv) bool support
    fg_ray_capacity: Optional[int] = None,  # static max per-column ray count
    fg_ray_cells: Optional[jnp.ndarray] = None,  # (Kv,) virtual->cell map
) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
    """Render a batch of rays -> (results dict, bg_rays_present scalar).

    Parity: reference `render_rays` (`rendering.py:15-173`). The results dict
    carries the same keys (`rgb_fine`, `depth_fine`, `bg_lambda_fine`,
    `fg_rgb_fine`, ... depending on settings).

    `fg_bounds` (opt-in, render/ray_bounds.py): occupancy-tightened
    [near, far] for the FOREGROUND sampling interval only — applied after
    the ellipsoid clamp and never consulted by the `has_bg` background
    decision, which keys on the ray's raw far. With `fg_bounds=None` the
    graph is unchanged.

    `fg_ray_support` + `fg_ray_capacity` (opt-in): per-ray submodule
    support masks (host: cell_cull.ray_support_masks, load-balanced into
    virtual experts by models.ray_route_plan whose `cell_ids` ride in
    `fg_ray_cells`) routing the FOREGROUND mega mixture at ray
    granularity via one-hot capacity dispatch
    (models/mega.mega_apply_ray_routed) instead of the dense K-way
    blend. Foreground only: with boundary_margin > 1 every background
    point far from the scene activates ALL cells (distance ratios tend
    to 1 with |p|), so an exact bg route degenerates to dense — the bg
    keeps the dense blend. Eval-only (ignored when `train=True`).
    """
    n_rays = rays.shape[0]
    rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
    near, far = rays[:, 6:7], rays[:, 7:8]

    if not train and settings.eval_compositor == "auto":
        # The known compiler fault only bites when the merge compositor is
        # COMPOSED with the Pallas kernels' custom calls (the identical
        # reduces pass with the XLA MLP path — bisected, PERF.md). When no
        # pass in this graph engages the kernels (mega mixtures, SH heads,
        # CPU, --no_pallas), take the cheap pairwise merge outright instead
        # of consulting the probe: merged-model eval — the flagship
        # workflow — gets the 4.5x cheaper compositor on every compiler.
        pallas_anywhere = any(
            _pallas_gate(b, settings, train=False)[0]
            for b in (fg, bg) if b is not None
        )
        if not pallas_anywhere:
            settings = dataclasses.replace(settings, eval_compositor="merge")

    perturb = settings.perturb if train else 0.0
    k_fg = k_fg_perturb = k_bg = k_bg_perturb = None
    if key is not None:
        k_fg, k_fg_perturb, k_bg, k_bg_perturb = jax.random.split(key, 4)

    last_delta = jnp.full((n_rays, 1), INF_DELTA)
    bg_results = None
    has_bg = None

    rays_o3 = rays_o[:, None, :]
    rays_d3 = rays_d[:, None, :]

    if bg is not None:
        fg_far = intersect_sphere(rays_o, rays_d, sphere_center, sphere_radius)
        fg_far = jnp.maximum(fg_far, near[:, 0])
        has_bg = far[:, 0] > fg_far  # (N,)
        # Equivalent to the reference's gather: bg rays get last_delta=fg_far
        # (rendering.py:43) and everyone's far is clamped to the ellipsoid
        # exit (rendering.py:45 — a no-op for rays that never leave it).
        last_delta = jnp.where(has_bg[:, None], fg_far[:, None], last_delta)
        far = jnp.minimum(far, fg_far[:, None])

        s_bg = settings.coarse_samples // 2
        bg_z = jnp.broadcast_to(
            jnp.linspace(0.0, 1.0, s_bg), (n_rays, s_bg)
        )
        bg_z = expand_and_perturb_z_vals(
            bg_z, perturb, k_bg_perturb if train else None
        )

        include_xyz_real = bg.is_mega and bg.xyz_real
        cluster_2d = bg.cluster_dim_start == 1
        bg_pts, bg_depth_real = depth2pts_outside(
            rays_o3, rays_d3, bg_z, sphere_center, sphere_radius,
            include_xyz_real, cluster_2d,
        )

        bg_settings = settings
        bg_results = _get_results(
            bg,
            bg_params,
            bg_settings,
            rays_d3,
            image_indices,
            bg_pts,
            bg_z,
            jnp.full((n_rays, 1), INF_DELTA),
            get_depth=settings.get_depth,
            get_depth_variance=settings.get_depth_variance,
            get_bg_lambda=False,
            flip=True,
            depth_real=bg_depth_real,
            xyz_fine_fn=lambda fz: depth2pts_outside(
                rays_o3, rays_d3, fz, sphere_center, sphere_radius,
                include_xyz_real, cluster_2d,
            ),
            fine_samples=(settings.fine_samples // 2)
            if settings.fine_samples > 0
            else 0,
            train=train,
            key=k_bg,
        )

    if fg_bounds is not None:
        # Tightened interval can only shrink: the host computes it within
        # [near, min(far, ellipsoid exit)] (ray_bounds.tighten_rays), and
        # the max/min below enforce it even against a stale grid. A
        # collapsed (zero-width) interval means "the bake saw nothing
        # anywhere on this ray": every fg delta degenerates to 0 AND the
        # trailing last_delta is zeroed, so the fg contribution is exactly
        # zero (not "whatever sigma at the collapse point times a huge
        # last_delta") — the ray renders pure background, and its collapse
        # POSITION is provably immaterial (cell_cull boxes exploit this).
        near = jnp.maximum(near, fg_bounds[:, 0:1])
        far0 = far
        far = jnp.maximum(jnp.minimum(far, fg_bounds[:, 1:2]), near)
        # Where the far end actually shrank, the span past it is DECLARED
        # empty, so the final sample's trailing segment must not span it:
        # untightened, the huge trailing segment (to fg_far / INF_DELTA)
        # multiplies a far-field sigma that is ~0; tightened, the final
        # sample sits just past geometry where sigma is NOT tiny, and the
        # same segment manufactures a phantom
        # `T * (1 - exp(-sigma * fg_far))` contribution. last_delta here
        # is an ABSOLUTE exit depth for values below INF_DELTA
        # (_get_results subtracts z_max, rendering.py:510-512): cap it at
        # one local sample spacing past the tightened far. Un-shrunk rays
        # (e.g. pass-through bounds) keep the baseline last_delta exactly.
        #
        # ONLY sub-INF rays (has_bg: a background composites behind the
        # fg) are capped. Rays whose baseline last_delta is INF_DELTA end
        # INSIDE the scene: the reference's catch-all semantics make their
        # final sample absorb ALL residual transmittance
        # (alpha = 1 - exp(-INF * sigma) = 1 for any sigma > 0), and with
        # no background behind them that residual has nowhere else to go.
        # Capping them DROPS the residual mass instead of re-attributing
        # it (measured: -4 dB broad darkening across live rays on the 4x2
        # drone val views); keeping INF preserves the catch-all — the only
        # change tightening makes for such rays is WHERE the catch-all
        # sample sits, not whether it absorbs.
        seg = (far - near) / settings.coarse_samples
        shrunk = (far < far0 - 1e-6 * jnp.abs(far0)) & (
            last_delta < INF_DELTA
        )
        last_delta = jnp.where(
            shrunk, jnp.minimum(last_delta, far + seg), last_delta
        )
        # Collapsed rays contribute EXACTLY zero fg regardless of where
        # they collapsed — cell_cull excludes them from cull boxes on this
        # guarantee, so it must hold even when the collapse point is the
        # un-shrunk interval end (z_max == far there, so depth `far` maps
        # to a zero trailing segment).
        last_delta = jnp.where(far > near, last_delta, far)

    z_steps = jnp.linspace(0.0, 1.0, settings.coarse_samples)
    z_vals = near * (1.0 - z_steps) + far * z_steps
    z_vals = expand_and_perturb_z_vals(
        z_vals, perturb, k_fg_perturb if train else None
    )
    xyz_coarse = rays_o3 + rays_d3 * z_vals[..., None]

    fg_routing = None
    if (
        fg_ray_support is not None
        and fg_ray_capacity is not None
        and fg.is_mega
        and not train
    ):
        fg_routing = (fg_ray_support, int(fg_ray_capacity), fg_ray_cells)

    results = _get_results(
        fg,
        fg_params,
        settings,
        rays_d3,
        image_indices,
        xyz_coarse,
        z_vals,
        last_delta,
        get_depth=settings.get_depth,
        get_depth_variance=settings.get_depth_variance,
        get_bg_lambda=bg is not None,
        flip=False,
        depth_real=None,
        xyz_fine_fn=lambda fz: (rays_o3 + rays_d3 * fz[..., None], None),
        fine_samples=settings.fine_samples,
        train=train,
        key=k_fg,
        ray_routing=fg_routing,
    )

    if bg is not None:
        types = ["fine" if settings.fine_samples > 0 else "coarse"]
        if settings.use_cascade and settings.fine_samples > 0:
            types.append("coarse")
        for typ in types:
            bg_lambda = results[f"bg_lambda_{typ}"]
            mult = jnp.where(has_bg, bg_lambda, 0.0)
            for comp in ("rgb", "depth"):
                fg_key = f"{comp}_{typ}"
                if fg_key not in results or fg_key not in bg_results:
                    continue
                val = results[fg_key]
                m = mult[..., None] if val.ndim > 1 else mult
                bg_val = bg_results[fg_key] * m
                if settings.get_bg_fg_rgb:
                    results[f"fg_{comp}_{typ}"] = val
                    results[f"bg_{comp}_{typ}"] = bg_val
                results[fg_key] = val + bg_val

    bg_rays_present = (
        jnp.any(has_bg) if has_bg is not None else jnp.asarray(False)
    )
    return results, bg_rays_present
