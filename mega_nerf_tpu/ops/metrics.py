"""Image-quality metrics: PSNR, SSIM (jnp), LPIPS (gated host-side).

Parity targets: reference `mega_nerf/metrics.py`. PSNR and SSIM are pure jnp
(SSIM reproduces the reference's tf.image.ssim-style separable Gaussian blur
with zero padding). LPIPS needs the pretrained `lpips` torch package; when it
is unavailable (e.g. in a hermetic TPU image with no weight downloads),
`lpips()` returns an empty dict and eval reports PSNR/SSIM only.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np
from jax import lax


def psnr(rgbs: jnp.ndarray, target_rgbs: jnp.ndarray) -> jnp.ndarray:
    """Peak signal-to-noise ratio in dB (reference `metrics.py:8-10`)."""
    mse = jnp.mean((rgbs - target_rgbs) ** 2)
    return -10.0 * jnp.log10(mse)


def _gaussian_blur(img: jnp.ndarray, filt: jnp.ndarray, hw: int) -> jnp.ndarray:
    """Separable Gaussian blur with zero padding, per channel.

    img: (B, C, H, W). Matches the reference's grouped conv2d with padding
    [hw, 0] then [0, hw] (`metrics.py:92-101`).
    """
    c = img.shape[1]
    # Blur along W then H (same composition order as the reference's
    # filt_fn1(filt_fn2(z))).
    kern_w = jnp.broadcast_to(filt.reshape(1, 1, 1, -1), (c, 1, 1, filt.shape[0]))
    kern_h = jnp.broadcast_to(filt.reshape(1, 1, -1, 1), (c, 1, filt.shape[0], 1))
    out = lax.conv_general_dilated(
        img, kern_w, window_strides=(1, 1), padding=[(0, 0), (hw, hw)],
        feature_group_count=c,
    )
    out = lax.conv_general_dilated(
        out, kern_h, window_strides=(1, 1), padding=[(hw, hw), (0, 0)],
        feature_group_count=c,
    )
    return out


def ssim(
    rgbs: jnp.ndarray,
    target_rgbs: jnp.ndarray,
    max_val: float,
    filter_size: int = 11,
    filter_sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Mean SSIM between two images of shape (..., H, W, C).

    Parity: reference `metrics.py:51-121` (itself modeled on tf.image.ssim,
    with zero-padded rather than VALID windows).
    """
    h, w, c = rgbs.shape[-3:]
    img0 = rgbs.reshape(-1, h, w, c).transpose(0, 3, 1, 2)
    img1 = target_rgbs.reshape(-1, h, w, c).transpose(0, 3, 1, 2)

    hw = filter_size // 2
    shift = (2 * hw - filter_size + 1) / 2
    f_i = ((jnp.arange(filter_size, dtype=img0.dtype) - hw + shift) / filter_sigma) ** 2
    filt = jnp.exp(-0.5 * f_i)
    filt = filt / jnp.sum(filt)

    mu0 = _gaussian_blur(img0, filt, hw)
    mu1 = _gaussian_blur(img1, filt, hw)
    mu00, mu11, mu01 = mu0 * mu0, mu1 * mu1, mu0 * mu1
    sigma00 = _gaussian_blur(img0 * img0, filt, hw) - mu00
    sigma11 = _gaussian_blur(img1 * img1, filt, hw) - mu11
    sigma01 = _gaussian_blur(img0 * img1, filt, hw) - mu01

    sigma00 = jnp.maximum(sigma00, 0.0)
    sigma11 = jnp.maximum(sigma11, 0.0)
    sigma01 = jnp.sign(sigma01) * jnp.minimum(
        jnp.sqrt(sigma00 * sigma11), jnp.abs(sigma01)
    )

    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    numer = (2 * mu01 + c1) * (2 * sigma01 + c2)
    denom = (mu00 + mu11 + c1) * (sigma00 + sigma11 + c2)
    ssim_map = numer / denom
    return jnp.mean(ssim_map.reshape(ssim_map.shape[0], -1), axis=-1).mean()


_LPIPS_CACHE: Dict[str, object] = {}


def lpips(rgbs: np.ndarray, target_rgbs: np.ndarray) -> Dict[str, float]:
    """LPIPS perceptual distance with vgg/alex/squeeze backbones
    (reference `metrics.py:13-26`). Inputs are HxWx3 float arrays in [0, 1].

    Runs our pure-JAX implementation (`ops/lpips.py`) for every net whose
    weight file exists (see `scripts/convert_lpips_weights.py`), falling back
    to the `lpips` torch package for nets without one. Returns {} when
    neither weights nor the package are available.
    """
    from mega_nerf_tpu.ops import lpips as jlpips

    out: Dict[str, float] = {}
    for net in jlpips.available_nets():
        # A corrupt/stale-contract weight file degrades to fewer metrics
        # (warn once) rather than killing a multi-hour run at its first
        # validation. Only load/format errors are swallowed — a failure in
        # the metric call itself (a genuine bug, an OOM) must propagate,
        # not vanish as a bogus "weights unusable" warning.
        import pickle
        import zipfile

        try:
            if net not in _LPIPS_CACHE:
                _LPIPS_CACHE[net] = jlpips.LPIPS.from_npz(net)
        except (
            OSError, ValueError, KeyError,
            # np.load on a truncated/corrupt .npz raises these directly
            # (they are not OSError/ValueError subclasses):
            zipfile.BadZipFile, pickle.UnpicklingError, EOFError,
        ) as e:
            key = f"warned_{net}"
            if key not in _LPIPS_CACHE:
                _LPIPS_CACHE[key] = True
                import warnings

                warnings.warn(
                    f"lpips-{net} weights unusable ({type(e).__name__}: {e});"
                    " skipping this net"
                )
            continue
        out[net] = float(_LPIPS_CACHE[net](rgbs, target_rgbs))

    remaining = [n for n in ("vgg", "alex", "squeeze") if n not in out]
    if remaining:
        try:
            import torch
            import lpips as _plips  # type: ignore

            gt = torch.from_numpy(
                np.asarray(target_rgbs, np.float32)
            ).permute(2, 0, 1).contiguous()
            pred = torch.from_numpy(
                np.asarray(rgbs, np.float32)
            ).permute(2, 0, 1).contiguous()
            for net in remaining:
                try:
                    key = f"torch_{net}"
                    if key not in _LPIPS_CACHE:
                        _LPIPS_CACHE[key] = _plips.LPIPS(net=net).eval()
                    with torch.no_grad():
                        out[net] = float(
                            _LPIPS_CACHE[key](gt, pred, normalize=True).item()
                        )
                except Exception:
                    continue
        except ImportError:
            pass
    return out
