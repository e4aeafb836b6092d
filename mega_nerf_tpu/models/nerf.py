"""The core NeRF MLP: frequency encoding, skip trunk, sigma + view/appearance
branches, optional affine color transform and SH output head.

Behavioral parity with the reference's `mega_nerf/models/nerf.py:8-160`
(Embedding, ShiftedSoftplus, NeRF), redesigned for TPU:

- inputs are separate arrays (xyz, dirs, image_indices, sigma_noise), never a
  packed width-inferred tensor;
- a `compute_dtype` knob runs the matmuls in bfloat16 on the MXU while
  keeping parameters and the compositing path in float32 (replaces torch AMP
  + GradScaler — bf16 needs no loss scaling);
- everything is shape-static and jit/vmap/shard_map friendly; the same module
  is vmapped over stacked parameters for the MegaNeRF spatial mixture.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def frequency_encode(x: jnp.ndarray, num_freqs: int, logscale: bool = True) -> jnp.ndarray:
    """Positional encoding: x -> [x, sin(2^k x), cos(2^k x), ...].

    Matches the reference `Embedding` (`models/nerf.py:8-25`): output width is
    d * (1 + 2 * num_freqs) with the identity first.
    """
    if num_freqs == 0:
        return x
    if logscale:
        freqs = 2.0 ** jnp.arange(num_freqs, dtype=x.dtype)
    else:
        freqs = jnp.linspace(1.0, 2.0 ** (num_freqs - 1), num_freqs, dtype=x.dtype)
    xf = x[..., None, :] * freqs[:, None]  # (..., F, d)
    enc = jnp.concatenate([jnp.sin(xf), jnp.cos(xf)], axis=-1)  # (..., F, 2d)
    return jnp.concatenate([x, enc.reshape(*x.shape[:-1], -1)], axis=-1)


def shifted_softplus(x: jnp.ndarray) -> jnp.ndarray:
    """softplus(x - 1): the reference's sigma activation (`models/nerf.py:28-42`)."""
    return nn.softplus(x - 1.0)


class MXUDense(nn.Module):
    """Dense layer with explicit f32 MXU accumulation.

    Drop-in for `nn.Dense(features, dtype=...)` (identical param names,
    shapes, and init, so checkpoints interchange), but the matmul requests
    `preferred_element_type=float32`. On TPU v5e a bf16 x bf16 -> bf16 dot
    compiles ~14x slower than the same dot with an f32 accumulator
    (measured: 181ms vs 13ms for 8 x (786k,256)@(256,256)); the MXU always
    accumulates in f32 internally, so this is free precision AND the fast
    path. The bias add also happens in f32 before the final cast.
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (x.shape[-1], self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
        )
        y = jnp.dot(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        return (y + bias).astype(self.dtype)


class OneHotEmbed(nn.Module):
    """Embedding lookup as a one-hot matmul instead of a gather.

    Drop-in for `nn.Embed` (same "embedding" param name/shape/init), but the
    lookup runs on the MXU: a row gather of (n_points, dim) from a small
    table compiles to a pathological scalar loop on TPU (measured 96ms for
    786k x 48 from a (512, 48) table), while one_hot(idx) @ table fuses the
    iota-compare into a ~1ms matmul.
    """

    num_embeddings: int
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, idx: jnp.ndarray) -> jnp.ndarray:
        table = self.param(
            "embedding",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal", out_axis=0),
            (self.num_embeddings, self.features),
            jnp.float32,
        )
        # Clamp like nn.Embed's take(mode="clip"): an out-of-range index
        # (e.g. novel-pose renders enumerated past the training set) gets
        # the nearest row, not a silent all-zero embedding.
        idx = jnp.clip(idx, 0, self.num_embeddings - 1)
        one_hot = jax.nn.one_hot(idx, self.num_embeddings, dtype=self.dtype)
        return jnp.dot(
            one_hot, table.astype(self.dtype),
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)


@dataclasses.dataclass(frozen=True)
class NeRFConfig:
    """Static architecture description (hashable: usable as a jit static arg)."""

    pos_xyz_dim: int = 12
    pos_dir_dim: int = 4
    layers: int = 8
    skip_layers: Tuple[int, ...] = (4,)
    layer_dim: int = 256
    appearance_dim: int = 48
    affine_appearance: bool = False
    appearance_count: int = 1
    rgb_dim: int = 3
    xyz_dim: int = 3
    shifted_softplus: bool = True
    compute_dtype: str = "float32"  # "bfloat16" on TPU for MXU throughput
    # Replicate the reference's packed-input quirk: NeRF.forward reads view
    # dirs at a hardcoded x[:, -4:-1] (reference nerf.py:146), which for
    # appearance-less models is actually [xyz_last, dir_x, dir_y] (dir_z is
    # dropped). Models the reference trained in that regime (nerf/npp/
    # no-embed families) need this on for exact parity; our own models use
    # proper directions.
    ref_packed_dirs: bool = False

    def __post_init__(self):
        if self.rgb_dim > 3:
            assert self.pos_dir_dim == 0, "SH output head requires pos_dir_dim == 0"
        object.__setattr__(self, "skip_layers", tuple(self.skip_layers))

    @property
    def uses_dir_branch(self) -> bool:
        """Whether a separate view/appearance branch exists after the trunk
        (reference condition at `models/nerf.py:93`)."""
        return self.pos_dir_dim > 0 or (
            self.appearance_dim > 0 and not self.affine_appearance
        )

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)


class NeRF(nn.Module):
    """Skip-connection MLP emitting (rgb_or_sh..., sigma).

    Call signature: (xyz, dirs, image_indices, sigma_noise, sigma_only).
    - xyz: (..., xyz_dim) — 3 for foreground, 4 for the NeRF++ background.
    - dirs: (..., 3) unit view directions, or None when pos_dir_dim == 0.
    - image_indices: (...,) int32 appearance indices, or None.
    - sigma_noise: (..., 1) pre-activation density regularization noise
      (the reference adds uniform [0,1) noise during training,
      `rendering.py:294,321`), or None.
    Returns (..., rgb_dim + 1); rgb is sigmoid-activated when rgb_dim == 3,
    raw SH coefficients otherwise (activated in the renderer after eval_sh).
    """

    config: NeRFConfig

    @nn.compact
    def __call__(
        self,
        xyz: jnp.ndarray,
        dirs: Optional[jnp.ndarray] = None,
        image_indices: Optional[jnp.ndarray] = None,
        sigma_noise: Optional[jnp.ndarray] = None,
        sigma_only: bool = False,
    ) -> jnp.ndarray:
        cfg = self.config
        dtype = cfg.dtype
        dense = lambda feats, name: MXUDense(feats, dtype=dtype, name=name)

        # Encode in f32, cast after: sin(2^11 x) in bf16 (8 mantissa bits)
        # would quantize positions far coarser than scene detail.
        x_in = frequency_encode(
            xyz.astype(jnp.float32), cfg.pos_xyz_dim
        ).astype(dtype)
        h = x_in
        for i in range(cfg.layers):
            if i in cfg.skip_layers:
                h = jnp.concatenate([x_in, h], axis=-1)
            h = nn.relu(dense(cfg.layer_dim, f"trunk_{i}")(h))

        sigma = dense(1, "sigma")(h).astype(jnp.float32)
        if sigma_noise is not None:
            sigma = sigma + sigma_noise
        if cfg.shifted_softplus:
            sigma = shifted_softplus(sigma)
        else:
            sigma = nn.relu(sigma)

        if sigma_only:
            return sigma

        appearance = None
        if cfg.appearance_dim > 0:
            assert image_indices is not None, "appearance model needs image indices"
            appearance = OneHotEmbed(
                cfg.appearance_count, cfg.appearance_dim, dtype=dtype,
                name="appearance",
            )(image_indices.astype(jnp.int32))

        if cfg.uses_dir_branch:
            final = dense(cfg.layer_dim, "trunk_final")(h)
            branch_in = [final]
            if cfg.pos_dir_dim > 0:
                assert dirs is not None, "view-dependent model needs directions"
                if cfg.ref_packed_dirs and cfg.appearance_dim == 0:
                    dir_in = jnp.concatenate(
                        [xyz[..., -1:], dirs[..., :2]], axis=-1
                    )
                else:
                    dir_in = dirs
                branch_in.append(
                    frequency_encode(
                        dir_in.astype(jnp.float32), cfg.pos_dir_dim
                    ).astype(dtype)
                )
            if appearance is not None and not cfg.affine_appearance:
                branch_in.append(appearance)
            branch = nn.relu(
                dense(cfg.layer_dim // 2, "dir_a")(jnp.concatenate(branch_in, axis=-1))
            )
            rgb = dense(cfg.rgb_dim, "rgb")(branch)
        else:
            rgb = dense(cfg.rgb_dim, "rgb")(h)

        if cfg.affine_appearance:
            assert appearance is not None, "affine appearance needs appearance_dim > 0"
            affine = dense(12, "affine")(appearance)
            affine = affine.reshape(*affine.shape[:-1], 3, 4)
            rgb = (
                jnp.einsum("...ij,...j->...i", affine[..., :3], rgb)
                + affine[..., 3]
            )

        rgb = rgb.astype(jnp.float32)
        if cfg.rgb_dim == 3:
            rgb = nn.sigmoid(rgb)
        return jnp.concatenate([rgb, sigma], axis=-1)
