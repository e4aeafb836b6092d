"""Single-chip training-throughput benchmark.

Measures train rays/sec/chip on the paper-parity Mega-NeRF submodule config
(batch 1024 rays, 256 coarse + 512 fine samples, 8x256 fg MLP + 8x256
NeRF++ bg MLP, 48-dim appearance embeddings, bf16 compute) — the hot loop of
reference `runner.py:238-277`.

Baseline: the reference trains 500k iterations of 1024 rays in ~1 day on
8 GPUs (BASELINE.md) -> ~5.9k rays/s for 8 GPUs ~= 740 rays/s per GPU.
`vs_baseline` is our per-chip rays/s over that per-GPU figure.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

REFERENCE_RAYS_PER_SEC_PER_GPU = 740.0


def main() -> None:
    from argparse import Namespace

    from mega_nerf_tpu.models import make_bg_nerf, make_nerf
    from mega_nerf_tpu.parallel.train_step import (
        make_optimizer,
        make_train_state,
        make_train_step,
    )
    from mega_nerf_tpu.render.rendering import RenderSettings

    hp = Namespace(
        pos_xyz_dim=12, pos_dir_dim=4, layers=8, skip_layers=[4],
        layer_dim=256, bg_layer_dim=256, appearance_dim=48,
        affine_appearance=False, use_cascade=False, sh_deg=None,
        shifted_softplus=True, compute_dtype="bfloat16",
    )
    batch_size = 1024
    settings = RenderSettings(coarse_samples=256, fine_samples=512)

    fg = make_nerf(hp, appearance_count=512)
    bg = make_bg_nerf(hp, appearance_count=512)
    optimizer = make_optimizer(5e-4, 0.1, 500_000)
    state = make_train_state(fg, bg, optimizer, jax.random.PRNGKey(0))

    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    o = jax.random.normal(k1, (batch_size, 3)) * 0.1
    d = jax.random.normal(k2, (batch_size, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    batch = {
        "rays": jnp.concatenate(
            [o, d, jnp.full((batch_size, 1), 0.05),
             jnp.full((batch_size, 1), 1e5)], axis=-1,
        ),
        "rgbs": jnp.abs(jnp.sin(o * 7.0)),
        "img_indices": jnp.zeros(batch_size, jnp.int32),
    }

    step = jax.jit(
        make_train_step(
            fg, bg, settings, optimizer,
            sphere_center=jnp.zeros(3), sphere_radius=jnp.ones(3),
            use_appearance=True,
        ),
        donate_argnums=(0,),
    )

    # Warmup (compile + first steps).
    for _ in range(3):
        state, metrics = step(state, batch)
    jax.block_until_ready(metrics)

    n_steps = 30
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state, batch)
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0

    rays_per_sec = n_steps * batch_size / dt
    print(
        json.dumps(
            {
                "metric": "train_rays_per_sec_per_chip",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / REFERENCE_RAYS_PER_SEC_PER_GPU, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
