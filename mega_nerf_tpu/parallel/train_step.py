"""The jitted training step: render -> loss -> grads -> optimizer update.

Parity target: the hot loop of reference `runner.py:238-277` +
`_training_step` (`runner.py:347-381`), redesigned as one pure function:

- loss = MSE on the fine rgb (+ coarse MSE averaged in when cascading,
  reference `runner.py:370-379`);
- the background optimizer is skipped when the batch had no background rays
  (reference `runner.py:268-272`) via lax.cond — parameters and Adam state
  stay bitwise unchanged;
- no GradScaler: bf16 compute needs no loss scaling; params/updates are f32;
- the PRNG key lives in TrainState, so a restored checkpoint reproduces the
  exact noise/sampling stream (reference RNG-state capture,
  `runner.py:526-528`).

Data parallelism: jit + a batch sharded over the mesh 'data' axis makes XLA
emit the gradient all-reduce (replaces DDP/NCCL).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from mega_nerf_tpu.models.factory import ModelBundle
from mega_nerf_tpu.render.rendering import RenderSettings, render_rays


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    key: jax.Array
    fg_params: Any
    fg_opt: Any
    bg_params: Any = None
    bg_opt: Any = None


def make_optimizer(lr: float, lr_decay_factor: float, train_iterations: int):
    """Adam with per-step exponential decay: lr(t) = lr * decay^(t/total)
    (reference Adam + ExponentialLR(gamma=decay^(1/iters)), `runner.py:168-194`)."""
    schedule = optax.exponential_decay(
        init_value=lr,
        transition_steps=train_iterations,
        decay_rate=lr_decay_factor,
    )
    return optax.adam(schedule)


def make_train_state(
    fg: ModelBundle,
    bg: Optional[ModelBundle],
    optimizer,
    key: jax.Array,
) -> TrainState:
    k_fg, k_bg, k_state = jax.random.split(key, 3)
    fg_params = fg.init(k_fg)
    bg_params = bg.init(k_bg) if bg is not None else None
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        key=k_state,
        fg_params=fg_params,
        fg_opt=optimizer.init(fg_params),
        bg_params=bg_params,
        bg_opt=optimizer.init(bg_params) if bg is not None else None,
    )


def make_train_step(
    fg: ModelBundle,
    bg: Optional[ModelBundle],
    settings: RenderSettings,
    optimizer,
    sphere_center=None,
    sphere_radius=None,
    use_appearance: bool = True,
    pmean_axis: Optional[str] = None,
) -> Callable[[TrainState, Dict[str, jnp.ndarray]], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Build the (jittable) train step. Donate the state for in-place updates.

    `pmean_axis` names a mapped mesh axis to average gradients/metrics over —
    used when the step runs inside `shard_map` (cell-parallel training, where
    'data' is an explicit axis rather than jit-implicit SPMD)."""

    import dataclasses

    train_settings = dataclasses.replace(
        settings, get_depth=False, get_depth_variance=True, get_bg_fg_rgb=False
    )
    typ = "fine" if settings.fine_samples > 0 else "coarse"

    def loss_fn(fg_params, bg_params, batch, key):
        image_indices = batch["img_indices"] if use_appearance else None
        results, bg_present = render_rays(
            fg, bg, fg_params, bg_params,
            batch["rays"], image_indices, train_settings,
            sphere_center, sphere_radius, train=True, key=key,
        )
        rgbs = batch["rgbs"]
        photo_loss = jnp.mean((results[f"rgb_{typ}"] - rgbs) ** 2)
        loss = photo_loss
        metrics = {
            "photo_loss": photo_loss,
            "psnr": -10.0 * jnp.log10(photo_loss),
            "depth_variance": jnp.mean(results[f"depth_variance_{typ}"]),
        }
        if settings.use_cascade and typ != "coarse":
            coarse_loss = jnp.mean((results["rgb_coarse"] - rgbs) ** 2)
            metrics["coarse_loss"] = coarse_loss
            loss = (loss + coarse_loss) / 2
        if settings.distortion_loss_weight > 0:
            # Anti-floater regularizer (render/rendering.py emits the
            # per-ray coarse-pass term; beyond the reference, default off).
            distortion = jnp.mean(results["distortion_coarse"])
            metrics["distortion"] = distortion
            loss = loss + settings.distortion_loss_weight * distortion
        metrics["loss"] = loss
        return loss, (metrics, bg_present)

    def _reduce(tree):
        if pmean_axis is None:
            return tree
        return jax.lax.pmean(tree, pmean_axis)

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        key, step_key = jax.random.split(state.key)

        if bg is None:
            grad_fn = jax.value_and_grad(
                lambda fp: loss_fn(fp, None, batch, step_key), has_aux=True
            )
            (_, (metrics, _)), fg_grads = grad_fn(state.fg_params)
            fg_grads, metrics = _reduce((fg_grads, metrics))
            fg_updates, fg_opt = optimizer.update(
                fg_grads, state.fg_opt, state.fg_params
            )
            return (
                state.replace(
                    step=state.step + 1,
                    key=key,
                    fg_params=optax.apply_updates(state.fg_params, fg_updates),
                    fg_opt=fg_opt,
                ),
                metrics,
            )

        grad_fn = jax.value_and_grad(
            lambda fp, bp: loss_fn(fp, bp, batch, step_key),
            argnums=(0, 1),
            has_aux=True,
        )
        (_, (metrics, bg_present)), (fg_grads, bg_grads) = grad_fn(
            state.fg_params, state.bg_params
        )
        fg_grads, bg_grads, metrics = _reduce((fg_grads, bg_grads, metrics))
        if pmean_axis is not None:
            # A cell skips the bg step only when NO shard in its data group
            # saw a background ray (reference semantics, runner.py:268-272).
            bg_present = jax.lax.pmax(
                bg_present.astype(jnp.int32), pmean_axis
            ).astype(bool)

        fg_updates, fg_opt = optimizer.update(fg_grads, state.fg_opt, state.fg_params)
        fg_params = optax.apply_updates(state.fg_params, fg_updates)

        def bg_apply(_):
            upd, opt = optimizer.update(bg_grads, state.bg_opt, state.bg_params)
            return optax.apply_updates(state.bg_params, upd), opt

        def bg_skip(_):
            return state.bg_params, state.bg_opt

        bg_params, bg_opt = jax.lax.cond(bg_present, bg_apply, bg_skip, None)

        return (
            state.replace(
                step=state.step + 1,
                key=key,
                fg_params=fg_params,
                fg_opt=fg_opt,
                bg_params=bg_params,
                bg_opt=bg_opt,
            ),
            metrics,
        )

    return train_step
