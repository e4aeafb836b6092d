"""The training/eval orchestrator.

Parity target: reference `mega_nerf/runner.py` (673 LoC), redesigned around a
pure jitted train step and explicit state:

- scene-space setup (coordinates.pt, near/far, altitude range, cluster-param
  validation, ellipse bounds) matches `runner.py:72-157`;
- the hot loop calls one donated, jitted `train_step`; data parallelism is a
  sharded batch over the mesh 'data' axis (XLA all-reduces grads over ICI —
  no DDP, no GradScaler, no sampler);
- determinism: a single numpy Generator for host-side shuffles + the jax
  PRNG key inside TrainState; both checkpointed (reference RNG triple,
  `runner.py:42-50,526-528`), with exact mid-epoch resume via the stored
  epoch/batch position (reference `dataset_index`/discard, `runner.py:238-242`);
- eval renders full images in fixed-size padded chunks under one jitted
  render fn, computes PSNR/SSIM(/LPIPS when available) on the RIGHT half of
  each val image (the half excluded from training — reference
  `runner.py:413-414`), and writes side-by-side gt|pred|log-depth panels.
"""

from __future__ import annotations

import dataclasses
import sys
import time
from argparse import Namespace
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mega_nerf_tpu.data.image_metadata import ImageMetadata
from mega_nerf_tpu.data.memory_dataset import MemoryDataset, generate_image_rays
from mega_nerf_tpu.data.torch_io import load_coordinates, load_pt
from mega_nerf_tpu.models.factory import ModelBundle, make_bg_nerf, make_nerf
from mega_nerf_tpu.ops.metrics import lpips as lpips_metric
from mega_nerf_tpu.ops.metrics import psnr as psnr_metric
from mega_nerf_tpu.ops.metrics import ssim as ssim_metric
from mega_nerf_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from mega_nerf_tpu.parallel.train_step import (
    TrainState,
    make_optimizer,
    make_train_state,
    make_train_step,
)
from mega_nerf_tpu.render.cell_cull import (
    ParamSubsetCache,
    active_cells,
    bucket_mask,
    clamp_rays_to_fg,
    ray_support_masks,
    support_order,
    tile_order,
)
from mega_nerf_tpu.render.ray_bounds import tighten_rays
from mega_nerf_tpu.render.rendering import RenderSettings, render_rays
from mega_nerf_tpu.runtime import checkpoints as ckpt_io
from mega_nerf_tpu.runtime.logging import MetricsWriter, is_master, main_print, main_tqdm

METRICS_CHECK_INTERVAL = 100  # steps between host-side non-finite guards

# Device-side point budget for one eval render pass. The fused Pallas eval
# path materializes the lane-padded position/direction/appearance encodings
# plus the (m, 128) output tile in HBM — roughly 1.3 GB per million points
# at the paper widths — so the per-chunk MLP pass is bounded to this many
# points and `render_image` loops more chunks instead. 8M points at the
# paper config (fine_samples=512) gives the proven 16384-ray eval chunk;
# the reference's 64k-pixel default (`runner.py:568`) is sized for GPU
# renders that stream `model_chunk_size` slices in Python instead.
EVAL_POINT_BUDGET = 8 * 1024 * 1024


def _eval_chunk_cap(
    hparams: Namespace, n_local: int, submodules: int = 1,
    bg_submodules: int = 0,
) -> int:
    """Max rays per eval render call that keeps every MLP pass in budget.

    `submodules` > 1 for MegaNeRF mixtures: the dense blend evaluates every
    submodule on every point (models/mega.py), multiplying the per-point
    activation footprint — a merged 2-cell eval at the plain cap OOM'd
    24.5G of 15.75G hbm on v5e.

    `bg_submodules` bounds the NeRF++ background pass separately: with
    per-chunk cell culling (render/cell_cull.py) the foreground cost drops
    to the chunk's active-cell count while the background stays at full K
    (bg samples route at unbounded radii — uncullable), so the bg pass can
    become the binding constraint. Its largest single MLP pass sees
    coarse//2 + fine//2 points per ray (render_rays runs the bg model
    hierarchically). 0 = no bg mixture; when bg_submodules == submodules
    the bg bound is never tighter, so pre-cull behavior is unchanged."""
    s_max = max(hparams.coarse_samples, hparams.fine_samples, 1)
    if getattr(hparams, "use_cascade", False) and hparams.fine_samples > 0:
        # Cascade's fine pass evaluates sort(concat(coarse, fine)) z-vals
        # through the fine MLP (rendering.py:459-462), so the largest
        # single MLP pass sees coarse+fine points per ray.
        s_max = hparams.coarse_samples + hparams.fine_samples
    cap = EVAL_POINT_BUDGET // (s_max * max(submodules, 1))
    if bg_submodules > 0:
        s_bg = max(hparams.coarse_samples // 2 + hparams.fine_samples // 2, 1)
        cap = min(cap, EVAL_POINT_BUDGET // (s_bg * bg_submodules))
    return max(n_local, cap)


class TrainLoopHooks:
    """Instrumentation shared by Runner.train and CellRunner.train:
    jax.profiler trace windows (SURVEY §5.1), the periodic non-finite
    metric guard (SURVEY §5.2), and throughput accounting — one
    implementation so the two loops cannot drift."""

    def __init__(self, hparams: Namespace, is_master: bool, profile_dir,
                 rays_per_step: int, start_iteration: int):
        self.is_master = is_master
        self.profile_dir = profile_dir
        self.rays_per_step = rays_per_step
        self.total = hparams.train_iterations
        self.profile_steps = getattr(hparams, "profile_steps", 0)
        self.profile_start = start_iteration + 10
        self.profiling = False
        self.t0: Optional[float] = None
        self.step0 = start_iteration

    def maybe_profile(self, iteration: int, metrics) -> None:
        if self.profile_steps <= 0 or not self.is_master:
            return
        if iteration == self.profile_start:
            jax.profiler.start_trace(str(self.profile_dir))
            self.profiling = True
        elif self.profiling and iteration >= (
            self.profile_start + self.profile_steps
        ):
            jax.block_until_ready(metrics)
            jax.profiler.stop_trace()
            self.profiling = False
            main_print(f"Wrote profiler trace to {self.profile_dir}")

    def metrics_due(self, iteration: int) -> bool:
        return iteration % METRICS_CHECK_INTERVAL == 0 or (
            iteration >= self.total
        )

    @staticmethod
    def check_finite(metrics_host) -> None:
        """psnr may be +/-inf (a perfectly-fit batch), never NaN; every
        other metric must be finite (reference `runner.py:255-261`)."""
        for k, v in metrics_host.items():
            arr = np.asarray(v)
            ok = np.isfinite(arr) | ((k == "psnr") & np.isinf(arr))
            if not ok.all():
                raise Exception(f"Train metrics not finite in {k}: {v}")

    def restart_window(self, iteration: int) -> None:
        """Exclude a pause (validation, checkpointing IO) from the next
        throughput sample: without this, the first train/rays_per_sec after
        every --val_interval pass is deflated by the validation wall."""
        self.t0 = time.perf_counter()
        self.step0 = iteration

    def throughput(self, iteration: int) -> Optional[float]:
        """rays/s since the previous metrics checkpoint (None on the first)."""
        now = time.perf_counter()
        rays = None
        if self.t0 is not None:
            rays = (
                (iteration - self.step0) * self.rays_per_step
                / (now - self.t0)
            )
        self.t0 = now
        self.step0 = iteration
        return rays


class Runner:
    # CellRunner (one-program multi-submodule training) flips this to build
    # a (cell, data) mesh; the base Runner is strictly single-model.
    _cell_parallel = False

    def __init__(self, hparams: Namespace, set_experiment_path: bool = True):
        # SIGUSR1 -> dump all Python thread stacks (reference `runner.py:40`):
        # the way to see where a run is stuck — device RPCs can hang for an
        # hour when a TPU worker wedges — WITHOUT killing it (a process with
        # no handler dies on USR1, taking its unsaved training state along).
        import faulthandler
        import signal

        if hasattr(signal, "SIGUSR1") and hasattr(faulthandler, "register"):
            faulthandler.register(signal.SIGUSR1)

        self.hparams = hparams
        self.is_master = is_master()

        if set_experiment_path:
            self.experiment_path = (
                self._get_experiment_path() if self.is_master else None
            )
            self.model_path = (
                self.experiment_path / "models" if self.is_master else None
            )
        else:
            self.experiment_path = None
            self.model_path = None
        self.writer: Optional[MetricsWriter] = None

        # --- RNG (reference runner.py:42-50) ---
        self.np_rng = np.random.default_rng(hparams.random_seed)
        self.init_key = jax.random.PRNGKey(hparams.random_seed)
        self._restored_aux = None
        if hparams.ckpt_path is not None and ckpt_io.is_native_checkpoint(
            hparams.ckpt_path
        ):
            # Reference torch checkpoints carry torch/np/random RNG states
            # we can't continue; only our format restores the host rng.
            self._restored_aux = ckpt_io.load_checkpoint_aux(hparams.ckpt_path)
            key_data, np_rng = ckpt_io.rng_state_from_aux(self._restored_aux)
            if np_rng is not None:
                self.np_rng = np_rng

        # --- Scene space (reference runner.py:72-105) ---
        coords = load_coordinates(hparams.dataset_path)
        self.origin_drb = coords["origin_drb"]
        self.pose_scale_factor = coords["pose_scale_factor"]
        main_print(f"Origin: {self.origin_drb}, scale factor: {self.pose_scale_factor}")

        self.near = hparams.near / self.pose_scale_factor
        if hparams.far is not None:
            self.far = hparams.far / self.pose_scale_factor
        elif hparams.bg_nerf:
            self.far = 1e5
        else:
            self.far = 2.0
        main_print(f"Ray bounds: {self.near}, {self.far}")

        if hparams.ray_altitude_range is not None:
            self.ray_altitude_range = [
                (x - self.origin_drb[0]) / self.pose_scale_factor
                for x in hparams.ray_altitude_range
            ]
            assert self.ray_altitude_range[0] < self.ray_altitude_range[1]
        else:
            self.ray_altitude_range = None
        main_print(f"Ray altitude range in [-1,1] space: {self.ray_altitude_range}")

        if hparams.cluster_mask_path is not None:
            cluster_params = load_pt(
                Path(hparams.cluster_mask_path).parent / "params.pt"
            )
            assert cluster_params["near"] == self.near
            assert np.allclose(cluster_params["origin_drb"], self.origin_drb)
            assert cluster_params["pose_scale_factor"] == self.pose_scale_factor
            if self.ray_altitude_range is not None:
                assert np.allclose(
                    np.asarray(cluster_params["ray_altitude_range"], np.float32),
                    np.asarray(self.ray_altitude_range, np.float32),
                ), (self.ray_altitude_range, cluster_params["ray_altitude_range"])

        self.train_items, self.val_items = self._get_image_metadata()
        main_print(
            f"Using {len(self.train_items)} train images and {len(self.val_items)} val images"
        )

        camera_positions = np.stack(
            [x.c2w[:3, 3] for x in self.train_items + self.val_items]
        )
        min_position = camera_positions.min(axis=0)
        max_position = camera_positions.max(axis=0)
        main_print(f"Camera range in [-1,1] space: {min_position} {max_position}")

        # --- Models ---
        if getattr(hparams, "train_mega_nerf", None) is not None:
            hparams._mega_centroid_metadata = load_pt(hparams.train_mega_nerf)
        self.fg = make_nerf(hparams, len(self.train_items))
        self.bg: Optional[ModelBundle] = None
        self.sphere_center = None
        self.sphere_radius = None

        container_has_bg = True
        if getattr(hparams, "container_path", None) is not None:
            from mega_nerf_tpu.models.factory import _container_bundles

            container_has_bg = _container_bundles(hparams)[1] is not None

        if hparams.bg_nerf and container_has_bg:
            self.bg = make_bg_nerf(hparams, len(self.train_items))
            if hparams.ellipse_bounds:
                # Ellipsoid fitted over cameras + their copies pinned to the
                # altitude bounds (reference runner.py:131-157).
                assert hparams.ray_altitude_range is not None
                ground = camera_positions.copy()
                ground[:, 0] = self.ray_altitude_range[1]
                air = camera_positions.copy()
                air[:, 0] = self.ray_altitude_range[0]
                used = np.concatenate([camera_positions, air, ground])

                max_position = max_position.copy()
                max_position[0] = self.ray_altitude_range[1]

                center = (max_position + min_position) * 0.5
                radius = (max_position - min_position) * 0.5
                scale = np.linalg.norm((used - center) / radius, axis=-1).max()
                radius = radius * scale * hparams.ellipse_scale_factor
                self.sphere_center = jnp.asarray(center, jnp.float32)
                self.sphere_radius = jnp.asarray(radius, jnp.float32)
            main_print(
                f"Sphere center: {self.sphere_center}, radius: {self.sphere_radius}"
            )

        # --- Mesh ---
        cell_axis = getattr(hparams, "cell_axis", 1) or 1
        if cell_axis > 1 and not self._cell_parallel:
            # Runner trains ONE model data-parallel; one-program
            # multi-submodule training is CellRunner's job
            # (mega_nerf_tpu.runtime.cell_runner / train_cells.py). Fail
            # loudly instead of silently replicating over the cell axis.
            raise ValueError(
                "--cell_axis > 1 is the cell-parallel trainer's axis; use "
                "`python -m mega_nerf_tpu.train_cells` (one-program "
                "multi-submodule training) or launch per-submodule jobs "
                "(parscripts/)."
            )
        self.mesh = make_mesh(
            cell_axis=cell_axis if self._cell_parallel else 1,
            data_axis=getattr(hparams, "data_axis", None),
        )

        self._eval_render_fn = None
        self._serialize_dispatch = (
            jax.default_backend() == "cpu" and len(jax.devices()) > 1
        )

    # ------------------------------------------------------------------ train

    def train(self) -> None:
        hp = self.hparams
        self._setup_experiment_dir()

        optimizer = make_optimizer(hp.lr, hp.lr_decay_factor, hp.train_iterations)
        settings = RenderSettings.from_hparams(hp)
        use_appearance = hp.appearance_dim > 0

        state = make_train_state(self.fg, self.bg, optimizer, self.init_key)

        train_iterations = 0
        start_epoch = 0
        discard_index = -1
        if hp.ckpt_path is not None:
            state, aux = self._load_checkpoint_into_state(hp.ckpt_path, state)
            train_iterations = int(aux["iteration"])
            if hp.resume_ckpt_state:
                ds_state = aux.get("dataset_state") or {}
                start_epoch = int(ds_state.get("epoch", 0))
                discard_index = int(ds_state.get("batch_index", -1))
            main_print(f"Resumed from {hp.ckpt_path} at iteration {train_iterations}")

        step_fn = jax.jit(
            make_train_step(
                self.fg, self.bg, settings, optimizer,
                self.sphere_center, self.sphere_radius,
                use_appearance=use_appearance,
            ),
            donate_argnums=(0,),
        )

        dataset = self._make_dataset()
        if hasattr(dataset, "set_position") and start_epoch > 0:
            # Filesystem dataset: epoch == chunk position in the cycle.
            dataset.set_position(start_epoch)
        state = replicate(self.mesh, state)

        from tqdm import tqdm as _tqdm

        pbar = _tqdm(total=hp.train_iterations, initial=train_iterations) \
            if self.is_master else None

        metrics_host: Dict[str, float] = {}
        epoch = start_epoch
        dataset_index = -1
        last_metrics = None
        hooks = TrainLoopHooks(
            hp, self.is_master,
            (self.experiment_path / "profile")
            if self.experiment_path is not None else None,
            rays_per_step=hp.batch_size,
            start_iteration=train_iterations,
        )
        while train_iterations < hp.train_iterations:
            epoch_rng = np.random.default_rng((hp.random_seed, epoch))
            for dataset_index, batch in enumerate(
                dataset.batches(hp.batch_size, epoch_rng)
            ):
                if dataset_index <= discard_index:
                    continue
                discard_index = -1

                batch = shard_batch(self.mesh, batch)
                state, metrics = step_fn(state, batch)
                if self._serialize_dispatch:
                    # On the virtual-device CPU backend, unbounded async
                    # dispatch lets replicas skew across steps until the
                    # host thread pool starves and the gradient all-reduce
                    # rendezvous deadlocks. Real TPUs execute in order.
                    jax.block_until_ready(metrics)
                last_metrics = metrics
                train_iterations += 1

                hooks.maybe_profile(train_iterations, metrics)

                if hooks.metrics_due(train_iterations):
                    metrics_host = {k: float(v) for k, v in metrics.items()}
                    hooks.check_finite(metrics_host)
                    rays_per_sec = hooks.throughput(train_iterations)
                    if self.writer is not None:
                        if rays_per_sec is not None:
                            self.writer.add_scalar(
                                "train/rays_per_sec", rays_per_sec,
                                train_iterations,
                            )
                        for k, v in metrics_host.items():
                            self.writer.add_scalar(f"train/{k}", v, train_iterations)

                if pbar is not None:
                    pbar.update(1)
                    if metrics_host:
                        pbar.set_postfix(
                            psnr=f"{metrics_host.get('psnr', 0):.2f}"
                        )

                if (
                    train_iterations > 0
                    and train_iterations % hp.ckpt_interval == 0
                    and self.is_master
                ):
                    self._save_checkpoint(
                        state, train_iterations,
                        {"epoch": epoch, "batch_index": dataset_index},
                    )

                if train_iterations > 0 and train_iterations % hp.val_interval == 0:
                    self._run_validation(state, train_iterations)
                    hooks.restart_window(train_iterations)

                if train_iterations >= hp.train_iterations:
                    break
            else:
                # Epoch fully consumed: clear the resume skip marker HERE,
                # not only after the first non-skipped batch — if the
                # checkpoint landed exactly on an epoch's final batch, the
                # resumed epoch skips every batch and the in-loop reset
                # never runs; without this the next epoch (same indices)
                # would be skipped too, spinning forever.
                discard_index = -1
                epoch += 1
                continue
            # Mid-epoch exit: keep `epoch` unchanged so the final checkpoint
            # records (epoch, last consumed batch_index) — resuming from it
            # must not skip batches of an epoch that never ran.
            break

        if pbar is not None:
            pbar.close()
        if self.is_master:
            self._save_checkpoint(
                state, train_iterations,
                {"epoch": epoch, "batch_index": dataset_index},
            )

        if hp.cluster_mask_path is None:
            val_metrics = self._run_validation(state, train_iterations)
            self._write_final_metrics(val_metrics)
        if self.writer is not None:
            self.writer.flush()
        self.final_state = jax.device_get(state)

    def make_eval_state(self) -> TrainState:
        """State with weights from --ckpt_path or --container_path."""
        hp = self.hparams
        optimizer = make_optimizer(hp.lr, hp.lr_decay_factor, hp.train_iterations)
        state = make_train_state(self.fg, self.bg, optimizer, self.init_key)
        if hp.ckpt_path is not None:
            state, _ = self._load_checkpoint_into_state(hp.ckpt_path, state)
        if self.fg.pretrained_params is not None:
            # Merged-container eval: weights come from the container itself.
            state = state.replace(
                fg_params=self.fg.pretrained_params,
                bg_params=(
                    self.bg.pretrained_params if self.bg is not None else None
                ),
            )
        return state

    def eval(self) -> None:
        self._setup_experiment_dir()
        val_metrics = self._run_validation(self.make_eval_state(), 0)
        self._write_final_metrics(val_metrics)

    def _load_checkpoint_into_state(
        self, path, state: TrainState
    ) -> Tuple[TrainState, Dict]:
        """Restore a checkpoint into `state` — ours (MNTPU001: params,
        optimizer, RNG, stream position) or a reference torch training
        checkpoint (`{iter}.pt`, reference `runner.py:519-538`: weights,
        iteration, AND torch Adam moments
        (`checkpoint['optimizers']['nerf'|'bg_nerf']` -> optax mu/nu/count,
        so a mid-run reference job hands off without an optimizer cold
        restart). The torch RNG triple (reference `runner.py:526-528`) has
        no jax equivalent and does not transfer — resumed runs draw fresh
        sample jitter. Makes BASELINE.md's parity procedure one command:
        `eval.py --ckpt_path <reference>.pt`."""
        path = Path(path)
        if ckpt_io.is_native_checkpoint(path):
            return ckpt_io.load_checkpoint(path, state)

        from mega_nerf_tpu.models.factory import nerf_config_from_hparams
        from mega_nerf_tpu.models.torch_interop import (
            adam_state_from_torch_opt,
            appearance_count_from_state,
            flax_params_from_torch_state,
            strip_module_prefix,
        )

        hp = self.hparams
        loaded = load_pt(path)
        fg_state = strip_module_prefix(loaded["model_state_dict"])
        appearance_count = appearance_count_from_state(fg_state) or 1
        fg_cfg = nerf_config_from_hparams(
            hp, appearance_count, hp.layer_dim, 3
        )
        fg_params = flax_params_from_torch_state(
            fg_cfg, fg_state, hp.use_cascade
        )
        self._check_params_match(state.fg_params, fg_params, "fg", path)

        bg_params = state.bg_params
        if "bg_model_state_dict" in loaded and self.bg is not None:
            bg_state = strip_module_prefix(loaded["bg_model_state_dict"])
            bg_cfg = nerf_config_from_hparams(
                hp, appearance_count, hp.bg_layer_dim, 4
            )
            bg_params = flax_params_from_torch_state(
                bg_cfg, bg_state, hp.use_cascade
            )
            self._check_params_match(state.bg_params, bg_params, "bg", path)

        state = state.replace(fg_params=fg_params, bg_params=bg_params)

        imported_opt = []
        torch_opts = loaded.get("optimizers", {})
        if "nerf" in torch_opts:
            state = state.replace(fg_opt=adam_state_from_torch_opt(
                fg_cfg, list(fg_state.keys()), torch_opts["nerf"],
                state.fg_opt, hp.use_cascade,
            ))
            imported_opt.append("nerf")
        if (
            "bg_nerf" in torch_opts
            and "bg_model_state_dict" in loaded
            and self.bg is not None
            and state.bg_opt is not None
        ):
            state = state.replace(bg_opt=adam_state_from_torch_opt(
                bg_cfg, list(bg_state.keys()), torch_opts["bg_nerf"],
                state.bg_opt, hp.use_cascade,
            ))
            imported_opt.append("bg_nerf")

        aux = {
            "iteration": int(loaded.get("iteration", 0)),
            "dataset_state": {},
        }
        opt_note = (
            f", Adam moments for {'+'.join(imported_opt)}"
            if imported_opt else ""
        )
        main_print(
            f"Imported reference torch checkpoint {path} (weights"
            f"{opt_note}; torch RNG state does not transfer)"
        )
        # Host-purify: the conversion helpers leave SOME leaves as jnp
        # arrays committed to device 0 (e.g. the imported Adam count).
        # Feeding a mixed committed/host state into the mesh-replicated
        # donated train step deadlocks the XLA:CPU collective rendezvous
        # (one device never reaches the gradient all-reduce — reproduced
        # deterministically, fixed by this purification). Checkpoint
        # import is a once-per-run host operation; placement is the
        # caller's job (`replicate(self.mesh, ...)`).
        state = jax.tree.map(np.asarray, state)
        return state, aux

    @staticmethod
    def _check_params_match(template, imported, name: str, path) -> None:
        t_struct = jax.tree.structure(template)
        i_struct = jax.tree.structure(imported)
        assert t_struct == i_struct, (
            f"{name} params from {path} don't match this config's module "
            f"tree:\n{t_struct}\nvs\n{i_struct}"
        )
        for t, i in zip(jax.tree.leaves(template), jax.tree.leaves(imported)):
            assert np.shape(t) == np.shape(i), (
                f"{name} param shape mismatch loading {path}: "
                f"{np.shape(t)} vs {np.shape(i)} — check layer_dim/"
                f"appearance_dim/use_cascade flags match the checkpoint"
            )

    # ------------------------------------------------------------- validation

    def _run_validation(self, state: TrainState, train_index: int,
                        key_prefix: str = "val") -> Dict[str, float]:
        """Render + score the val images (strided over processes). Returns
        AVERAGES over the images each metric was actually computed on —
        counts ride along the allgather so a metric some ranks cannot
        produce (e.g. LPIPS weights staged on one host) is averaged over
        its real coverage instead of silently diluted by len(val_items).

        `key_prefix` namespaces the metric/image keys (CellRunner passes
        val/cell{i} so per-submodule curves stay distinct)."""
        val_metrics: Dict[str, float] = {}
        val_counts: Dict[str, int] = {}
        # Keep params on device: a host copy here would re-upload the full
        # parameter pytree on every image chunk below (render_fn is called
        # with the same arrays chunk after chunk).
        indices = np.arange(jax.process_index(), len(self.val_items),
                            jax.process_count())

        img_dir = None
        if self.experiment_path is not None:
            img_dir = self.experiment_path / "val_images" / str(train_index)
            img_dir.mkdir(parents=True, exist_ok=True)

        for i in main_tqdm(indices):
            metadata = self.val_items[int(i)]
            viz_rgbs = metadata.load_image().astype(np.float32) / 255.0

            results = self.render_image(metadata, state)
            typ = "fine" if "rgb_fine" in results else "coarse"
            pred = np.asarray(results[f"rgb_{typ}"]).reshape(viz_rgbs.shape)

            half = viz_rgbs.shape[1] // 2
            eval_gt = viz_rgbs[:, half:]
            eval_pred = pred[:, half:]

            val_psnr = float(psnr_metric(jnp.asarray(eval_pred), jnp.asarray(eval_gt)))
            val_ssim = float(ssim_metric(jnp.asarray(eval_pred), jnp.asarray(eval_gt), 1.0))
            per_image = {
                f"{key_prefix}/psnr": val_psnr,
                f"{key_prefix}/ssim": val_ssim,
            }

            for net, v in lpips_metric(eval_pred, eval_gt).items():
                per_image[f"{key_prefix}/lpips/{net}"] = v

            for key, value in per_image.items():
                if self.writer is not None:
                    self.writer.add_scalar(f"{key}/{i}", value, train_index)
                val_metrics[key] = val_metrics.get(key, 0.0) + value
                val_counts[key] = val_counts.get(key, 0) + 1

            depth = np.asarray(results[f"depth_{typ}"]).reshape(viz_rgbs.shape[:2])
            if f"fg_depth_{typ}" in results:
                to_use = np.asarray(results[f"fg_depth_{typ}"]).reshape(-1)
                ma = np.quantile(to_use, 0.95)
                depth = np.clip(depth, None, ma)
            panel = self._create_result_image(viz_rgbs, pred, depth)
            if img_dir is not None:
                from PIL import Image

                Image.fromarray(panel).save(img_dir / f"{int(i)}.jpg")
            if self.writer is not None:
                self.writer.add_image(f"{key_prefix}/{i}", panel, train_index)

        if jax.process_count() > 1:
            # Sum the per-rank partial sums AND counts so the master's
            # average covers every image the metric was computed on (the
            # reference gathers per-rank metric files + barrier,
            # runner.py:495-510). Counts — not a value!=0 filter —
            # distinguish "not computed" from "computed as zero".
            from jax.experimental import multihost_utils

            keys = tuple(
                f"{key_prefix}/{m}"
                for m in ("psnr", "ssim", "lpips/vgg", "lpips/alex",
                          "lpips/squeeze")
            )
            vec = np.asarray(
                [val_metrics.get(k, 0.0) for k in keys]
                + [float(val_counts.get(k, 0)) for k in keys],
                np.float64,
            )
            total = np.asarray(
                multihost_utils.process_allgather(vec), np.float64
            ).sum(0)
            sums, counts = total[: len(keys)], total[len(keys):]
            return {
                k: float(s / c)
                for k, s, c in zip(keys, sums, counts)
                if c > 0
            }
        return {
            k: v / val_counts[k] for k, v in val_metrics.items()
        }

    def _write_final_metrics(self, val_metrics: Dict[str, float]) -> None:
        """val_metrics are per-image AVERAGES (see _run_validation)."""
        if self.is_master and self.experiment_path is not None:
            with (self.experiment_path / "metrics.txt").open("w") as f:
                for key, avg in val_metrics.items():
                    message = f"Average {key}: {avg}"
                    main_print(message)
                    f.write(message + "\n")
            if self.writer is not None:
                self.writer.flush()

    # ---------------------------------------------------------------- render

    def _get_eval_render_fn(self, bounded: bool = False):
        """Eval render jitted over a LOCAL data mesh: every chip this process
        owns renders a slice of each ray chunk (params replicated, rays
        sharded). The reference leaves all but one GPU idle during
        validation/flythroughs (`runner.py:540-589` is single-device); here
        an 8-chip host renders 8x faster. The mesh is local (not the global
        training mesh) because eval images are strided per process
        (reference `runner.py:395-403`) — each process renders whole images
        independently.

        `bounded=True` builds the occupancy variant taking a trailing
        (N, 2) `fg_bounds` input (render/ray_bounds.py); the default
        graph is byte-identical to the pre-occupancy one."""
        if self._eval_render_fn is None:
            self._eval_render_fn = {}
        if bounded not in self._eval_render_fn:
            from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

            hp = self.hparams
            settings = RenderSettings.from_hparams(
                hp, get_depth=True, get_bg_fg_rgb=True
            )

            if getattr(self, "_eval_mesh", None) is None:
                local = np.array(jax.local_devices())
                self._eval_mesh = Mesh(local, ("ldata",))
                self._eval_replicated = NamedSharding(self._eval_mesh, P())
                self._eval_sharded = NamedSharding(
                    self._eval_mesh, P("ldata")
                )
            sharded = self._eval_sharded

            def fn(fg_params, bg_params, rays, image_indices,
                   fg_bounds=None):
                results, _ = render_rays(
                    self.fg, self.bg, fg_params, bg_params, rays,
                    image_indices, settings,
                    self.sphere_center, self.sphere_radius, train=False,
                    fg_bounds=fg_bounds,
                )
                return results

            shardings = (
                self._eval_replicated, self._eval_replicated,
                sharded, sharded,
            )
            if bounded:
                shardings = shardings + (sharded,)
            self._eval_render_fn[bounded] = jax.jit(
                fn, in_shardings=shardings
            )
        return self._eval_render_fn[bounded]

    def _get_eval_render_fn_culled(self, bounded: bool = False):
        """Eval render for culled mega mixtures (render/cell_cull.py): the
        fg stacked params AND centroids arrive as traced ARGUMENTS (sliced
        to a chunk's active cells), so chunks with different active sets of
        the same size share one compilation — one trace per active COUNT,
        not per set. Closing the culled centroids over the jit instead
        would silently render with a stale set: jax keys its cache on
        function identity + argument shapes, never on closure contents."""
        if getattr(self, "_eval_render_fn_culled", None) is None:
            self._eval_render_fn_culled = {}
        if bounded not in self._eval_render_fn_culled:
            self._get_eval_render_fn()  # build the mesh/shardings
            hp = self.hparams
            settings = RenderSettings.from_hparams(
                hp, get_depth=True, get_bg_fg_rgb=True
            )

            def fn(fg_params, bg_params, fg_centroids, rays, image_indices,
                   fg_bounds=None):
                fg = dataclasses.replace(self.fg, centroids=fg_centroids)
                results, _ = render_rays(
                    fg, self.bg, fg_params, bg_params, rays,
                    image_indices, settings,
                    self.sphere_center, self.sphere_radius, train=False,
                    fg_bounds=fg_bounds,
                )
                return results

            shardings = (
                self._eval_replicated, self._eval_replicated,
                self._eval_replicated,
                self._eval_sharded, self._eval_sharded,
            )
            if bounded:
                shardings = shardings + (self._eval_sharded,)
            self._eval_render_fn_culled[bounded] = jax.jit(
                fn, in_shardings=shardings
            )
        return self._eval_render_fn_culled[bounded]

    def _get_eval_render_fn_ray(self, bounded: bool, kv: int, capacity: int):
        """Eval render for ray-routed mega mixtures (--mega_routing ray):
        the load-balanced virtual-expert plan (models/mega.ray_route_plan)
        arrives as traced support/cell-id arguments, so chunks with
        different plans of the same (Kv, capacity) bucket share one
        compilation — both axes are pow-2 bucketed by the planner, keeping
        distinct compiles O(log R * log K). Params stay FULL (the routed
        apply gathers rows by cell id in-graph), so there is no host-side
        param slicing or subset cache at all."""
        cache = getattr(self, "_eval_render_fn_ray_cache", None)
        if cache is None:
            cache = self._eval_render_fn_ray_cache = {}
        key = (bounded, int(kv), int(capacity))
        if key not in cache:
            self._get_eval_render_fn()  # build the mesh/shardings
            hp = self.hparams
            settings = RenderSettings.from_hparams(
                hp, get_depth=True, get_bg_fg_rgb=True
            )
            cap = int(capacity)

            def fn(fg_params, bg_params, support, cells, rays,
                   image_indices, fg_bounds=None):
                results, _ = render_rays(
                    self.fg, self.bg, fg_params, bg_params, rays,
                    image_indices, settings,
                    self.sphere_center, self.sphere_radius, train=False,
                    fg_bounds=fg_bounds,
                    fg_ray_support=support, fg_ray_capacity=cap,
                    fg_ray_cells=cells,
                )
                return results

            shardings = (
                self._eval_replicated, self._eval_replicated,
                self._eval_sharded, self._eval_replicated,
                self._eval_sharded, self._eval_sharded,
            )
            if bounded:
                shardings = shardings + (self._eval_sharded,)
            cache[key] = jax.jit(fn, in_shardings=shardings)
        return cache[key]

    def _get_occupancy(self):
        """Lazy (grid, invradius, offset) from --occupancy_path
        (render/ray_bounds.py), or None when the flag is unset."""
        hp = self.hparams
        path = getattr(hp, "occupancy_path", None)
        if not path:
            return None
        if getattr(self, "_occupancy", None) is None:
            from mega_nerf_tpu.render.ray_bounds import load_occupancy

            self._occupancy = load_occupancy(
                path,
                thresh=float(getattr(hp, "occupancy_thresh", -1.0)),
                dilate=int(getattr(hp, "occupancy_dilate", 1)),
            )
            grid = self._occupancy[0]
            main_print(
                f"Occupancy grid {grid.shape} from {path}: "
                f"{100.0 * grid.mean():.1f}% occupied"
            )
        return self._occupancy

    def _culled_fg_inputs(self, fg_params, mask: np.ndarray):
        """(stacked-params subset, centroids subset) on the eval mesh for
        one active-cell mask (render/cell_cull.ParamSubsetCache). The cache
        is rebuilt whenever `_eval_params` re-places params (new
        TrainState)."""
        cache = getattr(self, "_cull_cache", None)
        if cache is None:
            if getattr(self, "_gather_rows", None) is None:
                self._gather_rows = jax.jit(
                    lambda p, i: jax.tree.map(lambda x: x[i], p),
                    in_shardings=(
                        self._eval_replicated, self._eval_replicated
                    ),
                )
            cache = self._cull_cache = ParamSubsetCache(
                fg_params, np.asarray(self.fg.centroids, np.float32),
                self._gather_rows,
                lambda x: jax.device_put(x, self._eval_replicated),
            )
        return cache.get(mask)

    def _eval_params(self, state: TrainState):
        """Params placed (replicated) on the local eval mesh, cached per
        state object so a validation pass or flythrough places them once.

        Training params live on the (possibly multi-host) training mesh;
        the eval jit runs on the local mesh, so they take one hop through
        the host — negligible next to rendering a full image."""
        cached = getattr(self, "_eval_params_cache", None)
        # Keyed on the state OBJECT (held strongly so its id cannot be
        # recycled): an `id(state)` key alone can spuriously hit when
        # CPython reuses a freed TrainState's address across validations,
        # silently rendering with the PREVIOUS validation's weights.
        if cached is not None and cached[0] is state:
            return cached[1]
        self._get_eval_render_fn()
        placed = jax.device_put(
            (jax.device_get(state.fg_params),
             jax.device_get(state.bg_params) if state.bg_params is not None
             else None),
            self._eval_replicated,
        )
        self._eval_params_cache = (state, placed)
        # Per-active-set param subsets derive from these arrays — drop them
        # with the parent placement (stale subsets would render the
        # PREVIOUS state's weights).
        self._cull_cache = None
        return placed

    def render_image(
        self, metadata: ImageMetadata, state: TrainState
    ) -> Dict[str, np.ndarray]:
        """Render a full image in fixed-size padded chunks
        (reference `runner.py:540-589`)."""
        hp = self.hparams
        rays = generate_image_rays(
            metadata, self.near, self.far, self.ray_altitude_range,
            hp.center_pixels,
        )
        n = rays.shape[0]
        # Chunks divide evenly over the local chips (rays shard over 'ldata').
        n_local = jax.local_device_count()
        # Ray-granularity routed serving (--mega_routing ray): whole rays
        # dispatched to their support cells via the load-balanced
        # virtual-expert plan (models/mega.ray_route_plan — measured 2.11x
        # dense at K=25, PERF.md round 5). Subsumes chunk-union culling
        # (empty cells get no replica; granularity is per ray, not per
        # chunk), so the two paths are mutually exclusive.
        use_ray = (
            getattr(self.fg, "use_ray_routed", False)
            and int(self.fg.centroids.shape[0]) > 1
        )
        # Exact per-chunk submodule culling (render/cell_cull.py): dense
        # mega mixtures only — the routed path already skips inactive cells
        # per point, and a single NeRF has nothing to cull.
        cull = (
            getattr(hp, "cell_cull", True)
            and self.fg.is_mega
            and not self.fg.use_routed
            and not use_ray
            and int(self.fg.centroids.shape[0]) > 1
        )
        fg_centroids_np = (
            np.asarray(self.fg.centroids, np.float32)
            if (cull or use_ray) else None
        )
        sphere_c_np = (
            None if self.sphere_center is None
            else np.asarray(self.sphere_center, np.float64)
        )
        sphere_r_np = (
            None if self.sphere_radius is None
            else np.asarray(self.sphere_radius, np.float64)
        )
        # Opt-in occupancy-tightened fg sampling bounds (--occupancy_path,
        # render/ray_bounds.py) — per-ray, computed host-side.
        fg_bounds = None
        tighten = None
        occ = self._get_occupancy()
        if occ is not None:
            grid, occ_inv, occ_off = occ
            tighten = lambda rr: tighten_rays(  # noqa: E731
                rr, grid, occ_inv, occ_off,
                probes=int(getattr(hp, "occupancy_probes", 128)),
                sphere_center=sphere_c_np, sphere_radius=sphere_r_np,
                mode=str(getattr(hp, "occupancy_mode", "near")),
            )
        if tighten is not None and (cull or use_ray):
            # The culled/ray-routed paths need every ray's bounds BEFORE
            # chunk sizing (they shrink the cull boxes / support sets).
            # The un-culled path defers to per-chunk tightening inside the
            # dispatch loop instead, where the host probe work overlaps
            # the device rendering the previous chunks (24 s of serial
            # numpy per 512^2 frame on a 1-core host before the overlap +
            # blocked-scan rework).
            fg_bounds = tighten(rays)
        if cull:
            # Cull boxes end at the fg ellipsoid exit, not the (possibly
            # ~1e5, bg-owned) ray far — the RENDERED rays keep raw far,
            # only the mask math sees the clamp (cell_cull.clamp_rays_to_fg).
            cull_rays = clamp_rays_to_fg(rays, sphere_c_np, sphere_r_np)
            if fg_bounds is not None:
                # Occupancy-tightened intervals shrink the cull boxes too:
                # fg samples provably lie within [lo, hi]. Collapsed rays
                # keep a zero-width interval — active_cells excludes them
                # from the box (their fg contribution is exactly zero:
                # render_rays zeroes their last_delta).
                cull_rays[:, 6] = np.maximum(cull_rays[:, 6], fg_bounds[:, 0])
                cull_rays[:, 7] = np.minimum(cull_rays[:, 7], fg_bounds[:, 1])
                cull_rays[:, 7] = np.maximum(cull_rays[:, 7], cull_rays[:, 6])
            # Image-level active set sizes the chunks: with few cells in
            # view, each chunk's MLP passes shrink and more rays fit the
            # point budget. The (uncullable) bg mixture gets its own bound.
            image_mask = active_cells(
                cull_rays, fg_centroids_np, self.fg.boundary_margin,
                self.fg.cluster_dim_start,
            )
            if fg_bounds is None and image_mask.all():
                # Without occupancy-tightened bounds, per-chunk boxes under
                # a full image-level set essentially never shrink (measured
                # on-chip, 4x2 drone flythrough: steady 35.9 s/frame culled
                # vs 34.95 plain, after ~1000 s of per-size compiles) — the
                # fg interval legitimately spans the camera-enclosing
                # ellipsoid, so every tile's box reaches every cell. Skip
                # the culled path outright; occupancy bounds re-enable it.
                cull = False
        ray_masks = None
        if cull and fg_bounds is not None:
            # Expected-cost gate for the support-sorted culled path: it
            # buys bucketed_support/K of the fg MLP work per chunk but
            # pays real overhead (support sorting, per-chunk param
            # slicing, smaller chunks, one renderer compile per bucket
            # size). With near-mode occupancy bounds the far end of every
            # interval still reaches the ellipsoid exit, so support sets
            # typically stay at ~K and the path measured 1.29x SLOWER
            # than the plain bounded render (512^2 drone flythrough,
            # PERF.md round 5). Engage only when the mean bucketed
            # support predicts a real win. Per-ray masks are intersected
            # with the image-level box mask (both conservative supersets
            # — exact, and keeps every chunk's bucket within the
            # `submodules` HBM sizing below).
            ray_masks = ray_support_masks(
                cull_rays, fg_centroids_np, self.fg.boundary_margin,
                self.fg.cluster_dim_start,
            )
            ray_masks &= image_mask[None, :]
            sizes = np.maximum(ray_masks.sum(1), 1)
            buckets = 2 ** np.ceil(np.log2(sizes))
            k_total = max(int(self.fg.centroids.shape[0]), 1)
            if float(buckets.mean()) / k_total > 0.7:
                cull = False
                ray_masks = None
        if use_ray:
            from mega_nerf_tpu.models import ray_route_plan

            # Same conservative mask geometry as the culled path: supports
            # over the fg-clamped (and occupancy-tightened) segments only.
            ray_rays = clamp_rays_to_fg(rays, sphere_c_np, sphere_r_np)
            if fg_bounds is not None:
                ray_rays[:, 6] = np.maximum(ray_rays[:, 6], fg_bounds[:, 0])
                ray_rays[:, 7] = np.minimum(ray_rays[:, 7], fg_bounds[:, 1])
                ray_rays[:, 7] = np.maximum(ray_rays[:, 7], ray_rays[:, 6])
            ray_masks = ray_support_masks(
                ray_rays, fg_centroids_np, self.fg.boundary_margin,
                self.fg.cluster_dim_start,
            )
            # Expected-cost gate from the image-level plan: padded slots
            # per ray is the dense-equivalent submodule count the routed
            # render will actually pay. Measured on-chip at K=25 (512^2
            # frames, warm): plan cost 0.17 K won 2.11x over dense, but
            # 0.64 K LOST 2.07x — chunk-plan padding and dispatch
            # overhead exceed the thin MLP saving long before the
            # break-even a FLOP count predicts. Route only genuinely
            # sparse views (large grids, oblique/close-up cameras,
            # occupancy-tightened segments); everything else falls back
            # to dense. --ray_routing_gate tunes the threshold.
            sup_img, cells_img, cap_img = ray_route_plan(ray_masks)
            eff = max(1, -(-len(cells_img) * int(cap_img) // max(n, 1)))
            gate = float(getattr(hp, "ray_routing_gate", 0.45))
            if eff / max(int(self.fg.centroids.shape[0]), 1) > gate:
                use_ray = False
                ray_masks = None
            else:
                ray_plan_eff = eff
        if cull:
            # Size chunks by the BUCKETED count — per-chunk compute runs on
            # the power-of-two-padded subset (cell_cull.bucket_mask), which
            # can exceed the raw image-level count.
            submodules = max(int(bucket_mask(image_mask).sum()), 1)
            bg_k = (
                int(self.bg.centroids.shape[0])
                if self.bg is not None and getattr(self.bg, "is_mega", False)
                else 0
            )
        elif use_ray:
            # Dense-equivalent cost per ray from the image-level plan; the
            # (uncullable, dense) bg mixture gets its own bound.
            submodules = ray_plan_eff
            bg_k = (
                int(self.bg.centroids.shape[0])
                if self.bg is not None and getattr(self.bg, "is_mega", False)
                else 0
            )
        else:
            # Routed mixtures evaluate ~max_experts submodules per point,
            # not all K (models/mega.mega_apply_routed) — the cap follows.
            submodules = self.fg.eval_submodule_cost
            bg_k = 0
        chunk = min(
            hp.image_pixel_batch_size, n,
            _eval_chunk_cap(hp, n_local, submodules, bg_submodules=bg_k),
        )
        if use_ray and chunk > 1:
            # The ray-routed chunk size derives from the image's plan cost
            # (`eff`), which varies per view — a raw value would change the
            # jitted ray shapes every FRAME of a flythrough and recompile
            # the whole (Kv, capacity)-keyed family each time (measured:
            # frames never reached steady state). Floor to a power of two:
            # chunk shapes then coincide across views.
            chunk = 1 << (int(chunk).bit_length() - 1)
        chunk = ((chunk + n_local - 1) // n_local) * n_local
        order = None
        if ray_masks is not None:
            # Occupancy-tightened segments are short enough for per-RAY
            # support sets; grouping rays by support set beats any spatial
            # tiling (AABB chunk bounds stay at the full image-level set on
            # oblique views — see cell_cull.ray_support_masks). The
            # ray-routed path reuses the same grouping: similar supports
            # per chunk keep each chunk's virtual-expert count small.
            order = support_order(ray_masks)
            rays = rays[order]
            if cull:
                cull_rays = cull_rays[order]
            if fg_bounds is not None:
                fg_bounds = fg_bounds[order]
            ray_masks = ray_masks[order]
        elif cull and n == metadata.W * metadata.H:
            # Square-tile chunk order tightens each chunk's sample box
            # (scanline chunks span the full image width) — more culled
            # cells per chunk, identical per-ray outputs (rays are
            # independent; results are un-permuted below).
            cache = getattr(self, "_tile_order_cache", None)
            if cache is None:
                cache = self._tile_order_cache = {}
            key = (metadata.W, metadata.H, chunk)
            order = cache.get(key)
            if order is None:
                order = cache[key] = tile_order(metadata.W, metadata.H, chunk)
                if len(cache) > 8:
                    cache.pop(next(iter(cache)))
            rays = rays[order]
            cull_rays = cull_rays[order]
            if fg_bounds is not None:
                fg_bounds = fg_bounds[order]
        n_padded = ((n + chunk - 1) // chunk) * chunk
        rays = np.concatenate([rays, np.tile(rays[-1:], (n_padded - n, 1))])
        if cull:
            cull_rays = np.concatenate(
                [cull_rays, np.tile(cull_rays[-1:], (n_padded - n, 1))]
            )
        if fg_bounds is not None:
            fg_bounds = np.concatenate(
                [fg_bounds, np.tile(fg_bounds[-1:], (n_padded - n, 1))]
            )
        if ray_masks is not None:
            ray_masks = np.concatenate(
                [ray_masks, np.tile(ray_masks[-1:], (n_padded - n, 1))]
            )
        ray_plans = None
        if use_ray:
            from mega_nerf_tpu.models import ray_route_plan

            # Plan EVERY chunk upfront under ONE (Kv, capacity) compile
            # key: per-chunk optimal plans produce a fresh jit key per
            # chunk shape, and over the relay the compile sprawl swamps
            # the routing win end to end (measured: K=25 512^2 flythrough
            # never reached steady state in 6 frames — PERF.md round 5).
            # The image-level plan's capacity bounds every chunk's
            # per-cell load, so forcing it only pads; experts pad to the
            # max chunk count's pow-2 bucket. Host cost: one extra mask
            # pass, ~ms.
            cap_u = int(cap_img)
            ray_plans = [
                ray_route_plan(
                    ray_masks[s : s + chunk], capacity=cap_u
                )
                for s in range(0, n_padded, chunk)
            ]
            kv_u = 1 << (
                max(p[0].shape[1] for p in ray_plans) - 1
            ).bit_length()
            ray_plans = [
                ray_route_plan(
                    ray_masks[s : s + chunk], capacity=cap_u,
                    pad_experts_to=kv_u,
                )
                for s in range(0, n_padded, chunk)
            ]

        image_indices = (
            np.full(chunk, metadata.image_index, np.int32)
            if hp.appearance_dim > 0
            else None
        )

        render_fn = self._get_eval_render_fn(bounded=tighten is not None)
        fg_params, bg_params = self._eval_params(state)
        # Explicit placement: in multi-process jax, numpy inputs may not be
        # implicitly converted against a non-trivial sharding. The eval mesh
        # is local-only (fully addressable), so a plain device_put is valid
        # regardless of process count.
        if image_indices is not None:
            image_indices = jax.device_put(image_indices, self._eval_sharded)
        results: Dict[str, List[np.ndarray]] = {}

        def drain(out) -> None:
            out = jax.device_get(out)
            for k, v in out.items():
                results.setdefault(k, []).append(np.asarray(v))

        # Double-buffered dispatch: keep `depth` chunks in flight so the
        # device computes chunk i+1 (and the relay's dispatch latency is
        # paid) WHILE chunk i's results stream back through device_get.
        # The old dispatch->get->dispatch loop serialized compute, transfer
        # and round-trip latency per chunk (142 s for 2 frames, PERF.md).
        from collections import deque

        depth = max(1, int(getattr(hp, "render_dispatch_depth", 2)))
        pending: deque = deque()
        bounded = tighten is not None
        for start in range(0, n_padded, chunk):
            chunk_rays = rays[start : start + chunk]
            rays_dev = jax.device_put(chunk_rays, self._eval_sharded)
            tail = ()
            if bounded:
                # Un-culled path: tighten per chunk HERE so the probe
                # numpy overlaps the device rendering the chunks already
                # in flight (`depth` deep).
                fb = (
                    fg_bounds[start : start + chunk]
                    if fg_bounds is not None else tighten(chunk_rays)
                )
                tail = (jax.device_put(fb, self._eval_sharded),)
            if use_ray:
                sup_v, cells_v, cap_v = ray_plans[start // chunk]
                fn = self._get_eval_render_fn_ray(
                    bounded, sup_v.shape[1], cap_v
                )
                pending.append(fn(
                    fg_params, bg_params,
                    jax.device_put(sup_v, self._eval_sharded),
                    jax.device_put(
                        cells_v.astype(np.int32), self._eval_replicated
                    ),
                    rays_dev, image_indices, *tail,
                ))
            elif cull:
                if ray_masks is not None:
                    # Union of the chunk's (support-sorted) per-ray sets,
                    # intersected with the image-level box mask: both are
                    # conservative supersets of the true per-point need
                    # (the support probes' (margin+1)*h slack can admit
                    # cells the box test culled), so the intersection
                    # stays exact AND provably never exceeds the
                    # `submodules` count that sized the chunks above.
                    mask = ray_masks[start : start + chunk].any(0)
                    mask = mask & image_mask
                    if not mask.any():
                        # Every ray collapsed: zero fg everywhere, any
                        # non-empty set is exact.
                        mask = mask.copy()
                        mask[0] = True
                else:
                    # Per-chunk refinement of the image-level set (always a
                    # subset: a smaller box can only tighten both bounds).
                    mask = active_cells(
                        cull_rays[start : start + chunk], fg_centroids_np,
                        self.fg.boundary_margin, self.fg.cluster_dim_start,
                    )
                sub_params, sub_centroids = self._culled_fg_inputs(
                    fg_params, mask
                )
                pending.append(self._get_eval_render_fn_culled(bounded)(
                    sub_params, bg_params, sub_centroids, rays_dev,
                    image_indices, *tail,
                ))
            else:
                pending.append(render_fn(
                    fg_params, bg_params, rays_dev, image_indices, *tail,
                ))
            if len(pending) > depth:
                drain(pending.popleft())
        while pending:
            drain(pending.popleft())

        out = {k: np.concatenate(v)[:n] for k, v in results.items()}
        if order is not None:
            inv = np.empty_like(order)
            inv[order] = np.arange(n, dtype=order.dtype)
            out = {k: v[inv] for k, v in out.items()}
        return out

    # ------------------------------------------------------------------- viz

    @staticmethod
    def _create_result_image(
        rgbs: np.ndarray, result_rgbs: np.ndarray, result_depths: np.ndarray
    ) -> np.ndarray:
        """gt | prediction | log-depth inferno panel (reference runner.py:591-595)."""
        depth_vis = Runner.visualize_scalars(np.log(result_depths + 1e-8))
        images = (rgbs * 255, result_rgbs * 255, depth_vis)
        return np.concatenate(images, axis=1).astype(np.uint8)

    @staticmethod
    def visualize_scalars(scalar_tensor: np.ndarray) -> np.ndarray:
        """Quantile-normalized inverse-inferno colormap
        (reference runner.py:597-610)."""
        import cv2

        to_use = scalar_tensor.reshape(-1)
        while to_use.shape[0] > 2**24:
            to_use = to_use[::2]
        mi = np.quantile(to_use, 0.05)
        ma = np.quantile(to_use, 0.95)
        scalar_tensor = (scalar_tensor - mi) / max(ma - mi, 1e-8)
        scalar_tensor = np.clip(scalar_tensor, 0, 1)
        scalar_tensor = ((1 - scalar_tensor) * 255).astype(np.uint8)
        return cv2.cvtColor(
            cv2.applyColorMap(scalar_tensor, cv2.COLORMAP_INFERNO),
            cv2.COLOR_BGR2RGB,
        )

    # ------------------------------------------------------------------ setup

    def _make_dataset(self):
        hp = self.hparams
        # Datasets get a FRESH seed-derived rng, not self.np_rng: the
        # checkpointed np_rng has advanced past construction-time draws, so
        # rebuilding a dataset from it on resume would produce different
        # val-pixel rebalancing / shuffle choices than the original run and
        # break exact mid-epoch resume.
        ds_rng = np.random.default_rng(hp.random_seed)
        if hp.dataset_type == "memory":
            return MemoryDataset(
                self.train_items, self.near, self.far, self.ray_altitude_range,
                hp.center_pixels, ds_rng,
            )
        elif hp.dataset_type == "filesystem":
            from mega_nerf_tpu.data.filesystem_dataset import FilesystemDataset

            return FilesystemDataset(
                self.train_items, self.near, self.far, self.ray_altitude_range,
                hp.center_pixels,
                [Path(x) for x in sorted(hp.chunk_paths)],
                hp.num_chunks, hp.train_scale_factor, hp.disk_flush_size,
                rng=ds_rng,
            )
        raise Exception(f"Unrecognized dataset type: {hp.dataset_type}")

    def _save_checkpoint(
        self, state: TrainState, train_index: int, dataset_state: Dict
    ) -> None:
        host_state = jax.device_get(state)
        # The jax training key is inside TrainState (array pytree); only the
        # host-side numpy generator needs separate capture.
        aux = {
            "iteration": train_index,
            "dataset_state": dataset_state,
            "np_rng_state": self.np_rng.bit_generator.state,
        }
        ckpt_io.save_checkpoint(
            self.model_path / f"{train_index}.ckpt", host_state, aux
        )

    def _setup_experiment_dir(self) -> None:
        if self.is_master and self.experiment_path is not None:
            self.experiment_path.mkdir(parents=True)
            with (self.experiment_path / "hparams.txt").open("w") as f:
                for key, val in vars(self.hparams).items():
                    f.write(f"{key}: {val}\n")
            with (self.experiment_path / "command.txt").open("w") as f:
                f.write(" ".join(sys.argv) + "\n")
            self.model_path.mkdir(parents=True, exist_ok=True)
            with (self.experiment_path / "image_indices.txt").open("w") as f:
                for item in self.train_items:
                    f.write(f"{item.image_index},{item.image_path.name}\n")
        self.writer = (
            MetricsWriter(self.experiment_path / "tb")
            if self.is_master and self.experiment_path is not None
            else None
        )

    def _get_image_metadata(self) -> Tuple[List[ImageMetadata], List[ImageMetadata]]:
        """Scan metadata dirs; val images join the train set (left-half pixels)
        (reference `runner.py:612-665`)."""
        hp = self.hparams
        dataset_path = Path(hp.dataset_path)

        train_candidates = sorted((dataset_path / "train" / "metadata").iterdir())
        train_paths = [
            train_candidates[i]
            for i in range(0, len(train_candidates), hp.train_every)
        ]
        val_paths = sorted((dataset_path / "val" / "metadata").iterdir())
        train_paths += val_paths
        train_paths.sort(key=lambda x: x.name)
        val_set = set(val_paths)

        image_indices = {p.name: i for i, p in enumerate(train_paths)}
        train_items = [
            self._get_metadata_item(
                p, image_indices[p.name], hp.train_scale_factor, p in val_set
            )
            for p in train_paths
        ]
        val_items = [
            self._get_metadata_item(
                p, image_indices[p.name], hp.val_scale_factor, True
            )
            for p in val_paths
        ]
        return train_items, val_items

    def _get_metadata_item(
        self, metadata_path: Path, image_index: int, scale_factor: int, is_val: bool
    ) -> ImageMetadata:
        image_path = None
        for ext in (".jpg", ".JPG", ".png", ".PNG"):
            candidate = (
                metadata_path.parent.parent / "rgbs" / f"{metadata_path.stem}{ext}"
            )
            if candidate.exists():
                image_path = candidate
                break
        assert image_path is not None and image_path.exists(), metadata_path

        metadata = load_pt(metadata_path)
        intrinsics = np.asarray(metadata["intrinsics"]) / scale_factor
        assert metadata["W"] % scale_factor == 0
        assert metadata["H"] % scale_factor == 0

        dataset_mask = metadata_path.parent.parent.parent / "masks" / metadata_path.name
        if self.hparams.cluster_mask_path is not None:
            if image_index == 0:
                main_print(f"Using cluster mask path: {self.hparams.cluster_mask_path}")
            mask_path = Path(self.hparams.cluster_mask_path) / metadata_path.name
        elif dataset_mask.exists():
            if image_index == 0:
                main_print(f"Using dataset mask path: {dataset_mask.parent}")
            mask_path = dataset_mask
        else:
            mask_path = None

        return ImageMetadata(
            image_path,
            np.asarray(metadata["c2w"]),
            int(metadata["W"]) // scale_factor,
            int(metadata["H"]) // scale_factor,
            intrinsics,
            image_index,
            None if (is_val and self.hparams.all_val) else mask_path,
            is_val,
        )

    def _get_experiment_path(self) -> Path:
        exp_dir = Path(self.hparams.exp_name)
        exp_dir.mkdir(parents=True, exist_ok=True)
        existing = [int(x.name) for x in exp_dir.iterdir() if x.name.isdigit()]
        version = 0 if not existing else max(existing) + 1
        return exp_dir / str(version)
