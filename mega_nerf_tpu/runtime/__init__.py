"""Training/eval runtime (L4): orchestration, checkpoints, experiment dirs."""

from mega_nerf_tpu.runtime.runner import Runner

__all__ = ["Runner"]
