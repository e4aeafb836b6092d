"""Experiment logging: JSONL metrics + optional TensorBoard, rank-0 gating.

Parity target: reference `misc_utils.py` (main_print/main_tqdm) and the
SummaryWriter usage in `runner.py:282-283,342`. Metrics always go to a
`metrics.jsonl` file (greppable, no deps); TensorBoard event files are
written too when torch's SummaryWriter imports.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Optional

import jax
from tqdm import tqdm


def is_master() -> bool:
    return jax.process_index() == 0


def main_print(*args) -> None:
    if is_master():
        print(*args, flush=True)


def main_tqdm(iterable, **kw):
    return tqdm(iterable, **kw) if is_master() else iterable


class MetricsWriter:
    def __init__(self, log_dir: Optional[Path]):
        self._jsonl = None
        self._tb = None
        if log_dir is not None and is_master():
            log_dir = Path(log_dir)
            log_dir.mkdir(parents=True, exist_ok=True)
            self._jsonl = open(log_dir / "metrics.jsonl", "a")
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(str(log_dir))
            except Exception:
                self._tb = None

    def add_scalar(self, key: str, value: float, step: int) -> None:
        if self._jsonl is not None:
            self._jsonl.write(
                json.dumps({"t": time.time(), "step": step, key: float(value)}) + "\n"
            )
        if self._tb is not None:
            self._tb.add_scalar(key, float(value), step)

    def add_image(self, key: str, image_hwc, step: int) -> None:
        if self._tb is not None:
            self._tb.add_image(key, image_hwc, step, dataformats="HWC")

    def flush(self) -> None:
        if self._jsonl is not None:
            self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        if self._jsonl is not None:
            self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


def sync_processes(tag: str) -> None:
    """Cross-process barrier (the reference's dist.barrier, runner.py:55).

    No-op single-process; multi-host it rides a tiny psum over all devices
    via multihost_utils, so every process reaches `tag` before any proceeds
    (used around rank-0-only filesystem work: chunk writing, mask dirs).
    """
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(tag)
