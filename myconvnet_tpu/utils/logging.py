"""Metric logging/observability (SURVEY.md §5: console + TensorBoard
scalars in the reference; here console + JSONL + optional TensorBoard).

The JSONL stream is the structured source of truth (one line per log
call); TensorBoard is attached when a writer is available (flax's
summary writer or tensorboardX), and skipped silently otherwise — no
hard dependency.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any


class MetricLogger:
    def __init__(self, log_dir: str | None = None, name: str = "train",
                 stdout: bool = True, tensorboard: bool = False):
        self.stdout = stdout
        self._jsonl = None
        self._tb = None
        self._dir = log_dir
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._jsonl = open(os.path.join(log_dir, f"{name}.jsonl"), "a")
            if tensorboard:
                self._tb = _make_tb_writer(os.path.join(log_dir, "tb"))

    def log(self, step: int, metrics: dict[str, Any]) -> None:
        clean = {k: (float(v) if hasattr(v, "__float__") else v)
                 for k, v in metrics.items()}
        if self.stdout:
            parts = " ".join(f"{k}={v:.5g}" if isinstance(v, float)
                             else f"{k}={v}" for k, v in clean.items())
            print(f"[step {step}] {parts}", flush=True)
        if self._jsonl:
            rec = {"step": step, "time": time.time(), **clean}
            self._jsonl.write(json.dumps(rec) + "\n")
            self._jsonl.flush()
        if self._tb:
            for k, v in clean.items():
                if isinstance(v, float):
                    self._tb.scalar(k, v, step)
            self._tb.flush()

    def log_image(self, step: int, tag: str, image) -> str | None:
        """Write an image artifact (uint8 HWC/HW) under log_dir/images/
        and mirror to TensorBoard when a writer is attached.  Returns the
        file path (None without a log_dir)."""
        if self._tb is not None and hasattr(self._tb, "image"):
            try:
                self._tb.image(tag, image, step)
            except Exception:
                pass
        if self._dir is None:
            return None
        from myconvnet_tpu.utils.images import save_png
        path = os.path.join(self._dir, "images", f"{tag}_{step:08d}.png")
        return save_png(path, image)

    def close(self):
        if self._jsonl:
            self._jsonl.close()
        if self._tb:
            self._tb.close()


def _make_tb_writer(path: str):
    try:
        from flax.metrics import tensorboard as _tb
        return _tb.SummaryWriter(path)
    except Exception:
        return None
