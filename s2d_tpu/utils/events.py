"""Metric logging: console + metrics.json writers.

The d2 EventStorage / CommonMetricPrinter / JSONWriter trio
(`/root/reference/model_training/mask2former_video/engine/defaults.py:
254-273`, metrics drained every 20 iters) collapses into one MetricLogger:
scalars accumulate per step and flush to the console and to
`OUTPUT_DIR/metrics.json` (one JSON object per line) at a period.
"""
from __future__ import annotations

import json
import os
import time
from collections import deque
from typing import Dict, Optional


class MetricLogger:
    def __init__(
        self,
        output_dir: Optional[str] = None,
        period: int = 20,
        tensorboard: bool = True,
        wandb_project: Optional[str] = None,
    ):
        self.period = period
        self.output_dir = output_dir
        self._json_path = None
        self._tb = None
        self._wandb = None
        if output_dir:
            os.makedirs(output_dir, exist_ok=True)
            self._json_path = os.path.join(output_dir, "metrics.json")
            if tensorboard:
                # optional sink (reference: TensorboardXWriter); absent lib
                # silently degrades to json/console
                try:
                    from torch.utils.tensorboard import SummaryWriter

                    self._tb = SummaryWriter(log_dir=output_dir)
                except Exception:
                    self._tb = None
        if wandb_project:
            # optional sink (reference: WandBWriter, train_net_video.py:277)
            try:
                import wandb

                wandb.init(project=wandb_project, dir=output_dir)
                self._wandb = wandb
            except Exception:
                self._wandb = None
        self._window: deque = deque(maxlen=period)
        self._last_flush = time.perf_counter()

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        scalars = {k: float(v) for k, v in metrics.items()}
        scalars["iteration"] = step
        self._window.append(scalars)
        if self._json_path:
            with open(self._json_path, "a") as f:
                f.write(json.dumps(scalars) + "\n")
        if self._tb is not None:
            for k, v in scalars.items():
                if k != "iteration":
                    self._tb.add_scalar(k, v, step)
        if self._wandb is not None:
            self._wandb.log(scalars, step=step)
        if step % self.period == 0:
            self._print(step)

    def _print(self, step: int) -> None:
        if not self._window:
            return
        keys = [k for k in self._window[-1] if k != "iteration"]
        means = {
            k: sum(m.get(k, 0.0) for m in self._window) / len(self._window)
            for k in keys
        }
        now = time.perf_counter()
        iters_per_sec = len(self._window) / max(now - self._last_flush, 1e-9)
        self._last_flush = now
        parts = "  ".join(f"{k}: {v:.4f}" for k, v in sorted(means.items()))
        print(f"iter {step}  {parts}  ({iters_per_sec:.2f} it/s)", flush=True)
