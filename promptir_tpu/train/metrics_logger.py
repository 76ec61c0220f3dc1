"""Training metric logging: JSONL always; TensorBoard/wandb when available.

Capability parity with the reference's `WandbLogger | TensorBoardLogger`
selection (/root/reference/train.py:328-331) and per-step
`self.log("train_loss", ...)` (train.py:45). The JSONL stream is the
source of truth (greppable, survives without any logging backend).
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class MetricLogger:
    def __init__(
        self,
        log_dir: str,
        wandb_project: Optional[str] = None,
        use_tensorboard: bool = False,
    ):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._wandb = None
        self._tb = None
        if wandb_project:
            try:
                import wandb

                self._wandb = wandb.init(project=wandb_project, dir=log_dir)
            except Exception:
                self._wandb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def log(self, metrics: dict, step: int) -> None:
        record = {"step": step, "time": time.time()}
        record.update({k: float(v) for k, v in metrics.items()})
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, float(v), step)

    def close(self) -> None:
        self._jsonl.close()
        if self._wandb is not None:
            self._wandb.finish()
        if self._tb is not None:
            self._tb.close()
