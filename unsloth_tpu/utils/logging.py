"""Training metrics logging.

Parity target: the reference passes `report_to` through to
wandb/tensorboard/trackio with auto-disable of broken integrations
(reference: import_fixes.py:1792,781) and streams live metrics to the
Studio UI via trainer callbacks (studio core/training/trainer.py:248-344).

Here: a small logger fan-out. JSONL is always available (zero deps);
wandb/tensorboard attach when importable; callbacks get every entry
(the Studio-style live stream hook).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Callable, Dict, Optional, Sequence


class MetricsLogger:
    def __init__(self, output_dir: str = "outputs",
                 report_to: Any = "none",
                 run_name: Optional[str] = None,
                 callbacks: Sequence[Callable[[Dict[str, Any]], None]] = ()):
        self.output_dir = output_dir
        self.callbacks = list(callbacks)
        self._jsonl = None
        self._wandb = None
        self._tb = None
        targets = report_to if isinstance(report_to, (list, tuple)) \
            else [report_to]
        targets = [t for t in targets if t and t != "none"]
        os.makedirs(output_dir, exist_ok=True)
        self._jsonl_path = os.path.join(output_dir, "metrics.jsonl")

        for t in targets:
            if t == "wandb":
                try:
                    import wandb

                    self._wandb = wandb.init(
                        project=os.environ.get("WANDB_PROJECT",
                                               "unsloth_tpu"),
                        name=run_name, reinit=True)
                except Exception:
                    self._wandb = None  # broken wandb auto-disable
            elif t == "tensorboard":
                try:
                    from torch.utils.tensorboard import SummaryWriter

                    self._tb = SummaryWriter(log_dir=os.path.join(
                        output_dir, "tb"))
                except Exception:
                    self._tb = None

    def log(self, entry: Dict[str, Any]):
        entry = dict(entry, _ts=time.time())
        with open(self._jsonl_path, "a") as f:
            f.write(json.dumps(entry) + "\n")
        if self._wandb is not None:
            self._wandb.log({k: v for k, v in entry.items()
                             if isinstance(v, (int, float))})
        if self._tb is not None:
            step = int(entry.get("step", 0))
            for k, v in entry.items():
                if isinstance(v, (int, float)) and k != "step":
                    self._tb.add_scalar(k, v, step)
        for cb in self.callbacks:
            cb(entry)

    def close(self):
        if self._wandb is not None:
            self._wandb.finish()
        if self._tb is not None:
            self._tb.close()
