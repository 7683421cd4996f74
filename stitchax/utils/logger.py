"""Training/inference logger: console + JSONL metrics + running windows.

Rebuild of the reference Logger (reference: core/utils/logger.py:13-294 —
wandb + loguru + matplotlib panels). Zero-egress TPU environments can't use
wandb, so metrics stream to a local JSONL file any dashboard can tail; the
image-panel hooks accept a callable so wandb can be plugged back in where
available.
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections import defaultdict, deque
from typing import Any, Callable, Dict, Optional


class Logger:
    def __init__(self, log_dir: str = ".", name: str = "stitchax",
                 sum_freq: int = 100, window: int = 100,
                 sink: Optional[Callable[[Dict[str, Any]], None]] = None):
        self.name = name
        self.sum_freq = sum_freq
        self.window = window
        self.sink = sink
        self._running = defaultdict(lambda: deque(maxlen=window))
        self._step = 0
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, f"{name}_metrics.jsonl"),
                           "a", buffering=1)
        self._t0 = time.time()

    # ---------------------------- console -----------------------------------
    def info(self, msg: str):
        t = time.time() - self._t0
        print(f"[{self.name} +{t:8.1f}s] {msg}", file=sys.stderr, flush=True)

    # ---------------------------- metrics ------------------------------------
    def push(self, metrics: Dict[str, Any], step: Optional[int] = None):
        """Running-window metric accumulation (reference logger.py:53-67)."""
        self._step = self._step + 1 if step is None else step
        rec = {"step": self._step, "t": round(time.time() - self._t0, 3)}
        for k, v in metrics.items():
            v = float(v)
            self._running[k].append(v)
            rec[k] = v
        self._jsonl.write(json.dumps(rec) + "\n")
        if self.sink:
            self.sink(rec)
        if self._step % self.sum_freq == 0:
            avg = {k: sum(d) / len(d) for k, d in self._running.items()}
            pretty = " ".join(f"{k}={v:.4g}" for k, v in avg.items())
            self.info(f"step {self._step}: {pretty}")

    def write_dict(self, d: Dict[str, Any], step: Optional[int] = None):
        """Direct metric upload (reference logger.py:271)."""
        rec = {"step": step if step is not None else self._step}
        rec.update({k: float(v) for k, v in d.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        if self.sink:
            self.sink(rec)

    def close(self):
        self._jsonl.close()


def save_flow_panel(path: str, image1, image2, flow, warped=None):
    """Training dashboard panel: inputs, flow visualization, warp result
    (rebuild of the reference's matplotlib figure dashboards,
    core/utils/logger.py:110-267). Arrays are HWC numpy/[0,255]."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from ..data.flow_viz import flow_to_image

    panels = [("image1", np.clip(image1, 0, 255).astype("uint8")),
              ("image2", np.clip(image2, 0, 255).astype("uint8")),
              ("flow", flow_to_image(np.asarray(flow)))]
    if warped is not None:
        panels.append(("warped", np.clip(warped, 0, 255).astype("uint8")))
    fig, axes = plt.subplots(1, len(panels), figsize=(4 * len(panels), 4))
    for ax, (title, img) in zip(np.atleast_1d(axes), panels):
        ax.imshow(img)
        ax.set_title(title)
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(path, dpi=80)
    plt.close(fig)
