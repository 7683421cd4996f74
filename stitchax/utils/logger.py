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


def save_train_dashboard(path: str, image1, image2, flow_pred,
                         valid=None, flow_gt=None):
    """Reference-style training figure dashboard (core/utils/logger.py:
    110-267 plot_the_results): a grid of inputs / validity, per-axis flow
    maps, the flow-warped image2, and the avg blend — for the GT flow row
    (when given, i.e. supervised flow pretraining) and the predicted row.
    Arrays: images HWC [0,255]; flows HW2; valid HW (or None)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    import jax.numpy as jnp
    from .. import ops

    def row_for(flow):
        fx, fy = np.asarray(flow[..., 0]), np.asarray(flow[..., 1])
        warped = np.asarray(ops.flow_warp(jnp.asarray(image2, jnp.float32),
                                          jnp.asarray(flow, jnp.float32)))
        if valid is not None:
            warped = warped * np.asarray(valid)[..., None]
        blend = np.clip((np.asarray(image1, np.float64) + warped) / 2,
                        0, 255).astype("uint8")
        warped = np.clip(warped, 0, 255).astype("uint8")
        return fx, fy, warped, blend

    vmin_fn = lambda a: max(-200.0, float(a.min()))   # reference clamps the
    vmax_fn = lambda a: min(200.0, float(a.max()))    # colormap to ±200

    rows = [("pred", row_for(flow_pred))]
    if flow_gt is not None:
        rows.insert(0, ("gt", row_for(flow_gt)))

    n = 1 + len(rows)
    fig, axs = plt.subplots(n, 4, figsize=(16, 4 * n), squeeze=False)
    axs[0, 0].imshow(np.clip(image1, 0, 255).astype("uint8"))
    axs[0, 0].set_title("image1")
    axs[0, 1].imshow(np.clip(image2, 0, 255).astype("uint8"))
    axs[0, 1].set_title("image2")
    if valid is not None:
        axs[0, 2].imshow(np.asarray(valid), cmap="gray", vmin=0, vmax=1)
        axs[0, 2].set_title("valid")
    axs[0, 3].axis("off")
    for r, (label, (fx, fy, warped, blend)) in enumerate(rows, start=1):
        axs[r, 0].imshow(fx, vmin=vmin_fn(fx), vmax=vmax_fn(fx))
        axs[r, 0].set_title(
            f"{label} flow x  [{fx.min():.1f}, {fx.max():.1f}]")
        axs[r, 1].imshow(fy, vmin=vmin_fn(fy), vmax=vmax_fn(fy))
        axs[r, 1].set_title(
            f"{label} flow y  [{fy.min():.1f}, {fy.max():.1f}]")
        axs[r, 2].imshow(warped)
        axs[r, 2].set_title(f"{label} warped image2")
        axs[r, 3].imshow(blend)
        axs[r, 3].set_title(f"{label} avg blend")
    for ax in axs.ravel():
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(path, dpi=80)
    plt.close(fig)
    return path


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


def save_flow_quiver(path: str, flow, step: int = 20):
    """Flow-magnitude heatmap + sparse quiver overlay (headless rebuild of
    the reference's interactive debug helper, core/inference/vis_utils.py:
    4-13 plot_quiver — plt.show() replaced by a saved figure). `flow` is
    HW2 numpy, xy-last."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    flow = np.asarray(flow)
    mag = np.hypot(flow[..., 0], flow[..., 1])
    fig, ax = plt.subplots(figsize=(6, 5))
    im = ax.imshow(mag)
    fig.colorbar(im, ax=ax)
    ys = np.arange(0, flow.shape[0], step)
    xs = np.arange(0, flow.shape[1], step)
    ax.quiver(xs, ys, flow[::step, ::step, 0], flow[::step, ::step, 1],
              color="white", angles="xy", scale_units="xy")
    ax.set_axis_off()
    fig.tight_layout()
    fig.savefig(path, dpi=80)
    plt.close(fig)
    return path
