"""Run-dir naming, config snapshotting, stage trace annotations.

Rebuild of reference core/utils/misc.py:14-32 (process_cfg) plus the
tracing/profiling subsystem SURVEY.md §5 calls for: jax.profiler trace
annotations around the five pipeline stages so device timelines segment by
stage in TensorBoard/xprof captures.
"""

from __future__ import annotations

import contextlib
import datetime
import os
from typing import Iterator

import jax


def process_cfg(cfg, base_log_dir: str = "logs"):
    """Derive a unique run dir name from the config and snapshot the resolved
    config into it (reference: core/utils/misc.py:14-32)."""
    stamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
    name = "_".join(str(cfg.get(k)) for k in ("name", "stage")
                    if cfg.get(k)) or "run"
    log_dir = os.path.join(base_log_dir, f"{name}_{stamp}")
    os.makedirs(log_dir, exist_ok=True)
    cfg["log_dir"] = log_dir
    with open(os.path.join(log_dir, "config.txt"), "w") as f:
        dump = cfg.dump() if hasattr(cfg, "dump") else repr(cfg)
        f.write(dump)
    return cfg


@contextlib.contextmanager
def stage(name: str) -> Iterator[None]:
    """Profiler annotation for a pipeline stage; nests under jax.profiler
    traces (start a capture with `jax.profiler.start_trace(logdir)`)."""
    with jax.profiler.TraceAnnotation(name):
        yield


def start_trace(logdir: str):
    jax.profiler.start_trace(logdir)


def stop_trace():
    jax.profiler.stop_trace()
