"""Plugin registries + importlib-by-name resolution.

The reference's only extension mechanism is importlib string lookup of config
modules, mix methods, and inpainters (reference: out.py:45-46,235,344). This
module preserves that contract: components register under a string name and
callers resolve them either from the registry or by importing
``<package>.<name>`` directly, so user-supplied modules drop in exactly like
the reference's ``inf_configs/mycustom.py`` flow (reference: README.md:38-39).
"""

from __future__ import annotations

import importlib
from typing import Any, Callable, Dict


class Registry:
    def __init__(self, kind: str, module_prefixes: tuple[str, ...] = ()):
        self.kind = kind
        self.module_prefixes = module_prefixes
        self._entries: Dict[str, Any] = {}

    def register(self, name: str | None = None) -> Callable:
        def deco(obj):
            key = name or obj.__name__
            self._entries[key] = obj
            return obj

        return deco

    def add(self, name: str, obj: Any):
        self._entries[name] = obj

    def get(self, name: str) -> Any:
        if name in self._entries:
            return self._entries[name]
        # importlib fallback: resolve `<prefix>.<name>` like the reference does
        last_err = None
        for prefix in self.module_prefixes:
            try:
                return importlib.import_module(f"{prefix}.{name}")
            except ImportError as e:  # pragma: no cover - depends on cwd
                last_err = e
        raise KeyError(
            f"unknown {self.kind} '{name}' (registered: {sorted(self._entries)})"
        ) from last_err

    def names(self):
        return sorted(self._entries)

    def __contains__(self, name):
        return name in self._entries


# Mix methods combine TPS/flow warps + decide what to inpaint
# (reference: core/inference/mix_methods/*.py resolved at out.py:235).
MIX_METHODS = Registry("mix_method")

# Inpainters fill the remaining holes
# (reference: core/inference/mix_methods/utils/*_inpainter.py, out.py:344).
INPAINTERS = Registry("inpainter")

# Model configs (reference: configs/<name>.py via out.py:31-41).
MODEL_CONFIGS = Registry("model_config", module_prefixes=("configs",))

# Inference configs (reference: inf_configs/<name>.py via out.py:43-54).
INFERENCE_CONFIGS = Registry("inference_config", module_prefixes=("inf_configs",))

# TPS backends (reference: core/inference/tps_methods/* via tps_pipline.py:339-426).
TPS_METHODS = Registry("tps_method")

# Point-sampling strategies (reference: core/inference/sample_point_methods.py).
POINT_SAMPLERS = Registry("point_sampler")
