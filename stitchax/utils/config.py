"""Minimal yacs-style config nodes.

The reference stacks argparse + python-module configs + yacs ``CfgNode``
(reference: out.py:32-52, inf_configs/*.py). yacs is not available in this
environment, so this module provides the small subset the framework needs:
attribute access, dict merging, freezing, and pretty dumping.
"""

from __future__ import annotations

import copy
from typing import Any, Dict


class CfgNode(dict):
    """A dict with attribute access and recursive merge, yacs-compatible enough
    for the config files this framework ships."""

    IMMUTABLE = "__immutable__"

    def __init__(self, init_dict: Dict[str, Any] | None = None):
        super().__init__()
        object.__setattr__(self, CfgNode.IMMUTABLE, False)
        if init_dict:
            for k, v in init_dict.items():
                self[k] = self._to_node(v)

    @classmethod
    def _to_node(cls, v):
        if isinstance(v, dict) and not isinstance(v, CfgNode):
            return cls(v)
        return v

    # --- attribute access -------------------------------------------------
    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        if object.__getattribute__(self, CfgNode.IMMUTABLE):
            raise AttributeError(f"CfgNode is frozen; cannot set {name}")
        self[name] = self._to_node(value)

    def __setitem__(self, key, value):
        if object.__getattribute__(self, CfgNode.IMMUTABLE):
            raise AttributeError(f"CfgNode is frozen; cannot set {key}")
        super().__setitem__(key, self._to_node(value))

    # --- merge ------------------------------------------------------------
    def merge_from_dict(self, other: Dict[str, Any]):
        for k, v in other.items():
            if k in self and isinstance(self[k], CfgNode) and isinstance(v, dict):
                self[k].merge_from_dict(v)
            else:
                self[k] = self._to_node(copy.deepcopy(v))
        return self

    def merge_from_other_cfg(self, other: "CfgNode"):
        return self.merge_from_dict(other)

    def merge_from_list(self, opts):
        assert len(opts) % 2 == 0, "override list must be key value pairs"
        for key, value in zip(opts[0::2], opts[1::2]):
            node = self
            parts = key.split(".")
            for p in parts[:-1]:
                node = node[p]
            old = node.get(parts[-1])
            node[parts[-1]] = _coerce(value, old)
        return self

    # --- freeze -----------------------------------------------------------
    def freeze(self):
        object.__setattr__(self, CfgNode.IMMUTABLE, True)
        for v in self.values():
            if isinstance(v, CfgNode):
                v.freeze()
        return self

    def defrost(self):
        object.__setattr__(self, CfgNode.IMMUTABLE, False)
        for v in self.values():
            if isinstance(v, CfgNode):
                v.defrost()
        return self

    def clone(self) -> "CfgNode":
        return CfgNode(copy.deepcopy(self.to_dict()))

    def to_dict(self) -> Dict[str, Any]:
        out = {}
        for k, v in self.items():
            out[k] = v.to_dict() if isinstance(v, CfgNode) else v
        return out

    def dump(self, indent: int = 0) -> str:
        lines = []
        for k in sorted(self.keys()):
            v = self[k]
            pad = "  " * indent
            if isinstance(v, CfgNode):
                lines.append(f"{pad}{k}:")
                lines.append(v.dump(indent + 1))
            else:
                lines.append(f"{pad}{k}: {v!r}")
        return "\n".join(lines)

    def __repr__(self):
        return f"CfgNode({dict.__repr__(self)})"

    def __deepcopy__(self, memo):
        return CfgNode(copy.deepcopy(self.to_dict(), memo))


def _coerce(value: str, old: Any):
    """Coerce a CLI string override to the type of the existing value."""
    if not isinstance(value, str):
        return value
    if isinstance(old, bool):
        return value.lower() in ("1", "true", "yes", "on")
    for cast in (int, float):
        if isinstance(old, cast):
            try:
                return cast(value)
            except ValueError:
                pass
    if old is None:
        for cast in (int, float):
            try:
                return cast(value)
            except ValueError:
                continue
        if value.lower() in ("true", "false"):
            return value.lower() == "true"
    return value
