"""Mixed-precision helpers.

The reference trains/runs with mixed_precision=True (configs/last_config.py)
via torch autocast; the TPU-native equivalent is bfloat16 compute: cast
params + activations to bf16 (MXU dots still accumulate in fp32 on TPU) and
return fp32 outputs. Geometry (DLT/TPS solves, canvas math) stays fp32 —
only the neural backbones run in bf16.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp


def _cast_tree(tree: Any, dtype) -> Any:
    def cast(x):
        if isinstance(x, jnp.ndarray) and jnp.issubdtype(x.dtype,
                                                         jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree_util.tree_map(cast, tree)


def bf16_call(apply_fn: Callable, params: Any, *args) -> Any:
    """Run `apply_fn(params, *args)` in bfloat16; fp32 outputs. The casts
    happen inside the traced computation (jit folds them) — never cast
    eagerly: per-op dispatch through the remote-TPU tunnel costs ~1s/leaf."""
    p16 = _cast_tree(params, jnp.bfloat16)
    args16 = _cast_tree(args, jnp.bfloat16)
    out = apply_fn(p16, *args16)
    return _cast_tree(out, jnp.float32)


def bf16_apply(apply_fn: Callable, params: Any) -> Callable:
    """Wrap `apply_fn(params, *args)` to run in bfloat16 (casts are lazy —
    they trace into the caller's jit rather than dispatching eagerly)."""

    def fn(*args):
        return bf16_call(apply_fn, params, *args)

    return fn
