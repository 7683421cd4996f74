"""CLI jax platform/cache setup — the single copy (used by out.py,
evaluate.py, train.py, bench.py, __graft_entry__.py).

Two environment facts drive this (see CLAUDE.md):
  * the image pre-imports jax with the remote TPU backend, so
    JAX_PLATFORMS in the env is too late — only a post-import config
    update switches platforms (STITCHAX_PLATFORM honors that);
  * the remote compile service's CPU AOT cache entries carry other
    machines' CPU features (SIGILL risk), so the persistent compile cache
    is enabled for the TPU backend only.
"""

from __future__ import annotations

import os

CACHE_DIR = "/tmp/stitchax_jax_cache"


def setup_cli_jax():
    import jax

    plat = os.environ.get("STITCHAX_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    if plat in (None, "", "tpu", "axon"):
        jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
