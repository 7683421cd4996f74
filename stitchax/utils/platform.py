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
import socket

CACHE_DIR = "/tmp/stitchax_jax_cache"

# Relay tunnel listener ports (/root/.tpu_init.py PORTS; probing one suffices).
RELAY_PORTS = (8082, 8083, 8087, 8092)


def relay_alive(timeout: float = 2.0) -> bool:
    """True if the remote-TPU relay tunnel accepts a TCP connection.

    The tunnel can die mid-session and cannot be restarted from inside the
    sandbox (CLAUDE.md); backend init then raises UNAVAILABLE and any
    in-flight device fetch blocks forever. Callers that need the TPU should
    precheck with this instead of discovering the corpse via a hang.
    """
    for port in RELAY_PORTS:
        try:
            with socket.create_connection(("127.0.0.1", port),
                                          timeout=timeout):
                return True
        except OSError:
            continue
    return False


def setup_cli_jax():
    import jax

    plat = os.environ.get("STITCHAX_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    if plat in (None, "", "tpu", "axon"):
        jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
