"""Persistent XLA compilation cache.

Graph compiles on the (remote) TPU backend cost 1-6 minutes each; the JAX
persistent cache works through the axon remote-compile path (measured:
64px guided graph 296s -> 57s across fresh processes, residual being the
one-time fetch handshake). Enabled by every framework entry point (api, cli,
bench); opt out with CGD_TPU_NO_COMPILE_CACHE=1.
"""

from __future__ import annotations

import os

_ENABLED = False
CACHE_DIR = os.environ.get(
    "CGD_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/cgd-tpu/xla-cache")
)


def enable_compile_cache() -> None:
    global _ENABLED
    if _ENABLED or os.environ.get("CGD_TPU_NO_COMPILE_CACHE"):
        return
    import jax

    if jax.default_backend() == "cpu":
        # CPU AOT cache entries embed host machine features; reloading them
        # on a different host risks SIGILL, and CPU compiles are fast anyway
        return
    os.makedirs(CACHE_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    _ENABLED = True
