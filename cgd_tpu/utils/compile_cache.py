"""Persistent XLA compilation cache.

Graph compiles on the (remote) TPU backend cost 1-6 minutes each; the JAX
persistent cache works through the axon remote-compile path (measured:
64px guided graph 296s -> 57s across fresh processes, residual being the
one-time fetch handshake). Enabled by every framework entry point (api, cli,
bench); opt out with CGD_TPU_NO_COMPILE_CACHE=1.

The cache dir is salted with a host-CPU fingerprint: even on an accelerator
backend, host-side computations (param init on the CPU device, etc.) produce
XLA:CPU AOT entries that embed the compiling machine's CPU features, and
reloading them on a different host risks SIGILL (observed after a host swap:
"Target machine feature +prefer-no-scatter is not supported on the host
machine ... could lead to execution errors such as SIGILL"). A host change
now starts a fresh per-host cache instead of loading incompatible AOT code;
TPU entries recompile once (~4.5 min at the 256px headline, see PERF.md
cold-start).
"""

from __future__ import annotations

import os

_ENABLED = False


def _host_fingerprint() -> str:
    import hashlib
    import platform

    src = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                # x86 "flags" / arm64 "Features": the feature set XLA:CPU
                # bakes into AOT results
                if line.startswith(("flags", "Features")):
                    src += line
                    break
    except OSError:
        pass
    return hashlib.sha1(src.encode()).hexdigest()[:12]


CACHE_DIR = os.path.join(
    os.environ.get(
        "CGD_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/cgd-tpu/xla-cache")
    ),
    _host_fingerprint(),
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
