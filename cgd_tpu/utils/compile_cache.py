"""Persistent XLA compilation cache.

Graph compiles on the (remote) TPU backend cost 1-6 minutes each; the JAX
persistent cache works through the axon remote-compile path (measured:
64px guided graph 296s -> 57s across fresh processes, residual being the
one-time fetch handshake). Enabled by every framework entry point (api, cli,
bench); opt out with CGD_TPU_NO_COMPILE_CACHE=1.

The cache dir is salted with a host fingerprint: even on an accelerator
backend, host-side computations (param init on the CPU device, etc.) produce
XLA:CPU AOT entries that embed the compiling machine's LLVM *target
features*, and reloading them on a different host risks SIGILL (observed
after a host swap: "Target machine feature +prefer-no-scatter is not
supported on the host machine ... could lead to execution errors such as
SIGILL", cpu_aot_loader.cc). The r4 salt read /proc/cpuinfo's flags line,
which demonstrably did NOT catch that case: `+prefer-no-scatter` /
`+prefer-no-gather` are XLA/LLVM-derived target features that never appear
in cpuinfo, so two hosts with identical cpuinfo flags still produced the
mismatch pair in every bench tail. The fingerprint is now the feature
string XLA itself bakes into AOT results — extracted from a serialized
trivial XLA:CPU executable — plus the jaxlib version (the LLVM that derives
the features). A host change starts a fresh per-host cache instead of
loading incompatible AOT code; TPU entries recompile once (~4.5 min at the
256px headline, see PERF.md cold-start).
"""

from __future__ import annotations

import os

_ENABLED = False
_CACHE_DIR: "str | None" = None


def _xla_cpu_target_features() -> "str | None":
    """The exact LLVM target-feature string XLA:CPU compiles against on this
    host — the thing cpu_aot_loader.cc validates when reloading an AOT cache
    entry. Obtained the only way the Python API exposes it: serialize a
    trivial XLA:CPU executable and pull the comma-joined ±feature list out
    of the blob (it contains e.g. `+prefer-no-scatter,+prefer-no-gather`,
    which exist nowhere in /proc/cpuinfo). Returns None if anything about
    this private-ish path fails, in which case the caller falls back to the
    cpuinfo fingerprint."""
    import re

    try:
        import jax

        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            compiled = (
                jax.jit(lambda x: x + 1)
                .lower(jax.ShapeDtypeStruct((), "float32"))
                .compile()
            )
        blob = cpu.client.serialize_executable(compiled.runtime_executable())
        lists = re.findall(rb"(?:[+\-][a-z0-9\-\.]+,){4,}[+\-][a-z0-9\-\.]+", blob)
        if not lists:
            return None
        return max(lists, key=len).decode()
    except Exception:
        return None


def _cpuinfo_fallback() -> str:
    """Legacy (r4) fingerprint source: the cpuinfo flags/Features line plus
    the model identity. Weaker than the target-feature string (see module
    docstring) but better than nothing when executable serialization is
    unavailable. Model identity lines are included because LLVM derives
    tuning features like prefer-no-gather from the CPU *model*, not from
    the flag set."""
    src = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(
                    ("flags", "Features", "vendor_id", "model", "cpu family",
                     "stepping", "CPU implementer", "CPU part")
                ):
                    src += line
                if line.strip() == "" and src:
                    break  # first processor block only
    except OSError:
        pass
    return src


def _host_fingerprint() -> str:
    import hashlib
    import platform

    src = platform.machine()
    try:
        import jaxlib

        # the LLVM that derives the feature set lives in jaxlib; a jaxlib
        # upgrade can change codegen for the same hardware
        src += f" jaxlib={jaxlib.__version__}"
    except Exception:
        pass
    feats = _xla_cpu_target_features()
    if feats is not None:
        src += " " + feats
    else:
        src += " " + _cpuinfo_fallback()
    return hashlib.sha1(src.encode()).hexdigest()[:12]


def cache_dir() -> str:
    """Per-host cache directory (memoized — the fingerprint costs one
    trivial XLA:CPU compile the first time)."""
    global _CACHE_DIR
    if _CACHE_DIR is None:
        _CACHE_DIR = os.path.join(
            os.environ.get(
                "CGD_TPU_COMPILE_CACHE",
                os.path.expanduser("~/.cache/cgd-tpu/xla-cache"),
            ),
            _host_fingerprint(),
        )
    return _CACHE_DIR


def enable_compile_cache() -> None:
    global _ENABLED
    if _ENABLED or os.environ.get("CGD_TPU_NO_COMPILE_CACHE"):
        return
    import jax

    if jax.default_backend() == "cpu":
        # CPU AOT cache entries embed host machine features; reloading them
        # on a different host risks SIGILL, and CPU compiles are fast anyway
        return
    d = cache_dir()
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    _ENABLED = True
