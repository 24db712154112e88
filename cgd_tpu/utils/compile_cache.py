"""Persistent XLA compilation cache.

Graph compiles on the (remote) TPU backend cost 1-6 minutes each; the JAX
persistent cache works through the axon remote-compile path (measured:
64px guided graph 296s -> 57s across fresh processes, residual being the
one-time fetch handshake). Enabled by every framework entry point (api, cli,
bench); opt out with CGD_TPU_NO_COMPILE_CACHE=1.

XLA:CPU entries are excluded from the cache entirely (r5): the
cpu_aot_loader.cc "Target machine feature +prefer-no-scatter is not
supported on the host machine ... could lead to execution errors such as
SIGILL" error pair that polluted every bench/smoke tail is a SAME-HOST
false positive, measured on this toolchain (jax 0.9.0): a two-process probe
compiling and reloading a CPU entry on one machine still logs the pair,
because XLA bakes LLVM *tuning* preferences (`+prefer-no-scatter`,
`+prefer-no-gather`) into the compile-time feature string while the
loader's host probe enumerates only real CPUID features. The r4 reading
(host swap -> fingerprint salt) was wrong — no per-host salt can silence a
same-host mismatch. Under an accelerator default backend the only
cpu-platform compiles are small host-side graphs (param init, token
prep — sub-second), so persisting them buys nothing; _gate_cpu_cache_entries
nulls the cache key for cpu-platform backends, keeping the accelerator
entries (the ones worth minutes) and skipping CPU reads AND writes.

The cache dir is still salted with a host fingerprint — XLA's own
target-feature string (extracted from a serialized trivial XLA:CPU
executable) plus the jaxlib version — as defense in depth for any residual
host-sensitive entry a future backend might produce, plus a cache-format
version token so dirs holding pre-gate CPU entries are never reloaded.
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

    # cache-format token: v2 dirs never contain XLA:CPU entries (the gate
    # below); bumping it also orphans pre-gate dirs that do
    src = "v2-cpu-gated " + platform.machine()
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


def _gate_cpu_cache_entries() -> bool:
    """Null the persistent-cache key for cpu-platform backends so XLA:CPU
    modules are neither written to nor read from the cache (see module
    docstring: same-host CPU AOT reloads log a spurious feature-mismatch
    error pair on this toolchain, and CPU compiles are sub-second anyway).
    Wraps jax's private ``_get_cache_key`` — the single choke point both the
    read and write paths flow through; a jax upgrade that moves it degrades
    gracefully (returns False, entries cached as before). Idempotent."""
    try:
        from jax._src import compiler as _compiler

        orig = _compiler._get_cache_key
        if getattr(orig, "_cgd_cpu_gated", False):
            return True

        def gated(options, backend, computation, devices, *a, **kw):
            if getattr(backend, "platform", None) == "cpu":
                return None
            return orig(options, backend, computation, devices, *a, **kw)

        gated._cgd_cpu_gated = True
        _compiler._get_cache_key = gated
        return True
    except Exception:
        return False


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
    _gate_cpu_cache_entries()
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    _ENABLED = True
