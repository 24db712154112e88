"""Persistent-cache host fingerprint (utils/compile_cache.py).

The r4 fingerprint read /proc/cpuinfo's flags line and demonstrably missed
the failure it was built for: the cpu_aot_loader mismatch is in LLVM target
features (`+prefer-no-scatter`/`+prefer-no-gather`) which never appear in
cpuinfo. The fingerprint is now XLA's own target-feature string pulled from
a serialized trivial XLA:CPU executable; these tests pin (a) that the
extraction works on this toolchain, (b) that a feature-string difference —
including exactly the prefer-no-* case — isolates the cache directory, and
(c) the cpuinfo fallback still engages when extraction is unavailable.
"""

import re

import pytest


@pytest.fixture
def cc(monkeypatch):
    from cgd_tpu.utils import compile_cache

    # each test derives dirs fresh; never leak the memoized product dir
    monkeypatch.setattr(compile_cache, "_CACHE_DIR", None)
    yield compile_cache
    compile_cache._CACHE_DIR = None


class TestTargetFeatureExtraction:
    def test_extracts_comma_joined_feature_list(self, cc):
        feats = cc._xla_cpu_target_features()
        assert feats is not None, (
            "XLA:CPU executable serialization no longer exposes the target "
            "features — the fingerprint silently degraded to cpuinfo"
        )
        # a comma-joined ±feature list, e.g. "+64bit,+adx,...,+prefer-no-gather"
        assert re.fullmatch(r"(?:[+\-][a-z0-9\-\.]+,)+[+\-][a-z0-9\-\.]+", feats)
        assert len(feats.split(",")) >= 5

    def test_fingerprint_prefers_features_over_cpuinfo(self, cc, monkeypatch):
        """Two hosts with identical cpuinfo but different XLA target features
        (the observed r4 failure: +prefer-no-scatter on one side) must get
        different cache dirs."""
        monkeypatch.setattr(cc, "_cpuinfo_fallback", lambda: "same-cpuinfo")
        monkeypatch.setattr(
            cc, "_xla_cpu_target_features", lambda: "+avx,+avx2,+prefer-no-scatter"
        )
        fp_a = cc._host_fingerprint()
        monkeypatch.setattr(
            cc, "_xla_cpu_target_features", lambda: "+avx,+avx2"
        )
        fp_b = cc._host_fingerprint()
        assert fp_a != fp_b

    def test_cpuinfo_fallback_when_extraction_unavailable(self, cc, monkeypatch):
        monkeypatch.setattr(cc, "_xla_cpu_target_features", lambda: None)
        calls = []

        def fake_cpuinfo():
            calls.append(1)
            return "model name: x\nflags: a b c\n"

        monkeypatch.setattr(cc, "_cpuinfo_fallback", fake_cpuinfo)
        assert re.fullmatch(r"[0-9a-f]{12}", cc._host_fingerprint())
        assert calls, "fallback source was not consulted"


class TestCpuEntriesGated:
    def test_cpu_compiles_are_excluded_from_persistent_cache(self, cc, tmp_path):
        """XLA:CPU modules must never enter the persistent cache: reloading a
        CPU AOT entry logs the spurious cpu_aot_loader feature-mismatch error
        pair EVEN ON THE COMPILING HOST (jax 0.9.0 — measured with a
        two-process probe; the compile feature string carries LLVM tuning
        prefs the loader's CPUID probe never lists). Control first: with the
        cache dir set and no gate, a CPU jit writes entries (proves the
        assertion below isn't vacuous); after _gate_cpu_cache_entries, a
        fresh CPU jit writes nothing."""
        import jax
        import jax.numpy as jnp
        from jax._src import compiler as jcompiler

        orig_key_fn = jcompiler._get_cache_key
        entries = lambda: [p for p in tmp_path.rglob("*") if p.is_file()]
        try:
            jax.config.update("jax_compilation_cache_dir", str(tmp_path))
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
            jax.jit(lambda x: jnp.sin(x) * 3)(jnp.ones((16,))).block_until_ready()
            assert entries(), "control: persistent cache wrote nothing"
            n_control = len(entries())

            assert cc._gate_cpu_cache_entries()
            assert cc._gate_cpu_cache_entries()  # idempotent: no double wrap
            assert getattr(jcompiler._get_cache_key, "_cgd_cpu_gated", False)
            jax.jit(lambda x: jnp.cos(x) + 7)(jnp.ones((16,))).block_until_ready()
            assert len(entries()) == n_control, (
                "gated CPU compile still wrote a persistent-cache entry"
            )
        finally:
            jcompiler._get_cache_key = orig_key_fn
            jax.config.update("jax_compilation_cache_dir", None)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    def test_fingerprint_carries_cache_format_token(self, cc, monkeypatch):
        """Pre-gate cache dirs hold CPU AOT entries that would resume the
        E-log pair on load; the v2 format token in the fingerprint orphans
        them."""
        monkeypatch.setattr(cc, "_xla_cpu_target_features", lambda: "+avx")
        import hashlib
        import platform

        src_v1 = platform.machine()
        try:
            import jaxlib

            src_v1 += f" jaxlib={jaxlib.__version__}"
        except Exception:
            pass
        v1 = hashlib.sha1((src_v1 + " +avx").encode()).hexdigest()[:12]
        assert cc._host_fingerprint() != v1


class TestCacheIsolation:
    def test_fingerprint_change_yields_fresh_cache_dir(self, cc, monkeypatch, tmp_path):
        monkeypatch.setenv("CGD_TPU_COMPILE_CACHE", str(tmp_path))
        monkeypatch.setattr(cc, "_host_fingerprint", lambda: "aaaaaaaaaaaa")
        dir_a = cc.cache_dir()
        cc._CACHE_DIR = None
        monkeypatch.setattr(cc, "_host_fingerprint", lambda: "bbbbbbbbbbbb")
        dir_b = cc.cache_dir()
        assert dir_a != dir_b
        assert dir_a.startswith(str(tmp_path)) and dir_b.startswith(str(tmp_path))

    def test_cache_dir_memoized(self, cc, monkeypatch, tmp_path):
        monkeypatch.setenv("CGD_TPU_COMPILE_CACHE", str(tmp_path))
        calls = []

        def fp():
            calls.append(1)
            return "cccccccccccc"

        monkeypatch.setattr(cc, "_host_fingerprint", fp)
        assert cc.cache_dir() == cc.cache_dir()
        assert len(calls) == 1, "fingerprint (one XLA:CPU compile) must be memoized"
