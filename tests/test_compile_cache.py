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
