"""Deliberate cache warming (cgd_tpu/warmup.py; VERDICT r3 #4).

The warmer must run the REAL generator (so every segment graph of an
operating point lands in the persistent compile cache) and must accept the
same SIZE:RESPACE[:CUTN] grammar everywhere (tools/warm_cache.py and
`python -m cgd_tpu.serve --warmup`).
"""

import pytest

from cgd_tpu.warmup import parse_spec


class TestParseSpec:
    def test_defaults_cutn_16(self):
        assert parse_spec("256:ddim250") == (256, "ddim250", 16)

    def test_explicit_cutn(self):
        assert parse_spec("512:1000:8") == (512, "1000", 8)

    @pytest.mark.parametrize("bad", ["256", "256:ddim250:16:1", "x:y"])
    def test_bad_specs_raise(self, bad):
        with pytest.raises(ValueError):
            parse_spec(bad)


class TestServeWarmup:
    @pytest.mark.slow
    def test_serve_warmup_resolves_default_and_runs(self, monkeypatch, tmp_path):
        """serve --warmup maps 'default' to the 256px headline spec and
        warms with the daemon's final-frame-only segmentation. Driven with a
        tiny spec so it actually executes."""
        monkeypatch.setenv("CGD_TPU_DEBUG_TINY", "1")
        monkeypatch.chdir(tmp_path)
        from cgd_tpu import serve

        serve.run_warmup(["64:ddim5:2"])  # returns without raising

    def test_default_spec_mapping(self):
        from cgd_tpu.warmup import parse_spec

        assert parse_spec("256:ddim250:16") == (256, "ddim250", 16)


class TestWarm:
    @pytest.mark.slow
    def test_warm_runs_real_generator(self, monkeypatch, tmp_path):
        """Tiny debug models: one warm spec drives clip_guided_diffusion end
        to end with the serve daemon's final-frame-only segmentation."""
        monkeypatch.setenv("CGD_TPU_DEBUG_TINY", "1")
        monkeypatch.chdir(tmp_path)
        from cgd_tpu.validate import FINAL_FRAME_ONLY
        from cgd_tpu.warmup import warm_operating_points

        lines = []
        warm_operating_points(
            [(64, "ddim5", 2)], FINAL_FRAME_ONLY,
            log=lambda *a: lines.append(" ".join(map(str, a))),
        )
        assert any("warmed in" in ln for ln in lines)
