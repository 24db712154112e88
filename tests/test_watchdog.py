"""Stall detection (cgd_tpu/utils/watchdog.py): the failure-detection
subsystem for hung device backends (motivated by a real axon-tunnel outage
where jax.devices() blocked forever — STATUS.md).

Covers: countdown reset by pet(), disabled mode, the JSON stall report, and
the API's pet cadence (every phase transition + every sampler segment)."""

import json
import os
import time

import pytest

from cgd_tpu.utils.watchdog import STALL_EXIT_CODE, StallDetector


class TestStallDetector:
    def test_disabled_when_timeout_zero(self):
        with StallDetector(0) as dog:
            assert not dog.enabled
            assert dog._thread is None
        with StallDetector(None) as dog:
            assert not dog.enabled

    def test_pets_keep_it_alive_then_stall_fires(self, tmp_path):
        stalls = []
        report = tmp_path / "stall.json"
        with StallDetector(
            1.5, report_path=str(report), on_stall=lambda ph, s: stalls.append((ph, s))
        ) as dog:
            for _ in range(8):  # ~1.6s of liveness > timeout: pets must reset it
                dog.pet("busy phase")
                time.sleep(0.2)
            assert stalls == []
            dog.pet("device fetch")
            deadline = time.monotonic() + 15
            while not stalls and time.monotonic() < deadline:
                time.sleep(0.05)
        assert len(stalls) == 1
        phase, stalled_for = stalls[0]
        assert phase == "device fetch"
        assert stalled_for >= 1.5
        rec = json.loads(report.read_text())
        assert rec["stalled"] is True
        assert rec["phase"] == "device fetch"
        assert rec["pid"] == os.getpid()
        # on_stall replaces process exit, so no exit code is recorded
        assert rec["exit_code"] is None
        assert STALL_EXIT_CODE == 117  # supervisors key off this value

    def test_exit_disarmed_on_clean_close(self):
        # closing the context stops the watchdog thread before any stall
        fired = []
        dog = StallDetector(0.2, on_stall=lambda ph, s: fired.append(ph))
        with dog:
            dog.pet("quick work")
        time.sleep(0.6)
        assert not dog.stalled and not fired


class TestAPIPetCadence:
    @pytest.mark.slow
    def test_api_pets_every_phase_and_segment(self, tmp_path, monkeypatch):
        monkeypatch.setenv("CGD_TPU_DEBUG_TINY", "1")
        monkeypatch.chdir(tmp_path)
        from cgd_tpu.api import clip_guided_diffusion

        pets = []
        list(
            clip_guided_diffusion(
                prompts=["a b c"],
                image_size=64,
                timestep_respacing="ddim10",
                num_cutouts=2,
                save_frequency=4,
                weights_mode="random",
                prefix_path=tmp_path / "out",
                progress=False,
                stall_pet=pets.append,
            )
        )
        assert pets[0] == "resolve model checkpoints"
        assert "encode prompts" in pets
        assert "compile + first sampling segment" in pets
        # ddim10 @ save_frequency=4 -> segments [0][1-4][5-8][9] (a segment
        # runs up to and including the next save step): one liveness pet per
        # scan segment, cumulative step counts
        sampling = [p for p in pets if p.startswith("sampling (")]
        assert sampling == [f"sampling ({k} steps done)" for k in (1, 5, 9, 10)]

    def test_cli_exposes_stall_timeout_flag(self):
        from cgd_tpu.cli import build_parser

        args = build_parser().parse_args(["--stall-timeout", "600"])
        assert args.stall_timeout == 600.0
