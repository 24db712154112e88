"""Downloader contracts (no network: idempotence + error paths) and
non-square generation offsets (BASELINE config 5)."""

import os

import numpy as np
import pytest


class TestDownloader:
    def test_existing_file_returned(self, tmp_path):
        from cgd_tpu.io_utils.download import download

        f = tmp_path / "ckpt.pt"
        f.write_bytes(b"weights")
        out = download("http://example.invalid/x.pt", "ckpt.pt", str(tmp_path))
        assert out == str(f)  # no network touched

    def test_directory_collision_raises(self, tmp_path):
        from cgd_tpu.io_utils.download import DownloadError, download

        os.makedirs(tmp_path / "ckpt.pt")
        with pytest.raises(DownloadError, match="not a regular file"):
            download("http://example.invalid/x.pt", "ckpt.pt", str(tmp_path))

    def test_unreachable_retries_then_fails(self, tmp_path, monkeypatch):
        from cgd_tpu.io_utils import download as dl

        sleeps = []
        monkeypatch.setattr(dl.time, "sleep", sleeps.append)
        with pytest.raises(dl.DownloadError, match="after 3 attempts"):
            dl.download("http://127.0.0.1:1/x.pt", "x.pt", str(tmp_path))
        assert sleeps == [1, 2]  # exponential backoff between 3 attempts

    def test_fetch_local(self, tmp_path):
        from cgd_tpu.io_utils.download import fetch

        f = tmp_path / "a.bin"
        f.write_bytes(b"data")
        assert fetch(str(f)).read() == b"data"


class TestNonSquare:
    @pytest.mark.slow
    def test_width_offset_e2e(self, tmp_path, monkeypatch):
        """BASELINE config 5: non-square via width_offset (multiples of the
        UNet's total downsample factor; reference cgd/cgd.py:252,342-343)."""
        from PIL import Image

        monkeypatch.setenv("CGD_TPU_DEBUG_TINY", "1")
        monkeypatch.chdir(tmp_path)
        from cgd_tpu.api import clip_guided_diffusion

        gen = clip_guided_diffusion(
            prompts=["wide"],
            image_size=64,
            width_offset=32,
            timestep_respacing="ddim10",
            num_cutouts=2,
            save_frequency=100,
            weights_mode="random",
            prefix_path=tmp_path / "o",
            progress=False,
        )
        results = list(gen)
        img = Image.open(results[-1][1])
        assert img.size == (96, 64)  # (W+offset, H)

    @pytest.mark.slow
    def test_negative_offset(self, tmp_path, monkeypatch):
        """Negative offsets are documented (less memory, faster): README:141."""
        from PIL import Image

        monkeypatch.setenv("CGD_TPU_DEBUG_TINY", "1")
        monkeypatch.chdir(tmp_path)
        from cgd_tpu.api import clip_guided_diffusion

        gen = clip_guided_diffusion(
            prompts=["tall"], image_size=64, height_offset=-32,
            timestep_respacing="ddim10", num_cutouts=2, save_frequency=100,
            weights_mode="random", prefix_path=tmp_path / "o", progress=False,
        )
        img = Image.open(list(gen)[-1][1])
        assert img.size == (64, 32)
