"""IO layer + misc component tests: frame paths, video muxers (graceful
no-ffmpeg), native writer, resample quirk, zero-shot ranking, cog shim."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


class TestImages:
    def test_slug_and_path_contract(self):
        from cgd_tpu.io_utils.images import clean_and_combine_prompts

        # reference contract (test.py:106-119): <base>/a_b_c/04/...
        p = clean_and_combine_prompts("/base", ["a", "b", "c"], 4)
        assert p == os.path.join("/base", "a_b_c", "04")
        p = clean_and_combine_prompts("/base", ["Hello, World!"], 0)
        assert p == os.path.join("/base", "Hello_World", "00")

    def test_log_image_roundtrip(self, tmp_path, monkeypatch):
        from PIL import Image

        from cgd_tpu.io_utils.images import log_image

        monkeypatch.chdir(tmp_path)
        img = np.zeros((8, 8, 3), np.float32)
        img[:, :, 0] = 1.0  # red at +1
        path = log_image(img, tmp_path / "out", ["x y"], 3, 1)
        assert path.endswith(os.path.join("x_y", "01", "0003.png"))
        arr = np.asarray(Image.open(path))
        assert arr[0, 0, 0] == 255 and arr[0, 0, 1] == 128
        assert os.path.exists(tmp_path / "current.png")

    def test_native_writer_roundtrip(self, tmp_path):
        from cgd_tpu.io_utils import native_frameio as nf

        if not nf.available():
            pytest.skip("no native toolchain")
        from PIL import Image

        img = (np.random.RandomState(0).rand(32, 48, 3) * 255).astype(np.uint8)
        out = str(tmp_path / "f.png")
        assert nf.submit_png(img, out)
        nf.flush()
        assert nf.error_count() == 0
        np.testing.assert_array_equal(np.asarray(Image.open(out)), img)

    def test_log_image_async(self, tmp_path, monkeypatch):
        from cgd_tpu.io_utils.images import flush_frames, log_image

        monkeypatch.chdir(tmp_path)
        img = np.zeros((8, 8, 3), np.float32)
        path = log_image(img, tmp_path / "o", ["t"], 0, 0, use_async=True)
        flush_frames()
        assert os.path.exists(path)


class TestVideo:
    def test_missing_frames_is_graceful(self, tmp_path, capsys):
        from cgd_tpu.io_utils.video import create_gif_ffmpeg, create_video_ffmpeg

        assert create_gif_ffmpeg(tmp_path, ["none"], 0) is None
        assert create_video_ffmpeg(tmp_path, ["none"], 0) is None
        out = capsys.readouterr().out
        assert "No images found" in out

    def test_missing_ffmpeg_is_graceful(self, tmp_path, capsys, monkeypatch):
        from PIL import Image

        from cgd_tpu.io_utils.images import clean_and_combine_prompts
        from cgd_tpu.io_utils.video import create_video_ffmpeg

        d = clean_and_combine_prompts(tmp_path, ["v"], 0)
        os.makedirs(d)
        Image.new("RGB", (8, 8)).save(os.path.join(d, "0000.png"))
        monkeypatch.setenv("PATH", "/nonexistent")
        assert create_video_ffmpeg(tmp_path, ["v"], 0) is None
        assert "ffmpeg" in capsys.readouterr().out


class TestResample:
    def test_partial_out_shape_quirk(self):
        # ResizeRight contract: out_shape=[s] resizes ONLY the first dim
        from cgd_tpu.ops.resample import resize

        img = jnp.ones((64, 32, 3))
        out = resize(img, (16,))
        assert out.shape == (16, 32, 3)

    def test_downscale_antialiased(self):
        from cgd_tpu.ops.resample import resize

        # a 1px checkerboard downscaled 4x must average toward 0.5, not alias
        img = jnp.zeros((32, 32, 1)).at[::2, :].set(1.0)
        out = resize(img, (8, 8))
        np.testing.assert_allclose(np.asarray(out), 0.5, atol=0.05)


class TestZeroShot:
    def test_imagenet_classes_data(self):
        from cgd_tpu.zero_shot import imagenet_classes

        classes = imagenet_classes()
        assert len(classes) == 1000
        assert any("tench" in c for c in classes[:2])

    def test_top_n_ranking(self, monkeypatch):
        from cgd_tpu import zero_shot
        from cgd_tpu.api import _FallbackTokenizer
        from cgd_tpu.models.clip import init_clip
        from cgd_tpu.models.clip.configs import CLIPConfig, TextConfig, VisionViTConfig

        # tiny class list to keep CPU time sane
        monkeypatch.setattr(
            zero_shot, "imagenet_classes", lambda: ["cat", "dog", "fish", "bird"]
        )
        cfg = CLIPConfig(
            "t", 32, VisionViTConfig(32, 8, 64, 2, 2),
            TextConfig(context_length=16, vocab_size=128, width=64, heads=2, layers=2),
        )
        params = init_clip(jax.random.PRNGKey(0), cfg)
        tok = _FallbackTokenizer(128, 16)
        q = np.random.RandomState(0).randn(1, 32).astype(np.float32)
        order = zero_shot.imagenet_top_n(q, params, cfg, tok)
        assert sorted(order.tolist()) == [0, 1, 2, 3]
        top2 = zero_shot.imagenet_top_n(q, params, cfg, tok, n=2)
        assert len(top2) == 2 and list(top2) == list(order[:2])


class TestCogShim:
    def test_importable_without_cog(self):
        import cog_predict

        pred = cog_predict.ClipGuidedDiffusionPredictor()
        assert hasattr(pred, "setup") and hasattr(pred, "predict")
