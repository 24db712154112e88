"""Real checkpoint *serialization formats*, drilled offline (VERDICT r2 #2).

Network egress is blocked here, so the actual OpenAI downloads can't run —
but their on-disk formats can: every real OpenAI CLIP release is a
TorchScript archive (the reference loads them via clip.load ->
torch.jit.load, cgd/clip_util.py:59-64), and every guided_diffusion UNet
checkpoint is a torch.save'd state dict (cgd/script_util.py:317 th.load).
These tests create tiny files in BOTH formats and run the full
resolve/convert/cache file paths over them, so the first real-network run
exercises no untested branch.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from test_convert_keysets import adm_state_dict
from test_custom_clip import _tiny_vit_sd


def _torchscript_archive_with_sd(sd_numpy, path):
    """Build a TorchScript .pt archive whose state_dict() has exactly the
    given keys — the same container format torch.jit.save produces for the
    real OpenAI CLIP releases."""
    root = torch.nn.Module()
    for key, val in sd_numpy.items():
        parts = key.split(".")
        mod = root
        for p in parts[:-1]:
            if not hasattr(mod, p) or not isinstance(getattr(mod, p), torch.nn.Module):
                mod.add_module(p, torch.nn.Module())
            mod = getattr(mod, p)
        mod.register_parameter(
            parts[-1], torch.nn.Parameter(torch.from_numpy(np.asarray(val)))
        )
    root.forward = lambda x: x
    traced = torch.jit.trace(root, torch.zeros(1), strict=False)
    torch.jit.save(traced, str(path))


class TestTorchScriptClip:
    def test_load_torch_clip_sd_jit_branch(self, tmp_path):
        """load_torch_clip_sd's torch.jit.load branch (convert/torch_clip.py)
        had never seen an actual TorchScript archive before this test."""
        from cgd_tpu.convert.torch_clip import load_torch_clip_sd

        sd = _tiny_vit_sd()
        pt = tmp_path / "ts_clip.pt"
        _torchscript_archive_with_sd(sd, pt)
        loaded = load_torch_clip_sd(str(pt))
        assert set(loaded) == set(sd)
        for k in sd:
            np.testing.assert_array_equal(loaded[k], sd[k])

    def test_resolve_custom_clip_from_torchscript(self, tmp_path):
        """Full custom-checkpoint path over a TorchScript file: config
        inference, conversion, npz cache write, second-load cache hit —
        and bit-identical params vs the plain torch.save format."""
        from cgd_tpu.models.clip import encode_image
        from cgd_tpu.weights import _converted_path, resolve_clip

        sd = _tiny_vit_sd()
        ts_pt = tmp_path / "ts_clip.pt"
        plain_pt = tmp_path / "plain_clip.pt"
        _torchscript_archive_with_sd(sd, ts_pt)
        torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, plain_pt)

        params_ts, cfg_ts = resolve_clip(str(ts_pt))
        params_pl, cfg_pl = resolve_clip(str(plain_pt))
        import dataclasses

        assert dataclasses.replace(cfg_ts, name="x") == dataclasses.replace(cfg_pl, name="x")
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            params_ts, params_pl,
        )
        assert os.path.exists(_converted_path(str(ts_pt)))  # converted cache

        img = jnp.ones((1, 32, 32, 3)) * 0.25
        emb = encode_image(params_ts, cfg_ts, img)
        assert emb.shape == (1, cfg_ts.embed_dim)
        assert np.isfinite(np.asarray(emb)).all()

        # second resolve loads the npz cache branch
        params2, cfg2 = resolve_clip(str(ts_pt))
        assert cfg2 == cfg_ts
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            params_ts, params2,
        )

    def test_registry_path_from_torchscript(self, tmp_path, monkeypatch):
        """The registry download path (resolve_clip('ViT-B/32'-style names))
        over a pre-placed TorchScript file: jit.load branch + conversion +
        npz round trip + cache hit, with no network."""
        from cgd_tpu.models.clip.configs import (
            CLIP_CONFIGS,
            CLIPConfig,
            TextConfig,
            VisionViTConfig,
        )
        from cgd_tpu.registry import CLIP_MODEL_URLS
        from cgd_tpu.weights import resolve_clip

        sd = _tiny_vit_sd()
        cfg = CLIPConfig(
            name="tiny/fmt", embed_dim=32,
            vision=VisionViTConfig(32, 8, 64, 2, 1),
            text=TextConfig(context_length=12, vocab_size=96, width=128,
                            heads=2, layers=3),
        )
        monkeypatch.setitem(CLIP_CONFIGS, "tiny/fmt", cfg)
        monkeypatch.setitem(CLIP_MODEL_URLS, "tiny/fmt", "https://unreachable.invalid/x.pt")
        clip_dir = tmp_path / "clip"
        clip_dir.mkdir()
        _torchscript_archive_with_sd(sd, clip_dir / "tiny-fmt.pt")

        params, out_cfg = resolve_clip("tiny/fmt", str(tmp_path))
        assert out_cfg == cfg
        assert os.path.exists(str(clip_dir / "tiny-fmt.pt.npz.cgd"))
        params2, _ = resolve_clip("tiny/fmt", str(tmp_path))  # npz cache hit
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            params, params2,
        )


class TestLpipsCheckpointFiles:
    """convert_lpips from on-disk torch files (the torchvision vgg16 .pth +
    the lpips v0.1 vgg.pth linear heads) — the last converter whose
    torch.load file branch had never seen a real file. Real VGG16 shapes so
    the result maps onto the init_vgg_lpips template exactly."""

    _CONV_IDS = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    _CHANS = [
        (3, 64), (64, 64), (64, 128), (128, 128), (128, 256), (256, 256),
        (256, 256), (256, 512), (512, 512), (512, 512), (512, 512),
        (512, 512), (512, 512),
    ]

    def _write_files(self, tmp_path):
        rng = np.random.RandomState(0)
        vgg_sd = {}
        for cid, (ci, co) in zip(self._CONV_IDS, self._CHANS):
            vgg_sd[f"features.{cid}.weight"] = torch.from_numpy(
                (rng.randn(co, ci, 3, 3) * 0.05).astype(np.float32))
            vgg_sd[f"features.{cid}.bias"] = torch.from_numpy(
                (rng.randn(co) * 0.05).astype(np.float32))
        lin_sd = {
            f"lin{i}.model.1.weight": torch.from_numpy(
                np.abs(rng.randn(1, c, 1, 1)).astype(np.float32))
            for i, c in enumerate([64, 128, 256, 512, 512])
        }
        vgg_pt = tmp_path / "vgg16-397923af.pth"
        lin_pt = tmp_path / "lpips_vgg_v0.1.pth"
        torch.save(vgg_sd, vgg_pt)
        torch.save(lin_sd, lin_pt)
        return vgg_pt, lin_pt, vgg_sd, lin_sd

    def test_convert_lpips_from_disk(self, tmp_path):
        from cgd_tpu.convert.torch_lpips import convert_lpips
        from cgd_tpu.models.vgg_lpips import init_vgg_lpips

        vgg_pt, lin_pt, vgg_sd, lin_sd = self._write_files(tmp_path)
        params = convert_lpips(str(vgg_pt), str(lin_pt))

        template = jax.eval_shape(lambda: init_vgg_lpips(jax.random.PRNGKey(0)))
        conv_leaves, conv_def = jax.tree_util.tree_flatten(params)
        tmpl_leaves, tmpl_def = jax.tree_util.tree_flatten(template)
        assert conv_def == tmpl_def
        for c, t in zip(conv_leaves, tmpl_leaves):
            assert tuple(np.shape(c)) == tuple(t.shape)
        # spot-check the OIHW->HWIO transpose and the lin-head slice
        np.testing.assert_array_equal(
            params["convs"][0]["kernel"],
            np.transpose(vgg_sd["features.0.weight"].numpy(), (2, 3, 1, 0)))
        np.testing.assert_array_equal(
            params["lins"][2]["kernel"][:, 0],
            lin_sd["lin2.model.1.weight"].numpy()[0, :, 0, 0])

    def test_resolve_lpips_full_disk_path(self, tmp_path, monkeypatch):
        """resolve_lpips end-to-end with downloads redirected to the
        pre-placed files: convert, npz cache write, second-resolve cache
        hit, and a finite distance from the converted weights."""
        import cgd_tpu.convert.torch_lpips as torch_lpips_mod
        from cgd_tpu.models.vgg_lpips import lpips_distance
        from cgd_tpu.weights import resolve_lpips

        vgg_pt, lin_pt, _, _ = self._write_files(tmp_path)
        monkeypatch.setattr(
            torch_lpips_mod, "download",
            lambda url, fname, d: str(vgg_pt if "vgg16" in fname else lin_pt))

        params = resolve_lpips(checkpoints_dir=str(tmp_path))
        assert os.path.exists(str(tmp_path / "lpips_vgg.npz.cgd"))
        params2 = resolve_lpips(checkpoints_dir=str(tmp_path))  # cache hit
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            params, params2,
        )
        x = jnp.full((1, 32, 32, 3), 0.3)
        y = jnp.full((1, 32, 32, 3), -0.2)
        d = lpips_distance(params, x, y)
        assert d.shape == (1,)
        assert np.isfinite(np.asarray(d)).all() and float(d[0]) > 0.0


class TestUNetCheckpointFile:
    def _tiny_flags(self):
        return {
            "attention_resolutions": "16",
            "image_size": 32,
            "num_channels": 32,
            "num_head_channels": 16,
            "num_res_blocks": 1,
            "learn_sigma": True,
            "class_cond": True,
            "use_scale_shift_norm": True,
            "diffusion_steps": 1000,
            "noise_schedule": "linear",
        }

    def test_convert_unet_checkpoint_from_disk(self, tmp_path):
        """convert_unet_checkpoint's torch.load file branch — the format the
        real ADM .pt files use (torch.save'd tensor state dict)."""
        from cgd_tpu.convert.torch_unet import convert_unet_checkpoint
        from cgd_tpu.models.unet import UNetConfig, init_unet

        cfg = UNetConfig.from_flags(self._tiny_flags())
        sd = adm_state_dict(cfg)
        pt = tmp_path / "tiny_adm.pt"
        torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, pt)

        params = convert_unet_checkpoint(str(pt), cfg)
        init_shapes = jax.eval_shape(lambda k: init_unet(k, cfg), jax.random.PRNGKey(0))
        conv_leaves, conv_def = jax.tree_util.tree_flatten(params)
        init_leaves, init_def = jax.tree_util.tree_flatten(init_shapes)
        assert conv_def == init_def
        for c, i in zip(conv_leaves, init_leaves):
            assert tuple(np.shape(c)) == tuple(i.shape)

    def test_resolve_unet_full_disk_path(self, tmp_path, monkeypatch):
        """resolve_unet end-to-end over a pre-placed .pt file: convert,
        npz cache write, second-resolve cache hit — no network."""
        from cgd_tpu.models.unet import UNetConfig
        from cgd_tpu.registry import DIFFUSION_LOOKUP
        from cgd_tpu.weights import resolve_unet

        flags = self._tiny_flags()
        cfg = UNetConfig.from_flags(flags)
        sd = adm_state_dict(cfg)
        pt = tmp_path / "tiny32_diffusion.pt"
        torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, pt)

        monkeypatch.setitem(
            DIFFUSION_LOOKUP["cond"], 32,
            {
                "url": "https://unreachable.invalid/tiny32_diffusion.pt",
                "filename": "tiny32_diffusion.pt",
                "model_flags": flags,
            },
        )
        params, out_cfg, merged = resolve_unet(32, True, str(tmp_path), "auto")
        assert out_cfg == cfg
        assert merged["noise_schedule"] == "linear"
        assert os.path.exists(str(pt) + ".npz.cgd")
        params2, _, _ = resolve_unet(32, True, str(tmp_path), "auto")
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            params, params2,
        )
