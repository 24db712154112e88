"""Custom local CLIP checkpoint path (-clip model.pt) with config inference
from state-dict shapes (reference contract: cgd/script_util.py:50-53)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp


def _tiny_vit_sd():
    rng = np.random.RandomState(0)
    sd = {}

    def lin(name, cin, cout):
        sd[f"{name}.weight"] = rng.randn(cout, cin).astype(np.float32) * 0.05
        sd[f"{name}.bias"] = rng.randn(cout).astype(np.float32) * 0.05

    def ln(name, c):
        sd[f"{name}.weight"] = np.ones(c, np.float32)
        sd[f"{name}.bias"] = np.zeros(c, np.float32)

    def blocks(prefix, n, w):
        for i in range(n):
            p = f"{prefix}.{i}"
            ln(f"{p}.ln_1", w)
            sd[f"{p}.attn.in_proj_weight"] = rng.randn(3 * w, w).astype(np.float32) * 0.05
            sd[f"{p}.attn.in_proj_bias"] = np.zeros(3 * w, np.float32)
            lin(f"{p}.attn.out_proj", w, w)
            ln(f"{p}.ln_2", w)
            lin(f"{p}.mlp.c_fc", w, 4 * w)
            lin(f"{p}.mlp.c_proj", 4 * w, w)

    w = 64
    sd["visual.conv1.weight"] = rng.randn(w, 3, 8, 8).astype(np.float32) * 0.05
    sd["visual.class_embedding"] = rng.randn(w).astype(np.float32)
    sd["visual.positional_embedding"] = rng.randn(17, w).astype(np.float32)  # 4x4 grid
    ln("visual.ln_pre", w)
    blocks("visual.transformer.resblocks", 2, w)
    ln("visual.ln_post", w)
    sd["visual.proj"] = rng.randn(w, 32).astype(np.float32)
    sd["token_embedding.weight"] = rng.randn(96, 128).astype(np.float32)
    sd["positional_embedding"] = rng.randn(12, 128).astype(np.float32)
    blocks("transformer.resblocks", 3, 128)
    ln("ln_final", 128)
    sd["text_projection"] = rng.randn(128, 32).astype(np.float32)
    return sd


class TestCustomClip:
    def test_infer_config(self):
        from cgd_tpu.convert.clip_config_infer import infer_clip_config

        cfg = infer_clip_config(_tiny_vit_sd(), "tiny.pt")
        assert cfg.embed_dim == 32
        assert cfg.is_vit
        assert cfg.vision.patch_size == 8
        assert cfg.vision.input_resolution == 32  # 4x4 grid * 8
        assert cfg.vision.layers == 2 and cfg.vision.width == 64
        assert cfg.text.layers == 3 and cfg.text.width == 128
        assert cfg.text.context_length == 12 and cfg.text.vocab_size == 96

    def test_resolve_and_encode(self, tmp_path):
        from cgd_tpu.weights import resolve_clip

        sd = {k: torch.from_numpy(v) for k, v in _tiny_vit_sd().items()}
        pt = tmp_path / "tiny_clip.pt"
        torch.save(sd, pt)

        from cgd_tpu.models.clip import encode_image, encode_text

        params, cfg = resolve_clip(str(pt))
        img = jnp.ones((1, 32, 32, 3)) * 0.1
        tok = jnp.asarray(np.array([[94, 5, 95] + [0] * 9], np.int32))
        assert encode_image(params, cfg, img).shape == (1, 32)
        assert encode_text(params, cfg, tok).shape == (1, 32)
        # converted cache hit on second resolve
        params2, cfg2 = resolve_clip(str(pt))
        assert cfg2 == cfg
