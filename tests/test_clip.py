"""CLIP towers + tokenizer tests (contract: ext clip-anytorch 2.6.0,
SURVEY.md §2b; reference call sites cgd/clip_util.py)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cgd_tpu.models.clip import CLIP_CONFIGS, encode_image, encode_text, init_clip
from cgd_tpu.models.clip.configs import (
    CLIPConfig,
    TextConfig,
    VisionResNetConfig,
    VisionViTConfig,
)
from cgd_tpu.models.clip.tokenizer import SimpleTokenizer, bytes_to_unicode


def tiny_vit_cfg():
    return CLIPConfig(
        name="tiny-vit",
        embed_dim=64,
        vision=VisionViTConfig(input_resolution=32, patch_size=8, width=64, layers=2, heads=2),
        text=TextConfig(context_length=16, vocab_size=512, width=64, heads=2, layers=2),
    )


def tiny_rn_cfg():
    return CLIPConfig(
        name="tiny-rn",
        embed_dim=64,
        vision=VisionResNetConfig(input_resolution=64, width=16, layers=(1, 1, 1, 1), heads=8),
        text=TextConfig(context_length=16, vocab_size=512, width=64, heads=2, layers=2),
    )


class TestRegistry:
    def test_all_eight_models_present(self):
        # reference supports 7 names + ViT-L/14@336px (cgd/clip_util.py:17-29)
        expected = {
            "RN50", "RN101", "RN50x4", "RN50x16",
            "ViT-B/32", "ViT-B/16", "ViT-L/14", "ViT-L/14@336px",
        }
        assert expected == set(CLIP_CONFIGS)

    def test_input_resolutions(self):
        # contract: cgd/clip_util.py:61 visual.input_resolution
        assert CLIP_CONFIGS["ViT-B/32"].input_resolution == 224
        assert CLIP_CONFIGS["RN50"].input_resolution == 224
        assert CLIP_CONFIGS["RN50x4"].input_resolution == 288
        assert CLIP_CONFIGS["RN50x16"].input_resolution == 384
        assert CLIP_CONFIGS["ViT-L/14@336px"].input_resolution == 336

    def test_embed_dims(self):
        assert CLIP_CONFIGS["RN50"].embed_dim == 1024
        assert CLIP_CONFIGS["ViT-B/32"].embed_dim == 512
        assert CLIP_CONFIGS["ViT-L/14"].embed_dim == 768
        assert CLIP_CONFIGS["RN50x4"].embed_dim == 640


class TestTowers:
    def test_vit_encode_image(self):
        cfg = tiny_vit_cfg()
        params = init_clip(jax.random.PRNGKey(0), cfg)
        imgs = jax.random.normal(jax.random.PRNGKey(1), (3, 32, 32, 3))
        out = jax.jit(lambda p, x: encode_image(p, cfg, x))(params, imgs)
        assert out.shape == (3, 64)
        assert out.dtype == jnp.float32
        assert bool(jnp.isfinite(out).all())

    def test_resnet_encode_image(self):
        cfg = tiny_rn_cfg()
        params = init_clip(jax.random.PRNGKey(0), cfg)
        imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
        out = encode_image(params, cfg, imgs)
        assert out.shape == (2, 64)
        assert bool(jnp.isfinite(out).all())

    def test_text_encode_uses_eot_position(self):
        cfg = tiny_vit_cfg()
        params = init_clip(jax.random.PRNGKey(0), cfg)
        # same prefix, EOT (max id) at different positions -> different embeds
        t1 = np.zeros((1, 16), np.int32)
        t1[0, :3] = [500, 7, 511]
        t2 = np.zeros((1, 16), np.int32)
        t2[0, :5] = [500, 7, 9, 9, 511]
        e1 = encode_text(params, cfg, jnp.asarray(t1))
        e2 = encode_text(params, cfg, jnp.asarray(t2))
        assert e1.shape == (1, 64)
        assert not np.allclose(np.asarray(e1), np.asarray(e2))

    def test_text_causality(self):
        # tokens AFTER the EOT position must not affect the embedding
        cfg = tiny_vit_cfg()
        params = init_clip(jax.random.PRNGKey(0), cfg)
        t1 = np.zeros((1, 16), np.int32)
        t1[0, :3] = [500, 7, 511]
        t2 = t1.copy()
        t2[0, 10] = 123  # after EOT; EOT still argmax (511)
        e1 = encode_text(params, cfg, jnp.asarray(t1))
        e2 = encode_text(params, cfg, jnp.asarray(t2))
        np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-5)

    def test_bf16_compute(self):
        cfg = tiny_vit_cfg()
        params = init_clip(jax.random.PRNGKey(0), cfg)
        imgs = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
        out = encode_image(params, cfg, imgs, compute_dtype=jnp.bfloat16)
        assert out.dtype == jnp.float32
        ref = encode_image(params, cfg, imgs)
        # bf16 tower should be within a few percent of fp32
        cos = float(
            (out * ref).sum()
            / (jnp.linalg.norm(out) * jnp.linalg.norm(ref))
        )
        assert cos > 0.98


@pytest.fixture(scope="module")
def tiny_bpe(tmp_path_factory):
    """Synthetic merge table exercising the real BPE machinery."""
    path = tmp_path_factory.mktemp("bpe") / "merges.txt"
    merges = [
        "t h", "th e</w>", "a n", "an d</w>", "i n", "in g</w>",
        "h e", "he l", "hel l", "hell o</w>",
    ]
    path.write_text("#version: tiny\n" + "\n".join(merges) + "\n")
    return str(path)


class TestTokenizer:
    def test_bytes_to_unicode_reversible(self):
        m = bytes_to_unicode()
        assert len(m) == 256
        assert len(set(m.values())) == 256

    def test_vocab_layout(self, tiny_bpe):
        tok = SimpleTokenizer(tiny_bpe, vocab_limit=256 + 2 + 10)
        # 256 bytes + 256 byte</w> + 10 merges + 2 specials
        assert tok.vocab_size == 512 + 10 + 2
        assert tok.sot_token == tok.vocab_size - 2
        assert tok.eot_token == tok.vocab_size - 1

    def test_merge_application(self, tiny_bpe):
        tok = SimpleTokenizer(tiny_bpe, vocab_limit=256 + 2 + 10)
        # "hello" fully merges to hello</w> via the chain
        ids = tok.encode("hello")
        assert len(ids) == 1
        assert tok.decoder[ids[0]] == "hello</w>"
        # "the" merges via t+h, th+e</w>
        ids = tok.encode("The")  # lowercased
        assert [tok.decoder[i] for i in ids] == ["the</w>"]

    def test_roundtrip(self, tiny_bpe):
        tok = SimpleTokenizer(tiny_bpe, vocab_limit=256 + 2 + 10)
        text = "the cat and the dog"
        assert tok.decode(tok.encode(text)).strip() == text

    def test_tokenize_batch_contract(self, tiny_bpe):
        tok = SimpleTokenizer(tiny_bpe, vocab_limit=256 + 2 + 10)
        arr = tok.tokenize(["hello", "the and"], context_length=8)
        assert arr.shape == (2, 8) and arr.dtype == np.int32
        assert arr[0, 0] == tok.sot_token
        assert arr[0, 2] == tok.eot_token  # hello is 1 token
        assert arr[0, 3] == 0  # zero padding

    def test_tokenize_overflow(self, tiny_bpe):
        tok = SimpleTokenizer(tiny_bpe, vocab_limit=256 + 2 + 10)
        with pytest.raises(RuntimeError):
            tok.tokenize("hello " * 20, context_length=8)
        arr = tok.tokenize("hello " * 20, context_length=8, truncate=True)
        assert arr[0, -1] == tok.eot_token

    def test_whitespace_and_case_cleanup(self, tiny_bpe):
        tok = SimpleTokenizer(tiny_bpe, vocab_limit=256 + 2 + 10)
        assert tok.encode("  HELLO\n\tthe ") == tok.encode("hello the")
