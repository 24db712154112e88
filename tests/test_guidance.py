"""Guidance layer tests: losses vs hand math, cutout geometry/distribution,
prompt grammar (reference contracts: cgd/losses.py, cgd/modules.py,
cgd/script_util.py:60-67)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cgd_tpu.guidance import (
    CutoutSpec,
    make_cutouts,
    parse_prompt,
    range_loss,
    sample_cutout_coords,
    saturation_loss,
    spherical_dist_loss,
    tv_loss,
)
from cgd_tpu.guidance.cutouts import augment_cutouts
from cgd_tpu.guidance.prompts import split_prompts


class TestLosses:
    def test_range_loss(self):
        x = jnp.array([[[[0.5, 1.5, -2.0]]]])  # overshoots: 0, .5, 1
        out = range_loss(x)
        np.testing.assert_allclose(np.asarray(out), [(0 + 0.25 + 1.0) / 3], rtol=1e-6)

    def test_range_loss_zero_inside(self):
        x = jnp.zeros((2, 4, 4, 3))
        np.testing.assert_allclose(np.asarray(range_loss(x)), [0.0, 0.0])

    def test_spherical_dist_identical_is_zero(self):
        x = jnp.array([[1.0, 2.0, 3.0]])
        np.testing.assert_allclose(np.asarray(spherical_dist_loss(x, 2 * x)), [0.0], atol=1e-6)

    def test_spherical_dist_opposite(self):
        x = jnp.array([[1.0, 0.0]])
        y = jnp.array([[-1.0, 0.0]])
        # chord=2 -> arcsin(1)=pi/2 -> 2*(pi/2)^2
        np.testing.assert_allclose(
            np.asarray(spherical_dist_loss(x, y)), [2 * (np.pi / 2) ** 2], rtol=1e-5
        )

    def test_spherical_dist_orthogonal(self):
        x = jnp.array([[1.0, 0.0]])
        y = jnp.array([[0.0, 1.0]])
        # chord=sqrt(2) -> arcsin(sqrt(2)/2)=pi/4 -> 2*(pi/4)^2
        np.testing.assert_allclose(
            np.asarray(spherical_dist_loss(x, y)), [2 * (np.pi / 4) ** 2], rtol=1e-5
        )

    def test_tv_loss_constant_zero(self):
        np.testing.assert_allclose(np.asarray(tv_loss(jnp.ones((1, 8, 8, 3)))), [0.0])

    def test_tv_loss_step(self):
        # single vertical edge in an NxN image; replicate pad => (N-?) known value
        x = jnp.zeros((1, 2, 2, 1)).at[:, :, 1, :].set(1.0)
        # pixels: [[0,1],[0,1]]; padded 3x3 replicate: rows [[0,1,1],[0,1,1],[0,1,1]]
        # x_diff over [:-1,1:] vs [:-1,:-1]: [[1,0],[1,0]]; y_diff: zeros
        # mean over 2x2x1 = (1+0+1+0)/4
        np.testing.assert_allclose(np.asarray(tv_loss(x)), [0.5], rtol=1e-6)

    def test_saturation(self):
        x = jnp.array([[[[2.0, -3.0, 0.0]]]])
        np.testing.assert_allclose(np.asarray(saturation_loss(x)), (1 + 2 + 0) / 3, rtol=1e-6)

    def test_losses_differentiable(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 3)) * 2
        for fn in (lambda a: range_loss(a).sum(), lambda a: tv_loss(a).sum(), saturation_loss):
            g = jax.grad(fn)(x)
            assert bool(jnp.isfinite(g).all())


class TestCutouts:
    def test_full_image_cutout_is_box_downsample(self):
        img = jnp.arange(64.0).reshape(1, 8, 8, 1) / 64.0
        spec = CutoutSpec(
            offset_x=jnp.array([0.0]), offset_y=jnp.array([0.0]), size=jnp.array([8.0])
        )
        out = make_cutouts(img, spec, cut_size=4)
        assert out.shape == (1, 4, 4, 1)
        # box filter 2x2 average
        expected = np.asarray(img).reshape(8, 8)[::2, ::2]
        expected = (expected + np.asarray(img).reshape(8, 8)[1::2, ::2]
                    + np.asarray(img).reshape(8, 8)[::2, 1::2]
                    + np.asarray(img).reshape(8, 8)[1::2, 1::2]) / 4
        np.testing.assert_allclose(np.asarray(out)[0, :, :, 0], expected, rtol=1e-5)

    def test_identity_cutout(self):
        img = jax.random.uniform(jax.random.PRNGKey(0), (1, 6, 6, 3))
        spec = CutoutSpec(jnp.array([2.0]), jnp.array([1.0]), jnp.array([4.0]))
        out = make_cutouts(img, spec, cut_size=4)
        np.testing.assert_allclose(
            np.asarray(out)[0], np.asarray(img)[0, 1:5, 2:6, :], rtol=1e-5, atol=1e-6
        )

    def test_batch_order_cutout_major(self):
        # reference concat order: index = k*B + b (cgd/modules.py:59-66)
        img = jnp.stack([jnp.zeros((4, 4, 1)), jnp.ones((4, 4, 1))])
        spec = CutoutSpec(jnp.zeros(3), jnp.zeros(3), jnp.full(3, 4.0))
        out = make_cutouts(img, spec, cut_size=2)
        assert out.shape == (6, 2, 2, 1)
        np.testing.assert_allclose(np.asarray(out[0]), 0.0)
        np.testing.assert_allclose(np.asarray(out[1]), 1.0)
        np.testing.assert_allclose(np.asarray(out[4]), 0.0)

    def test_coord_distribution(self):
        spec = sample_cutout_coords(jax.random.PRNGKey(0), 2000, 256, 256, 224, cut_pow=1.0)
        sizes = np.asarray(spec.size)
        assert sizes.min() >= 224 and sizes.max() <= 256
        ox = np.asarray(spec.offset_x)
        assert ox.min() >= 0
        assert (ox + sizes).max() <= 256
        # uniform size in [min,max] with pow=1
        assert abs(sizes.mean() - 240) < 3

    def test_cut_pow_skews_small(self):
        big = sample_cutout_coords(jax.random.PRNGKey(1), 2000, 256, 256, 64, cut_pow=0.5)
        small = sample_cutout_coords(jax.random.PRNGKey(1), 2000, 256, 256, 64, cut_pow=2.0)
        # higher pow -> rand^pow smaller -> smaller cutouts
        assert np.asarray(small.size).mean() < np.asarray(big.size).mean()

    def test_nonsquare_sides(self):
        spec = sample_cutout_coords(jax.random.PRNGKey(2), 100, 288, 256, 224)
        sizes = np.asarray(spec.size)
        assert sizes.max() <= 256  # min(side_x, side_y)
        assert (np.asarray(spec.offset_x) + sizes).max() <= 288
        assert (np.asarray(spec.offset_y) + sizes).max() <= 256
        img = jnp.ones((1, 256, 288, 3))  # H=side_y, W=side_x
        out = make_cutouts(img, spec, cut_size=32)
        assert out.shape == (100, 32, 32, 3)
        np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-4)

    def test_gradients_flow_to_image(self):
        img = jax.random.uniform(jax.random.PRNGKey(3), (1, 16, 16, 3))
        spec = sample_cutout_coords(jax.random.PRNGKey(4), 4, 16, 16, 8)

        def f(im):
            return make_cutouts(im, spec, 8).sum()

        g = jax.grad(f)(img)
        assert g.shape == img.shape
        assert float(jnp.abs(g).sum()) > 0

    def test_augment_shapes_and_determinism(self):
        cuts = jax.random.uniform(jax.random.PRNGKey(5), (4, 16, 16, 3))
        a1 = augment_cutouts(jax.random.PRNGKey(6), cuts)
        a2 = augment_cutouts(jax.random.PRNGKey(6), cuts)
        a3 = augment_cutouts(jax.random.PRNGKey(7), cuts)
        assert a1.shape == cuts.shape
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2))
        assert not np.allclose(np.asarray(a1), np.asarray(a3))


class TestPrompts:
    def test_plain(self):
        assert parse_prompt("a cat") == ("a cat", 1.0)

    def test_weighted(self):
        assert parse_prompt("a cat:0.5") == ("a cat", 0.5)

    def test_negative(self):
        assert parse_prompt("blurry:-0.5") == ("blurry", -0.5)

    def test_url_with_weight(self):
        assert parse_prompt("https://x.com/img.png:0.7") == ("https://x.com/img.png", 0.7)

    def test_url_without_weight(self):
        # reference behavior: rsplit(':',2) on URLs eats the scheme colon pair
        txt, w = parse_prompt("https://x.com/img.png")
        assert w == 1.0 and txt == "https://x.com/img.png"

    def test_split(self):
        assert split_prompts("a|b:0.5|c") == ["a", "b:0.5", "c"]
        assert split_prompts("") == []


class TestMultiPromptMultiBatch:
    """The reference's dists broadcasting silently breaks for batch_size > 1
    with #prompts != batch_size (SURVEY §3.1 shape-fragility note,
    cgd/cgd.py:196-199). The rebuild computes [cutn, B, P] distances and
    reduces explicitly, so P=3 prompts x B=2 batch must just work."""

    def test_loss_and_grad_shapes(self):
        from cgd_tpu.diffusion import make_diffusion
        from cgd_tpu.diffusion.gaussian import PMeanVariance
        from cgd_tpu.diffusion.sampler import StepMeta
        from cgd_tpu.guidance.pipeline import GuidanceSettings, make_guidance_builder
        from cgd_tpu.models.clip import init_clip
        from cgd_tpu.models.clip.configs import CLIPConfig, TextConfig, VisionViTConfig

        cfg = CLIPConfig(
            name="t",
            embed_dim=32,
            vision=VisionViTConfig(input_resolution=32, patch_size=8, width=32, layers=1, heads=2),
            text=TextConfig(context_length=16, vocab_size=64, width=32, heads=2, layers=1),
        )
        clip_params = init_clip(jax.random.PRNGKey(0), cfg)
        d = make_diffusion(100, "linear", "10")

        P, B = 3, 2
        rs = np.random.RandomState(1)
        targets = rs.randn(P, cfg.embed_dim).astype(np.float32)
        weights = np.asarray([0.7, 0.2, 0.1], np.float32)
        builder = make_guidance_builder(
            cfg, targets, weights, d,
            GuidanceSettings(clip_compute_dtype="float32"),
        )
        fns = builder(StepMeta(t=5, guided=True, cutn=4))

        x = jnp.asarray(rs.randn(B, 48, 48, 3).astype(np.float32))
        px = jnp.tanh(x)
        out = PMeanVariance(px, jnp.ones_like(x), jnp.zeros_like(x), px, x - px)

        def scalar_loss(x):
            loss, _log = fns.loss_fn(
                {"clip": clip_params}, jax.random.PRNGKey(2), x, out, jnp.int32(5)
            )
            return loss

        loss, grad = jax.value_and_grad(scalar_loss)(x)
        assert np.isfinite(float(loss))
        assert grad.shape == x.shape
        assert np.isfinite(np.asarray(grad)).all()
        # every batch entry receives gradient (no silent broadcast collapse)
        gnorm = np.asarray(jnp.sqrt((grad.astype(jnp.float32) ** 2).sum(axis=(1, 2, 3))))
        assert (gnorm > 0).all()
