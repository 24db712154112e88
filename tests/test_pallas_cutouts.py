"""Pallas fused cutout kernel vs the einsum reference path (interpret mode
on CPU; the kernel itself targets TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cgd_tpu.guidance.cutouts import CutoutSpec, _box_weights, make_cutouts
from cgd_tpu.kernels.cutouts_pallas import fused_cutouts_normalize
from cgd_tpu.models.clip.configs import CLIP_MEAN, CLIP_STD


def _setup(k=3, b=2, h=16, w=16, cut=8, seed=0):
    rng = np.random.RandomState(seed)
    img = rng.rand(b, h, w, 3).astype(np.float32)
    sizes = rng.uniform(cut, min(h, w), size=k).astype(np.float32)
    ox = rng.uniform(0, w - sizes, size=k).astype(np.float32)
    oy = rng.uniform(0, h - sizes, size=k).astype(np.float32)
    spec = CutoutSpec(jnp.asarray(ox), jnp.asarray(oy), jnp.asarray(sizes))
    wy = _box_weights(spec.offset_y, spec.size, h, cut)
    wx = _box_weights(spec.offset_x, spec.size, w, cut)
    mean = np.asarray(CLIP_MEAN, np.float32)[None]
    std = np.asarray(CLIP_STD, np.float32)[None]
    return img, spec, wy, wx, mean, std


class TestFusedCutouts:
    def test_matches_einsum_path(self):
        img, spec, wy, wx, mean, std = _setup()
        out = fused_cutouts_normalize(jnp.asarray(img), wy, wx, mean, std, True)
        ref = make_cutouts(jnp.asarray(img), spec, 8)
        ref = (ref - mean[0]) / std[0]
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def test_gradient_matches(self):
        img, spec, wy, wx, mean, std = _setup(k=2, b=1)

        def loss_pallas(im):
            return jnp.sum(jnp.sin(fused_cutouts_normalize(im, wy, wx, mean, std, True)))

        def loss_ref(im):
            cuts = make_cutouts(im, spec, 8)
            return jnp.sum(jnp.sin((cuts - mean[0]) / std[0]))

        g1 = jax.grad(loss_pallas)(jnp.asarray(img))
        g2 = jax.grad(loss_ref)(jnp.asarray(img))
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)
