"""Pallas direct 3x3 conv vs XLA conv (interpret mode on CPU; compiled +
A/B-benchmarked on real TPU — see PERF.md).

The kernel replaces XLA's batch-1 space-to-batch conv rewrite with halo'd
Element-window row streaming + nine MXU matmuls (kernels/conv_pallas.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from cgd_tpu.kernels.conv_pallas import (
    _conv3x3_pallas,
    conv3x3,
    conv3x3_available,
)


def _xla(x, w, b):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b


def _rand(shape, seed, scale=1.0):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape).astype(np.float32) * scale)


SHAPES = [
    (1, 32, 32, 128, 128),   # square mid level
    (2, 16, 64, 256, 256),   # batch > 1, non-square
    (1, 8, 32, 384, 768),    # full-cout tile (768 = no 128-multiple divisor fit)
    (1, 16, 32, 512, 256),   # cin > cout (decoder skip-concat shape class)
    (1, 16, 32, 3, 128),     # RGB input conv (cin zero-padded in-kernel)
    (1, 16, 32, 128, 6),     # eps+sigma output conv (cout padded + sliced)
    (1, 16, 32, 768, 576),   # 64px-model shape: no exact tile, cout padded to 768
]


class TestConv3x3Pallas:
    @pytest.mark.parametrize("shape", SHAPES)
    def test_forward_matches_xla(self, shape):
        b, h, w, ci, co = shape
        x = _rand((b, h, w, ci), 0)
        wg = _rand((3, 3, ci, co), 1, 0.05)
        bias = _rand((co,), 2)
        with pltpu.force_tpu_interpret_mode():
            ours = _conv3x3_pallas(x, wg, bias)
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(_xla(x, wg, bias)), atol=2e-4, rtol=1e-4
        )

    def test_input_gradient_matches_xla(self):
        # the sampling path differentiates w.r.t. the image only
        b, h, w, ci, co = 1, 16, 32, 128, 128
        x = _rand((b, h, w, ci), 3)
        wg = _rand((3, 3, ci, co), 4, 0.05)
        bias = _rand((co,), 5)

        def loss_pal(x):
            return jnp.sum(jnp.sin(conv3x3(x, wg, bias)))

        def loss_xla(x):
            return jnp.sum(jnp.sin(_xla(x, wg, bias)))

        with pltpu.force_tpu_interpret_mode():
            gp = jax.grad(loss_pal)(x)
        gx = jax.grad(loss_xla)(x)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), atol=5e-4, rtol=1e-3)

    def test_weight_and_bias_gradients_match_xla(self):
        b, h, w, ci, co = 1, 8, 32, 128, 128
        x = _rand((b, h, w, ci), 6)
        wg = _rand((3, 3, ci, co), 7, 0.05)
        bias = _rand((co,), 8)

        def loss(fn, w_, b_):
            return jnp.sum(jnp.cos(fn(x, w_, b_)))

        with pltpu.force_tpu_interpret_mode():
            gw_p, gb_p = jax.grad(lambda w_, b_: loss(conv3x3, w_, b_), (0, 1))(wg, bias)
        gw_x, gb_x = jax.grad(lambda w_, b_: loss(_xla, w_, b_), (0, 1))(wg, bias)
        np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_x), atol=5e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(gb_p), np.asarray(gb_x), atol=5e-4, rtol=1e-3)

    def test_availability_gate(self):
        ok = ((1, 1), (1, 1))
        assert conv3x3_available((1, 64, 64, 256), (3, 3, 256, 256), 1, ok)
        # skinny channels route too (zero-padded to a lane tile inside)
        assert conv3x3_available((1, 64, 64, 3), (3, 3, 3, 256), 1, ok)
        assert conv3x3_available((1, 64, 64, 256), (3, 3, 256, 6), 1, ok)
        assert not conv3x3_available((1, 64, 64, 256), (3, 3, 256, 256), 2, ok)  # stride
        assert not conv3x3_available((1, 64, 64, 256), (1, 1, 256, 256), 1, ok)  # 1x1
        assert not conv3x3_available((1, 64, 16, 256), (3, 3, 256, 256), 1, ok)  # W<32
        assert not conv3x3_available(
            (1, 64, 64, 256), (3, 3, 256, 256), 1, ((0, 0), (0, 0))  # valid pad
        )

    def test_env_gate_routes_conv2d(self, monkeypatch):
        from cgd_tpu.ops.nn import conv2d

        x = _rand((1, 8, 32, 128), 9)
        params = {"kernel": _rand((3, 3, 128, 128), 10, 0.05), "bias": _rand((128,), 11)}
        base = conv2d(params, x)
        monkeypatch.setenv("CGD_TPU_PALLAS_CONV", "1")
        with pltpu.force_tpu_interpret_mode():
            gated = conv2d(params, x)
        np.testing.assert_allclose(np.asarray(gated), np.asarray(base), atol=2e-4, rtol=1e-4)
