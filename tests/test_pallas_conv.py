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
        assert conv3x3_available((1, 64, 16, 256), (3, 3, 256, 256), 1, ok)  # W>=8 (r2c)
        assert not conv3x3_available((1, 64, 4, 256), (3, 3, 256, 256), 1, ok)  # W<8
        assert not conv3x3_available(
            (1, 64, 64, 256), (3, 3, 256, 256), 1, ((0, 0), (0, 0))  # valid pad
        )

    def test_fused_gn_silu_conv_matches_unfused(self, monkeypatch):
        """fused_gn_silu_conv (Pallas prologue+epilogue fusion) ==
        GN -> scale-shift -> SiLU -> conv -> +skip unfused chain."""
        from cgd_tpu.ops import nn as cnn

        b, h, w, ci, co = 2, 16, 32, 128, 128
        x = _rand((b, h, w, ci), 20)
        norm = {"scale": 1.0 + 0.1 * _rand((ci,), 21), "bias": 0.1 * _rand((ci,), 22)}
        conv = {"kernel": _rand((3, 3, ci, co), 23, 0.05), "bias": _rand((co,), 24)}
        scale = 0.1 * _rand((b, 1, 1, co), 25)  # co == ci here
        shift = 0.1 * _rand((b, 1, 1, co), 26)
        skip = _rand((b, h, w, co), 27)

        ref = cnn.group_norm(norm, x) * (1.0 + scale) + shift
        ref = cnn.conv2d(conv, cnn.silu(ref)) + skip

        monkeypatch.setenv("CGD_TPU_PALLAS_CONV", "1")
        with pltpu.force_tpu_interpret_mode():
            fused = cnn.fused_gn_silu_conv(
                norm, conv, x, scale_shift=(scale, shift), skip=skip
            )
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=2e-4, rtol=1e-4)

    def test_fused_gn_silu_conv_gradient_through_stats(self, monkeypatch):
        """d(loss)/dx must flow through the GN statistics folded into A/B."""
        from cgd_tpu.ops import nn as cnn

        b, h, w, ci, co = 1, 8, 32, 128, 128
        x = _rand((b, h, w, ci), 30)
        norm = {"scale": 1.0 + 0.1 * _rand((ci,), 31), "bias": 0.1 * _rand((ci,), 32)}
        conv = {"kernel": _rand((3, 3, ci, co), 33, 0.05), "bias": _rand((co,), 34)}

        def loss_ref(x, norm, conv):
            hh = cnn.silu(cnn.group_norm(norm, x))
            return jnp.sum(jnp.sin(cnn.conv2d(conv, hh)))

        def loss_fused(x, norm, conv):
            return jnp.sum(jnp.sin(cnn.fused_gn_silu_conv(norm, conv, x)))

        g_ref = jax.grad(loss_ref, (0, 1, 2))(x, norm, conv)
        monkeypatch.setenv("CGD_TPU_PALLAS_CONV", "1")
        with pltpu.force_tpu_interpret_mode():
            g_fused = jax.grad(loss_fused, (0, 1, 2))(x, norm, conv)
        for a, bb in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fused)):
            np.testing.assert_allclose(np.asarray(bb), np.asarray(a), atol=5e-4, rtol=1e-3)

    def test_fused_unet_matches_unfused(self, monkeypatch):
        """Tiny UNet, all zero-init convs perturbed (zero out_convs would
        mask prologue bugs in the out-conv fused path): Pallas-fused forward
        + image gradient == unfused XLA chain."""
        from cgd_tpu.models.unet import UNetConfig, apply_unet, init_unet

        # image_size 32: the top level's W=32 convs route through the fused
        # Pallas path (the 16x16 level falls back — both paths exercised)
        cfg = UNetConfig(
            image_size=32, model_channels=64, num_res_blocks=1,
            attention_ds=(2,), channel_mult=(1, 2), num_heads=2,
        )
        params = init_unet(jax.random.PRNGKey(0), cfg)
        leaves, treedef = jax.tree.flatten(params)
        rs = np.random.RandomState(7)
        params = jax.tree.unflatten(
            treedef,
            [l + jnp.asarray(0.05 * rs.randn(*l.shape).astype(np.float32)) for l in leaves],
        )
        x = _rand((1, 32, 32, 3), 40)
        ts = jnp.full((1,), 10.0, jnp.float32)

        def loss(x):
            return jnp.sum(jnp.sin(apply_unet(params, cfg, x, ts, None)))

        ref_o = apply_unet(params, cfg, x, ts, None)
        ref_g = jax.grad(loss)(x)
        monkeypatch.setenv("CGD_TPU_PALLAS_CONV", "1")
        with pltpu.force_tpu_interpret_mode():
            fus_o = apply_unet(params, cfg, x, ts, None)
            fus_g = jax.grad(loss)(x)
        np.testing.assert_allclose(np.asarray(fus_o), np.asarray(ref_o), atol=1e-3, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(fus_g), np.asarray(ref_g), atol=1e-3, rtol=1e-3)

    def test_cin_split_chain(self):
        """ci-2048 decoder-bottleneck shapes: the [3,3,Cin,128] weight block
        exceeds the VMEM budget, so the kernel splits the reduction in half
        and chains the partial sum through the skip epilogue."""
        from cgd_tpu.kernels.conv_pallas import _conv3x3_pallas, conv3x3_available

        assert conv3x3_available((1, 16, 16, 2048), (3, 3, 2048, 1024), 1, ((1, 1), (1, 1)))
        b, h, w, ci, co = 1, 16, 16, 2048, 1024
        x = _rand((b, h, w, ci), 60)
        wk = _rand((3, 3, ci, co), 61, 0.02)
        bias = _rand((co,), 62)
        A = 1.0 + 0.1 * _rand((b, ci), 63)
        B = 0.1 * _rand((b, ci), 64)
        act = jax.nn.silu(x * A[:, None, None, :] + B[:, None, None, :])
        ref = jax.lax.conv_general_dilated(
            act, wk, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias
        with pltpu.force_tpu_interpret_mode():
            out = _conv3x3_pallas(x, wk, bias, A=A, B=B)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-4)

    def test_down_resample_not_fused(self):
        """Negative result pinned: Mosaic cannot lower any stride-2 column
        selection, so the avg-pool 'down' prologue must NOT route to the
        kernel (it would fail at real-device compile time)."""
        from cgd_tpu.kernels.conv_pallas import resample_fused_available

        assert not resample_fused_available((1, 32, 32, 128), (3, 3, 128, 128), "down")
        assert resample_fused_available((1, 16, 16, 128), (3, 3, 128, 128), "up")

    @pytest.mark.parametrize("mode", ["up"])
    def test_fused_resample_conv(self, mode, monkeypatch):
        """conv3x3_gn_silu_up == GN -> SiLU -> nearest-2x -> conv unfused
        chain (fwd + full gradient). 'down' deliberately not fused (see
        test_down_resample_not_fused)."""
        from cgd_tpu.ops import nn as cnn

        b, h, w, ci, co = 1, 16, 32, 128, 128
        x = _rand((b, h, w, ci), 80)
        norm = {"scale": 1.0 + 0.1 * _rand((ci,), 81), "bias": 0.1 * _rand((ci,), 82)}
        conv = {"kernel": _rand((3, 3, ci, co), 83, 0.05), "bias": _rand((co,), 84)}

        def ref_fn(x):
            hh = cnn.silu(cnn.group_norm(norm, x))
            hh = cnn.avg_pool_2x(hh) if mode == "down" else cnn.upsample_nearest_2x(hh)
            return cnn.conv2d(conv, hh)

        def fused_fn(x):
            return cnn.fused_gn_silu_conv(norm, conv, x, resample=mode)

        ref = ref_fn(x)
        g_ref = jax.grad(lambda x: jnp.sum(jnp.sin(ref_fn(x))))(x)
        monkeypatch.setenv("CGD_TPU_PALLAS_CONV", "1")
        with pltpu.force_tpu_interpret_mode():
            out = fused_fn(x)
            g_out = jax.grad(lambda x: jnp.sum(jnp.sin(fused_fn(x))))(x)
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(g_out), np.asarray(g_ref), atol=5e-4, rtol=1e-3)

    def test_bwd_wtiled_dx_kernel(self, monkeypatch):
        """The 256^2 ci256->co512 backward class (full-W dx streams blow
        VMEM) routes through the W-tiled Element-window dx kernel since
        round 3 — gradient must match the XLA reference."""
        from cgd_tpu.kernels import conv_pallas as cp
        from cgd_tpu.ops import nn as cnn

        b, h, w, ci, co = 1, 8, 256, 256, 512
        # the W-tiled plan must be the one exercised (opt-in since the
        # 512px compile-time A/B made the composition fallback the default)
        monkeypatch.setenv("CGD_TPU_DX_WTILED", "1")
        co_p, ci_p = co, ci
        tiles = cp._pick_dx_tiles(h, w, co_p, ci_p)
        assert tiles[0] is not None and tiles[2] is not None, tiles
        assert cp._dx_kernel_available((b, h, w, co), (3, 3, co, ci))
        x = _rand((b, h, w, ci), 70)
        norm = {"scale": 1.0 + 0.1 * _rand((ci,), 71), "bias": 0.1 * _rand((ci,), 72)}
        conv = {"kernel": _rand((3, 3, ci, co), 73, 0.03), "bias": _rand((co,), 74)}

        def loss_ref(x):
            hh = cnn.silu(cnn.group_norm(norm, x))
            return jnp.sum(jnp.sin(cnn.conv2d(conv, hh)))

        def loss_fused(x):
            return jnp.sum(jnp.sin(cnn.fused_gn_silu_conv(norm, conv, x)))

        g_ref = jax.grad(loss_ref)(x)
        monkeypatch.setenv("CGD_TPU_PALLAS_CONV", "1")
        with pltpu.force_tpu_interpret_mode():
            g_fused = jax.grad(loss_fused)(x)
        np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref), atol=5e-4, rtol=1e-3)

    def test_bwd_falls_back_when_dx_kernel_ineligible(self, monkeypatch):
        """Shapes with no dx-kernel VMEM plan at all must take the exact
        composition backward — gradient still matches the XLA reference."""
        from cgd_tpu.kernels import conv_pallas as cp
        from cgd_tpu.ops import nn as cnn

        monkeypatch.setattr(cp, "_dx_kernel_available", lambda *a, **k: False)
        b, h, w, ci, co = 1, 8, 64, 256, 256
        x = _rand((b, h, w, ci), 80)
        norm = {"scale": 1.0 + 0.1 * _rand((ci,), 81), "bias": 0.1 * _rand((ci,), 82)}
        conv = {"kernel": _rand((3, 3, ci, co), 83, 0.03), "bias": _rand((co,), 84)}

        def loss_ref(x):
            hh = cnn.silu(cnn.group_norm(norm, x))
            return jnp.sum(jnp.sin(cnn.conv2d(conv, hh)))

        def loss_fused(x):
            return jnp.sum(jnp.sin(cnn.fused_gn_silu_conv(norm, conv, x)))

        g_ref = jax.grad(loss_ref)(x)
        monkeypatch.setenv("CGD_TPU_PALLAS_CONV", "1")
        with pltpu.force_tpu_interpret_mode():
            g_fused = jax.grad(loss_fused)(x)
        np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref), atol=5e-4, rtol=1e-3)

    def test_explicit_halo_rows(self):
        """SPMD spatial-sharding support: explicit etop/ebot boundary rows
        replace the zero pad — the kernel on rows [1, H+1) of a taller image
        with its true neighbor rows must equal the conv evaluated on the
        full image (interior-shard semantics of kernels/conv_spmd.py)."""
        from cgd_tpu.kernels.conv_pallas import _conv3x3_pallas

        b, hh, w, ci, co = 1, 34, 32, 128, 128
        x_full = _rand((b, hh, w, ci), 50)
        wk = _rand((3, 3, ci, co), 51, 0.05)
        bias = _rand((co,), 52)
        ref = jax.lax.conv_general_dilated(
            x_full, wk, (1, 1), ((0, 0), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias

        with pltpu.force_tpu_interpret_mode():
            out = _conv3x3_pallas(
                x_full[:, 1:-1], wk, bias,
                etop=x_full[:, :1], ebot=x_full[:, -1:],
            )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-4)

        # prologue variant: halo rows arrive POST-activation (conv_spmd
        # activates the neighbor's boundary row before the ppermute)
        A = 1.0 + 0.1 * _rand((b, ci), 53)
        B = 0.1 * _rand((b, ci), 54)
        act = jax.nn.silu(x_full * A[:, None, None, :] + B[:, None, None, :])
        ref2 = jax.lax.conv_general_dilated(
            act, wk, (1, 1), ((0, 0), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias
        with pltpu.force_tpu_interpret_mode():
            out2 = _conv3x3_pallas(
                x_full[:, 1:-1], wk, bias, A=A, B=B,
                etop=act[:, :1], ebot=act[:, -1:],
            )
        np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2), atol=2e-4, rtol=1e-4)

    def test_env_gate_routes_conv2d(self, monkeypatch):
        from cgd_tpu.ops.nn import conv2d

        x = _rand((1, 8, 32, 128), 9)
        params = {"kernel": _rand((3, 3, 128, 128), 10, 0.05), "bias": _rand((128,), 11)}
        base = conv2d(params, x)
        monkeypatch.setenv("CGD_TPU_PALLAS_CONV", "1")
        with pltpu.force_tpu_interpret_mode():
            gated = conv2d(params, x)
        np.testing.assert_allclose(np.asarray(gated), np.asarray(base), atol=2e-4, rtol=1e-4)


class TestConvRouting:
    def test_override_scopes_and_restores(self, monkeypatch):
        """ops.nn.conv_routing pins the routing policy for its dynamic
        extent only — replaces the round-2 env mutation that leaked the
        mesh run's decision into later runs in the process (ADVICE r2)."""
        from cgd_tpu.ops import nn

        monkeypatch.delenv("CGD_TPU_PALLAS_CONV", raising=False)
        monkeypatch.delenv("CGD_TPU_PALLAS_CONV_SPMD", raising=False)
        args = ((1, 32, 32, 128), (3, 3, 128, 128), 1, ((1, 1), (1, 1)))
        assert nn._pallas_conv_mode(*args) == ""  # CPU backend default: XLA
        with nn.conv_routing("plain"):
            assert nn._pallas_conv_mode(*args) == "plain"
            with nn.conv_routing(""):
                assert nn._pallas_conv_mode(*args) == ""
            assert nn._pallas_conv_mode(*args) == "plain"
        assert nn._pallas_conv_mode(*args) == ""

    def test_override_respects_availability_gate(self):
        from cgd_tpu.ops import nn

        with nn.conv_routing("plain"):
            # 1x1 kernel is never kernel-eligible, override or not
            assert nn._pallas_conv_mode(
                (1, 32, 32, 128), (1, 1, 128, 128), 1, None
            ) == ""


def test_measured_safe_entries_still_selected():
    """The planner must still SELECT each _MEASURED_SAFE plan for its shape
    class (the host-side half of validate_measured_safe; the on-device
    compile half runs in bench.py before every timed round)."""
    from cgd_tpu.kernels import conv_pallas as cp

    # runs the planner-selection assertions; on CPU the Mosaic compile part
    # is skipped inside
    cp.validate_measured_safe()
    for key in cp._MEASURED_SAFE:
        th, w, cin, tco, z, resample, has_skip = key
        plan = cp._plan_fwd(th, w, cin, tco, z, resample=resample, has_skip=has_skip)
        assert plan == (tco, tco, th), (key, plan)
