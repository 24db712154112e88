"""ADM UNet structure/shape tests across the reference's checkpoint flag matrix
(reference: data/diffusion_model_flags.py; SURVEY.md §2b unet row)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cgd_tpu.models.unet import DEFAULT_CHANNEL_MULT, UNetConfig, apply_unet, block_plan, init_unet


def tiny_cfg(**kw):
    base = dict(
        image_size=32,
        model_channels=32,
        out_channels=6,
        num_res_blocks=1,
        attention_ds=(4,),
        channel_mult=(1, 2),
        num_head_channels=16,
    )
    base.update(kw)
    return UNetConfig(**base)


class TestConfig:
    def test_from_flags_64px(self):
        flags = {
            "attention_resolutions": "32,16,8",
            "class_cond": True,
            "image_size": 64,
            "learn_sigma": True,
            "num_channels": 192,
            "num_head_channels": 64,
            "num_res_blocks": 3,
            "resblock_updown": True,
            "use_new_attention_order": True,
            "use_scale_shift_norm": True,
            "dropout": 0.1,
        }
        cfg = UNetConfig.from_flags(flags)
        assert cfg.channel_mult == (1, 2, 3, 4)
        assert cfg.attention_ds == (2, 4, 8)
        assert cfg.out_channels == 6
        assert cfg.num_classes == 1000
        assert cfg.model_channels == 192
        assert cfg.use_new_attention_order

    def test_from_flags_128px_heads(self):
        flags = {
            "attention_resolutions": "32,16,8",
            "class_cond": True,
            "image_size": 128,
            "learn_sigma": True,
            "num_channels": 256,
            "num_heads": 4,
            "num_res_blocks": 2,
            "resblock_updown": True,
            "use_scale_shift_norm": True,
        }
        cfg = UNetConfig.from_flags(flags)
        assert cfg.channel_mult == (1, 1, 2, 3, 4)
        assert cfg.num_heads == 4 and cfg.num_head_channels == -1
        assert cfg.heads_for(256) == 4

    def test_from_flags_512px(self):
        flags = {
            "attention_resolutions": "32, 16, 8",
            "class_cond": False,
            "image_size": 512,
            "learn_sigma": True,
            "num_channels": 256,
            "num_head_channels": 64,
            "num_res_blocks": 2,
            "resblock_updown": True,
            "use_scale_shift_norm": True,
        }
        cfg = UNetConfig.from_flags(flags)
        assert cfg.channel_mult == DEFAULT_CHANNEL_MULT[512]
        assert cfg.attention_ds == (16, 32, 64)
        assert cfg.num_classes is None
        assert cfg.heads_for(512) == 8

    def test_plan_skip_bookkeeping(self):
        cfg = tiny_cfg()
        input_plan, middle_plan, output_plan, out_ch = block_plan(cfg)
        # levels=2, nres=1: input = conv_in's h + (res)+(down)+(res) = 4 entries in hs
        assert len(input_plan) == 3
        assert len(output_plan) == (cfg.num_res_blocks + 1) * len(cfg.channel_mult)
        assert out_ch == cfg.model_channels * cfg.channel_mult[0]


class TestForward:
    @pytest.mark.parametrize("class_cond", [False, True])
    def test_shapes_and_jit(self, class_cond):
        cfg = tiny_cfg(num_classes=10 if class_cond else None)
        params = init_unet(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
        t = jnp.array([0.0, 10.0])
        y = jnp.array([1, 2]) if class_cond else None
        fn = jax.jit(lambda p, x, t, y: apply_unet(p, cfg, x, t, y))
        out = fn(params, x, t, y)
        assert out.shape == (2, 32, 32, 6)
        assert out.dtype == jnp.float32
        assert bool(jnp.isfinite(out).all())

    def test_zero_init_heads_give_near_input_independent_output(self):
        # out_conv is zero-init => output is exactly 0 at init
        cfg = tiny_cfg()
        params = init_unet(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
        out = apply_unet(params, cfg, x, jnp.array([5.0]))
        np.testing.assert_allclose(np.asarray(out), 0.0)

    def test_bfloat16_compute(self):
        cfg = tiny_cfg()
        params = init_unet(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
        out = apply_unet(params, cfg, x, jnp.array([5.0]), compute_dtype=jnp.bfloat16)
        assert out.dtype == jnp.float32
        assert bool(jnp.isfinite(out).all())

    def test_partial_remat_grad_parity_and_engagement(self):
        """remat_min_dim (r5 partial-remat policy rung): gradients must be
        IDENTICAL to no-remat (checkpointing changes scheduling, not math),
        and jax.checkpoint must actually engage — only for layers at or
        above the spatial threshold."""
        cfg = tiny_cfg()
        params = init_unet(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
        t = jnp.array([5.0])

        def loss(p, md):
            out = apply_unet(p, cfg, x, t, None, remat_min_dim=md)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        g_off = jax.grad(lambda p: loss(p, None))(params)
        g_partial = jax.grad(lambda p: loss(p, 32))(params)
        for a, b in zip(jax.tree.leaves(g_off), jax.tree.leaves(g_partial)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

        # engagement: the remat primitive appears iff a layer clears the bar
        jx_off = str(jax.make_jaxpr(lambda p: loss(p, None))(params))
        jx_on = str(jax.make_jaxpr(lambda p: loss(p, 32))(params))
        jx_above = str(jax.make_jaxpr(lambda p: loss(p, 64))(params))
        assert "remat" not in jx_off
        assert "remat" in jx_on
        assert "remat" not in jx_above, (
            "threshold above every layer's spatial dim must checkpoint nothing"
        )

    def test_partial_remat_engages_with_dropout_rng(self):
        """The dropout rng rides THROUGH jax.checkpoint as a regular
        argument: remat_min_dim must still engage when rng is threaded
        (it used to silently disable — the knob became a no-op for any
        dropout-enabled model), and the recompute replays the same key so
        the output is identical to the no-remat graph."""
        cfg = tiny_cfg(dropout=0.1)
        params = init_unet(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
        t = jnp.array([5.0])
        rng = jax.random.PRNGKey(7)

        def fwd(p, md):
            return apply_unet(p, cfg, x, t, None, rng=rng, remat_min_dim=md)

        jx_on = str(jax.make_jaxpr(lambda p: fwd(p, 32))(params))
        assert "remat" in jx_on, "rng-threaded layers must still checkpoint"
        np.testing.assert_allclose(
            np.asarray(fwd(params, 32)), np.asarray(fwd(params, None)),
            atol=1e-5,
        )

    def test_non_square(self):
        # height/width offsets must be multiples of the total downsample factor
        cfg = tiny_cfg()
        params = init_unet(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 48, 3))
        out = apply_unet(params, cfg, x, jnp.array([5.0]))
        assert out.shape == (1, 32, 48, 6)

    @pytest.mark.slow
    def test_all_checkpoint_variants_tiny(self):
        """Walk all 6 reference flag sets, shrunk to 32px/16ch, and check the
        full encoder/decoder plan executes (updown resblocks, attention
        placement, class embedding, fractional channel_mult)."""
        variants = [
            # 64px-style: new attention order, 3 resblocks, dropout, cond
            dict(channel_mult=(1, 2, 3, 4), num_head_channels=16, class_cond=True,
                 use_new_attention_order=True, num_res_blocks=3, dropout=0.1),
            # 128px-style: heads by count, not channels
            dict(channel_mult=(1, 1, 2), num_heads=4, class_cond=True),
            # 256px-style: heads by channels, cond + uncond
            dict(channel_mult=(1, 2, 2, 4), num_head_channels=16, class_cond=True),
            dict(channel_mult=(1, 2, 2, 4), num_head_channels=16, class_cond=False),
            # 512px-style: fractional first mult
            dict(channel_mult=(0.5, 1, 2, 4), num_head_channels=16, class_cond=False),
        ]
        for v in variants:
            size = 2 ** (len(v["channel_mult"]) + 1)  # keep spatial >= 4 at bottom
            cfg = UNetConfig(
                image_size=size,
                model_channels=32,
                num_res_blocks=v.get("num_res_blocks", 1),
                attention_ds=(4,),
                channel_mult=v["channel_mult"],
                num_classes=7 if v["class_cond"] else None,
                num_heads=v.get("num_heads", 1),
                num_head_channels=v.get("num_head_channels", -1),
                dropout=v.get("dropout", 0.0),
                use_new_attention_order=v.get("use_new_attention_order", False),
            )
            params = init_unet(jax.random.PRNGKey(0), cfg)
            x = jnp.ones((1, size, size, 3)) * 0.1
            y = jnp.array([3]) if v["class_cond"] else None
            out = apply_unet(params, cfg, x, jnp.array([7.0]), y)
            assert out.shape == (1, size, size, 6), v
            assert bool(jnp.isfinite(out).all()), v

    def test_dropout_rng(self):
        cfg = tiny_cfg(dropout=0.5)
        params = init_unet(jax.random.PRNGKey(0), cfg)
        # unzero every zero-init kernel so dropout inside resblocks is observable
        params = jax.tree.map(
            lambda a: jnp.full_like(a, 0.01) if bool((a == 0).all()) else a, params
        )
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
        o1 = apply_unet(params, cfg, x, jnp.array([5.0]), rng=jax.random.PRNGKey(2))
        o2 = apply_unet(params, cfg, x, jnp.array([5.0]), rng=jax.random.PRNGKey(3))
        o_det = apply_unet(params, cfg, x, jnp.array([5.0]))
        assert not np.allclose(np.asarray(o1), np.asarray(o2))
        assert bool(jnp.isfinite(o_det).all())


class TestFlagMergeOrder:
    @pytest.mark.slow
    def test_noise_schedule_override_footgun(self):
        """Reference §3.4: user noise_schedule overrides the checkpoint's —
        the CLI 'linear' default silently overrides 64px's cosine."""
        from cgd_tpu.weights import resolve_unet

        _p, _cfg, flags = resolve_unet(
            64, True, mode="random",
            flag_overrides={"noise_schedule": "linear", "diffusion_steps": 1000,
                            "dropout": 0.0},
        )
        assert flags["noise_schedule"] == "linear"  # overrode cosine (quirk kept)

        _p, _cfg, flags = resolve_unet(64, True, mode="random", flag_overrides=None)
        assert flags["noise_schedule"] == "cosine"  # checkpoint default

    def test_512_carries_rescale(self):
        from cgd_tpu.weights import resolve_unet

        _p, _cfg, flags = resolve_unet(512, False, mode="random")
        assert flags.get("rescale_timesteps") is True
