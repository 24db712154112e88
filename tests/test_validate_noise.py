"""Parameter validation (reference check_parameters contract) and the
recorded-noise golden escape hatch."""

import numpy as np
import pytest

from cgd_tpu.validate import check_parameters


class TestCheckParameters:
    def good(self, **over):
        kw = dict(
            prompts=["a"], image_prompts=[], image_size=256,
            timestep_respacing="ddim250", diffusion_steps=1000,
            clip_model_name="ViT-B/32", save_frequency=25, noise_schedule="linear",
        )
        kw.update(over)
        return kw

    def test_ok(self):
        check_parameters(**self.good())

    def test_no_prompts(self):
        with pytest.raises(ValueError, match="at least one prompt"):
            check_parameters(**self.good(prompts=[], image_prompts=[]))

    def test_bad_schedule(self):
        with pytest.raises(ValueError, match="linear, cosine"):
            check_parameters(**self.good(noise_schedule="quadratic"))

    def test_bad_size(self):
        with pytest.raises(ValueError, match="image size"):
            check_parameters(**self.good(image_size=100))

    def test_bad_save_frequency(self):
        with pytest.raises(ValueError, match="save_frequency"):
            check_parameters(**self.good(save_frequency=0))
        # > respacing is a soft warning (means: save first + final only)
        check_parameters(**self.good(save_frequency=300, timestep_respacing="ddim250"))

    def test_final_frame_sentinel_does_not_warn(self, capsys):
        """serve.py's final-frame-only default must not spam the daemon log
        with the exceeds-respacing warning on every request (VERDICT r3)."""
        from cgd_tpu.validate import FINAL_FRAME_ONLY

        check_parameters(**self.good(save_frequency=FINAL_FRAME_ONLY))
        assert "save_frequency" not in capsys.readouterr().out
        # an ordinary too-large value still warns
        check_parameters(**self.good(save_frequency=300))
        assert "save_frequency" in capsys.readouterr().out

    def test_comma_section_respacing_accepted(self):
        # "a,b,c" section specs are valid per space_timesteps; total = sum
        check_parameters(**self.good(timestep_respacing="25,25", save_frequency=50))
        with pytest.raises(ValueError, match="save_frequency"):
            check_parameters(**self.good(timestep_respacing="25,25", save_frequency=0))

    def test_garbage_respacing_rejected(self):
        with pytest.raises(ValueError, match="timestep_respacing"):
            check_parameters(**self.good(timestep_respacing="fast"))

    def test_missing_custom_ckpt(self):
        with pytest.raises(AssertionError):
            check_parameters(**self.good(clip_model_name="/nope/model.pt"))


class TestNoiseOverride:
    def test_recorded_noise_reproduces(self):
        import jax
        import jax.numpy as jnp

        from cgd_tpu.diffusion import make_diffusion
        from cgd_tpu.diffusion.sampler import SamplerConfig, sample_loop
        from cgd_tpu.models.unet import UNetConfig, apply_unet, init_unet

        cfg_m = UNetConfig(
            image_size=16, model_channels=32, num_res_blocks=1,
            attention_ds=(4,), channel_mult=(1, 2), num_head_channels=16,
        )
        params_u = init_unet(jax.random.PRNGKey(0), cfg_m)

        def model_fn(p, x, t, r, y):
            return apply_unet(params_u, cfg_m, x, t, y)

        d = make_diffusion(steps=1000, timestep_respacing="10")
        cfg = SamplerConfig(use_ddim=False)
        rng_np = np.random.RandomState(0)
        init = rng_np.randn(1, 16, 16, 3).astype(np.float32)
        steps = rng_np.randn(10, 1, 16, 16, 3).astype(np.float32)

        def run(key):
            outs = list(
                sample_loop(
                    d, model_fn, lambda m: None, {}, (1, 16, 16, 3), key, cfg,
                    save_frequency=100, noise_override=steps, init_noise=init,
                )
            )
            return np.asarray(outs[-1][1])

        # different jax keys, same recorded noise -> identical trajectories
        a = run(jax.random.PRNGKey(1))
        b = run(jax.random.PRNGKey(2))
        np.testing.assert_allclose(a, b)
