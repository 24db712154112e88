"""Schedule / respacing / diffusion-process math tests.

Golden values hand-derived from the documented contract (SURVEY.md §2b):
linear betas linspace(1e-4, 0.02)*1000/T; cosine alpha_bar; ddimN stride sets;
respaced beta~ = 1 - abar_i/abar_{i-1}.
"""

import math

import numpy as np
import pytest

from cgd_tpu.diffusion import (
    GaussianDiffusion,
    ScheduleCoefficients,
    get_named_beta_schedule,
    make_diffusion,
    space_timesteps,
)


class TestBetaSchedules:
    def test_linear_1000(self):
        betas = get_named_beta_schedule("linear", 1000)
        assert betas.shape == (1000,)
        assert betas[0] == pytest.approx(1e-4)
        assert betas[-1] == pytest.approx(0.02)
        assert np.all(np.diff(betas) > 0)

    def test_linear_scaling_with_T(self):
        betas = get_named_beta_schedule("linear", 250)
        assert betas[0] == pytest.approx(4 * 1e-4)
        assert betas[-1] == pytest.approx(4 * 0.02)

    def test_cosine(self):
        betas = get_named_beta_schedule("cosine", 1000)
        assert betas.shape == (1000,)
        assert np.all(betas <= 0.999)

        def alpha_bar(t):
            return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

        expected_b0 = 1 - alpha_bar(1 / 1000) / alpha_bar(0)
        assert betas[0] == pytest.approx(expected_b0, rel=1e-10)
        # late betas saturate at the 0.999 cap
        assert betas[-1] == pytest.approx(0.999)

    def test_unknown_raises(self):
        with pytest.raises(NotImplementedError):
            get_named_beta_schedule("quadratic", 100)


class TestSpaceTimesteps:
    def test_ddim25_of_1000(self):
        steps = space_timesteps(1000, "ddim25")
        assert steps == list(range(0, 1000, 40))
        assert len(steps) == 25

    def test_ddim250(self):
        steps = space_timesteps(1000, "ddim250")
        assert steps == list(range(0, 1000, 4))

    def test_ddim_impossible(self):
        with pytest.raises(ValueError):
            space_timesteps(1000, "ddim333")

    def test_even_respace_250(self):
        steps = space_timesteps(1000, "250")
        assert len(steps) == 250
        assert steps[0] == 0
        assert steps[-1] == 999
        assert steps == sorted(set(steps))

    def test_full(self):
        assert space_timesteps(1000, "1000") == list(range(1000))

    def test_sections(self):
        steps = space_timesteps(100, [10, 10])
        assert len(steps) == 20
        assert steps[0] == 0 and 50 in steps and steps[-1] == 99

    def test_single_step_section(self):
        assert space_timesteps(10, [1]) == [0]


class TestCoefficients:
    def test_derived_arrays(self):
        betas = get_named_beta_schedule("linear", 100)
        c = ScheduleCoefficients.from_betas(betas)
        alphas = 1 - betas
        abar = np.cumprod(alphas)
        np.testing.assert_allclose(c.alphas_cumprod, abar, rtol=1e-6)
        np.testing.assert_allclose(c.sqrt_one_minus_alphas_cumprod, np.sqrt(1 - abar), rtol=1e-6)
        np.testing.assert_allclose(c.alphas_cumprod_prev[0], 1.0)
        np.testing.assert_allclose(c.alphas_cumprod_prev[1:], abar[:-1], rtol=1e-6)
        # posterior variance at t=0 is 0; log clipped to t=1's value
        assert c.posterior_variance[0] == 0.0
        assert c.posterior_log_variance_clipped[0] == pytest.approx(
            np.log(c.posterior_variance[1]), rel=1e-5
        )

    def test_respaced_betas_match_abar_ratio(self):
        d = make_diffusion(steps=1000, noise_schedule="linear", timestep_respacing="ddim25")
        base = get_named_beta_schedule("linear", 1000)
        abar = np.cumprod(1 - base)
        kept = list(range(0, 1000, 40))
        last = 1.0
        expected = []
        for i in kept:
            expected.append(1 - abar[i] / last)
            last = abar[i]
        np.testing.assert_allclose(d.coeffs.betas, np.float32(expected), rtol=1e-5)
        assert d.num_timesteps == 25
        np.testing.assert_array_equal(d.timestep_map, kept)


class TestDiffusionProcess:
    def test_q_sample_identity_at_zero_noise(self):
        import jax.numpy as jnp

        d = make_diffusion(steps=100, timestep_respacing="100")
        x = jnp.ones((1, 8, 8, 3))
        noise = jnp.zeros_like(x)
        out = d.q_sample(x, jnp.array([0]), noise)
        np.testing.assert_allclose(
            np.asarray(out), float(d.coeffs.sqrt_alphas_cumprod[0]) * np.ones_like(out), rtol=1e-6
        )

    def test_eps_xstart_roundtrip(self):
        import jax
        import jax.numpy as jnp

        d = make_diffusion(steps=50, timestep_respacing="50")
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        x = jax.random.normal(k1, (2, 8, 8, 3))
        eps = jax.random.normal(k2, (2, 8, 8, 3))
        t = jnp.array([3, 30])
        x0 = d.predict_xstart_from_eps(x, t, eps)
        eps_back = d.predict_eps_from_xstart(x, t, x0)
        np.testing.assert_allclose(np.asarray(eps_back), np.asarray(eps), rtol=1e-3, atol=1e-4)

    def test_p_mean_variance_learned_sigma(self):
        import jax
        import jax.numpy as jnp

        d = make_diffusion(steps=50, timestep_respacing="50")
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 3))
        model_out = jnp.concatenate([jnp.zeros((1, 8, 8, 3)), jnp.ones((1, 8, 8, 3))], -1)
        out = d.p_mean_variance(model_out, x, jnp.array([10]))
        # var logits = +1 -> log_variance == log(beta_t)
        np.testing.assert_allclose(
            np.asarray(out.log_variance)[0, 0, 0, 0], np.log(d.coeffs.betas[10]), rtol=1e-5
        )
        # eps=0 -> pred_xstart = sqrt_recip_abar * x
        np.testing.assert_allclose(
            np.asarray(out.pred_xstart),
            float(d.coeffs.sqrt_recip_alphas_cumprod[10]) * np.asarray(x),
            rtol=1e-5,
        )

    def test_p_mean_variance_fixed_large(self):
        """learn_sigma=False uses FIXED_LARGE variance (guided_diffusion's
        create_gaussian_diffusion default): betas with posterior_variance[1]
        substituted at t=0."""
        import jax
        import jax.numpy as jnp

        d = make_diffusion(steps=50, timestep_respacing="50", learn_sigma=False)
        x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 3))
        model_out = jnp.zeros((1, 8, 8, 3))
        expected = np.append(d.coeffs.posterior_variance[1], d.coeffs.betas[1:])
        for t, want in [(0, expected[0]), (10, expected[10]), (49, expected[49])]:
            out = d.p_mean_variance(model_out, x, jnp.array([t]))
            np.testing.assert_allclose(
                np.asarray(out.variance)[0, 0, 0, 0], want, rtol=1e-6
            )
            np.testing.assert_allclose(
                np.asarray(out.log_variance)[0, 0, 0, 0], np.log(want), rtol=1e-5
            )

    def test_ddim_deterministic_at_eta0(self):
        import jax
        import jax.numpy as jnp

        d = make_diffusion(steps=100, timestep_respacing="ddim10")
        x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 3))
        model_out = jnp.concatenate([0.1 * jnp.ones_like(x), jnp.zeros_like(x)], -1)
        out = d.p_mean_variance(model_out, x, jnp.array([5]))
        n1 = jax.random.normal(jax.random.PRNGKey(3), x.shape)
        n2 = jax.random.normal(jax.random.PRNGKey(4), x.shape)
        s1 = d.ddim_sample_step(out, x, jnp.array([5]), n1)
        s2 = d.ddim_sample_step(out, x, jnp.array([5]), n2)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2))

    def test_p_sample_no_noise_at_t0(self):
        import jax
        import jax.numpy as jnp

        d = make_diffusion(steps=100, timestep_respacing="100")
        x = jax.random.normal(jax.random.PRNGKey(5), (1, 4, 4, 3))
        model_out = jnp.concatenate([jnp.zeros_like(x), jnp.zeros_like(x)], -1)
        out = d.p_mean_variance(model_out, x, jnp.array([0]))
        noise = 100.0 * jnp.ones_like(x)
        s = d.p_sample_step(out, x, jnp.array([0]), noise)
        np.testing.assert_allclose(np.asarray(s), np.asarray(out.mean), atol=1e-5)

    def test_rescale_timesteps(self):
        d = make_diffusion(steps=1000, timestep_respacing="ddim25", rescale_timesteps=True)
        import jax.numpy as jnp

        # spaced index 1 -> original 40 -> rescaled 40 * 1000/1000 = 40.0
        assert float(d.model_time(jnp.array(1))) == pytest.approx(40.0)
        d2 = make_diffusion(steps=500, timestep_respacing="ddim25", rescale_timesteps=True)
        # original step 20 -> 20 * (1000/500) = 40.0
        assert float(d2.model_time(jnp.array(1))) == pytest.approx(40.0)
