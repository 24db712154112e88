"""DPM-Solver++(2M) sampler tests (beyond the reference — the reference
only has ancestral/DDIM, cgd/cgd.py:250-262).

Correctness is pinned three independent ways:
1. first-order DPM++ is algebraically identical to DDIM eta=0 — checked
   step-by-step on a shared trajectory;
2. convergence ORDER against an analytic-score model (Gaussian data, where
   the exact eps-prediction is closed-form): halving the step budget must
   grow DPM error ~4x (second order) while DDIM grows ~2x, and DPM must be
   far more accurate than DDIM at every budget;
3. the sample_loop integration (segment chaining of the multistep x0_prev
   carry, checkpoint/resume bit-exactness incl. the new x0p state field).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cgd_tpu.diffusion import make_diffusion
from cgd_tpu.diffusion.sampler import (
    GuidanceFns,
    SamplerConfig,
    sample_loop,
)


def _pmv(d, x, t, eps):
    tb = jnp.full((x.shape[0],), t, jnp.int32)
    return d.p_mean_variance(eps, x, tb), tb


class TestFirstOrderIsDDIM:
    def test_first_order_matches_ddim_every_step(self):
        d = make_diffusion(100, timestep_respacing="10", learn_sigma=False)
        rng = np.random.RandomState(0)
        x_d = x_m = jnp.asarray(rng.randn(1, 8, 8, 3), jnp.float32)
        zeros = jnp.zeros_like(x_d)

        def model(x, t):
            # arbitrary smooth eps prediction; identical for both arms
            return jnp.tanh(x) * (1.0 + 0.1 * t)

        for t in range(d.num_timesteps - 1, -1, -1):
            out_d, tb = _pmv(d, x_d, t, model(x_d, t))
            x_d = d.ddim_sample_step(out_d, x_d, tb, zeros, None, eta=0.0)
            out_m, tb = _pmv(d, x_m, t, model(x_m, t))
            x_m, x0g = d.dpm_solver2m_step(
                out_m, x_m, tb, tb, jnp.asarray(True), zeros
            )
            np.testing.assert_allclose(
                np.asarray(x_m), np.asarray(x_d), atol=3e-5,
                err_msg=f"first-order DPM++ != DDIM at t={t}",
            )
            np.testing.assert_allclose(
                np.asarray(x0g), np.asarray(out_m.pred_xstart), atol=1e-6
            )


class TestConvergenceOrder:
    """Gaussian data x0 ~ N(mu, s^2 I) admits the exact eps prediction in
    closed form, so every solver error is pure discretization error of the
    same probability-flow ODE — the cleanest possible order measurement."""

    MU, S2 = 0.3, 0.25
    STEPS = 1000

    def _exact_eps(self, abar1000):
        mu, s2 = self.MU, self.S2

        def eps_fn(x, t_orig):
            a = float(abar1000[t_orig])
            post = ((1.0 - a) * mu + np.sqrt(a) * s2 * x) / ((1.0 - a) + a * s2)
            return (x - np.sqrt(a) * post) / np.sqrt(1.0 - a)

        return eps_fn

    def _run(self, n, solver, x_start, eps_fn):
        d = make_diffusion(self.STEPS, "linear", [n], learn_sigma=False)
        assert int(d.timestep_map[-1]) == self.STEPS - 1  # shared start level
        x = jnp.asarray(x_start, jnp.float32)
        zeros = jnp.zeros_like(x)
        x0p = zeros
        for i, t in enumerate(range(d.num_timesteps - 1, -1, -1)):
            eps = jnp.asarray(eps_fn(np.asarray(x), int(d.timestep_map[t])))
            out, tb = _pmv(d, x, t, eps)
            if solver == "ddim":
                x = d.ddim_sample_step(out, x, tb, zeros, None, eta=0.0)
            else:
                tp = d.num_timesteps - 1 if i == 0 else t + 1
                tpb = jnp.full((x.shape[0],), tp, jnp.int32)
                x, x0p = d.dpm_solver2m_step(
                    out, x, tb, tpb, jnp.asarray(i == 0), x0p
                )
        return np.asarray(x)

    def test_dpm_beats_ddim_and_is_second_order(self):
        d_full = make_diffusion(self.STEPS, "linear", None, learn_sigma=False)
        abar1000 = np.asarray(d_full.coeffs.alphas_cumprod, np.float64)
        eps_fn = self._exact_eps(abar1000)
        rng = np.random.RandomState(3)
        x_start = rng.randn(1, 4, 4, 3).astype(np.float32)

        truth = self._run(self.STEPS, "ddim", x_start, eps_fn)
        errs = {}
        for n in (8, 16, 32):
            for solver in ("ddim", "dpm"):
                final = self._run(n, solver, x_start, eps_fn)
                errs[(solver, n)] = float(
                    np.sqrt(np.mean((final - truth) ** 2))
                )

        # second-order accuracy: far below DDIM at every budget (measured
        # with the clamped-coef update: 0.085/0.014/0.0016 vs DDIM
        # 0.174/0.086/0.043 at N=8/16/32)
        assert errs[("dpm", 8)] < 0.6 * errs[("ddim", 8)], errs
        assert errs[("dpm", 16)] < 0.25 * errs[("ddim", 16)], errs
        assert errs[("dpm", 32)] < 0.25 * errs[("ddim", 32)], errs
        # order: halving steps grows DPM error super-linearly (>=2nd order;
        # measured ~6x), DDIM stays first-order (~2x)
        assert errs[("dpm", 8)] / errs[("dpm", 16)] > 3.0, errs
        assert errs[("dpm", 16)] / errs[("dpm", 32)] > 3.0, errs
        assert errs[("ddim", 8)] / errs[("ddim", 16)] < 2.8, errs


def _tiny_guided_run(dpm, state_sink=None, resume=None, stop_after=None,
                     seed=7):
    d = make_diffusion(steps=100, timestep_respacing="10")

    def model_fn(params, x, t_model, rng, y):
        return jnp.concatenate([jnp.tanh(x), jnp.zeros_like(x)], -1)

    def builder(meta):
        def loss_fn(p, rng, x, out, ref_t):
            return 1e-3 * jnp.sum(out.pred_xstart ** 2)

        return GuidanceFns(loss_fn, lambda g: g)

    outs = []
    gen = sample_loop(
        d, model_fn, builder, {}, (1, 16, 16, 3), jax.random.PRNGKey(seed),
        SamplerConfig(use_ddim=False, dpm_solver=dpm),
        save_frequency=3,
        state_sink=state_sink, resume=resume,
    )
    for i, item in enumerate(gen):
        outs.append(item)
        if stop_after is not None and i + 1 >= stop_after:
            gen.close()
            break
    return outs


class TestSampleLoopIntegration:
    def test_guided_dpm_loop_runs_and_differs_from_ancestral(self):
        dpm = _tiny_guided_run(dpm=True)
        anc = _tiny_guided_run(dpm=False)
        assert len(dpm) == len(anc) == 4
        for k, p, x in dpm:
            assert np.all(np.isfinite(np.asarray(x)))
        # dpm_solver actually changes the update rule
        assert not np.allclose(np.asarray(dpm[-1][2]), np.asarray(anc[-1][2]))

    def test_dpm_resume_is_bit_exact(self):
        # the x0_prev multistep carry must survive the checkpoint round-trip
        full = _tiny_guided_run(dpm=True)
        snaps = {}
        _tiny_guided_run(
            dpm=True,
            state_sink=lambda n, st: snaps.__setitem__(n, st),
            stop_after=2,
        )
        n0 = max(snaps)
        assert snaps[n0]["x0p"] is not None
        resumed = _tiny_guided_run(dpm=True, resume={"next_seg": n0, **snaps[n0]})
        assert len(resumed) == len(full) - n0
        for (k1, p1, x1), (k2, p2, x2) in zip(full[-len(resumed):], resumed):
            assert k1 == k2
            np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))

    def test_dpm_resume_rejects_checkpoint_without_x0p(self):
        with pytest.raises(ValueError, match="x0_prev"):
            _tiny_guided_run(
                dpm=True,
                resume={"next_seg": 1, "x": np.zeros((1, 16, 16, 3)),
                        "y": None, "x0p": None},
            )
