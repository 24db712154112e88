"""Multi-step guided sample-LOOP parity vs torch.

The single-step crosscheck (test_guided_step_crosscheck.py) pins one
p/ddim_sample_with_grad step; this one pins what only a full loop exercises:
the respaced-schedule progression (timestep_map, beta-tilde recompute), the
reference's ref_t countdown quirk ACROSS steps (cgd/cgd.py:157-177 —
exercised here with skip_timesteps>0 so ref_t != t every step), the
q_sample skip start, the scanned segment chaining of
cgd_tpu.diffusion.sampler.sample_loop (multiple lax.scan segments sharing a
carried x), the save_frequency + always-save-final yield cadence
(cgd/cgd.py:265-270), and the no-noise mask at the final t=0 step.

Both sides consume identical recorded noise streams and fixed cutout
coordinates, so the outputs must agree to f32 op-reordering tolerance at
every save point — a drift anywhere in the chain compounds and fails."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from cgd_tpu.diffusion import make_diffusion
from cgd_tpu.diffusion.sampler import SamplerConfig, sample_loop
from cgd_tpu.guidance.pipeline import GuidanceSettings, make_guidance_builder
from cgd_tpu.models.unet import apply_unet
from tests.test_guided_step_crosscheck import IMG, _setup, _torch_guided_step

SKIP = 2
SAVE_FREQ = 2


def _torch_guided_loop(use_ddim, tunet, tvit, d, init_noise, noises, target,
                       weights, coords, scales):
    """Reference loop semantics: t walks the respaced indices top-down after
    skip, ref_t counts down from the FULL spaced length (cgd/cgd.py:157)."""
    total = d.num_timesteps
    ts = list(range(total - SKIP))[::-1]
    # q_sample from a zero base (skip>0, no init image): x = sqrt(1-abar)*noise
    x = float(d.coeffs.sqrt_one_minus_alphas_cumprod[ts[0]]) * init_noise
    xs, px0s = [], []
    for consumed, t_idx in enumerate(ts):
        ref_t = total - 1 - consumed
        x, px0 = _torch_guided_step(
            use_ddim, tunet, tvit, d, x, noises[consumed], target, weights,
            coords, t_idx, ref_t, scales,
        )
        xs.append(x)
        px0s.append(px0)
    return xs, px0s


@pytest.mark.parametrize("use_ddim", [False, True])
@pytest.mark.slow
def test_guided_loop_matches_torch(use_ddim):
    (ucfg, tunet, ccfg, tvit, unet_params, clip_params, _d, _x0, _noise,
     target, weights, coords) = _setup()
    # A short respaced process of its own: 100 base steps -> 6 spaced.
    d = make_diffusion(steps=100, noise_schedule="linear", timestep_respacing="ddim6")
    n_steps = d.num_timesteps - SKIP
    scales = {"cgs": 120.0, "range": 50.0, "tv": 150.0}

    rng = np.random.RandomState(11)
    init_noise = rng.randn(1, IMG, IMG, 3).astype(np.float32)
    noises = rng.randn(n_steps, 1, IMG, IMG, 3).astype(np.float32)

    ref_xs, ref_px0s = _torch_guided_loop(
        use_ddim, tunet, tvit, d, init_noise, noises, target, weights, coords, scales
    )

    def model_fn(params, x, t_model, rng, y):
        return apply_unet(params["unet"], ucfg, x, t_model, y, compute_dtype=jnp.float32)

    builder = make_guidance_builder(
        ccfg, target, weights, d,
        GuidanceSettings(
            clip_guidance_scale=scales["cgs"], range_scale=scales["range"],
            tv_scale=scales["tv"], clip_compute_dtype="float32",
        ),
        cached_coords=coords,
    )
    saves = {
        k: (np.asarray(pred_x0), np.asarray(x))
        for k, pred_x0, x in sample_loop(
            d, model_fn, builder,
            {"unet": unet_params, "clip": clip_params},
            (1, IMG, IMG, 3), jax.random.PRNGKey(3),
            SamplerConfig(use_ddim=use_ddim),
            skip_timesteps=SKIP,
            num_cutouts=len(coords.size),
            save_frequency=SAVE_FREQ,
            noise_override=noises,
            init_noise=init_noise,
        )
    }

    expected_keys = sorted({k for k in range(n_steps) if k % SAVE_FREQ == 0} | {n_steps - 1})
    assert sorted(saves) == expected_keys

    for k in expected_keys:
        pred_x0, x = saves[k]
        np.testing.assert_allclose(x, ref_xs[k], atol=2e-2, rtol=2e-2,
                                   err_msg=f"x_t diverged at save point {k}")
        np.testing.assert_allclose(pred_x0, ref_px0s[k], atol=2e-2, rtol=2e-2,
                                   err_msg=f"pred_xstart diverged at save point {k}")
