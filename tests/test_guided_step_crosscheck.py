"""End-to-end guided-step parity vs torch.

Implements one p_sample_with_grad / ddim_sample_with_grad step in torch
(the crowsonkb-fork semantics the reference relies on: p_mean_variance with
learned sigma, CLIP-guidance loss through the model, condition_mean /
condition_score, cgd/cgd.py:151-239 + SURVEY.md §2b) using the SAME
coefficient arrays, cutout matrices, noise, and converted weights as the
JAX guided step — the outputs must match. This pins every sign, blend
factor, and coefficient lookup in the sampler."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from cgd_tpu.convert.torch_clip import convert_state_dict as convert_clip
from cgd_tpu.convert.torch_unet import convert_state_dict as convert_unet
from cgd_tpu.diffusion import make_diffusion
from cgd_tpu.diffusion.sampler import SamplerConfig, StepMeta, make_guided_step
from cgd_tpu.guidance.cutouts import CutoutSpec, _box_weights
from cgd_tpu.guidance.pipeline import GuidanceSettings, make_guidance_builder
from cgd_tpu.models.clip.configs import (
    CLIP_MEAN,
    CLIP_STD,
    CLIPConfig,
    TextConfig,
    VisionViTConfig,
)
from cgd_tpu.models.unet import UNetConfig, apply_unet
from tests.torch_ref_models import TorchADMUNet, TorchCLIPText, TorchCLIPViT

CUT = 16  # tiny clip input resolution
IMG = 32


def _setup():
    torch.manual_seed(7)
    ucfg = UNetConfig(
        image_size=IMG, model_channels=32, num_res_blocks=1,
        attention_ds=(4,), channel_mult=(1, 2), num_head_channels=16,
    )
    tunet = TorchADMUNet(ucfg).eval()
    ccfg = CLIPConfig(
        "x", 24, VisionViTConfig(CUT, 8, 64, 2, 2),
        TextConfig(context_length=12, vocab_size=96, width=48, heads=2, layers=1),
    )
    tvit = TorchCLIPViT(res=CUT, patch=8, width=64, layers=2, heads=2, embed_dim=24).eval()
    ttxt = TorchCLIPText(vocab=96, ctx=12, width=48, heads=2, layers=1, embed_dim=24).eval()

    unet_params = convert_unet({k: v.numpy() for k, v in tunet.adm_state_dict().items()}, ucfg)
    clip_params = convert_clip({k: v.numpy() for k, v in tvit.clip_state_dict(ttxt).items()}, ccfg)

    d = make_diffusion(steps=1000, noise_schedule="linear", timestep_respacing="50")
    rng = np.random.RandomState(0)
    x0 = rng.randn(1, IMG, IMG, 3).astype(np.float32)
    noise = rng.randn(1, IMG, IMG, 3).astype(np.float32)
    target = rng.randn(2, 24).astype(np.float32)
    weights = np.array([0.7, 0.3], np.float32)
    K = 4
    sizes = rng.uniform(CUT, IMG, size=K).astype(np.float32)
    coords = CutoutSpec(
        offset_x=np.floor(rng.uniform(0, IMG - sizes)).astype(np.float32),
        offset_y=np.floor(rng.uniform(0, IMG - sizes)).astype(np.float32),
        size=np.floor(sizes).astype(np.float32),
    )
    return ucfg, tunet, ccfg, tvit, unet_params, clip_params, d, x0, noise, target, weights, coords


def _torch_guided_step(use_ddim, tunet, tvit, d, x0, noise, target, weights, coords,
                       t_idx, ref_t, scales):
    c = d.coeffs
    x = torch.tensor(np.transpose(x0, (0, 3, 1, 2)), requires_grad=True)
    tt = torch.tensor([float(d.timestep_map[t_idx])])
    model_out = tunet(x, tt)
    eps, v = torch.chunk(model_out, 2, dim=1)
    min_log = float(c.posterior_log_variance_clipped[t_idx])
    max_log = float(np.log(c.betas[t_idx]))
    frac = (v + 1) / 2
    log_var = frac * max_log + (1 - frac) * min_log
    pred_x0 = float(c.sqrt_recip_alphas_cumprod[t_idx]) * x - float(
        c.sqrt_recipm1_alphas_cumprod[t_idx]
    ) * eps
    mean = float(c.posterior_mean_coef1[t_idx]) * pred_x0 + float(
        c.posterior_mean_coef2[t_idx]
    ) * x

    # guidance loss (reference cond_fn): blend, fixed cutouts, CLIP, losses
    fac = float(c.sqrt_one_minus_alphas_cumprod[ref_t])
    x_in = pred_x0 * fac + x * (1 - fac)
    wy = np.asarray(_box_weights(jnp.asarray(coords.offset_y), jnp.asarray(coords.size), IMG, CUT))
    wx = np.asarray(_box_weights(jnp.asarray(coords.offset_x), jnp.asarray(coords.size), IMG, CUT))
    img01 = (x_in + 1) / 2  # [1,3,H,W]
    cuts = torch.einsum(
        "kyh,bchw,kxw->kbcyx", torch.tensor(wy), img01, torch.tensor(wx)
    ).reshape(-1, 3, CUT, CUT)
    mean_t = torch.tensor(np.asarray(CLIP_MEAN, np.float32)).view(1, 3, 1, 1)
    std_t = torch.tensor(np.asarray(CLIP_STD, np.float32)).view(1, 3, 1, 1)
    embeds = tvit((cuts - mean_t) / std_t).float().view(len(coords.size), 1, -1)
    tgt = torch.tensor(target)
    xn = embeds / embeds.norm(dim=-1, keepdim=True)
    yn = tgt / tgt.norm(dim=-1, keepdim=True)
    dists = (xn.unsqueeze(2) - yn[None, None]).norm(dim=-1).div(2).arcsin().pow(2).mul(2)
    clip_losses = (dists * torch.tensor(weights)).sum(-1).mean(0)
    range_l = (pred_x0 - pred_x0.clamp(-1, 1)).pow(2).mean([1, 2, 3])
    pad = torch.nn.functional.pad(x_in, (0, 1, 0, 1), "replicate")
    xd = pad[..., :-1, 1:] - pad[..., :-1, :-1]
    yd = pad[..., 1:, :-1] - pad[..., :-1, :-1]
    tv_l = (xd**2 + yd**2).mean([1, 2, 3])
    loss = (clip_losses.sum() * scales["cgs"] + range_l.sum() * scales["range"]
            + tv_l.sum() * scales["tv"])
    grad = -torch.autograd.grad(loss, x)[0]

    nz = torch.tensor(np.transpose(noise, (0, 3, 1, 2)))
    nonzero = 1.0 if t_idx != 0 else 0.0  # no noise at the final timestep
    if use_ddim:
        abar = float(c.alphas_cumprod[t_idx])
        abar_prev = float(c.alphas_cumprod_prev[t_idx])
        eps_d = (float(c.sqrt_recip_alphas_cumprod[t_idx]) * x - pred_x0) / float(
            c.sqrt_recipm1_alphas_cumprod[t_idx]
        )
        eps_d = eps_d - np.sqrt(1 - abar) * grad
        px0 = float(c.sqrt_recip_alphas_cumprod[t_idx]) * x - float(
            c.sqrt_recipm1_alphas_cumprod[t_idx]
        ) * eps_d
        sample = px0 * np.sqrt(abar_prev) + np.sqrt(1 - abar_prev) * eps_d
    else:
        new_mean = mean + torch.exp(log_var) * grad
        sample = new_mean + nonzero * torch.exp(0.5 * log_var) * nz
    return (
        sample.detach().numpy().transpose(0, 2, 3, 1),
        pred_x0.detach().numpy().transpose(0, 2, 3, 1),
    )


@pytest.mark.parametrize("use_ddim", [False, True])
@pytest.mark.slow
def test_guided_step_matches_torch(use_ddim):
    (ucfg, tunet, ccfg, tvit, unet_params, clip_params, d, x0, noise,
     target, weights, coords) = _setup()
    t_idx, ref_t = 30, 42
    scales = {"cgs": 120.0, "range": 50.0, "tv": 150.0}

    ref, _ref_px0 = _torch_guided_step(
        use_ddim, tunet, tvit, d, x0, noise, target, weights, coords, t_idx, ref_t, scales
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
    step = make_guided_step(
        d, model_fn, builder(StepMeta(t=t_idx, guided=True, cutn=len(coords.size))),
        SamplerConfig(use_ddim=use_ddim),
    )
    x_next, pred_x0, _y = step(
        {"unet": unet_params, "clip": clip_params},
        jnp.asarray(x0), jnp.int32(t_idx), jnp.int32(ref_t), None,
        jax.random.PRNGKey(0), noise_override=jnp.asarray(noise),
    )
    np.testing.assert_allclose(np.asarray(x_next), ref, atol=5e-3, rtol=5e-3)
