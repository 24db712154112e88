"""The CLIP guidance pipeline: assembles the per-step guidance loss.

TPU-native equivalent of the reference's ``cond_fn`` closure
(cgd/cgd.py:151-239): blend x̂₀ with x by fac = sqrt(1-ᾱ[ref_t]), cut out
`cutn` random crops, CLIP-encode, weighted spherical distances against the
target embeddings, plus range/tv/saturation/LPIPS-init losses. Here it is a
*scalar loss function* handed to the sampler, which differentiates the whole
(UNet + cutouts + CLIP) computation in one fused XLA step.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cgd_tpu.diffusion.gaussian import GaussianDiffusion, PMeanVariance
from cgd_tpu.diffusion.sampler import GuidanceFns, StepMeta
from cgd_tpu.guidance.cutouts import (
    CutoutSpec,
    augment_cutouts,
    make_cutouts,
    sample_cutout_coords,
)
from cgd_tpu.guidance.losses import (
    range_loss,
    saturation_loss,
    spherical_dist_loss,
    tv_loss,
)
from cgd_tpu.models.clip import encode_image
from cgd_tpu.models.clip.configs import CLIP_MEAN, CLIP_STD, CLIPConfig
from cgd_tpu.models.vgg_lpips import lpips_distance


@dataclasses.dataclass(frozen=True)
class GuidanceSettings:
    clip_guidance_scale: float = 1000.0
    tv_scale: float = 150.0
    range_scale: float = 50.0
    sat_scale: float = 0.0
    init_scale: float = 0.0
    use_magnitude: bool = False
    use_augs: bool = False
    cutout_power: float = 1.0
    clip_compute_dtype: str = "bfloat16"


def make_guidance_builder(
    clip_params,
    clip_cfg: CLIPConfig,
    target_embeds: jnp.ndarray,  # [P, D] float32
    weights: jnp.ndarray,  # [P] float32, normalized (sum |.| = 1 contract)
    diffusion: GaussianDiffusion,
    settings: GuidanceSettings,
    *,
    init_image: Optional[jnp.ndarray] = None,  # [B,H,W,3] in [-1,1]
    lpips_params=None,
    cached_coords: Optional[CutoutSpec] = None,
):
    """Returns builder(meta: StepMeta) -> GuidanceFns for the sampler."""
    clip_size = clip_cfg.input_resolution
    mean = jnp.asarray(CLIP_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_STD, jnp.float32)
    sqrt_om = jnp.asarray(diffusion.sqrt_one_minus_alphas_cumprod)
    compute_dtype = jnp.bfloat16 if settings.clip_compute_dtype == "bfloat16" else jnp.float32

    use_lpips = init_image is not None and settings.init_scale != 0
    if use_lpips and lpips_params is None:
        raise ValueError("init_scale != 0 requires lpips_params")

    def builder(meta: StepMeta):
        cutn = meta.cutn

        def loss_fn(rng, x, out: PMeanVariance, ref_t):
            b = x.shape[0]
            side_y, side_x = x.shape[1], x.shape[2]
            fac = sqrt_om[ref_t]
            x_in = out.pred_xstart * fac + x * (1.0 - fac)

            r_coords, r_augs = jax.random.split(rng)
            if cached_coords is not None:
                spec = CutoutSpec(
                    cached_coords.offset_x[:cutn],
                    cached_coords.offset_y[:cutn],
                    cached_coords.size[:cutn],
                )
            else:
                spec = sample_cutout_coords(
                    r_coords, cutn, side_x, side_y, clip_size, settings.cutout_power
                )
            cuts = make_cutouts((x_in + 1.0) / 2.0, spec, clip_size)  # [K*B,c,c,3]
            if settings.use_augs:
                cuts = augment_cutouts(r_augs, cuts)
            cuts = (cuts - mean) / std

            embeds = encode_image(clip_params, clip_cfg, cuts, compute_dtype=compute_dtype)
            embeds = embeds.reshape(cutn, b, -1)

            # [K,B,P] distances; weighted sum over prompts, mean over cutouts
            dists = spherical_dist_loss(
                embeds[:, :, None, :], target_embeds[None, None, :, :]
            )
            clip_losses = (dists * weights).sum(-1).mean(0)  # [B]

            loss = (
                clip_losses.sum() * settings.clip_guidance_scale
                + range_loss(out.pred_xstart).sum() * settings.range_scale
                + tv_loss(x_in).sum() * settings.tv_scale
            )
            if settings.sat_scale:
                loss = loss + saturation_loss(x_in).sum() * settings.sat_scale
            if use_lpips:
                loss = loss + lpips_distance(lpips_params, x_in, init_image).sum() * settings.init_scale
            return loss

        def grad_transform(grad):
            if settings.use_magnitude:
                rms = jnp.sqrt(jnp.mean(jnp.square(grad)))
                grad = grad * jnp.clip(rms, max=0.05) / jnp.maximum(rms, 1e-12)
            return grad

        return GuidanceFns(loss_fn, grad_transform)

    return builder


def normalize_weights(weights_list) -> jnp.ndarray:
    """Reference contract (cgd/cgd.py:100-105): raise if |sum| < 1e-3, then
    divide by |sum|."""
    w = jnp.asarray(np.asarray(weights_list, dtype=np.float32))
    total = w.sum()
    if abs(float(total)) < 1e-3:
        raise RuntimeError("The weights must not sum to 0.")
    return w / jnp.abs(total)
