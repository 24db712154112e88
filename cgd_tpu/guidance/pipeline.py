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
    # NOTE r1/r2: a fused Pallas cutout kernel was built, measured, and
    # removed — the einsum path costs only ~1.5 ms/step at 256px (already
    # MXU matmuls) and the kernel tripped Mosaic scoped-VMEM staging at full
    # operand sizes (negative result recorded in PERF.md).


def make_guidance_builder(
    clip_cfg: CLIPConfig,
    target_embeds: jnp.ndarray,  # [P, D] float32 (small; safe to close over)
    weights: jnp.ndarray,  # [P] float32, normalized (sum |.| = 1 contract)
    diffusion: GaussianDiffusion,
    settings: GuidanceSettings,
    *,
    use_init_loss: bool = False,
    cached_coords: Optional[CutoutSpec] = None,
    mesh=None,
    loss_callback=None,  # host fn(dict of float scalars), called per guided step
):
    """Returns builder(meta: StepMeta) -> GuidanceFns for the sampler.

    Model weights arrive via the sampler's ``params`` pytree argument:
    params["clip"] (CLIP tower), and when ``use_init_loss``, params["lpips"]
    + params["init_image"] ([B,H,W,3] in [-1,1]). Only scalars/small arrays
    are closed over — big closures become inlined HLO constants.

    ``target_embeds=None`` (serving mode, used by api.py): the prompt
    targets are read from ``params["guidance"]`` = {"target_embeds": [P,D],
    "weights": [P]} instead of being closed over. Closed-over targets are
    inlined into the HLO as literals, so every NEW PROMPT used to produce a
    different HLO module and miss both the jit and the persistent compile
    caches — a full recompile (~4.5 min at the 256px headline) per distinct
    prompt in a serving daemon. As jit arguments, any prompt with the same
    prompt-count P reuses the one compiled graph (r5; pinned by
    tests/test_serve.py::test_new_prompt_same_config_is_same_hlo).

    When ``mesh`` is given, the cutout batch is sharded across all mesh
    devices (see cgd_tpu.parallel.mesh) — XLA then all-reduces the guidance
    gradient over the cutout shards."""
    clip_size = clip_cfg.input_resolution
    # IMPORTANT: closure constants must be NUMPY, not device arrays — a
    # device-resident constant makes MLIR lowering fetch ._value from the
    # (possibly remote) accelerator, which is pathologically slow on
    # tunneled backends (measured: minutes per constant).
    mean = np.asarray(CLIP_MEAN, np.float32)
    std = np.asarray(CLIP_STD, np.float32)
    sqrt_om = np.asarray(diffusion.sqrt_one_minus_alphas_cumprod)
    targets_in_params = target_embeds is None
    if not targets_in_params:
        target_embeds = np.asarray(target_embeds, np.float32)
        weights = np.asarray(weights, np.float32)
    if cached_coords is not None:
        cached_coords = CutoutSpec(*(np.asarray(a) for a in cached_coords))
    compute_dtype = jnp.bfloat16 if settings.clip_compute_dtype == "bfloat16" else jnp.float32

    def builder(meta: StepMeta):
        cutn = meta.cutn

        def loss_fn(params, rng, x, out: PMeanVariance, ref_t):
            if targets_in_params:
                t_embeds = params["guidance"]["target_embeds"]
                t_weights = params["guidance"]["weights"]
            else:
                t_embeds, t_weights = target_embeds, weights
            b = x.shape[0]
            side_y, side_x = x.shape[1], x.shape[2]
            fac = jnp.asarray(sqrt_om)[ref_t]
            x_in = out.pred_xstart * fac + x * (1.0 - fac)
            if mesh is not None:
                # Mediate the spatial->cutout sharding handoff. The UNet
                # output may arrive height-sharded (parallel/mesh.py
                # spatial_sharding) while the cutout einsums below partition
                # over the cutout axis; left to its own devices XLA's last
                # resort is an involuntary full rematerialization at the
                # einsum transpose (measured: MULTICHIP_r02 tail warning).
                # Replicating x_in here lowers to ONE all-gather of a single
                # image batch over ICI, and its transpose is the
                # reduce-scatter/psum of the guidance gradient back to the
                # height shards — the BASELINE north-star collective.
                # Asserted rematerialization-free by tests/test_parallel.py
                # and __graft_entry__.dryrun_multichip.
                from jax.sharding import NamedSharding, PartitionSpec

                x_in = jax.lax.with_sharding_constraint(
                    x_in, NamedSharding(mesh, PartitionSpec())
                )

            r_coords, r_augs = jax.random.split(rng)
            cc = cached_coords
            if targets_in_params and "cached_coords" in params["guidance"]:
                # serving mode: the per-run random coords are jit arguments
                # too — as closure literals each new seed's coords would
                # force a recompile, exactly like the prompt targets
                cc = params["guidance"]["cached_coords"]
            if cc is not None:
                spec = CutoutSpec(
                    cc.offset_x[:cutn],
                    cc.offset_y[:cutn],
                    cc.size[:cutn],
                )
            else:
                spec = sample_cutout_coords(
                    r_coords, cutn, side_x, side_y, clip_size, settings.cutout_power
                )
            cuts = make_cutouts((x_in + 1.0) / 2.0, spec, clip_size)  # [K*B,c,c,3]
            if settings.use_augs:
                cuts = augment_cutouts(r_augs, cuts)
            cuts = (cuts - mean) / std
            if mesh is not None:
                from cgd_tpu.parallel.mesh import cutout_sharding

                cuts = jax.lax.with_sharding_constraint(cuts, cutout_sharding(mesh))

            embeds = encode_image(params["clip"], clip_cfg, cuts, compute_dtype=compute_dtype)
            embeds = embeds.reshape(cutn, b, -1)

            # [K,B,P] distances; weighted sum over prompts, mean over cutouts.
            # Intentionally NOT behind strict_parity (the one quirk exempt
            # from the replicate-by-default rule): the reference's
            # dists.view([cutn, n, -1]) (cgd/cgd.py:195-200) silently
            # mis-broadcasts when #prompts != batch_size with B > 1 —
            # there is no working reference behavior to replicate, only an
            # error/garbage mode. Pinned by tests/test_guidance.py:181.
            dists = spherical_dist_loss(
                embeds[:, :, None, :], t_embeds[None, None, :, :]
            )
            clip_losses = (dists * t_weights).sum(-1).mean(0)  # [B]

            log = {}
            clip_total = clip_losses.sum() * settings.clip_guidance_scale
            range_total = range_loss(out.pred_xstart).sum() * settings.range_scale
            tv_total = tv_loss(x_in).sum() * settings.tv_scale
            loss = clip_total + range_total + tv_total
            log["CLIP Loss"] = clip_total
            log["Range Loss"] = range_total
            log["TV Loss"] = tv_total
            if settings.sat_scale:
                sat_total = saturation_loss(x_in).sum() * settings.sat_scale
                log["Saturation Loss"] = sat_total
                loss = loss + sat_total
            if use_init_loss:
                init_total = (
                    lpips_distance(params["lpips"], x_in, params["init_image"]).sum()
                    * settings.init_scale
                )
                log["Init VGG Loss"] = init_total
                loss = loss + init_total
            log["Total Loss"] = loss
            if loss_callback is not None:
                # per-step loss observability (reference: tqdm.write +
                # wandb.log every step, cgd/cgd.py:234-238). Host callback —
                # costs a device->host sync per step; opt-in. Backends that
                # reject host callbacks use the sampler's loss_sink path
                # instead (log is also returned below).
                jax.debug.callback(loss_callback, log)
            return loss, log

        def grad_transform(grad):
            # reference logs the final guidance gradient mean + magnitude
            # per step (cgd/cgd.py:229-233)
            log = {}
            if settings.use_magnitude:
                rms = jnp.sqrt(jnp.mean(jnp.square(grad)))
                log["Magnitude"] = rms
                grad = grad * jnp.clip(rms, max=0.05) / jnp.maximum(rms, 1e-12)
            log["Grad"] = jnp.mean(grad)
            if loss_callback is not None:
                jax.debug.callback(loss_callback, log)
            return grad, log

        return GuidanceFns(loss_fn, grad_transform)

    return builder


def normalize_weights(weights_list) -> np.ndarray:
    """Reference contract (cgd/cgd.py:100-105): raise if |sum| < 1e-3, then
    divide by |sum|. Returns numpy (safe to close over in jitted code)."""
    w = np.asarray(weights_list, dtype=np.float32)
    total = w.sum()
    if abs(float(total)) < 1e-3:
        raise RuntimeError("The weights must not sum to 0.")
    return w / np.abs(total)
