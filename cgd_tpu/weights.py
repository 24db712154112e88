"""Weight resolution: converted-cache -> torch-convert -> download -> random.

Model checkpoints live in the reference's cache layout
(~/.cache/clip-guided-diffusion, cgd/script_util.py:18) as the original
torch .pt files; we store a converted flat .npz next to each
(<name>.pt -> <name>.npz.cgd) on first use. `mode="random"` gives
randomly-initialized weights for tests/benchmarks without network access.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax

from cgd_tpu.io_utils.download import CACHE_PATH, download
from cgd_tpu.models.clip import CLIP_CONFIGS, init_clip
from cgd_tpu.models.clip.configs import CLIPConfig
from cgd_tpu.models.unet import UNetConfig, init_unet
from cgd_tpu.models.vgg_lpips import init_vgg_lpips
from cgd_tpu.registry import CLIP_MODEL_URLS, DIFFUSION_LOOKUP
from cgd_tpu.utils.pytree_io import load_pytree_like, save_pytree


def _converted_path(pt_path: str) -> str:
    return pt_path + ".npz.cgd"


def _host_init(fn):
    """Run a random-init function on the host CPU device, then bulk-transfer
    the pytree to the default accelerator.

    Two traps on remote (tunneled) TPU backends, both hit and fixed here:
    - eager init on the accelerator costs a per-op compile round trip
      (hundreds of ops => tens of minutes);
    - leaving params *committed* to the CPU device makes every jitted call
      re-transfer the full model (seconds per step). One explicit
      device_put to the accelerator fixes both.
    """
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        return fn()
    with jax.default_device(cpu):
        params = fn()
    default = jax.devices()[0]
    if default.platform != "cpu":
        params = jax.device_put(params, default)
    return params


def resolve_unet(
    image_size: int,
    class_cond: bool,
    checkpoints_dir: str = CACHE_PATH,
    mode: str = "auto",
    flag_overrides: Optional[dict] = None,
) -> Tuple[dict, UNetConfig, dict]:
    """Returns (params, cfg, merged_flags). ``merged_flags`` carries the
    diffusion-process flags (schedule, steps, rescale_timesteps) after the
    reference's merge order: defaults <- checkpoint flags <- user overrides
    (cgd/script_util.py:307-315, override footgun included)."""
    cond_key = "cond" if class_cond else "uncond"
    info = DIFFUSION_LOOKUP[cond_key][image_size]
    flags = dict(info["model_flags"])
    if flag_overrides:
        flags.update({k: v for k, v in flag_overrides.items() if v is not None})
    cfg = UNetConfig.from_flags(flags)

    if mode == "random":
        if os.environ.get("CGD_TPU_DEBUG_TINY"):
            # CPU-smoke escape hatch: full pipeline, toy-size model
            import dataclasses

            cfg = dataclasses.replace(
                cfg, model_channels=32, num_res_blocks=1,
                channel_mult=(1, 2), attention_ds=(2,), num_head_channels=16,
                num_heads=1,
            )
        return _host_init(lambda: init_unet(jax.random.PRNGKey(0), cfg)), cfg, flags

    pt_path = os.path.join(checkpoints_dir, info["filename"])
    npz_path = _converted_path(pt_path)
    template = jax.eval_shape(lambda: init_unet(jax.random.PRNGKey(0), cfg))
    if os.path.exists(npz_path):
        params = jax.device_put(load_pytree_like(npz_path, _materialize(template)))
        return params, cfg, flags
    if not os.path.exists(pt_path):
        download(info["url"], info["filename"], checkpoints_dir)
    from cgd_tpu.convert.torch_unet import convert_unet_checkpoint

    params = convert_unet_checkpoint(pt_path, cfg)
    save_pytree(npz_path, params)
    return jax.device_put(params), cfg, flags


def resolve_clip(
    model_name: str,
    checkpoints_dir: str = CACHE_PATH,
    mode: str = "auto",
) -> Tuple[dict, CLIPConfig]:
    if model_name.endswith((".pt", ".pth")):
        # custom local checkpoint (reference contract: cgd/script_util.py:50-53)
        return _resolve_custom_clip(model_name)
    cfg = CLIP_CONFIGS.get(model_name)
    if cfg is None:
        raise ValueError(
            f"Unknown CLIP model {model_name!r}; known: {sorted(CLIP_CONFIGS)} "
            "or a local .pt/.pth checkpoint path"
        )
    if mode == "random":
        if os.environ.get("CGD_TPU_DEBUG_TINY"):
            import dataclasses

            from cgd_tpu.models.clip.configs import TextConfig, VisionViTConfig

            cfg = dataclasses.replace(
                cfg,
                vision=VisionViTConfig(cfg.input_resolution, 32, 64, 2, 2),
                text=TextConfig(width=64, heads=2, layers=2),
                embed_dim=64,
            )
        return _host_init(lambda: init_clip(jax.random.PRNGKey(0), cfg)), cfg

    clip_dir = os.path.join(checkpoints_dir, "clip")
    filename = model_name.replace("/", "-") + ".pt"
    pt_path = os.path.join(clip_dir, filename)
    npz_path = _converted_path(pt_path)
    template = jax.eval_shape(lambda: init_clip(jax.random.PRNGKey(0), cfg))
    if os.path.exists(npz_path):
        return jax.device_put(load_pytree_like(npz_path, _materialize(template))), cfg
    if not os.path.exists(pt_path):
        download(CLIP_MODEL_URLS[model_name], filename, clip_dir)
    from cgd_tpu.convert.torch_clip import convert_clip_checkpoint

    params = convert_clip_checkpoint(pt_path, cfg)
    save_pytree(npz_path, params)
    return jax.device_put(params), cfg


def _resolve_custom_clip(pt_path: str):
    if not os.path.exists(pt_path):
        raise FileNotFoundError(pt_path)
    npz_path = _converted_path(pt_path)
    from cgd_tpu.convert.clip_config_infer import infer_clip_config
    from cgd_tpu.convert.torch_clip import convert_state_dict, load_torch_clip_sd

    sd = load_torch_clip_sd(pt_path)
    cfg = infer_clip_config(sd, name=os.path.basename(pt_path))
    if os.path.exists(npz_path):
        template = jax.eval_shape(lambda: init_clip(jax.random.PRNGKey(0), cfg))
        return jax.device_put(load_pytree_like(npz_path, template)), cfg
    params = convert_state_dict(sd, cfg)
    save_pytree(npz_path, params)
    return jax.device_put(params), cfg


def resolve_lpips(checkpoints_dir: str = CACHE_PATH, mode: str = "auto"):
    if mode == "random":
        return _host_init(lambda: init_vgg_lpips(jax.random.PRNGKey(0)))
    npz_path = os.path.join(checkpoints_dir, "lpips_vgg.npz.cgd")
    template = jax.eval_shape(lambda: init_vgg_lpips(jax.random.PRNGKey(0)))
    if os.path.exists(npz_path):
        return jax.device_put(load_pytree_like(npz_path, _materialize(template)))
    from cgd_tpu.convert.torch_lpips import convert_lpips

    params = convert_lpips()
    save_pytree(npz_path, params)
    return jax.device_put(params)


def _materialize(shape_tree):
    """eval_shape gives ShapeDtypeStructs; loader only needs .shape, but
    scalar leaves (python ints) survive eval_shape as-is."""
    return shape_tree
