"""`cgd` CLI — flag-compatible with the reference driver (cgd/cgd.py:286-434),
plus TPU-framework extras (--weights-mode, --compute-dtype, --profile)."""

from __future__ import annotations

import argparse
import glob
from pathlib import Path

from cgd_tpu.io_utils.download import CACHE_PATH
from cgd_tpu.registry import CLIP_MODEL_NAMES


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    p.add_argument("--prompts", "-txts", type=str, default="",
                   help="the prompt/s to reward paired with weights. e.g. 'My text:0.5|Other text:-0.5'")
    p.add_argument("--image_prompts", "-imgs", type=str, default="",
                   help="the image prompt/s to reward paired with weights. e.g. 'img1.png:0.5,img2.png:-0.5'")
    p.add_argument("--image_size", "-size", type=int, default=128,
                   help="Diffusion image size. Must be one of [64, 128, 256, 512].")
    p.add_argument("--init_image", "-init", type=str, default="",
                   help="Blend an image with diffusion for n steps")
    p.add_argument("--init_scale", "-is", type=int, default=0,
                   help="(optional) Perceptual loss scale for init image.")
    p.add_argument("--skip_timesteps", "-skip", type=int, default=0,
                   help="Number of timesteps to blend image for. CLIP guidance occurs after this.")
    p.add_argument("--prefix", "-dir", default="outputs", type=Path, help="output directory")
    p.add_argument("--checkpoints_dir", "-ckpts", default=CACHE_PATH, type=Path,
                   help="Path subdirectory containing checkpoints.")
    p.add_argument("--batch_size", "-bs", type=int, default=1, help="the batch size")
    p.add_argument("--clip_guidance_scale", "-cgs", type=float, default=1000,
                   help="Scale for CLIP spherical distance loss.")
    p.add_argument("--tv_scale", "-tvs", type=float, default=150.0,
                   help="Controls the smoothness of the final output.")
    p.add_argument("--range_scale", "-rs", type=float, default=50.0,
                   help="Controls how far out of RGB range values may get.")
    p.add_argument("--sat_scale", "-sats", type=float, default=0.0,
                   help="Controls how much saturation is allowed. Used for ddim.")
    p.add_argument("--seed", "-seed", type=int, default=0, help="Random number seed")
    p.add_argument("--save_frequency", "-freq", type=int, default=1, help="Save frequency")
    p.add_argument("--diffusion_steps", "-steps", type=int, default=1000, help="Diffusion steps")
    p.add_argument("--timestep_respacing", "-respace", type=str, default="1000",
                   help="Timestep respacing")
    p.add_argument("--num_cutouts", "-cutn", type=int, default=16,
                   help="Number of randomly cut patches to distort from diffusion.")
    p.add_argument("--cutout_power", "-cutpow", type=float, default=1.0, help="Cutout size power")
    p.add_argument("--clip_model", "-clip", type=str, default="ViT-B/32",
                   help=f"clip model name. Should be one of: {CLIP_MODEL_NAMES}")
    p.add_argument("--uncond", "-uncond", action="store_true",
                   help="Use finetuned unconditional checkpoints (256px OpenAI, 512px Crowson)")
    p.add_argument("--noise_schedule", "-sched", default="linear", type=str,
                   help="Specify noise schedule. Either 'linear' or 'cosine'.")
    p.add_argument("--dropout", "-drop", default=0.0, type=float, help="Amount of dropout to apply.")
    p.add_argument("--device", "-dev", default="", type=str,
                   help="(accepted for reference compatibility; JAX picks the backend)")
    p.add_argument("--wandb_project", "-proj", default=None,
                   help="Name W&B will use when saving results.")
    p.add_argument("--wandb_entity", "-ent", default=None,
                   help="(optional) Name of W&B team/entity to log to.")
    p.add_argument("--height_offset", "-ht", default=0, type=int, help="Height offset for image")
    p.add_argument("--width_offset", "-wd", default=0, type=int, help="Width offset for image")
    p.add_argument("--use_augs", "-augs", action="store_true",
                   help="Uses augmentations in the guidance cutouts")
    p.add_argument("--use_magnitude", "-mag", action="store_true",
                   help="Uses magnitude of the gradient")
    p.add_argument("--quiet", "-q", action="store_true", help="Suppress output.")
    p.add_argument("--save-as-gif", "-gif", action="store_true",
                   help="Save output as high-quality GIF using ffmpeg. Deletes individual frames.")
    p.add_argument("--save-as-video", "-mp4", action="store_true",
                   help="Save output as high-quality MP4 video using ffmpeg. Deletes individual frames.")
    p.add_argument("--reduce-clip", "-reduce", action="store_true",
                   help="Reduce CLIP guidance frequency for faster generation.")
    p.add_argument("--progressive-cutout", "-cutn_skip", action="store_true",
                   help="Use fewer cutouts in early steps (4->8->16) for faster generation.")
    p.add_argument("--cached-cutouts", "-cached_cutn", action="store_true",
                   help="Cache cutout coordinates for reuse across steps.")
    # --- TPU-framework extras ---
    p.add_argument("--weights-mode", default="auto", choices=["auto", "random"],
                   help="'auto' downloads+converts checkpoints; 'random' uses random init (dev/bench)")
    p.add_argument("--compute-dtype", default="bfloat16", choices=["bfloat16", "float32"],
                   help="activation dtype on the MXU")
    p.add_argument("--profile", default=None, type=str,
                   help="write a jax.profiler trace to this directory")
    p.add_argument("--log-losses", action="store_true",
                   help="print per-step guidance loss lines (costs a host sync per step)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    _class_cond = not args.uncond
    prefix_path = args.prefix
    Path(prefix_path).mkdir(exist_ok=True)

    prompts = args.prompts.split("|") if len(args.prompts) > 0 else []
    image_prompts = args.image_prompts.split("|") if len(args.image_prompts) > 0 else []

    from cgd_tpu.api import clip_guided_diffusion

    profile_ctx = None
    if args.profile:
        import jax

        jax.profiler.start_trace(args.profile)
        profile_ctx = args.profile

    cgd_generator = clip_guided_diffusion(
        prompts=prompts,
        image_prompts=image_prompts,
        batch_size=args.batch_size,
        tv_scale=args.tv_scale,
        init_scale=args.init_scale,
        range_scale=args.range_scale,
        sat_scale=args.sat_scale,
        image_size=args.image_size,
        class_cond=_class_cond,
        randomize_class=_class_cond,
        save_frequency=args.save_frequency,
        clip_guidance_scale=args.clip_guidance_scale,
        cutout_power=args.cutout_power,
        num_cutouts=args.num_cutouts,
        timestep_respacing=args.timestep_respacing,
        seed=args.seed,
        diffusion_steps=args.diffusion_steps,
        skip_timesteps=args.skip_timesteps,
        init_image=args.init_image,
        checkpoints_dir=str(args.checkpoints_dir),
        clip_model_name=args.clip_model,
        noise_schedule=args.noise_schedule,
        dropout=args.dropout,
        device=args.device,
        prefix_path=prefix_path,
        wandb_project=args.wandb_project,
        wandb_entity=args.wandb_entity,
        use_augs=args.use_augs,
        use_magnitude=args.use_magnitude,
        height_offset=args.height_offset,
        width_offset=args.width_offset,
        progress=not args.quiet,
        reduce_clip=args.reduce_clip,
        progressive_cutout=args.progressive_cutout,
        cached_cutouts=args.cached_cutouts,
        weights_mode=args.weights_mode,
        compute_dtype=args.compute_dtype,
        async_frames=True,  # CLI reads frames only after the loop (ffmpeg)
        log_losses=args.log_losses,
    )
    list(enumerate(cgd_generator))  # drain the generator

    if profile_ctx:
        import jax

        jax.profiler.stop_trace()
        print(f"Profile trace written to {profile_ctx}")

    from cgd_tpu.io_utils.images import clean_and_combine_prompts
    from cgd_tpu.io_utils.video import create_gif_ffmpeg, create_video_ffmpeg

    delete_frames = args.save_as_gif or args.save_as_video
    for batch_idx in range(args.batch_size):
        if args.save_as_gif:
            create_gif_ffmpeg(prefix_path, prompts, batch_idx, delete_frames=False)
        if args.save_as_video:
            create_video_ffmpeg(prefix_path, prompts, batch_idx, delete_frames=False)
        if delete_frames:
            io_safe_prompts = clean_and_combine_prompts(prefix_path, prompts, batch_idx)
            image_files = sorted(glob.glob(f"{io_safe_prompts}/*.png"))
            for f in image_files:
                Path(f).unlink()
            if Path(io_safe_prompts).is_dir() and not list(Path(io_safe_prompts).iterdir()):
                Path(io_safe_prompts).rmdir()
            print(f"Deleted {len(image_files)} frame(s)")


if __name__ == "__main__":
    main()
