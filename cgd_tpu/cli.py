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
                   help="text prompt(s), '|'-separated, each optionally 'text:weight' (negative weights penalize), e.g. 'a forest:0.7|blurry:-0.4'")
    p.add_argument("--image_prompts", "-imgs", type=str, default="",
                   help="image prompt(s), '|'-separated paths/URLs, each optionally 'path:weight'")
    p.add_argument("--image_size", "-size", type=int, default=128,
                   help="output resolution; a checkpoint exists for each of 64, 128, 256, 512")
    p.add_argument("--init_image", "-init", type=str, default="",
                   help="start from this image (noised to the skip point) instead of pure noise")
    p.add_argument("--init_scale", "-is", type=int, default=0,
                   help="weight of the VGG/LPIPS perceptual loss pulling samples toward --init_image")
    p.add_argument("--skip_timesteps", "-skip", type=int, default=0,
                   help="how many leading diffusion steps to skip (used with --init_image)")
    p.add_argument("--prefix", "-dir", default="outputs", type=Path, help="output directory")
    p.add_argument("--checkpoints_dir", "-ckpts", default=CACHE_PATH, type=Path,
                   help="directory where model checkpoints are cached")
    p.add_argument("--batch_size", "-bs", type=int, default=1, help="number of images to sample at once")
    p.add_argument("--clip_guidance_scale", "-cgs", type=float, default=1000,
                   help="strength of the CLIP prompt-matching guidance")
    p.add_argument("--tv_scale", "-tvs", type=float, default=150.0,
                   help="total-variation loss weight (higher = smoother output)")
    p.add_argument("--range_scale", "-rs", type=float, default=50.0,
                   help="range loss weight penalizing pixels outside [-1, 1]")
    p.add_argument("--sat_scale", "-sats", type=float, default=0.0,
                   help="saturation loss weight (mostly useful with ddim respacing)")
    p.add_argument("--seed", "-seed", type=int, default=0, help="PRNG seed for reproducible runs")
    p.add_argument("--save_frequency", "-freq", type=int, default=1, help="write a frame every N steps")
    p.add_argument("--diffusion_steps", "-steps", type=int, default=1000, help="length of the full (pre-respacing) diffusion schedule")
    p.add_argument("--timestep_respacing", "-respace", type=str, default="1000",
                   help="respaced schedule: a step count, 'ddimN', or comma sections")
    p.add_argument("--num_cutouts", "-cutn", type=int, default=16,
                   help="number of random crops CLIP scores per guided step")
    p.add_argument("--cutout_power", "-cutpow", type=float, default=1.0, help="exponent skewing the random crop size distribution")
    p.add_argument("--clip_model", "-clip", type=str, default="ViT-B/32",
                   help=f"clip model name. Should be one of: {CLIP_MODEL_NAMES}")
    p.add_argument("--uncond", "-uncond", action="store_true",
                   help="use the unconditional checkpoints (256px OpenAI / 512px finetune) instead of class-conditional")
    p.add_argument("--noise_schedule", "-sched", default="linear", type=str,
                   help="beta schedule: 'linear' or 'cosine' (note: overrides the checkpoint default)")
    p.add_argument("--dropout", "-drop", default=0.0, type=float, help="UNet dropout rate")
    p.add_argument("--device", "-dev", default="", type=str,
                   help="(accepted for reference compatibility; JAX picks the backend)")
    p.add_argument("--wandb_project", "-proj", default=None,
                   help="log the run to this Weights & Biases project")
    p.add_argument("--wandb_entity", "-ent", default=None,
                   help="W&B team/entity owning the project")
    p.add_argument("--height_offset", "-ht", default=0, type=int, help="extra output height (multiple of the UNet downsample factor)")
    p.add_argument("--width_offset", "-wd", default=0, type=int, help="extra output width (multiple of the UNet downsample factor)")
    p.add_argument("--use_augs", "-augs", action="store_true",
                   help="apply flip/affine/perspective/grayscale augs to guidance cutouts")
    p.add_argument("--use_magnitude", "-mag", action="store_true",
                   help="RMS-clamp the guidance gradient (auto-enabled at 64px)")
    p.add_argument("--quiet", "-q", action="store_true", help="suppress progress output")
    p.add_argument("--save-as-gif", "-gif", action="store_true",
                   help="mux saved frames into a GIF with ffmpeg, then delete the frames")
    p.add_argument("--save-as-video", "-mp4", action="store_true",
                   help="mux saved frames into an MP4 with ffmpeg, then delete the frames")
    p.add_argument("--reduce-clip", "-reduce", action="store_true",
                   help="stage CLIP guidance (skip 20%%, every 4th step to 70%%) to generate faster")
    p.add_argument("--progressive-cutout", "-cutn_skip", action="store_true",
                   help="ramp the cutout count (cutn/4 -> cutn/2 -> cutn) across the schedule")
    p.add_argument("--cached-cutouts", "-cached_cutn", action="store_true",
                   help="sample cutout coordinates once and reuse them every step")
    # --- TPU-framework extras ---
    p.add_argument("--weights-mode", default="auto", choices=["auto", "random"],
                   help="'auto' downloads+converts checkpoints; 'random' uses random init (dev/bench)")
    p.add_argument("--mesh", default=None, type=str, metavar="SPEC",
                   help="shard the run across every visible TPU chip: 'auto' "
                        "(all devices; no-op on one device), 'data=N' (N-way "
                        "batch parallelism, the rest shard cutouts + UNet "
                        "height), 'cut=M', or 'data=N,cut=M'. Weights are "
                        "replicated; the guidance gradient is all-reduced "
                        "over ICI (see cgd_tpu/parallel/mesh.py)")
    p.add_argument("--compute-dtype", default="bfloat16", choices=["bfloat16", "float32"],
                   help="activation dtype on the MXU")
    p.add_argument("--profile", default=None, type=str,
                   help="write a jax.profiler trace to this directory")
    p.add_argument("--log-losses", action="store_true",
                   help="print per-step guidance loss lines (costs a host sync per step)")
    p.add_argument("--fast-guidance", action="store_true",
                   help="guide on a detached denoised prediction (classic pre-fork CLIP "
                        "guidance; skips the UNet backward, ~45%% faster steps). NOT "
                        "reference semantics — quality differs from the default")
    p.add_argument("--dpm-solver", dest="dpm_solver", action="store_true",
                   help="use the DPM-Solver++(2M) second-order multistep update instead of "
                        "DDIM/ancestral: comparable quality at ~4-5x fewer respaced steps "
                        "(try ddim50 budgets). Deterministic. Beyond the reference — "
                        "NOT reference semantics")
    p.add_argument("--checkpoint", default=None, type=str, metavar="PATH",
                   help="save resumable sampling state (atomic npz) after every "
                        "scan segment; continue an interrupted run with --resume")
    p.add_argument("--resume", default=None, type=str, metavar="PATH",
                   help="resume sampling from a --checkpoint file (bit-exact "
                        "continuation; the run flags must match the original)")
    p.add_argument("--stall-timeout", default=0.0, type=float, metavar="SECONDS",
                   help="fail instead of hanging forever if the device backend stops "
                        "responding: exit with code 117 (and write <prefix>/stall_report.json) "
                        "when no progress happens for SECONDS. Set it above the worst "
                        "expected compile time (cold segment compiles can take minutes "
                        "on remote backends). 0 disables. Pairs with --checkpoint/--resume "
                        "so a supervisor can restart the run where it stalled")
    p.add_argument("--no-strict-parity", dest="strict_parity", action="store_false",
                   help="fix reference quirks instead of replicating them: always save "
                        "the final frame even with skip>0, CLIP-normalize image prompts, "
                        "resize init images to the offset (non-square) shape")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    _class_cond = not args.uncond
    prefix_path = args.prefix
    Path(prefix_path).mkdir(exist_ok=True)

    prompts = args.prompts.split("|") if len(args.prompts) > 0 else []
    image_prompts = args.image_prompts.split("|") if len(args.image_prompts) > 0 else []

    from cgd_tpu.api import clip_guided_diffusion

    mesh = None
    if args.mesh:
        from cgd_tpu.parallel.mesh import mesh_from_spec

        mesh = mesh_from_spec(args.mesh)
        if mesh is None and not args.quiet:
            print("--mesh auto: one device visible; running single-chip")

    profile_ctx = None
    if args.profile:
        import jax

        jax.profiler.start_trace(args.profile)
        profile_ctx = args.profile

    from cgd_tpu.utils.watchdog import StallDetector

    stall_dog = StallDetector(
        args.stall_timeout,
        exit_on_stall=True,
        report_path=str(Path(prefix_path) / "stall_report.json"),
    )

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
        mesh=mesh,
        async_frames=True,  # CLI reads frames only after the loop (ffmpeg)
        log_losses=args.log_losses,
        strict_parity=args.strict_parity,
        fast_guidance=args.fast_guidance,
        dpm_solver=args.dpm_solver,
        checkpoint_path=args.checkpoint,
        resume_from=args.resume,
        stall_pet=stall_dog.pet,
    )
    with stall_dog:
        list(enumerate(cgd_generator))  # drain the generator

    if profile_ctx:
        import jax

        jax.profiler.stop_trace()
        print(f"Profile trace written to {profile_ctx}")

    from cgd_tpu.io_utils.images import clean_and_combine_prompts
    from cgd_tpu.io_utils.video import create_gif_ffmpeg, create_video_ffmpeg

    # The reference deletes frames even when the mux fails (cgd/cgd.py:415-430
    # deletes unconditionally after create_*_ffmpeg) — that loses every output
    # on a box without ffmpeg, so deletion here additionally requires that all
    # requested muxes actually produced a file.
    delete_frames = args.save_as_gif or args.save_as_video
    for batch_idx in range(args.batch_size):
        muxed = []
        if args.save_as_gif:
            muxed.append(create_gif_ffmpeg(prefix_path, prompts, batch_idx, delete_frames=False))
        if args.save_as_video:
            muxed.append(create_video_ffmpeg(prefix_path, prompts, batch_idx, delete_frames=False))
        if delete_frames and all(m is not None for m in muxed):
            io_safe_prompts = clean_and_combine_prompts(prefix_path, prompts, batch_idx)
            image_files = sorted(glob.glob(f"{io_safe_prompts}/*.png"))
            for f in image_files:
                Path(f).unlink()
            if Path(io_safe_prompts).is_dir() and not list(Path(io_safe_prompts).iterdir()):
                Path(io_safe_prompts).rmdir()
            print(f"Deleted {len(image_files)} frame(s)")


if __name__ == "__main__":
    main()
