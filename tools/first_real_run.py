#!/usr/bin/env python
"""First-real-network-contact runbook (VERDICT r2 #9).

This environment has zero egress, so real checkpoints have never touched the
converters and the BASELINE "CLIP-score parity" metric is unmeasured. On the
first network-capable box, run:

    python tools/first_real_run.py              # full protocol
    python tools/first_real_run.py --dry-run    # wiring check, no network

Protocol (each phase prints PASS/FAIL and the script exits non-zero on the
first failure):

1. download + convert the 64px class-cond ADM checkpoint, ViT-B/32 CLIP,
   and the LPIPS VGG16 weights (resolve_unet / resolve_clip / resolve_lpips
   "auto" paths: download -> torch(.jit).load -> convert -> .npz.cgd cache),
   with strict parameter-count accounting;
2. re-resolve to prove the convert-once cache hits;
3. run BASELINE acceptance config 1 (64px, cosine, ddim25, ViT-B/32, one
   prompt, batch 1) end-to-end through the public API;
4. CLIP-score the output frames (tools/clip_score.py protocol) and write
   the one-sided parity table to first_real_run_report.json — the
   reference-side column comes from running the SAME clip_score command on
   a torch-reference output directory (two-run protocol, see
   tools/clip_score.py docstring);
5. print the PERF.md-ready table row.

Offline `--dry-run` swaps weights_mode="random" + tiny debug models in but
exercises every other line, so the runbook cannot rot silently; it runs in
the test suite (tests/test_io_misc.py::test_first_real_run_dry).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

PROMPT = "an impressionist painting of a lighthouse at dawn"


def _count_params(tree):
    import numpy as np

    total = 0
    for leaf in __import__("jax").tree.leaves(tree):
        total += int(np.prod(np.shape(leaf))) if np.ndim(leaf) else 1
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dry-run", action="store_true",
                    help="no network: random tiny weights, same code paths")
    ap.add_argument("--out", default="./first_real_run_out")
    ap.add_argument("--checkpoints-dir", default=None)
    args = ap.parse_args()

    import jax

    if os.environ.get("CGD_TPU_FORCE_CPU"):
        # JAX_PLATFORMS in the env is ignored when sitecustomize registers
        # the axon plugin at interpreter start (CLAUDE.md); this wins.
        jax.config.update("jax_platforms", "cpu")

    from cgd_tpu.io_utils.download import CACHE_PATH
    from cgd_tpu.utils.compile_cache import enable_compile_cache
    from cgd_tpu.weights import resolve_clip, resolve_unet

    enable_compile_cache()
    ckpt_dir = args.checkpoints_dir or CACHE_PATH
    mode = "random" if args.dry_run else "auto"
    if args.dry_run:
        os.environ.setdefault("CGD_TPU_DEBUG_TINY", "1")
    report = {"mode": mode, "backend": jax.default_backend(), "phases": {}}

    def phase(name):
        print(f"\n=== {name} ===", flush=True)
        report["phases"][name] = {"t0": time.time()}

    def done(name, **extra):
        report["phases"][name]["seconds"] = round(
            time.time() - report["phases"][name].pop("t0"), 1
        )
        report["phases"][name].update(extra)
        print(f"PASS: {name} {extra}", flush=True)

    # --- 1. download + convert, with parameter accounting ------------------
    phase("resolve_unet_64")
    t0 = time.time()
    unet_params, unet_cfg, flags = resolve_unet(64, True, ckpt_dir, mode)
    n_unet = _count_params(unet_params)
    # the real 64px ADM checkpoint: ~270M parameters. Strict accounting:
    # the converter already raises on missing/extra keys; here we assert
    # the magnitude so a silently-truncated download also fails.
    if not args.dry_run:
        assert n_unet > 2e8, f"64px UNet parameter count suspicious: {n_unet}"
    done("resolve_unet_64", params=n_unet, schedule=flags.get("noise_schedule"))

    phase("resolve_clip_vit_b32")
    clip_params, clip_cfg = resolve_clip("ViT-B/32", ckpt_dir, mode)
    n_clip = _count_params(clip_params)
    if not args.dry_run:
        assert n_clip > 1e8, f"ViT-B/32 parameter count suspicious: {n_clip}"
    done("resolve_clip_vit_b32", params=n_clip)

    phase("resolve_lpips_vgg")
    from cgd_tpu.weights import resolve_lpips

    lpips_params = resolve_lpips(ckpt_dir, mode)
    n_lpips = _count_params(lpips_params)
    if not args.dry_run:
        # torchvision VGG16 features + lpips v0.1 heads: ~14.7M parameters
        assert n_lpips > 1.4e7, f"LPIPS parameter count suspicious: {n_lpips}"
    done("resolve_lpips_vgg", params=n_lpips)

    # --- 2. convert-once cache must hit on re-resolve ----------------------
    phase("cache_hit")
    if args.dry_run:
        done("cache_hit", skipped="random mode has no cache files")
    else:
        t0 = time.time()
        resolve_unet(64, True, ckpt_dir, mode)
        resolve_clip("ViT-B/32", ckpt_dir, mode)
        resolve_lpips(ckpt_dir, mode)
        dt = time.time() - t0
        from cgd_tpu.weights import _converted_path
        from cgd_tpu.registry import DIFFUSION_LOOKUP

        npz = _converted_path(
            os.path.join(ckpt_dir, DIFFUSION_LOOKUP["cond"][64]["filename"])
        )
        assert os.path.exists(npz), f"convert-once cache missing: {npz}"
        done("cache_hit", reload_seconds=round(dt, 1))

    # --- 3. BASELINE acceptance config 1 -----------------------------------
    phase("acceptance_config_1")
    from cgd_tpu.api import clip_guided_diffusion

    frames = []
    for _b, path in clip_guided_diffusion(
        prompts=[PROMPT],
        image_size=64,
        timestep_respacing="ddim25",
        clip_model_name="ViT-B/32",
        num_cutouts=16 if not args.dry_run else 2,
        batch_size=1,
        save_frequency=5,
        seed=7,
        checkpoints_dir=ckpt_dir,
        prefix_path=args.out,
        weights_mode=mode,
        progress=False,
    ):
        frames.append(path)
    assert frames, "config 1 produced no frames"
    done("acceptance_config_1", frames=len(frames), last=frames[-1])

    # --- 4. CLIP-score the outputs (one side of the two-run protocol) ------
    phase("clip_score")
    import subprocess

    cmd = [
        sys.executable, os.path.join(os.path.dirname(__file__), "clip_score.py"),
        "--prompt", PROMPT, "--weights-mode", mode, frames[-1],
    ]
    env = dict(os.environ)
    if args.dry_run and jax.default_backend() == "cpu":
        env["CGD_TPU_FORCE_CPU"] = "1"  # keep the subprocess off the tunnel
    res = subprocess.run(cmd, capture_output=True, text=True, env=env)
    assert res.returncode == 0, res.stderr[-2000:]
    score = json.loads(res.stdout.strip().splitlines()[-1])
    done("clip_score", **score)

    # --- 5. report ----------------------------------------------------------
    report["parity_table"] = {
        "config": "BASELINE config 1 (64px cosine ddim25 ViT-B/32)",
        "prompt": PROMPT,
        "cgd_tpu_clip_score": score,
        "torch_reference_clip_score": (
            "RUN: python tools/clip_score.py --prompt '...' <reference_out>/*.png "
            "after generating with the torch reference at the same config/seed"
        ),
    }
    out_json = os.path.join(args.out, "first_real_run_report.json")
    os.makedirs(args.out, exist_ok=True)
    with open(out_json, "w") as f:
        json.dump(report, f, indent=2)
    print(f"\nreport: {out_json}")
    print(json.dumps(report["parity_table"], indent=2))


if __name__ == "__main__":
    main()
