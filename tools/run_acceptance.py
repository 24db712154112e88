#!/usr/bin/env python
"""Run the BASELINE.md acceptance configs 2-5 end-to-end on the real TPU.

BASELINE.json "configs" (config 1, 64px ddim25 CPU-runnable, is exercised
continuously by the test suite and the CLAUDE.md smoke command):
  2. 128px ckpt, respace 250, ViT-B/16, weighted multi-prompt
  3. 256px ckpt, ddim250, init_image + skip 125 + VGG init_scale 1000
  4. 512px ckpt, respace 1000, RN50x16, cgs 1500 + tv 150
  5. 256px non-square (width_offset 32), --reduce-clip, MP4 export

Real checkpoints are unreachable from this box (no egress; verified
2026-08-16: DNS resolution fails for openaipublic.blob.core.windows.net),
so runs use --weights-mode random: the compiled graph, memory footprint and
wall-clock are identical to converted weights (same architectures and
shapes); only the pixels are meaningless. Each config runs as a fresh
process through the actual `cgd` CLI surface.

Writes one JSON line per config to --out (default /tmp/acceptance.jsonl)
and a human table to stdout.
"""

import argparse
import json
import subprocess
import sys
sys.path.insert(0, __file__.rsplit('/', 2)[0])
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def make_init_image(path: Path, size: int = 256) -> None:
    import numpy as np
    from PIL import Image

    # deterministic smooth gradient + blob: a plausible init image
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    r = np.exp(-(((xx - 0.5) ** 2 + (yy - 0.45) ** 2) / 0.06))
    img = np.stack(
        [0.2 + 0.6 * xx + 0.3 * r, 0.3 + 0.4 * yy + 0.2 * r, 0.5 + 0.4 * r], -1
    )
    Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(path)


CONFIGS = {
    "cfg2_128_multiprompt": dict(
        desc="128px respace 250, ViT-B/16, weighted multi-prompt",
        steps=250,
        argv=[
            "-txts", "an impressionist painting of a lighthouse at dawn:1.0"
                     "|oil on canvas:0.1|blurry:-0.1",
            "-size", "128", "-respace", "250", "-clip", "ViT-B/16",
            "-freq", "50",
        ],
    ),
    "cfg3_256_init_vgg": dict(
        desc="256px ddim250, init_image + skip 125 + VGG init_scale 1000",
        steps=125,
        init_image=True,
        argv=[
            "-txts", "a watercolor seascape",
            "-size", "256", "-respace", "ddim250",
            "-skip", "125", "-is", "1000", "-freq", "25",
        ],
    ),
    "cfg4_512_rn50x16": dict(
        desc="512px respace 1000, RN50x16, cgs 1500 tv 150",
        steps=1000,
        argv=[
            "-txts", "a detailed matte painting of a castle",
            "-size", "512", "-respace", "1000", "-clip", "RN50x16",
            "-cgs", "1500", "-tvs", "150", "-freq", "200",
        ],
    ),
    "cfg5_256_nonsquare_reduce_mp4": dict(
        desc="256px width_offset 32, --reduce-clip, MP4 export",
        steps=250,
        argv=[
            "-txts", "a panoramic photo of mountains",
            "-size", "256", "-respace", "ddim250", "-wd", "32",
            "-reduce", "-mp4", "-freq", "25",
        ],
    ),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", nargs="*", default=None, help="subset of config keys")
    ap.add_argument("--out", default="/tmp/acceptance.jsonl")
    ap.add_argument("--outdir", default="/tmp/acceptance_runs")
    args = ap.parse_args()

    outdir = Path(args.outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    init_path = outdir / "init_256.png"
    if not init_path.exists():
        make_init_image(init_path)

    results = []
    for key, cfg in CONFIGS.items():
        if args.only and key not in args.only:
            continue
        rundir = outdir / key
        rundir.mkdir(exist_ok=True)
        argv = [
            sys.executable, "-m", "cgd_tpu.cli",
            *cfg["argv"],
            "--weights-mode", "random", "-q",
            "-dir", str(rundir),
        ]
        if cfg.get("init_image"):
            argv += ["-init", str(init_path)]
        print(f"== {key}: {cfg['desc']}", flush=True)
        print("   " + " ".join(argv[2:]), flush=True)
        t0 = time.time()
        proc = subprocess.run(
            argv, cwd=REPO, capture_output=True, text=True, timeout=3600,
        )
        wall = time.time() - t0
        frames = sorted(str(p.relative_to(rundir)) for p in rundir.rglob("*.png"))
        videos = sorted(str(p.relative_to(rundir)) for p in rundir.rglob("*.mp4"))
        rec = {
            "config": key, "desc": cfg["desc"], "rc": proc.returncode,
            "wall_s": round(wall, 1), "steps": cfg["steps"],
            "s_per_step_incl_compile": round(wall / cfg["steps"], 3),
            "frames": len(frames), "videos": videos,
            "dir": str(rundir),
            "last_frame": frames[-1] if frames else None,
        }
        if proc.returncode != 0:
            rec["stderr_tail"] = proc.stderr[-2000:]
        print(json.dumps(rec), flush=True)
        results.append(rec)
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")

    print("\n| config | wall (s) | steps | frames | rc |")
    print("|---|---|---|---|---|")
    for r in results:
        print(f"| {r['config']} | {r['wall_s']} | {r['steps']} | {r['frames']} | {r['rc']} |")
    return 0 if all(r["rc"] == 0 for r in results) else 1


if __name__ == "__main__":
    sys.exit(main())
