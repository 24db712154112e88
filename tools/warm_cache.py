#!/usr/bin/env python
"""Pre-warm the persistent XLA compile cache for standard operating points.

A fresh serving host's first request pays the full cold compile (measured
~4.5 min for the 256px ddim250 guided graphs on the tunneled v5e backend —
PERF.md cold-start section). This tool runs the REAL generator once per
requested config with random weights so every segment graph lands in the
persistent cache (utils/compile_cache.py); later processes start warm.

Weights are jit *arguments* in this framework (never closure constants —
CLAUDE.md trap #2), so the compiled HLO — and therefore the cache key — is
identical between random and converted weights of the same architecture:
warming with random weights needs no network and no checkpoints.

Usage:
    python tools/warm_cache.py                         # 256px ddim250 cutn16
    python tools/warm_cache.py --spec 512:1000 --spec 64:ddim25:8
    python tools/warm_cache.py --save-frequency serve  # serve.py's
        final-frame-only segmentation (default 25 = the API default; the
        segment LENGTHS are part of the compiled graphs, so warm with the
        save_frequency your deployment will use: CLI default is 1,
        serve.py saves only the final frame)

Each --spec is SIZE:RESPACE[:CUTN] (cutn defaults to 16, the reference
default operating point).
"""

import argparse
import sys


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--spec", action="append", default=None, metavar="SIZE:RESPACE[:CUTN]",
                    help="operating point(s) to warm; repeatable. "
                         "Default: 256:ddim250:16 (the headline)")
    ap.add_argument("--save-frequency", default="25",
                    help="'serve' for serve.py's final-frame-only segmentation, "
                         "or an integer (CLI default is 1; API default 25)")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--clip", default="ViT-B/32")
    ap.add_argument("--uncond", action="store_true",
                    help="warm the unconditional checkpoints' graphs instead")
    args = ap.parse_args()

    from cgd_tpu.warmup import parse_spec, warm_operating_points

    specs = [parse_spec(s) for s in (args.spec or ["256:ddim250:16"])]
    if args.save_frequency == "serve":
        from cgd_tpu.validate import FINAL_FRAME_ONLY

        save_frequency = FINAL_FRAME_ONLY
    else:
        save_frequency = int(args.save_frequency)

    from cgd_tpu.utils.compile_cache import cache_dir, enable_compile_cache

    enable_compile_cache()
    log(f"persistent cache: {cache_dir()}")

    warm_operating_points(
        specs, save_frequency, batch_size=args.batch,
        clip_model_name=args.clip, class_cond=not args.uncond, log=log,
    )
    log("cache warm. Subsequent processes compile from cache "
        "(measured numbers: PERF.md cold-start section).")


if __name__ == "__main__":
    main()
