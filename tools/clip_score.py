#!/usr/bin/env python
"""CLIP-score harness: score generated images against their prompts.

BASELINE.md's quality metric is "CLIP-score parity with the PyTorch
reference". This tool computes mean CLIP similarity (100 * cosine) between
images and a prompt using this framework's CLIP with converted OpenAI
weights — the same protocol works on reference outputs, so parity is a
two-run comparison:

    python tools/clip_score.py --prompt "..." ref_out/*.png   # torch run
    python tools/clip_score.py --prompt "..." tpu_out/*.png   # ours

Requires the CLIP checkpoint (downloaded/converted on first use). Scores are
computed with center-crop-to-square + resize to the tower's resolution.
"""

import argparse
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("images", nargs="+", help="image files to score")
    ap.add_argument("--prompt", required=True)
    ap.add_argument("--clip", default="ViT-B/32")
    ap.add_argument("--weights-mode", default="auto", choices=["auto", "random"])
    args = ap.parse_args()

    import os

    import jax

    if os.environ.get("CGD_TPU_FORCE_CPU"):
        # JAX_PLATFORMS in the env is ignored when sitecustomize registers
        # the axon plugin at interpreter start (CLAUDE.md); this wins.
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from cgd_tpu.models.clip import encode_image, encode_text
    from cgd_tpu.models.clip.configs import CLIP_MEAN, CLIP_STD
    from cgd_tpu.utils.compile_cache import enable_compile_cache
    from cgd_tpu.weights import resolve_clip

    enable_compile_cache()
    params, cfg = resolve_clip(args.clip, mode=args.weights_mode)
    res = cfg.input_resolution

    if args.weights_mode == "random":
        from cgd_tpu.api import _FallbackTokenizer

        tokens = _FallbackTokenizer(cfg.text.vocab_size).tokenize([args.prompt])
    else:
        from cgd_tpu.models.clip.tokenizer import get_tokenizer

        tokens = get_tokenizer().tokenize([args.prompt], cfg.text.context_length, truncate=True)

    tfeat = np.asarray(jax.jit(lambda p, t: encode_text(p, cfg, t))(params, jnp.asarray(tokens)))
    tfeat = tfeat / np.linalg.norm(tfeat, axis=-1, keepdims=True)

    ims = []
    for path in args.images:
        im = Image.open(path).convert("RGB")
        side = min(im.size)
        left, top = (im.size[0] - side) // 2, (im.size[1] - side) // 2
        im = im.crop((left, top, left + side, top + side)).resize((res, res), Image.BICUBIC)
        arr = np.asarray(im, np.float32) / 255.0
        ims.append((arr - np.asarray(CLIP_MEAN, np.float32)) / np.asarray(CLIP_STD, np.float32))
    batch = jnp.asarray(np.stack(ims))

    ifeat = np.asarray(jax.jit(lambda p, x: encode_image(p, cfg, x))(params, batch))
    ifeat = ifeat / np.linalg.norm(ifeat, axis=-1, keepdims=True)
    scores = 100.0 * (ifeat @ tfeat.T)[:, 0]

    for path, s in zip(args.images, scores):
        print(f"{s:7.3f}  {path}", file=sys.stderr)
    print(json.dumps({
        "prompt": args.prompt, "clip_model": args.clip, "n": len(scores),
        "mean_clip_score": float(np.mean(scores)), "std": float(np.std(scores)),
    }))


if __name__ == "__main__":
    main()
