"""Deliberate compile-cache warming for serving cold-start.

A fresh host's first generation pays the full remote compile (measured
~4.5 min for the 256px ddim250 guided graphs on the tunneled v5e — PERF.md
cold-start section). Warming runs the REAL generator once per operating
point with random weights so every segment graph lands in the persistent
XLA cache (utils/compile_cache.py); later processes — and the daemon's own
first request — start warm.

Random weights are sufficient: weights are jit *arguments* in this
framework (never closure constants — CLAUDE.md trap #2), so the compiled
HLO and therefore the cache key are identical between random and converted
weights of the same architecture. No network, no checkpoints needed.

Used by ``tools/warm_cache.py`` (standalone) and ``python -m cgd_tpu.serve
--warmup`` (daemon warms before binding the port). The reference has no
analog — its `load_guided_diffusion` (cgd/script_util.py:317) recompiles
nothing but re-pays full model load per process.
"""

from __future__ import annotations

import sys
import tempfile
import time
from typing import Iterable, Optional, Sequence, Tuple

Spec = Tuple[int, str, int]  # (size, respacing, cutn)


def parse_spec(spec: str) -> Spec:
    """SIZE:RESPACE[:CUTN] (cutn defaults to 16, the reference default)."""
    parts = spec.split(":")
    if len(parts) not in (2, 3):
        raise ValueError(f"bad warmup spec {spec!r}: expected SIZE:RESPACE[:CUTN]")
    return int(parts[0]), parts[1], int(parts[2]) if len(parts) == 3 else 16


def warm_operating_points(
    specs: Iterable[Spec],
    save_frequency,
    batch_size: int = 1,
    clip_model_name: str = "ViT-B/32",
    class_cond: bool = True,
    mesh=None,
    stall_pet=None,
    log=None,
) -> None:
    """Compile (and cache) every graph of each operating point by running
    the real generator end-to-end with random weights.

    ``save_frequency`` matters: segment LENGTHS are part of the compiled
    graphs, so warm with the segmentation your deployment will use (CLI
    default 1, API default 25, serve.py FINAL_FRAME_ONLY)."""
    from cgd_tpu.api import clip_guided_diffusion

    if log is None:
        def log(*a):
            print(*a, file=sys.stderr, flush=True)

    for size, respace, cutn in specs:
        t0 = time.time()
        log(f"warming {size}px {respace} cutn={cutn} batch={batch_size} "
            f"save_frequency={save_frequency} ...")
        with tempfile.TemporaryDirectory() as td:
            gen = clip_guided_diffusion(
                prompts=["cache warmup"],
                image_size=size,
                timestep_respacing=respace,
                num_cutouts=cutn,
                batch_size=batch_size,
                class_cond=class_cond,
                clip_model_name=clip_model_name,
                save_frequency=save_frequency,
                weights_mode="random",
                prefix_path=td,
                progress=False,
                mesh=mesh,
                stall_pet=stall_pet,
            )
            n = sum(1 for _ in gen)
        log(f"  warmed in {time.time() - t0:.1f}s ({n} frame yields; graphs cached)")
