"""Host trace/MLIR-lowering time per distinct segment signature (VERDICT r4 #6).

The warm-start floor decomposes as: per-process first-fetch claim handshake
(uncontrollable on the tunneled backend) + XLA compilation (removed by the
persistent compile cache) + host tracing/MLIR-lowering of the big scan
graphs (this tool's subject). ``jax.jit(seg_fn).lower(...)`` runs exactly
the trace+lower work the sampler pays per distinct segment signature and
stops BEFORE backend compilation, and abstract avals (jax.eval_shape param
templates, ShapeDtypeStruct inputs) make the measurement pure host work —
no weights materialized, no device touched, identical jaxprs to the
product's (tracing is shape-driven).

Segment signatures come from the product's own plan arithmetic
(sampler.build_step_plan + sampler.segment_plan), so the table can't drift
from what sample_loop actually traces. Cross-RUN reuse of these traces is
the api._SEG_CACHES path (zero re-trace for a repeat-config generation,
pinned by tests/test_api_cli.py::TestSegmentExecutableReuse); this tool
measures the first-run cost that cache cannot remove.
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--respace", default=None,
                    help="default: the size's headline (ddim250 at 256, ddim100 at 512)")
    ap.add_argument("--save-frequency", type=int, default=25,
                    help="API default 25 (CLI default is 1: every segment length 1)")
    ap.add_argument("--cutn", type=int, default=16)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--clip", default=None)
    ap.add_argument("--share", action="store_true",
                    help="jit the inner step once per (guided, cutn) so its "
                         "traced jaxpr is shared across signatures — measured "
                         "NEGATIVE (lowering of the inner pjit is redone per "
                         "module and dominates; PERF.md r5), kept for the A/B")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    # host-only measurement: tracing/lowering never needs the device, and
    # claiming the tunneled TPU here would bill its handshake to the table
    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from cgd_tpu.diffusion import make_diffusion
    from cgd_tpu.diffusion.sampler import (
        SamplerConfig,
        build_step_plan,
        make_guided_step,
        segment_plan,
    )
    from cgd_tpu.guidance.pipeline import GuidanceSettings, make_guidance_builder
    from cgd_tpu.models.clip import CLIP_CONFIGS, init_clip
    from cgd_tpu.models.unet import UNetConfig, apply_unet, init_unet
    from cgd_tpu.ops.nn import cast_conv_params
    from cgd_tpu.registry import DIFFUSION_LOOKUP

    size = args.size
    respace = args.respace or ("ddim100" if size >= 512 else "ddim250")
    clip_name = args.clip or ("RN50x16" if size >= 512 else "ViT-B/32")
    clip_cfg = CLIP_CONFIGS[clip_name]
    flags = dict(DIFFUSION_LOOKUP["cond" if size != 256 else "uncond"][size]["model_flags"])
    unet_cfg = UNetConfig.from_flags(flags)
    diffusion = make_diffusion(1000, flags.get("noise_schedule", "linear"), respace)

    plan = build_step_plan(diffusion.num_timesteps, num_cutouts=args.cutn)
    segments, _ = segment_plan(plan, args.save_frequency)
    distinct = {}
    for _k, seg in segments:
        distinct.setdefault((len(seg), seg[0].guided, seg[0].cutn), seg)
    log(f"{size}px {respace} save_freq={args.save_frequency}: "
        f"{len(segments)} segments, {len(distinct)} distinct signatures")

    # abstract param templates — the exact product trees, zero compute
    params = jax.eval_shape(
        lambda: {
            "unet": cast_conv_params(
                init_unet(jax.random.PRNGKey(0), unet_cfg), jnp.bfloat16
            ),
            "clip": cast_conv_params(
                init_clip(jax.random.PRNGKey(1), clip_cfg), jnp.bfloat16
            ),
            "guidance": {
                "target_embeds": jnp.zeros((1, clip_cfg.embed_dim), jnp.float32),
                "weights": jnp.ones((1,), jnp.float32),
            },
        }
    )

    def model_fn(p, x, t_model, rng, y):
        return apply_unet(
            p["unet"], unet_cfg, x, t_model, y, compute_dtype=jnp.bfloat16
        )

    builder = make_guidance_builder(
        clip_cfg, None, None, diffusion, GuidanceSettings()
    )
    cfg = SamplerConfig(use_ddim=respace.startswith("ddim"))

    shape = (args.batch, size, size, 3)
    f32 = lambda s: jax.ShapeDtypeStruct(s, jnp.float32)
    total = 0.0
    rows = []
    step_cache = {}  # --share experimental arm (measured negative)
    for (seg_len, guided, cutn), seg in sorted(distinct.items()):
        if not args.share:
            # the product behavior (sample_loop.build_seg_fn): a plain step
            # inlined into every signature's outer trace
            step = make_guided_step(
                diffusion, model_fn, builder(seg[0]) if guided else None, cfg
            )
        else:
            if (guided, cutn) not in step_cache:
                step_cache[(guided, cutn)] = jax.jit(make_guided_step(
                    diffusion, model_fn, builder(seg[0]) if guided else None, cfg
                ))
            step = step_cache[(guided, cutn)]

        # mirrors sample_loop.build_seg_fn's carry/scan structure (no sinks)
        def seg_fn(params, x, y, rng, ts, ref_ts):
            def body(carry, per_step):
                x, y, rng, _last = carry
                t, ref_t = per_step
                rng, r = jax.random.split(rng)
                x, pred_x0, y = step(params, x, t, ref_t, y, r)
                return (x, y, rng, pred_x0), None

            (x, y, rng, last), _ = jax.lax.scan(
                body, (x, y, rng, jnp.zeros_like(x)), (ts, ref_ts)
            )
            return x, y, rng, last

        t0 = time.perf_counter()
        jaxpr_s = None
        lowered = jax.jit(seg_fn).lower(
            params, f32(shape),
            jax.ShapeDtypeStruct((args.batch,), jnp.int32),
            jax.ShapeDtypeStruct((2,), jnp.uint32),
            jax.ShapeDtypeStruct((seg_len,), jnp.int32),
            jax.ShapeDtypeStruct((seg_len,), jnp.int32),
        )
        dt = time.perf_counter() - t0
        n_lines = lowered.as_text().count("\n")
        total += dt
        rows.append(((seg_len, guided, cutn), dt, n_lines))
        log(f"  sig (len={seg_len}, guided={guided}, cutn={cutn}): "
            f"trace+lower {dt:.2f}s  ({n_lines} MLIR lines)")

    log(f"TOTAL first-run trace+lower at {size}px: {total:.2f}s "
        f"({len(distinct)} signatures)")
    print(
        {"size": size, "respace": respace, "save_frequency": args.save_frequency,
         "signatures": len(distinct), "trace_lower_total_s": round(total, 2),
         "per_sig": [
             {"len": mk[0], "guided": mk[1], "cutn": mk[2], "s": round(dt, 2)}
             for mk, dt, _ in rows
         ]}
    )


if __name__ == "__main__":
    main()
