#!/usr/bin/env python
"""Headline benchmark: 256px ddim250 CLIP-guided sample, wall-clock per image.

BASELINE.md north star: < 15 s on one TPU v5e chip (guided steps/sec also
reported on stderr). The graph is identical with random or converted weights
(same architectures: 256px cond ADM UNet + ViT-B/32 CLIP, cutn=16, the
reference default operating point), so random weights give honest timing
without network access.

Prints ONE JSON line:
  {"metric": ..., "value": <seconds/image>, "unit": "seconds",
   "vs_baseline": <baseline_target / value, >1 means faster than target>}

Compile/warmup is excluded (steady-state serving metric); compile time goes
to stderr.
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--respace", default="ddim250")
    ap.add_argument("--cutn", type=int, default=16)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--clip", default="ViT-B/32")
    ap.add_argument("--fast", action="store_true",
                    help="fast_guidance mode (detached pred_xstart; NOT reference semantics)")
    ap.add_argument("--dpm", action="store_true",
                    help="DPM-Solver++(2M) multistep update (2nd order: pair with a small "
                         "--respace budget like ddim50; beyond reference, NOT reference "
                         "semantics)")
    ap.add_argument("--stall-timeout", type=float, default=1200.0, metavar="SECONDS",
                    help="exit 117 with a stack dump if no phase completes for this "
                         "long (a hung tunneled backend otherwise blocks forever — "
                         "see STATUS.md 2026-08-17 outage). Must exceed the worst "
                         "legitimate gap: cold 250-step compile ~4-5 min + first "
                         "device->host fetch 2-6 min. 0 disables")
    args = ap.parse_args()

    from cgd_tpu.utils.watchdog import StallDetector

    # The 2026-08-17 tunnel outage hung even jax.devices() at backend init
    # with no error; the watchdog turns that into exit 117 + thread stacks
    # so the bench driver sees a diagnosable failure instead of a stall.
    # try/finally (not bare __enter__): an exception anywhere in the bench
    # body must disarm the exit-on-stall daemon thread, or exit 117 could
    # fire mid post-mortem in this same process (ADVICE r3).
    dog = StallDetector(args.stall_timeout, exit_on_stall=True)
    dog.__enter__()
    try:
        per_image, S, dt, flops_step = _bench_body(args, dog)
    finally:
        dog.__exit__(None, None, None)  # timing done; don't watch JSON printing

    log(f"steady-state (min of 3): {dt:.2f}s total, {S / dt:.2f} guided steps/s, "
        f"{per_image:.2f}s/image")

    baseline_target = 15.0  # BASELINE.md: <15s per 256px ddim250 image on v5e
    tag = "_dpm" if args.dpm else ""
    record = {
        "metric": f"{args.size}px_{args.respace}{tag}_guided_wallclock_per_image",
        "value": round(per_image, 3),
        "unit": "seconds",
        "vs_baseline": round(baseline_target / per_image, 3),
    }
    if flops_step is not None:
        # MFU against the chip's bf16 dense peak (VERDICT r3 #5): achieved =
        # XLA-cost-model FLOPs of one optimized guided step * S steps / wall
        # time. See PERF.md 'MFU' for the derivation and what it does/doesn't
        # include (memory-bound ops count 0 FLOPs but still take time — this
        # is the standard MFU convention).
        record["flops_per_step"] = flops_step
        peak = _bf16_peak_flops()
        if peak is not None:
            mfu = flops_step * S / dt / peak
            record["mfu"] = round(mfu, 4)
            log(f"MFU: {mfu:.3f} ({flops_step * S / dt / 1e12:.1f} TF/s achieved "
                f"vs {peak / 1e12:.0f} TF/s bf16 peak)")
    print(json.dumps(record))


def _bench_body(args, dog):
    from cgd_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from cgd_tpu.diffusion import make_diffusion
    from cgd_tpu.diffusion.sampler import SamplerConfig, StepMeta, make_guided_step
    from cgd_tpu.guidance.pipeline import GuidanceSettings, make_guidance_builder
    from cgd_tpu.models.unet import apply_unet
    from cgd_tpu.weights import resolve_clip, resolve_unet

    dog.pet("backend init (jax.devices)")
    log(f"devices: {jax.devices()}")
    dog.pet("validate conv-plan allowlist")
    if jax.default_backend() != "cpu":
        # re-validate the measured-fact conv-plan allowlist on this exact
        # kernel/backend before timing (fails loudly if stale — VERDICT r2)
        from cgd_tpu.kernels.conv_pallas import validate_measured_safe

        log("validating _MEASURED_SAFE conv plans on-device...")
        validate_measured_safe()
    dog.pet("resolve weights + build step")
    clip_params, clip_cfg = resolve_clip(args.clip, mode="random")
    unet_params, unet_cfg, flags = resolve_unet(args.size, True, mode="random")
    from cgd_tpu.ops.nn import cast_conv_params
    clip_params = cast_conv_params(clip_params, jnp.bfloat16)
    unet_params = cast_conv_params(unet_params, jnp.bfloat16)
    diffusion = make_diffusion(
        1000, flags.get("noise_schedule", "linear"), args.respace,
        rescale_timesteps=flags.get("rescale_timesteps", False),
    )
    use_ddim = args.respace.startswith("ddim")

    import numpy as np
    target = np.random.RandomState(2).randn(1, clip_cfg.embed_dim).astype(np.float32)
    weights = np.ones((1,), np.float32)

    def model_fn(params, x, t_model, rng, y):
        return apply_unet(params["unet"], unet_cfg, x, t_model, y, compute_dtype=jnp.bfloat16)

    builder = make_guidance_builder(
        clip_cfg, target, weights, diffusion, GuidanceSettings()
    )
    params = {"unet": unet_params, "clip": clip_params}
    step = make_guided_step(
        diffusion, model_fn, builder(StepMeta(t=0, guided=True, cutn=args.cutn)),
        SamplerConfig(use_ddim=use_ddim, randomize_class=True,
                      fast_guidance=args.fast, dpm_solver=args.dpm),
    )

    import numpy as np

    S = diffusion.num_timesteps
    # numpy, NOT jnp: device-resident closure constants stall MLIR lowering
    # on tunneled backends (see cgd_tpu/diffusion/sampler.py ModelFn note)
    ts = np.arange(S - 1, -1, -1, dtype=np.int32)
    ref_ts = np.arange(S - 1, -1, -1, dtype=np.int32)

    if args.dpm:
        # multistep schedule context: previous step's t + first-step flag
        tps = np.concatenate([ts[:1], ts[:-1]]).astype(np.int32)
        fis = np.zeros(S, np.bool_)
        fis[0] = True

        @jax.jit
        def run(params, x, y, key):
            def body(carry, per):
                x, x0p, y, k = carry
                t, rt, tp, fi = per
                k, r = jax.random.split(k)
                x, _px, y, x0p = step(params, x, t, rt, y, r,
                                      dpm_state=(x0p, tp, fi))
                return (x, x0p, y, k), ()

            init = (x, jnp.zeros_like(x), y, key)
            (x, _x0p, y, key), _ = jax.lax.scan(body, init, (ts, ref_ts, tps, fis))
            return x
    else:
        @jax.jit
        def run(params, x, y, key):
            def body(carry, per):
                x, y, k = carry
                t, rt = per
                k, r = jax.random.split(k)
                x, _px, y = step(params, x, t, rt, y, r)
                return (x, y, k), ()

            (x, y, key), _ = jax.lax.scan(body, (x, y, key), (ts, ref_ts))
            return x

    shape = (args.batch, args.size, args.size, 3)
    with jax.default_device(jax.devices("cpu")[0]):
        x0 = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
        y0 = jnp.zeros((args.batch,), jnp.int32)

    log(f"compiling {args.size}px {args.respace} guided loop (cutn={args.cutn})...")
    dog.pet("compile + warmup run (fetch-forced)")
    t0 = time.time()
    out = run(params, x0, y0, jax.random.PRNGKey(1))
    # NOTE: on the tunneled axon backend block_until_ready is unreliable —
    # force completion with a scalar fetch. This also pays the one-time
    # first-device-to-host-fetch tax inside the warmup, not the timed region.
    warm = float(jnp.mean(out))
    log(f"compile+first run (fetch-forced): {time.time() - t0:.1f}s (mean={warm:.4f})")

    # min of 3: the tunneled backend shows ~±10% run-to-run variance
    times = []
    for i in range(3):
        dog.pet(f"timed run {i}")
        t0 = time.time()
        out = run(params, x0, y0, jax.random.PRNGKey(2 + i))
        _ = float(jnp.mean(out))
        times.append(time.time() - t0)
        log(f"run {i}: {times[-1]:.2f}s")
    dt = min(times)
    per_image = dt / args.batch

    dog.pet("cost analysis (single-step lowering)")
    flops_step = _guided_step_flops(step, params, x0, y0, args.dpm)
    return per_image, S, dt, flops_step


def _guided_step_flops(step, params, x0, y0, dpm):
    """FLOPs of ONE guided step from XLA's own cost model (HloCostAnalysis
    via Compiled.cost_analysis) — the honest 'analytic' count: it sees the
    exact optimized HLO that runs (UNet fwd + p_mean_variance + the guidance
    backward through CLIP+cutouts[+UNet] + the sampler update), after fusion
    and DCE. Derivation + v5e roofline context in PERF.md ('MFU' section).

    Analyzing a single step rather than the scanned loop is deliberate:
    HloCostAnalysis does NOT multiply a while-loop body by its trip count,
    so the loop-level number would be meaningless. The loop is S identical
    steps (one guidance phase in bench.py), so step_flops * S is exact.
    Returns None when the backend can't produce a cost analysis."""
    def one_step(params, x, y, key):
        if dpm:
            r = step(params, x, jnp.int32(1), jnp.int32(1), y, key,
                     dpm_state=(jnp.zeros_like(x), jnp.int32(2),
                                jnp.asarray(False)))
        else:
            r = step(params, x, jnp.int32(1), jnp.int32(1), y, key)
        return r[0]

    try:
        compiled = jax.jit(one_step).lower(params, x0, y0, jax.random.PRNGKey(9)).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):  # older JAX returned [dict]
            ca = ca[0] if ca else {}
        flops = float(ca.get("flops", 0.0))
        return flops if flops > 0 else None
    except Exception as e:
        log(f"cost_analysis unavailable on this backend ({type(e).__name__}: {e})")
        return None


# bf16 dense peak FLOP/s by TPU generation (public spec sheets); substring
# match against jax device_kind. MFU is only emitted when the kind is known.
_TPU_BF16_PEAK = {
    "v6": 918e12,   # Trillium / v6e
    "v5p": 459e12,
    "v5e": 197e12,  # device_kind "TPU v5e" / "TPU v5 lite"
    "v5 lite": 197e12,
    "v4": 275e12,
}


def _bf16_peak_flops() -> float | None:
    kind = jax.devices()[0].device_kind.lower()
    for key, peak in _TPU_BF16_PEAK.items():
        if key in kind:
            return peak
    return None


if __name__ == "__main__":
    main()
