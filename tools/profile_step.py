"""Profile one 256px guided step on the TPU and print the per-op breakdown.

Captures a jax.profiler device trace of a few compiled guided steps, then
parses the xplane with xprof/tensorboard_plugin_profile to rank HLO ops by
self time. Drives the PERF.md optimization backlog (which ops to fuse or
replace with Pallas kernels).

Usage: python tools/profile_step.py [--size 256] [--cutn 16] [--steps 4]
"""

import argparse
import glob
import json
import os
import sys
sys.path.insert(0, __file__.rsplit('/', 2)[0])
import time

# The tensorboard_plugin_profile / tsl xplane protos are generated with an
# older protoc than this box's C++ protobuf runtime accepts ("Descriptors
# cannot be created directly"); the pure-Python implementation parses them
# fine. Must land before the first google.protobuf import.
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_step(size, cutn, clip_name="ViT-B/32", remat=None, batch=1):
    from cgd_tpu.diffusion import make_diffusion
    from cgd_tpu.diffusion.sampler import SamplerConfig, StepMeta, make_guided_step
    from cgd_tpu.guidance.pipeline import GuidanceSettings, make_guidance_builder
    from cgd_tpu.models.unet import apply_unet
    from cgd_tpu.weights import resolve_clip, resolve_unet

    clip_params, clip_cfg = resolve_clip(clip_name, mode="random")
    unet_params, unet_cfg, flags = resolve_unet(size, True, mode="random")
    from cgd_tpu.ops.nn import cast_conv_params
    clip_params = cast_conv_params(clip_params, jnp.bfloat16)
    unet_params = cast_conv_params(unet_params, jnp.bfloat16)
    diffusion = make_diffusion(1000, flags.get("noise_schedule", "linear"), "ddim250")

    target = np.random.RandomState(2).randn(1, clip_cfg.embed_dim).astype(np.float32)
    weights = np.ones((1,), np.float32)

    if remat is None:
        # match the product graph (api._resolve_remat)
        from cgd_tpu.api import _resolve_remat

        remat = _resolve_remat(size, batch, cutn)
        remat = "full" if remat is True else ("off" if remat is False else remat)
    # remat policies: "off" (keep all activations), "full" (whole-UNet
    # jax.checkpoint — recompute every forward op in the backward),
    # "hiresN" (partial: checkpoint only layers with input spatial dim >= N
    # — apply_unet remat_min_dim)
    min_dim = int(remat[5:]) if str(remat).startswith("hires") else None

    def model_fn(params, x, t_model, rng, y):
        return apply_unet(
            params["unet"], unet_cfg, x, t_model, y,
            compute_dtype=jnp.bfloat16, remat_min_dim=min_dim,
        )

    if remat == "full":
        model_fn = jax.checkpoint(model_fn, static_argnums=())
    log(f"UNet remat policy: {remat}")

    builder = make_guidance_builder(clip_cfg, target, weights, diffusion, GuidanceSettings())
    step = make_guided_step(
        diffusion, model_fn, builder(StepMeta(t=0, guided=True, cutn=cutn)),
        SamplerConfig(use_ddim=True, randomize_class=True),
    )
    params = {"unet": unet_params, "clip": clip_params}
    return step, params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--cutn", type=int, default=16)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--clip", default="ViT-B/32",
                    help="CLIP release (512px product config pairs with RN50x16)")
    ap.add_argument("--remat", default="auto",
                    help="UNet rematerialization under the guidance gradient: "
                         "auto = the product gate (api._resolve_remat), "
                         "off / full / hiresN (partial: checkpoint layers with "
                         "input spatial dim >= N, e.g. hires256)")
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--top", type=int, default=45)
    ap.add_argument("--time-only", action="store_true",
                    help="skip the xplane trace: print compile time, "
                         "memory_analysis, and steady per-step only")
    ap.add_argument("--trace-dir", default="/tmp/cgd_profile")
    args = ap.parse_args()

    from cgd_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    remat = None if args.remat == "auto" else (
        {"on": "full"}.get(args.remat, args.remat)
    )
    step, params = build_step(
        args.size, args.cutn, clip_name=args.clip, remat=remat, batch=args.batch
    )

    def one_fn(params, x, y, key):
        x2, px, y2 = step(params, x, jnp.int32(125), jnp.int32(249), y, key)
        return x2, y2

    with jax.default_device(jax.devices("cpu")[0]):
        x = jax.random.normal(
            jax.random.PRNGKey(0), (args.batch, args.size, args.size, 3), jnp.float32
        )
        y = jnp.zeros((args.batch,), jnp.int32)
    x = jax.device_put(x, jax.devices()[0])
    y = jax.device_put(y, jax.devices()[0])

    log("compiling single guided step...")
    t0 = time.time()
    compiled = jax.jit(one_fn).lower(params, x, y, jax.random.PRNGKey(1)).compile()
    log(f"compile: {time.time() - t0:.1f}s")
    try:
        ma = compiled.memory_analysis()
        log(
            "memory_analysis: "
            f"temp={ma.temp_size_in_bytes / 2**30:.2f}GiB "
            f"args={ma.argument_size_in_bytes / 2**30:.2f}GiB "
            f"out={ma.output_size_in_bytes / 2**30:.2f}GiB "
            f"gen={ma.generated_code_size_in_bytes / 2**20:.0f}MiB"
        )
    except Exception as e:
        log(f"memory_analysis unavailable: {e}")

    def one(params, x, y, key):
        return compiled(params, x, y, key)

    t0 = time.time()
    x1, y1 = one(params, x, y, jax.random.PRNGKey(1))
    _ = float(jnp.sum(x1))  # fetch-forced completion (axon trap #3)
    log(f"first step (incl. fetch handshake on fresh processes): {time.time() - t0:.1f}s")

    # timed, untraced (steady state)
    t0 = time.time()
    xs, ys = x1, y1
    for i in range(args.steps):
        xs, ys = one(params, xs, ys, jax.random.PRNGKey(2 + i))
    _ = float(jnp.sum(xs))
    per = (time.time() - t0) / args.steps
    log(f"steady per-step (fetch-forced, n={args.steps}): {per * 1e3:.1f} ms")
    if args.time_only:
        return

    log("tracing...")
    with jax.profiler.trace(args.trace_dir):
        xs2, ys2 = x1, y1
        for i in range(args.steps):
            xs2, ys2 = one(params, xs2, ys2, jax.random.PRNGKey(100 + i))
        _ = float(jnp.sum(xs2))

    planes = sorted(glob.glob(f"{args.trace_dir}/**/*.xplane.pb", recursive=True))
    if not planes:
        log("no xplane captured (remote backend may not support device tracing)")
        return
    log(f"xplane: {planes[-1]}")
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

        try:
            data, _ = rtd.xspace_to_tool_data([planes[-1]], "hlo_stats^", {})
        except Exception as e:
            log(f"hlo_stats failed ({e}); trying op_stats")
            data, _ = rtd.xspace_to_tool_data(
                [planes[-1]], "framework_op_stats^", {}
            )
        out = json.loads(data) if isinstance(data, (str, bytes)) else data
        # hlo_stats is a gviz table json; print top rows by self time
        print(json.dumps(out)[:400], file=sys.stderr)
        with open("/tmp/cgd_profile/hlo_stats.json", "w") as f:
            f.write(data if isinstance(data, str) else json.dumps(out))
        log("wrote /tmp/cgd_profile/hlo_stats.json")
    except Exception as e:
        # the plugin converters break whenever protobuf was already imported
        # with the C++ implementation (descriptor-version skew); the in-repo
        # xplane parser in a FRESH process (env honored at import) always
        # works — same per-category table PERF.md uses
        log(f"plugin converters unavailable ({e}); using tools/xplane_stats.py")
        import subprocess

        env = dict(os.environ, PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION="python")
        subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__), "xplane_stats.py"),
             args.trace_dir, "--steps", str(args.steps), "--top", str(args.top)],
            env=env, check=False,
        )


if __name__ == "__main__":
    main()
