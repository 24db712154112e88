"""Time UNet-256 fwd / fwd+input-grad / full guided step on the TPU.

Round-1 methodology (PERF.md): jit a lax.scan of N iterations of the op,
fetch-forced completion (block_until_ready is unreliable on the tunneled
backend), min of 3. Baselines r1: fwd 40 ms, fwd+bwd 71 ms, step ~74 ms.
"""

import sys
sys.path.insert(0, __file__.rsplit('/', 2)[0])
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(fn, args, n_scan, label):
    @jax.jit
    def run(*args):
        def body(c, _):
            return fn(*args[:-1], c), None

        out, _ = jax.lax.scan(body, args[-1], None, length=n_scan)
        return out

    t0 = time.time()
    out = run(*args)
    _ = float(jnp.sum(out))
    log(f"{label}: compile+first {time.time() - t0:.1f}s")
    times = []
    for _ in range(3):
        t0 = time.time()
        out = run(*args)
        _ = float(jnp.sum(out))
        times.append((time.time() - t0) / n_scan)
    log(f"{label}: {min(times) * 1e3:.2f} ms/iter (min of 3, n={n_scan})")
    return min(times)


def main():
    from cgd_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    from cgd_tpu.diffusion import make_diffusion
    from cgd_tpu.diffusion.sampler import SamplerConfig, StepMeta, make_guided_step
    from cgd_tpu.guidance.pipeline import GuidanceSettings, make_guidance_builder
    from cgd_tpu.models.unet import apply_unet
    from cgd_tpu.weights import resolve_clip, resolve_unet

    size = 256
    clip_params, clip_cfg = resolve_clip("ViT-B/32", mode="random")
    unet_params, unet_cfg, flags = resolve_unet(size, True, mode="random")
    dev = jax.devices()[0]

    with jax.default_device(jax.devices("cpu")[0]):
        x = jax.random.normal(jax.random.PRNGKey(0), (1, size, size, 3), jnp.float32)
        y = jnp.zeros((1,), jnp.int32)
        t = jnp.full((1,), 500.0, jnp.float32)
    x, y, t = (jax.device_put(v, dev) for v in (x, y, t))

    def fwd(params, y, t, x):
        out = apply_unet(params, unet_cfg, x, t, y, compute_dtype=jnp.bfloat16)
        # keep shapes scan-compatible: reduce model out back onto x
        return x + 0.0 * out[..., :3].astype(jnp.float32)

    timed(fwd, (unet_params, y, t, x), 10, "unet256 fwd")

    def fwdbwd(params, y, t, x):
        def loss(x_):
            out = apply_unet(params, unet_cfg, x_, t, y, compute_dtype=jnp.bfloat16)
            return jnp.sum(out[..., :3].astype(jnp.float32) ** 2)

        return x + 1e-9 * jax.grad(loss)(x)

    timed(fwdbwd, (unet_params, y, t, x), 10, "unet256 fwd+input-grad")

    diffusion = make_diffusion(1000, "linear", "ddim250")
    target = np.random.RandomState(2).randn(1, clip_cfg.embed_dim).astype(np.float32)
    weights = np.ones((1,), np.float32)

    def model_fn(params, x, t_model, rng, y):
        return apply_unet(params["unet"], unet_cfg, x, t_model, y, compute_dtype=jnp.bfloat16)

    builder = make_guidance_builder(clip_cfg, target, weights, diffusion, GuidanceSettings())
    step = make_guided_step(
        diffusion, model_fn, builder(StepMeta(t=0, guided=True, cutn=16)),
        SamplerConfig(use_ddim=True, randomize_class=True),
    )
    params = {"unet": unet_params, "clip": clip_params}

    def stepfn(params, y, x):
        x2, _p, _y = step(params, x, jnp.int32(125), jnp.int32(249), y, jax.random.PRNGKey(1))
        return x2

    timed(stepfn, (params, y, x), 10, "guided step 256 cutn16")


if __name__ == "__main__":
    main()
