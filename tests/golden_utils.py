"""Golden-tensor regression harness (SURVEY.md §4: the reference ships no
numerical goldens; we generate our own deterministic ones).

Each golden is produced by a named builder on the CPU backend with fixed
seeds and stored in tests/goldens/<name>.npz. `pytest` compares current
outputs against the stored files; regenerate deliberately with
`python tests/golden_utils.py regen [name ...]` after an intentional
numerics change (and say so in the commit message).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")


def _schedule_arrays():
    from cgd_tpu.diffusion import make_diffusion

    d = make_diffusion(1000, "cosine", "ddim25")
    return {
        "betas": d.coeffs.betas,
        "alphas_cumprod": d.coeffs.alphas_cumprod,
        "sqrt_one_minus": d.coeffs.sqrt_one_minus_alphas_cumprod,
        "posterior_log_var": d.coeffs.posterior_log_variance_clipped,
        "timestep_map": d.timestep_map,
    }


def _unet_forward():
    import jax
    import jax.numpy as jnp

    from cgd_tpu.models.unet import UNetConfig, apply_unet, init_unet

    cfg = UNetConfig(
        image_size=16, model_channels=32, num_res_blocks=1, attention_ds=(4,),
        channel_mult=(1, 2), num_head_channels=16, num_classes=7,
    )
    params = init_unet(jax.random.PRNGKey(11), cfg)
    x = jax.random.normal(jax.random.PRNGKey(12), (2, 16, 16, 3))
    out = apply_unet(params, cfg, x, jnp.array([3.0, 250.0]), jnp.array([1, 5]))
    return {"out": np.asarray(out)}


def _clip_embeds():
    import jax
    import jax.numpy as jnp

    from cgd_tpu.models.clip import encode_image, encode_text, init_clip
    from cgd_tpu.models.clip.configs import CLIPConfig, TextConfig, VisionViTConfig

    cfg = CLIPConfig(
        "g", 32, VisionViTConfig(32, 8, 64, 2, 2),
        TextConfig(context_length=16, vocab_size=128, width=64, heads=2, layers=2),
    )
    params = init_clip(jax.random.PRNGKey(21), cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(22), (2, 32, 32, 3))
    toks = np.zeros((2, 16), np.int32)
    toks[0, :3] = [126, 5, 127]
    toks[1, :4] = [126, 9, 9, 127]
    return {
        "img": np.asarray(encode_image(params, cfg, imgs)),
        "txt": np.asarray(encode_text(params, cfg, jnp.asarray(toks))),
    }


def _guided_e2e():
    """Full tiny guided ddim loop, fixed seeds — the end-to-end golden."""
    import jax
    import jax.numpy as jnp

    from cgd_tpu.diffusion import make_diffusion
    from cgd_tpu.diffusion.sampler import GuidanceFns, SamplerConfig, sample_loop
    from cgd_tpu.models.unet import UNetConfig, apply_unet, init_unet

    cfg_m = UNetConfig(
        image_size=16, model_channels=32, num_res_blocks=1, attention_ds=(4,),
        channel_mult=(1, 2), num_head_channels=16,
    )
    params_u = init_unet(jax.random.PRNGKey(31), cfg_m)

    def model_fn(p, x, t, r, y):
        return apply_unet(params_u, cfg_m, x, t, y)

    target = np.random.RandomState(32).randn(1, 16, 16, 3).astype(np.float32)

    def builder(meta):
        def loss_fn(p, rng, x, out, ref_t):
            return jnp.sum((out.pred_xstart - target) ** 2) * 0.1

        return GuidanceFns(loss_fn, lambda g: g)

    d = make_diffusion(1000, "linear", "ddim10")
    outs = list(
        sample_loop(
            d, model_fn, builder, {}, (1, 16, 16, 3), jax.random.PRNGKey(33),
            SamplerConfig(use_ddim=True), save_frequency=5,
        )
    )
    return {"final": np.asarray(outs[-1][1]), "mid": np.asarray(outs[1][1])}


BUILDERS = {
    "schedule": _schedule_arrays,
    "unet_forward": _unet_forward,
    "clip_embeds": _clip_embeds,
    "guided_e2e": _guided_e2e,
}


def regen(names=None):
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name in names or BUILDERS:
        arrays = BUILDERS[name]()
        np.savez(os.path.join(GOLDEN_DIR, f"{name}.npz"), **arrays)
        print(f"wrote goldens/{name}.npz: {list(arrays)}")


if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")
    args = sys.argv[1:]
    assert args and args[0] == "regen", "usage: python tests/golden_utils.py regen [name ...]"
    regen(args[1:] or None)
