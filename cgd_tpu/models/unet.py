"""ADM UNet, TPU-native.

Reimplements the architecture contract of guided_diffusion's ``UNetModel``
(external dep of the reference; contract per SURVEY.md §2b unet row and the
flag matrix in /root/reference/data/diffusion_model_flags.py) as pure
functions over a parameter pytree:

    cfg    = UNetConfig.from_flags(flags)
    params = init_unet(jax.random.PRNGKey(0), cfg)
    out    = apply_unet(params, cfg, x_nhwc, timesteps, y)

Not a port: channels-last NHWC, fused qkv attention in a canonical head
layout (legacy/new attention order is purely a checkpoint-conversion
permutation, handled in cgd_tpu/convert), fp32-accumulated convs/matmuls with
bf16 activations, and a static "block plan" shared by init and apply so the
whole network traces into one XLA computation with no Python state.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from cgd_tpu.ops import nn as cnn

# Default channel multipliers per image size (create_model contract,
# SURVEY.md §2b; reference flag tables omit channel_mult).
DEFAULT_CHANNEL_MULT: Dict[int, Tuple[float, ...]] = {
    512: (0.5, 1, 1, 2, 2, 4, 4),
    256: (1, 1, 2, 2, 4, 4),
    128: (1, 1, 2, 3, 4),
    64: (1, 2, 3, 4),
    32: (1, 2, 2, 2),
}


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    image_size: int
    in_channels: int = 3
    model_channels: int = 256
    out_channels: int = 6
    num_res_blocks: int = 2
    attention_ds: Tuple[int, ...] = (4, 8, 16)  # downsample factors with attention
    dropout: float = 0.0
    channel_mult: Tuple[float, ...] = (1, 1, 2, 2, 4, 4)
    num_classes: Optional[int] = None
    num_heads: int = 1
    num_head_channels: int = -1
    use_scale_shift_norm: bool = True
    resblock_updown: bool = True
    use_new_attention_order: bool = False  # conversion-time concern only

    @property
    def time_embed_dim(self) -> int:
        return self.model_channels * 4

    def heads_for(self, ch: int) -> int:
        if self.num_head_channels != -1:
            assert ch % self.num_head_channels == 0, (ch, self.num_head_channels)
            return ch // self.num_head_channels
        return self.num_heads

    @staticmethod
    def from_flags(flags: dict) -> "UNetConfig":
        """Build from a reference-style flag dict
        (data/diffusion_model_flags.py 'model_flags' entries)."""
        image_size = flags["image_size"]
        attn = flags.get("attention_resolutions", "32,16,8")
        if isinstance(attn, str):
            attn_res = [int(r.strip()) for r in attn.split(",") if r.strip()]
        else:
            attn_res = list(attn)
        attention_ds = tuple(image_size // r for r in attn_res)
        channel_mult = flags.get("channel_mult") or DEFAULT_CHANNEL_MULT[image_size]
        learn_sigma = flags.get("learn_sigma", True)
        return UNetConfig(
            image_size=image_size,
            model_channels=flags.get("num_channels", 256),
            out_channels=6 if learn_sigma else 3,
            num_res_blocks=flags.get("num_res_blocks", 2),
            attention_ds=attention_ds,
            dropout=flags.get("dropout", 0.0),
            channel_mult=tuple(channel_mult),
            num_classes=(1000 if flags.get("class_cond") else None),
            num_heads=flags.get("num_heads", 1),
            num_head_channels=flags.get("num_head_channels", -1),
            use_scale_shift_norm=flags.get("use_scale_shift_norm", True),
            resblock_updown=flags.get("resblock_updown", True),
            use_new_attention_order=flags.get("use_new_attention_order", False),
        )


# ---------------------------------------------------------------------------
# Block plan: a static description of the network, shared by init & apply.
# Entries: ("res", cin, cout, mode) with mode in {"", "up", "down"}
#          ("attn", ch)
#          ("downsample", ch) / ("upsample", ch)   [conv resampling]
# ---------------------------------------------------------------------------

def block_plan(cfg: UNetConfig):
    mc = cfg.model_channels
    ch = int(cfg.channel_mult[0] * mc)
    input_plan: List[List[tuple]] = []
    input_chs = [ch]
    ds = 1
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            layers = [("res", ch, int(mult * mc), "")]
            ch = int(mult * mc)
            if ds in cfg.attention_ds:
                layers.append(("attn", ch))
            input_plan.append(layers)
            input_chs.append(ch)
        if level != len(cfg.channel_mult) - 1:
            if cfg.resblock_updown:
                input_plan.append([("res", ch, ch, "down")])
            else:
                input_plan.append([("downsample", ch)])
            input_chs.append(ch)
            ds *= 2

    middle_plan = [("res", ch, ch, ""), ("attn", ch), ("res", ch, ch, "")]

    output_plan: List[List[tuple]] = []
    chs = list(input_chs)
    for level, mult in list(enumerate(cfg.channel_mult))[::-1]:
        for i in range(cfg.num_res_blocks + 1):
            ich = chs.pop()
            layers = [("res", ch + ich, int(mult * mc), "")]
            ch = int(mult * mc)
            if ds in cfg.attention_ds:
                layers.append(("attn", ch))
            if level and i == cfg.num_res_blocks:
                if cfg.resblock_updown:
                    layers.append(("res", ch, ch, "up"))
                else:
                    layers.append(("upsample", ch))
                ds //= 2
            output_plan.append(layers)
    return input_plan, middle_plan, output_plan, ch


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _init_res(key, cfg: UNetConfig, cin: int, cout: int):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    emb_out = 2 * cout if cfg.use_scale_shift_norm else cout
    p = {
        "in_norm": cnn.group_norm_init(cin),
        "in_conv": cnn.conv_init(k1, 3, 3, cin, cout),
        "emb": cnn.dense_init(k2, cfg.time_embed_dim, emb_out),
        "out_norm": cnn.group_norm_init(cout),
        "out_conv": cnn.conv_init(k3, 3, 3, cout, cout, zero=True),
    }
    if cin != cout:
        p["skip"] = cnn.conv_init(k4, 1, 1, cin, cout)
    return p


def _init_attn(key, ch: int):
    k1, k2 = jax.random.split(key)
    return {
        "norm": cnn.group_norm_init(ch),
        "qkv": cnn.dense_init(k1, ch, 3 * ch),
        "proj": cnn.dense_init(k2, ch, ch, zero=True),
    }


def _init_layer(key, cfg: UNetConfig, spec: tuple):
    kind = spec[0]
    if kind == "res":
        _, cin, cout, _mode = spec
        return _init_res(key, cfg, cin, cout)
    if kind == "attn":
        return _init_attn(key, spec[1])
    if kind == "downsample":
        return {"conv": cnn.conv_init(key, 3, 3, spec[1], spec[1])}
    if kind == "upsample":
        return {"conv": cnn.conv_init(key, 3, 3, spec[1], spec[1])}
    raise ValueError(kind)


def init_unet(key, cfg: UNetConfig):
    input_plan, middle_plan, output_plan, out_ch = block_plan(cfg)
    keys = iter(jax.random.split(key, 4096))
    nxt = lambda: next(keys)

    params = {
        "time_embed": [
            cnn.dense_init(nxt(), cfg.model_channels, cfg.time_embed_dim),
            cnn.dense_init(nxt(), cfg.time_embed_dim, cfg.time_embed_dim),
        ],
        "conv_in": cnn.conv_init(
            nxt(), 3, 3, cfg.in_channels, int(cfg.channel_mult[0] * cfg.model_channels)
        ),
        "input": [[_init_layer(nxt(), cfg, s) for s in blk] for blk in input_plan],
        "middle": [_init_layer(nxt(), cfg, s) for s in middle_plan],
        "output": [[_init_layer(nxt(), cfg, s) for s in blk] for blk in output_plan],
        "out_norm": cnn.group_norm_init(out_ch),
        "out_conv": cnn.conv_init(nxt(), 3, 3, out_ch, cfg.out_channels, zero=True),
    }
    if cfg.num_classes is not None:
        params["label_emb"] = cnn.embedding_init(nxt(), cfg.num_classes, cfg.time_embed_dim)
    return params


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

def _apply_res(p, cfg: UNetConfig, x, emb, mode: str, rng=None):
    dropout = cfg.dropout > 0.0 and rng is not None
    # GN+SiLU (+ the up/down h_upd resample) fused into the conv's Pallas
    # window load when eligible; exact unfused fallback otherwise
    h = cnn.fused_gn_silu_conv(p["in_norm"], p["in_conv"], x, resample=mode)
    if mode == "up":
        x = cnn.upsample_nearest_2x(x)
    elif mode == "down":
        x = cnn.avg_pool_2x(x)

    emb_out = cnn.dense(p["emb"], cnn.silu(emb))[:, None, None, :]
    skip = cnn.conv2d(p["skip"], x) if "skip" in p else x
    if cfg.use_scale_shift_norm:
        scale, shift = jnp.split(emb_out, 2, axis=-1)
        if not dropout:
            return cnn.fused_gn_silu_conv(
                p["out_norm"], p["out_conv"], h, scale_shift=(scale, shift), skip=skip
            )
        h = cnn.group_norm(p["out_norm"], h) * (1.0 + scale) + shift
        h = cnn.silu(h)
    else:
        h = h + emb_out
        if not dropout:
            return cnn.fused_gn_silu_conv(p["out_norm"], p["out_conv"], h, skip=skip)
        h = cnn.silu(cnn.group_norm(p["out_norm"], h))
    keep = 1.0 - cfg.dropout
    mask = jax.random.bernoulli(rng, keep, h.shape)
    h = jnp.where(mask, h / keep, 0.0).astype(h.dtype)
    h = cnn.conv2d(p["out_conv"], h)
    return skip + h


def _apply_attn(p, cfg: UNetConfig, x):
    b, hh, ww, c = x.shape
    flat = x.reshape(b, hh * ww, c)
    h = cnn.group_norm(p["norm"], flat)
    qkv = cnn.dense(p["qkv"], h)
    a = cnn.qkv_attention(qkv, cfg.heads_for(c))
    a = cnn.dense(p["proj"], a)
    return (flat + a).reshape(b, hh, ww, c)


def _apply_layer(p, cfg: UNetConfig, spec, x, emb, rng=None):
    kind = spec[0]
    if kind == "res":
        return _apply_res(p, cfg, x, emb, spec[3], rng)
    if kind == "attn":
        return _apply_attn(p, cfg, x)
    if kind == "downsample":
        return cnn.conv2d(p["conv"], x, stride=2)
    if kind == "upsample":
        return cnn.conv2d(p["conv"], cnn.upsample_nearest_2x(x))
    raise ValueError(kind)


def apply_unet(
    params,
    cfg: UNetConfig,
    x: jnp.ndarray,
    timesteps: jnp.ndarray,
    y: Optional[jnp.ndarray] = None,
    *,
    compute_dtype=jnp.float32,
    rng=None,
    remat_min_dim: Optional[int] = None,
) -> jnp.ndarray:
    """Forward pass. x: [B,H,W,in_channels]; timesteps: [B] (float ok);
    y: [B] int class labels when class-conditional. Returns [B,H,W,out_channels]
    in float32 (eps + variance logits when learn_sigma).

    ``remat_min_dim``: PARTIAL rematerialization under a gradient — every
    layer whose input spatial dim is >= this value runs inside
    ``jax.checkpoint``, so only layer-boundary activations at those levels
    are kept for the backward and each such layer's internals are recomputed.
    This sits between the r4 all-or-nothing choices: whole-UNet remat re-runs
    every forward conv (+21% step time at 512px, PERF.md r4 profile), while
    no-remat's saved activations can push b>1 512px runs into the HBM
    pressure region (the 20 s/step cliff). High-res layers hold the bulk of
    the activation bytes, so checkpointing only them buys most of the memory
    back for a fraction of the recompute. None = keep everything (fastest,
    most memory). The reference's analog is guided_diffusion's per-block
    ``use_checkpoint`` flag (ext unet.py), off in every published config."""
    input_plan, middle_plan, output_plan, _ = block_plan(cfg)

    emb = cnn.timestep_embedding(timesteps, cfg.model_channels)
    emb = cnn.dense(params["time_embed"][0], emb)
    emb = cnn.dense(params["time_embed"][1], cnn.silu(emb))
    if cfg.num_classes is not None:
        assert y is not None, "class-conditional model requires y"
        emb = emb + params["label_emb"]["table"][y]
    emb = emb.astype(compute_dtype)

    h = x.astype(compute_dtype)
    h = cnn.conv2d(params["conv_in"], h)
    hs = [h]
    rngs = iter(jax.random.split(rng, 256)) if rng is not None else None
    nxt_rng = (lambda: next(rngs)) if rngs is not None else (lambda: None)

    def run_layer(p, spec, h, emb, r):
        if remat_min_dim is not None and h.shape[1] >= remat_min_dim:
            # the dropout rng (when threaded) rides through the checkpoint as
            # a regular argument — the backward recompute replays the SAME
            # key, so masks are identical and remat stays a pure memory/FLOPs
            # trade even with dropout>0 (it used to silently disable)
            fn = jax.checkpoint(
                lambda p_, h_, emb_, r_: _apply_layer(p_, cfg, spec, h_, emb_, r_)
            )
            return fn(p, h, emb, r)
        return _apply_layer(p, cfg, spec, h, emb, r)

    for blk_params, blk_plan_ in zip(params["input"], input_plan):
        for p, spec in zip(blk_params, blk_plan_):
            h = run_layer(p, spec, h, emb, nxt_rng())
        hs.append(h)

    for p, spec in zip(params["middle"], middle_plan):
        h = run_layer(p, spec, h, emb, nxt_rng())

    for blk_params, blk_plan_ in zip(params["output"], output_plan):
        h = jnp.concatenate([h, hs.pop()], axis=-1)
        for p, spec in zip(blk_params, blk_plan_):
            h = run_layer(p, spec, h, emb, nxt_rng())

    h = cnn.fused_gn_silu_conv(params["out_norm"], params["out_conv"], h)
    return h.astype(jnp.float32)
