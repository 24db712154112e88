"""CLIP towers (ViT, ModifiedResNet, text transformer), TPU-native.

Reimplements the encode_image / encode_text contract of clip-anytorch 2.6.0's
``clip/model.py`` (external dep of the reference; SURVEY.md §2b clip rows;
reference call sites cgd/cgd.py:194-195, cgd/clip_util.py:104-108) as pure
functions over parameter pytrees.

TPU-first choices:
- NHWC images; patchify as a strided conv (MXU); token transforms as fused
  dense layers with fp32 accumulation.
- LayerNorm/softmax in fp32 islands inside a bf16-activations network.
- BatchNorm (ModifiedResNet) is *folded* at conversion into per-channel
  scale/bias — sampling is inference-only, so no batch statistics exist.
- Attention uses one fused qkv matmul; causal masking via additive bias.
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp

from cgd_tpu.models.clip.configs import (
    CLIPConfig,
    TextConfig,
    VisionResNetConfig,
    VisionViTConfig,
)
from cgd_tpu.ops import nn as cnn


def layer_norm(params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


def _ln_init(dim):
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


# ---------------------------------------------------------------------------
# transformer (shared by ViT visual tower and text tower)
# ---------------------------------------------------------------------------

def _init_block(key, width: int):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "ln_1": _ln_init(width),
        "attn_qkv": cnn.dense_init(k1, width, 3 * width),
        "attn_out": cnn.dense_init(k2, width, width),
        "ln_2": _ln_init(width),
        "mlp_fc": cnn.dense_init(k3, width, 4 * width),
        "mlp_proj": cnn.dense_init(k4, 4 * width, width),
    }


def _mha(params, x: jnp.ndarray, heads: int, causal: bool) -> jnp.ndarray:
    b, t, c = x.shape
    d = c // heads
    qkv = cnn.dense(params["attn_qkv"], x)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, t, heads, d).transpose(0, 2, 1, 3)
    k = k.reshape(b, t, heads, d).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, heads, d).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k)
    logits = logits.astype(jnp.float32) / math.sqrt(d)
    if causal:
        mask = jnp.triu(jnp.full((t, t), -jnp.inf, jnp.float32), k=1)
        logits = logits + mask
    w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", w, v).astype(x.dtype)
    o = o.transpose(0, 2, 1, 3).reshape(b, t, c)
    return cnn.dense(params["attn_out"], o)


def _block(params, x: jnp.ndarray, heads: int, causal: bool) -> jnp.ndarray:
    x = x + _mha(params, layer_norm(params["ln_1"], x), heads, causal)
    h = cnn.dense(params["mlp_fc"], layer_norm(params["ln_2"], x))
    h = quick_gelu(h)
    x = x + cnn.dense(params["mlp_proj"], h)
    return x


def _transformer(params_list, x: jnp.ndarray, heads: int, causal: bool) -> jnp.ndarray:
    for p in params_list:
        x = _block(p, x, heads, causal)
    return x


# ---------------------------------------------------------------------------
# ViT visual tower
# ---------------------------------------------------------------------------

def _init_vit(key, cfg: VisionViTConfig, embed_dim: int):
    n_patches = (cfg.input_resolution // cfg.patch_size) ** 2
    keys = jax.random.split(key, cfg.layers + 4)
    scale = cfg.width ** -0.5
    return {
        "conv1": {
            "kernel": jax.random.normal(keys[0], (cfg.patch_size, cfg.patch_size, 3, cfg.width))
            * scale
        },  # no bias (torch Conv2d bias=False)
        "class_embedding": jax.random.normal(keys[1], (cfg.width,)) * scale,
        "positional_embedding": jax.random.normal(keys[2], (n_patches + 1, cfg.width)) * scale,
        "ln_pre": _ln_init(cfg.width),
        "blocks": [_init_block(keys[3 + i], cfg.width) for i in range(cfg.layers)],
        "ln_post": _ln_init(cfg.width),
        "proj": jax.random.normal(keys[-1], (cfg.width, embed_dim)) * scale,
    }


def _apply_vit(params, cfg: VisionViTConfig, x: jnp.ndarray) -> jnp.ndarray:
    """x: [B, R, R, 3] normalized images -> [B, embed_dim].

    Patchify is a reshape + ONE matmul rather than a strided conv: the conv's
    input-gradient is an input-dilated transposed conv that XLA:TPU executes
    ~7x slower than the equivalent matmul transpose (measured 23ms -> ~4ms
    for the 16-cutout guidance backward)."""
    p = cfg.patch_size
    b, r1, r2, _ = x.shape
    gh, gw = r1 // p, r2 // p
    patches = x.reshape(b, gh, p, gw, p, 3).transpose(0, 1, 3, 2, 4, 5)
    patches = patches.reshape(b, gh * gw, p * p * 3)
    kernel = params["conv1"]["kernel"].astype(x.dtype)  # [p, p, 3, width]
    wmat = kernel.reshape(p * p * 3, -1)
    h = jnp.dot(patches, wmat)
    c = h.shape[-1]
    cls = jnp.broadcast_to(params["class_embedding"].astype(h.dtype), (b, 1, c))
    h = jnp.concatenate([cls, h], axis=1)
    h = h + params["positional_embedding"].astype(h.dtype)
    h = layer_norm(params["ln_pre"], h)
    h = _transformer(params["blocks"], h, cfg.heads, causal=False)
    h = layer_norm(params["ln_post"], h[:, 0])
    return jnp.dot(h, params["proj"].astype(h.dtype))


# ---------------------------------------------------------------------------
# ModifiedResNet visual tower
# ---------------------------------------------------------------------------

def _bn_init(ch):
    # folded (inference) batchnorm: y = x*scale + bias
    return {"scale": jnp.ones((ch,), jnp.float32), "bias": jnp.zeros((ch,), jnp.float32)}


def _bn(params, x):
    return (
        x.astype(jnp.float32) * params["scale"] + params["bias"]
    ).astype(x.dtype)


def _init_bottleneck(key, cin, planes, stride):
    # NOTE: stride is static structure (encoded by block position), never a
    # pytree leaf — leaves must all be arrays for jit arguments.
    ks = jax.random.split(key, 4)
    p = {
        "conv1": {"kernel": cnn.conv_init(ks[0], 1, 1, cin, planes)["kernel"]},
        "bn1": _bn_init(planes),
        "conv2": {"kernel": cnn.conv_init(ks[1], 3, 3, planes, planes)["kernel"]},
        "bn2": _bn_init(planes),
        "conv3": {"kernel": cnn.conv_init(ks[2], 1, 1, planes, planes * 4)["kernel"]},
        "bn3": _bn_init(planes * 4),
    }
    if stride > 1 or cin != planes * 4:
        p["down_conv"] = {"kernel": cnn.conv_init(ks[3], 1, 1, cin, planes * 4)["kernel"]}
        p["down_bn"] = _bn_init(planes * 4)
    return p


def _conv_nobias(p, x, stride=1):
    kernel = p["kernel"].astype(x.dtype)
    kh, kw = kernel.shape[0], kernel.shape[1]
    return jax.lax.conv_general_dilated(
        x, kernel, (stride, stride), ((kh // 2, kh // 2), (kw // 2, kw // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(x.dtype)


def _apply_bottleneck(p, x, stride: int):
    relu = jax.nn.relu
    out = relu(_bn(p["bn1"], _conv_nobias(p["conv1"], x)))
    out = relu(_bn(p["bn2"], _conv_nobias(p["conv2"], out)))
    if stride > 1:
        out = cnn.avg_pool_2x(out)  # anti-aliased rect-2 downsample
    out = _bn(p["bn3"], _conv_nobias(p["conv3"], out))
    if "down_conv" in p:
        identity = x
        if stride > 1:
            identity = cnn.avg_pool_2x(identity)
        identity = _bn(p["down_bn"], _conv_nobias(p["down_conv"], identity))
    else:
        identity = x
    return relu(out + identity)


def _init_resnet(key, cfg: VisionResNetConfig, embed_dim: int):
    w = cfg.width
    keys = iter(jax.random.split(key, 256))
    nxt = lambda: next(keys)
    params = {
        "conv1": {"kernel": cnn.conv_init(nxt(), 3, 3, 3, w // 2)["kernel"]},
        "bn1": _bn_init(w // 2),
        "conv2": {"kernel": cnn.conv_init(nxt(), 3, 3, w // 2, w // 2)["kernel"]},
        "bn2": _bn_init(w // 2),
        "conv3": {"kernel": cnn.conv_init(nxt(), 3, 3, w // 2, w)["kernel"]},
        "bn3": _bn_init(w),
    }
    cin = w
    for i, (blocks, planes, stride) in enumerate(
        zip(cfg.layers, (w, w * 2, w * 4, w * 8), (1, 2, 2, 2))
    ):
        layer = [_init_bottleneck(nxt(), cin, planes, stride)]
        cin = planes * 4
        for _ in range(blocks - 1):
            layer.append(_init_bottleneck(nxt(), cin, planes, 1))
        params[f"layer{i + 1}"] = layer
    spacial = cfg.input_resolution // 32
    c = w * 32
    params["attnpool"] = {
        "positional_embedding": jax.random.normal(nxt(), (spacial**2 + 1, c)) / c**0.5,
        "q_proj": cnn.dense_init(nxt(), c, c),
        "k_proj": cnn.dense_init(nxt(), c, c),
        "v_proj": cnn.dense_init(nxt(), c, c),
        "c_proj": cnn.dense_init(nxt(), c, embed_dim),
    }
    return params


def _apply_attnpool(p, x: jnp.ndarray, heads: int) -> jnp.ndarray:
    """x: [B, H, W, C] -> [B, out_dim]. Query = mean token (ext clip
    AttentionPool2d contract)."""
    b, h, w, c = x.shape
    t = x.reshape(b, h * w, c)
    mean_tok = t.mean(axis=1, keepdims=True)
    t = jnp.concatenate([mean_tok, t], axis=1)
    t = t + p["positional_embedding"].astype(t.dtype)
    q = cnn.dense(p["q_proj"], t[:, :1])
    k = cnn.dense(p["k_proj"], t)
    v = cnn.dense(p["v_proj"], t)
    d = c // heads
    q = q.reshape(b, 1, heads, d).transpose(0, 2, 1, 3)
    k = k.reshape(b, -1, heads, d).transpose(0, 2, 1, 3)
    v = v.reshape(b, -1, heads, d).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k)
    wgt = jax.nn.softmax(logits.astype(jnp.float32) / math.sqrt(d), axis=-1).astype(t.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", wgt, v).astype(t.dtype)
    o = o.transpose(0, 2, 1, 3).reshape(b, 1, c)[:, 0]
    return cnn.dense(p["c_proj"], o)


def _apply_resnet(params, cfg: VisionResNetConfig, x: jnp.ndarray) -> jnp.ndarray:
    relu = jax.nn.relu
    h = relu(_bn(params["bn1"], _conv_nobias(params["conv1"], x, stride=2)))
    h = relu(_bn(params["bn2"], _conv_nobias(params["conv2"], h)))
    h = relu(_bn(params["bn3"], _conv_nobias(params["conv3"], h)))
    h = cnn.avg_pool_2x(h)
    for i in range(4):
        layer_stride = (1, 2, 2, 2)[i]
        for j, blk in enumerate(params[f"layer{i + 1}"]):
            h = _apply_bottleneck(blk, h, layer_stride if j == 0 else 1)
    return _apply_attnpool(params["attnpool"], h, cfg.heads)


# ---------------------------------------------------------------------------
# text tower
# ---------------------------------------------------------------------------

def _init_text(key, cfg: TextConfig, embed_dim: int):
    keys = jax.random.split(key, cfg.layers + 4)
    return {
        "token_embedding": jax.random.normal(keys[0], (cfg.vocab_size, cfg.width)) * 0.02,
        "positional_embedding": jax.random.normal(keys[1], (cfg.context_length, cfg.width)) * 0.01,
        "blocks": [_init_block(keys[2 + i], cfg.width) for i in range(cfg.layers)],
        "ln_final": _ln_init(cfg.width),
        "text_projection": jax.random.normal(keys[-1], (cfg.width, embed_dim))
        * cfg.width**-0.5,
    }


def _apply_text(params, cfg: TextConfig, tokens: jnp.ndarray, compute_dtype) -> jnp.ndarray:
    """tokens: [B, 77] int32 -> [B, embed_dim]."""
    h = params["token_embedding"][tokens].astype(compute_dtype)
    h = h + params["positional_embedding"].astype(h.dtype)
    h = _transformer(params["blocks"], h, cfg.heads, causal=True)
    h = layer_norm(params["ln_final"], h)
    eot = jnp.argmax(tokens, axis=-1)
    h = h[jnp.arange(h.shape[0]), eot]
    return jnp.dot(
        h, params["text_projection"].astype(h.dtype)
    )


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def init_clip(key, cfg: CLIPConfig):
    kv, kt = jax.random.split(key)
    if cfg.is_vit:
        visual = _init_vit(kv, cfg.vision, cfg.embed_dim)
    else:
        visual = _init_resnet(kv, cfg.vision, cfg.embed_dim)
    return {"visual": visual, "text": _init_text(kt, cfg.text, cfg.embed_dim)}


def encode_image(
    params, cfg: CLIPConfig, images: jnp.ndarray, *, compute_dtype=jnp.float32
) -> jnp.ndarray:
    """images: [B, R, R, 3], CLIP-normalized, NHWC -> [B, embed_dim] float32."""
    x = images.astype(compute_dtype)
    if cfg.is_vit:
        out = _apply_vit(params["visual"], cfg.vision, x)
    else:
        out = _apply_resnet(params["visual"], cfg.vision, x)
    return out.astype(jnp.float32)


def encode_text(
    params, cfg: CLIPConfig, tokens: jnp.ndarray, *, compute_dtype=jnp.float32
) -> jnp.ndarray:
    """tokens: [B, 77] int -> [B, embed_dim] float32."""
    out = _apply_text(params["text"], cfg.text, tokens.astype(jnp.int32), compute_dtype)
    return out.astype(jnp.float32)
