"""Low-level neural-net ops, TPU-first.

Conventions (deliberately different from the torch reference — see SURVEY.md §7):
- Images/activations are channels-last NHWC; conv weights are HWIO. This is
  the layout XLA:TPU tiles best onto the MXU without transposes.
- bf16 activations ride the MXU (which accumulates partial products in fp32
  internally); normalization and softmax run in explicit fp32 islands — the
  TPU analog of the reference's fp16-with-fp32-GroupNorm-islands policy (ext
  guided_diffusion nn.py GroupNorm32, per SURVEY.md §2b). We deliberately do
  NOT pass preferred_element_type on mixed-precision ops: an f32-output conv
  with bf16 kernels has no valid transpose under jax.grad.
- Params are plain dicts of jnp arrays ("kernel"/"bias"/"scale"), pytree-native.
"""

from __future__ import annotations

import contextlib
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp


_conv_routing_override = None  # see conv_routing(); beats the env flags


@contextlib.contextmanager
def conv_routing(mode):
    """Force conv routing for the dynamic extent: '' (XLA), 'plain', 'spmd',
    or None (no override — env flags / platform defaults apply).

    Process-local and restored on exit — replaces the round-2 env-var
    mutation in api.py's mesh branch, which leaked the routing decision into
    every later run in the same process (ADVICE r2 medium). Shape
    availability gates still apply under an override; only the *policy*
    (XLA vs plain kernel vs SPMD-wrapped kernel) is pinned.
    """
    global _conv_routing_override
    prev = _conv_routing_override
    _conv_routing_override = mode
    try:
        yield
    finally:
        _conv_routing_override = prev


def _pallas_conv_mode(x_shape, kernel_shape, stride, padding, itemsize=2) -> str:
    """'' (XLA), 'plain', or 'spmd' for an eligible 3x3 conv.

    Default ON ('plain') for accelerator backends — measured e2e win at the
    256px ddim250 headline: 13.95 -> 12.91 s/image (PERF.md round-2 A/B).
    CGD_TPU_PALLAS_CONV=0 forces XLA's conv; =1 forces the kernel even on
    CPU (interpret-mode tests). On a CPU default backend the kernel cannot
    compile, so the XLA path is kept automatically (tests, dryrun_multichip).

    CGD_TPU_PALLAS_CONV_SPMD=1 selects the custom_partitioning-wrapped
    variants (kernels/conv_spmd.py) so mesh-sharded runs keep the Pallas
    convs — set by api.py when a mesh is in play; the partition callbacks
    live in the client process, which the axon remote-compile path cannot
    call back into, hence not the single-chip default.
    """
    from cgd_tpu.kernels.conv_pallas import conv3x3_available

    if _conv_routing_override is not None:
        if _conv_routing_override == "":
            return ""
        if not conv3x3_available(x_shape, kernel_shape, stride, padding, itemsize):
            return ""
        return _conv_routing_override
    flag = os.environ.get("CGD_TPU_PALLAS_CONV")
    if flag == "0":
        return ""
    if flag != "1" and jax.default_backend() == "cpu":
        return ""
    if not conv3x3_available(x_shape, kernel_shape, stride, padding, itemsize):
        return ""
    return "spmd" if os.environ.get("CGD_TPU_PALLAS_CONV_SPMD") == "1" else "plain"




def silu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.silu(x)


def cast_conv_params(params, compute_dtype):
    """Pre-cast 4-D conv kernels (+ their biases) to the compute dtype.

    The per-op ``kernel.astype(x.dtype)`` inside the scanned step becomes a
    no-op, removing the per-step f32->bf16 weight converts + the HBM copy
    pairs XLA schedules to satisfy the Pallas calls' layout constraints
    (r2c-final profile: ~1.5 ms/step of [3,3,1024,1024]-class copy-dones).
    Bit-identical results — the same cast, applied once host-side. Norm
    params and the f32-input dense layers (time/label embedding chain) are
    left untouched; do NOT apply to the LPIPS VGG tree (those convs run in
    f32 by design).
    """
    if jnp.dtype(compute_dtype) == jnp.float32:
        return params

    def walk(node):
        if isinstance(node, dict):
            k = node.get("kernel")
            if k is not None and getattr(k, "ndim", 0) == 4:
                return {key: v.astype(compute_dtype) for key, v in node.items()}
            return {key: walk(v) for key, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return node

    return walk(params)


# ---------------------------------------------------------------------------
# parameter initializers
# ---------------------------------------------------------------------------

def conv_init(key, kh: int, kw: int, cin: int, cout: int, zero: bool = False, dtype=jnp.float32):
    if zero:
        kernel = jnp.zeros((kh, kw, cin, cout), dtype)
    else:
        fan_in = kh * kw * cin
        bound = 1.0 / math.sqrt(fan_in)
        kernel = jax.random.uniform(key, (kh, kw, cin, cout), dtype, -bound, bound)
    return {"kernel": kernel, "bias": jnp.zeros((cout,), dtype)}


def dense_init(key, cin: int, cout: int, zero: bool = False, dtype=jnp.float32):
    if zero:
        kernel = jnp.zeros((cin, cout), dtype)
    else:
        bound = 1.0 / math.sqrt(cin)
        kernel = jax.random.uniform(key, (cin, cout), dtype, -bound, bound)
    return {"kernel": kernel, "bias": jnp.zeros((cout,), dtype)}


def group_norm_init(channels: int, dtype=jnp.float32):
    return {"scale": jnp.ones((channels,), dtype), "bias": jnp.zeros((channels,), dtype)}


def embedding_init(key, num: int, dim: int, dtype=jnp.float32):
    return {"table": jax.random.normal(key, (num, dim), dtype)}


# ---------------------------------------------------------------------------
# forward ops
# ---------------------------------------------------------------------------

def conv2d(params, x: jnp.ndarray, stride: int = 1, padding=None) -> jnp.ndarray:
    """NHWC conv with fp32 accumulation; output cast back to x.dtype.

    Default padding is symmetric k//2 per side (torch Conv2d semantics), NOT
    XLA "SAME" — they differ for strided convs, and checkpoint parity needs
    the torch alignment.
    """
    kernel = params["kernel"].astype(x.dtype)
    kh, kw = kernel.shape[0], kernel.shape[1]
    if padding is None:
        padding = ((kh // 2, kh // 2), (kw // 2, kw // 2))
    if (kh, kw) == (1, 1) and stride == 1 and padding == ((0, 0), (0, 0)):
        # 1x1 convs as plain matmuls: XLA's convolution path picks
        # space-to-batch T(2,128) layouts for these and runs them ~4x
        # slower than the equivalent dot (profiled on v5e — PERF.md r2;
        # the ADM skip-projection convs alone cost ~5 ms/step as convs).
        out = jnp.einsum("bhwc,cd->bhwd", x, kernel[0, 0])
        return out + params["bias"].astype(out.dtype)
    mode = _pallas_conv_mode(
        x.shape, kernel.shape, stride, padding, jnp.dtype(x.dtype).itemsize
    )
    if mode:
        if mode == "spmd":
            from cgd_tpu.kernels.conv_spmd import conv3x3
        else:
            from cgd_tpu.kernels.conv_pallas import conv3x3

        return conv3x3(x, kernel, params["bias"].astype(x.dtype))
    out = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    # bias in compute dtype: an f32 bias add would materialize a full-size
    # f32 tensor after every conv (2x HBM traffic; measured on v5e). Matches
    # the reference's fp16-model-with-fp16-bias behavior.
    return out + params["bias"].astype(out.dtype)


def dense(params, x: jnp.ndarray) -> jnp.ndarray:
    kernel = params["kernel"].astype(x.dtype)
    out = jnp.dot(x, kernel)
    return out + params["bias"].astype(out.dtype)


def _gn_groups(c: int, num_groups: int) -> int:
    # Real ADM channel counts are all multiples of 32; shrink groups only for
    # tiny test configs.
    while c % num_groups:
        num_groups //= 2
    return num_groups


def _gn_stats(x: jnp.ndarray, num_groups: int, eps: float):
    """Per-(batch, group) mean and rsqrt(var+eps), f32, one fused pass over
    the (bf16) input — E[x^2]-E[x]^2, never materializing a f32 copy."""
    c = x.shape[-1]
    shape = x.shape[:-1] + (num_groups, c // num_groups)
    g = x.reshape(shape)
    reduce_axes = tuple(range(1, g.ndim - 2)) + (g.ndim - 1,)
    mean = jnp.mean(g, axis=reduce_axes, keepdims=True, dtype=jnp.float32)
    mean_sq = jnp.mean(
        jnp.square(g.astype(jnp.float32)), axis=reduce_axes, keepdims=True,
        dtype=jnp.float32,
    )
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    return mean, inv


def group_norm(params, x: jnp.ndarray, num_groups: int = 32, eps: float = 1e-5) -> jnp.ndarray:
    """GroupNorm over channels-last input.

    Statistics and the normalization arithmetic are float32 (the GroupNorm32
    contract, ext guided_diffusion/nn.py, SURVEY.md §2b) but the full-size
    tensor is NEVER materialized in f32: stats accumulate in f32 straight
    from the (bf16) input in one fused pass (E[x^2]-E[x]^2), and the apply
    pass reads bf16/writes bf16 with the f32 math fused per element. The
    round-1 variant cast x to f32 up front, which made XLA materialize and
    re-read full f32 copies at the 256^2x512 decoder levels (~2 ms per GN
    stats pass at 634 GB/s, hlo_stats r2 profile); this version halves that
    HBM traffic.
    """
    orig_dtype = x.dtype
    c = x.shape[-1]
    num_groups = _gn_groups(c, num_groups)
    mean, inv = _gn_stats(x, num_groups, eps)
    g = x.reshape(x.shape[:-1] + (num_groups, c // num_groups))
    # second pass: bf16 in -> f32 elementwise (fused, never stored) -> bf16 out
    g = (g.astype(jnp.float32) - mean) * inv
    out = g.reshape(x.shape)
    out = out * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return out.astype(orig_dtype)


def fused_gn_silu_conv(
    norm_params,
    conv_params,
    x: jnp.ndarray,
    scale_shift=None,
    skip: Optional[jnp.ndarray] = None,
    num_groups: int = 32,
    eps: float = 1e-5,
    resample: str = "",
) -> jnp.ndarray:
    """GroupNorm -> [emb scale-shift] -> SiLU -> [avg-pool/nearest-2x] ->
    conv3x3 [+ residual], with the whole elementwise (+resample) chain
    fused into the Pallas conv's window load.

    The GN apply + scale-shift collapse into per-(batch, channel) f32
    vectors A/B (act = silu(x*A + B)); only the tiny stats reduction stays
    outside the kernel. Saves one full HBM write+read of the activation
    tensor per conv vs the unfused chain (and the residual add's read+write
    when ``skip`` is given; and the resampled tensor's round trip when
    ``resample`` is 'down'/'up'). Reference chain: ext guided_diffusion
    unet.py ResBlock (GroupNorm32 -> SiLU -> [h_upd] -> conv,
    use_scale_shift_norm variant).

    Falls back to the exact unfused ops when the Pallas conv is unavailable
    (CPU backends, mesh-sharded runs, ineligible shapes).
    """
    kernel = conv_params["kernel"]
    mode = _pallas_conv_mode(
        x.shape, kernel.shape, 1, ((1, 1), (1, 1)), jnp.dtype(x.dtype).itemsize
    )
    if mode and resample:
        from cgd_tpu.kernels.conv_pallas import resample_fused_available

        # the SPMD wrappers do not cover the resample variants
        if mode != "plain" or not resample_fused_available(
            x.shape, kernel.shape, resample, jnp.dtype(x.dtype).itemsize
        ):
            mode = ""
    if not mode:
        h = group_norm(norm_params, x, num_groups, eps)
        if scale_shift is not None:
            h = h * (1.0 + scale_shift[0]) + scale_shift[1]
        h = silu(h)
        if resample == "down":
            h = avg_pool_2x(h)
        elif resample == "up":
            h = upsample_nearest_2x(h)
        out = conv2d(conv_params, h)
        return out + skip if skip is not None else out

    if mode == "spmd":
        from cgd_tpu.kernels.conv_spmd import conv3x3_gn_silu, conv3x3_gn_silu_add
    else:
        from cgd_tpu.kernels.conv_pallas import (
            conv3x3_gn_silu,
            conv3x3_gn_silu_add,
            conv3x3_gn_silu_up,
        )

    b, c = x.shape[0], x.shape[-1]
    groups = _gn_groups(c, num_groups)
    mean, inv = _gn_stats(x, groups, eps)  # [B,1,1,G,1] f32
    rep = c // groups
    meanc = jnp.repeat(mean.reshape(b, groups), rep, axis=-1)  # [B,C]
    invc = jnp.repeat(inv.reshape(b, groups), rep, axis=-1)
    gamma = norm_params["scale"].astype(jnp.float32)[None]  # [1,C]
    beta = norm_params["bias"].astype(jnp.float32)[None]
    A = invc * gamma
    B = beta - meanc * A
    if scale_shift is not None:
        s = scale_shift[0].reshape(b, c).astype(jnp.float32)
        t = scale_shift[1].reshape(b, c).astype(jnp.float32)
        A = A * (1.0 + s)
        B = B * (1.0 + s) + t
    wk = kernel.astype(x.dtype)
    bias = conv_params["bias"].astype(x.dtype)
    if resample == "up":
        return conv3x3_gn_silu_up(x, A, B, wk, bias)
    if skip is not None:
        return conv3x3_gn_silu_add(x, A, B, wk, bias, skip.astype(x.dtype))
    return conv3x3_gn_silu(x, A, B, wk, bias)


def timestep_embedding(timesteps: jnp.ndarray, dim: int, max_period: int = 10000) -> jnp.ndarray:
    """Sinusoidal timestep embedding, [cos|sin] order (ADM convention).

    Computed in float32; ``timesteps`` may be float (rescaled) or int.
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def avg_pool_2x(x: jnp.ndarray) -> jnp.ndarray:
    # f32 reduce_window, cast back (a reshape-slice-sum variant measured
    # slower end-to-end on v5e — XLA's window reduction fuses better)
    return jax.lax.reduce_window(
        x.astype(jnp.float32), 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ).astype(x.dtype) * 0.25


def qkv_attention(qkv: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """Multi-head self-attention from a fused qkv tensor.

    qkv: [B, T, 3*C] laid out as [q_heads | k_heads | v_heads] (the "new
    attention order" canonical layout; legacy checkpoints are permuted into
    this layout at conversion time — see cgd_tpu/convert).
    Returns [B, T, C]. Softmax in float32; matmuls fp32-accumulated (MXU).

    CGD_TPU_PALLAS_ATTN=1 routes through the VMEM-resident Pallas kernel
    (kernels/attention_pallas.py). Measured on v5e at the UNet's largest
    attention (T=1024, d=64): within noise of XLA (0.63 vs 0.65 ms fwd) —
    XLA already keeps these logits on-chip, so it stays opt-in.
    """
    b, t, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, t, num_heads, d).transpose(0, 2, 1, 3)
    k = k.reshape(b, t, num_heads, d).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, num_heads, d).transpose(0, 2, 1, 3)
    if os.environ.get("CGD_TPU_PALLAS_ATTN"):
        from cgd_tpu.kernels.attention_pallas import flash_mha

        interpret = jax.default_backend() != "tpu"
        out = flash_mha(
            q.reshape(b * num_heads, t, d),
            k.reshape(b * num_heads, t, d),
            v.reshape(b * num_heads, t, d),
            interpret,
        ).reshape(b, num_heads, t, d)
        return out.transpose(0, 2, 1, 3).reshape(b, t, c)
    # ADM scales both q and k by d^-1/4 for fp16 stability; same math as 1/sqrt(d)
    scale = 1.0 / math.sqrt(math.sqrt(d))
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k * scale)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(qkv.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
    out = out.astype(qkv.dtype)
    return out.transpose(0, 2, 1, 3).reshape(b, t, c)
