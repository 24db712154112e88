"""Pallas TPU kernel: VMEM-resident multi-head self-attention.

The ADM UNet attends over ≤(32·32)=1024 tokens — small enough that one
(batch·head) cell's entire q/k/v, logits, and probabilities fit in VMEM, so
no online-softmax streaming is needed: this is "flash attention degenerate
case T fits on chip". vs the XLA path, the [B,H,T,T] logits/probs tensors
never round-trip HBM (forward AND backward; the backward recomputes
probabilities in-kernel, classic flash strategy).

Layout: q,k,v as [B*H, T, d] float32/bf16; d is 64 for every reference
checkpoint (num_head_channels=64) except 128px (d=64 via 256/4). softmax in
f32 with the ADM d^-1/4 double-scaling.

Wired into cgd_tpu.ops.nn.qkv_attention behind `CGD_TPU_PALLAS_ATTN`
(validated vs the einsum path in tests; A/B'd on hardware before default-on).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0].astype(jnp.float32)  # [T, d]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    d = q.shape[-1]
    scale = 1.0 / math.sqrt(math.sqrt(d))
    s = jnp.dot(q * scale, (k * scale).T, preferred_element_type=jnp.float32)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0] = jnp.dot(p, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    d = q.shape[-1]
    scale = 1.0 / math.sqrt(math.sqrt(d))
    s = jnp.dot(q * scale, (k * scale).T, preferred_element_type=jnp.float32)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    dp = jnp.dot(g, v.T, preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq_ref[0] = (jnp.dot(ds, k, preferred_element_type=jnp.float32) * (scale * scale)).astype(
        dq_ref.dtype
    )
    dk_ref[0] = (jnp.dot(ds.T, q, preferred_element_type=jnp.float32) * (scale * scale)).astype(
        dk_ref.dtype
    )
    dv_ref[0] = jnp.dot(p.T, g, preferred_element_type=jnp.float32).astype(dv_ref.dtype)


def _specs(n, t, d):
    blk = pl.BlockSpec((1, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return blk


def _run_fwd(q, k, v, interpret):
    n, t, d = q.shape
    blk = _specs(n, t, d)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(n,),
        in_specs=[blk, blk, blk],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((n, t, d), q.dtype),
        interpret=interpret,
    )(q, k, v)


def _run_bwd(q, k, v, g, interpret):
    n, t, d = q.shape
    blk = _specs(n, t, d)
    return pl.pallas_call(
        _bwd_kernel,
        grid=(n,),
        in_specs=[blk, blk, blk, blk],
        out_specs=(blk, blk, blk),
        out_shape=tuple(jax.ShapeDtypeStruct((n, t, d), q.dtype) for _ in range(3)),
        interpret=interpret,
    )(q, k, v, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_mha(q, k, v, interpret=False):
    """q,k,v: [N, T, d] (N = batch*heads). Returns [N, T, d]."""
    return _run_fwd(q, k, v, interpret)


def _fwd_rule(q, k, v, interpret):
    return _run_fwd(q, k, v, interpret), (q, k, v)


def _bwd_rule(interpret, res, g):
    q, k, v = res
    dq, dk, dv = _run_bwd(q, k, v, g, interpret)
    return dq, dk, dv


flash_mha.defvjp(_fwd_rule, _bwd_rule)
