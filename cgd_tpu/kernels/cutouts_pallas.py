"""Pallas TPU kernel: fused cutout extraction + CLIP normalization.

Replaces the two-einsum cutout path (cgd_tpu/guidance/cutouts.make_cutouts +
separate normalize) with one kernel per (cutout, batch) grid cell:

    out[k*B+b, :, :, c] = (W_y[k] @ img01[b,:,:,c] @ W_x[k]^T - mean[c]) / std[c]

- both contractions run on the MXU from VMEM-resident blocks;
- the [K,B,cut,W,C] intermediate of the einsum path never hits HBM;
- CLIP mean/std normalization fuses into the epilogue.

Backward (gradient wrt the image — the guidance path differentiates through
cutouts) is the transposed pair of matmuls, also as a Pallas kernel, wired
via custom_vjp. The box-filter weight matrices W_y/W_x are tiny and stay in
plain jnp (cgd_tpu/guidance/cutouts._box_weights).

Falls back to the einsum path off-TPU (pl.pallas_call with interpret=True is
used in CPU tests).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(wy_ref, wx_ref, img_ref, mean_ref, std_ref, out_ref):
    """Grid (K, B). Blocks: wy [cut,H], wx [cut,W], img [H,W,C], out [cut,cut,C]."""
    wy = wy_ref[...]  # [cut, H]
    wx = wx_ref[...]  # [cut, W]
    img = img_ref[...]  # [H, W, C]
    c = img.shape[-1]
    for ch in range(c):  # C=3, static unroll
        tmp = jnp.dot(wy, img[:, :, ch], preferred_element_type=jnp.float32)
        cut = jnp.dot(tmp, wx.T, preferred_element_type=jnp.float32)
        out_ref[:, :, ch] = (cut - mean_ref[0, ch]) / std_ref[0, ch]


def _bwd_kernel(wy_ref, wx_ref, g_ref, std_ref, dimg_ref):
    """d_img[b] += sum_k Wy[k]^T @ (g[k,b]/std) @ Wx[k]. Grid (K, B); K is the
    reduction axis — accumulate into the output block across k iterations."""
    k = pl.program_id(0)
    wy = wy_ref[...]
    wx = wx_ref[...]
    g = g_ref[...]  # [cut, cut, C]
    c = g.shape[-1]

    @pl.when(k == 0)
    def _():
        dimg_ref[...] = jnp.zeros_like(dimg_ref)

    for ch in range(c):
        gch = g[:, :, ch] / std_ref[0, ch]
        tmp = jnp.dot(wy.T, gch, preferred_element_type=jnp.float32)  # [H, cut]
        dimg_ref[:, :, ch] += jnp.dot(tmp, wx, preferred_element_type=jnp.float32)


def _run_fwd(wy, wx, img, mean, std, *, interpret):
    k, cut, h = wy.shape
    b, _, w, c = img.shape
    return pl.pallas_call(
        _fwd_kernel,
        grid=(k, b),
        in_specs=[
            pl.BlockSpec((None, cut, h), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, cut, w), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, h, w, c), lambda i, j: (j, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, cut, cut, c), lambda i, j: (i * b + j, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((k * b, cut, cut, c), jnp.float32),
        interpret=interpret,
    )(wy, wx, img, mean, std)


def _run_bwd(wy, wx, g, std, img_shape, *, interpret):
    k, cut, h = wy.shape
    b, _, w, c = img_shape
    g = g.reshape(k, b, cut, cut, c)
    return pl.pallas_call(
        _bwd_kernel,
        grid=(k, b),
        in_specs=[
            pl.BlockSpec((None, cut, h), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, cut, w), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (None, None, cut, cut, c), lambda i, j: (i, j, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, h, w, c), lambda i, j: (j, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), jnp.float32),
        interpret=interpret,
    )(wy, wx, g, std)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_cutouts_normalize(img, wy, wx, mean, std, interpret=False):
    """img: [B,H,W,C] in [0,1]; wy/wx: [K,cut,{H,W}] box weights;
    mean/std: [1,C] SMEM scalars. Returns [K*B,cut,cut,C] CLIP-normalized."""
    return _run_fwd(wy, wx, img, mean, std, interpret=interpret)


def _fwd_rule(img, wy, wx, mean, std, interpret):
    out = _run_fwd(wy, wx, img, mean, std, interpret=interpret)
    return out, (img.shape, wy, wx, std)


def _bwd_rule(interpret, res, g):
    img_shape, wy, wx, std = res
    dimg = _run_bwd(wy, wx, g, std, img_shape, interpret=interpret)
    return dimg, None, None, None, None


fused_cutouts_normalize.defvjp(_fwd_rule, _bwd_rule)
