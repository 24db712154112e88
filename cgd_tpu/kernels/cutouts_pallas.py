"""Pallas TPU kernel: fused cutout extraction + CLIP normalization.

Replaces the two-einsum cutout path (cgd_tpu/guidance/cutouts.make_cutouts +
separate normalize) with one kernel per (cutout, batch) grid cell:

    out[k*B+b, :, :, c] = (W_y[k] @ img01[b,:,:,c] @ W_x[k]^T - mean[c]) / std[c]

- both contractions run on the MXU from VMEM-resident blocks;
- the [K,B,cut,W,C] intermediate of the einsum path never hits HBM;
- CLIP mean/std normalization fuses into the epilogue.

Backward (gradient wrt the image — the guidance path differentiates through
cutouts) is the transposed pair of matmuls as plain einsums via custom_vjp
(XLA emits these reductions well; a Pallas accumulate-across-grid version
hit Mosaic scoped-VMEM limits at full scale). The box-filter weight matrices W_y/W_x are tiny and stay in
plain jnp (cgd_tpu/guidance/cutouts._box_weights).

Falls back to the einsum path off-TPU (pl.pallas_call with interpret=True is
used in CPU tests).
"""

from __future__ import annotations

import functools
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_cutouts_normalize(img, wy, wx, mean, std, interpret=False):
    """img: [B,H,W,C] in [0,1]; wy/wx: [K,cut,{H,W}] box weights;
    mean/std: [1,C] SMEM scalars. Returns [K*B,cut,cut,C] CLIP-normalized."""
    return _run_fwd(wy, wx, img, mean, std, interpret=interpret)


def _fwd_rule(img, wy, wx, mean, std, interpret):
    out = _run_fwd(wy, wx, img, mean, std, interpret=interpret)
    return out, (img.shape, wy, wx, std)


def _bwd_rule(interpret, res, g):
    # Backward as plain einsums (MXU matmuls): the Pallas accumulate-across-
    # grid version hit a Mosaic scoped-VMEM limit at full scale, and XLA
    # already emits this reduction well (~1.5ms total at 256px/cutn16).
    img_shape, wy, wx, std = res
    b = img_shape[0]
    k, cut, _ = wy.shape
    c = img_shape[-1]
    gsc = g.reshape(k, b, cut, cut, c) / std[0]
    tmp = jnp.einsum("kyh,kbyxc->kbhxc", wy, gsc)
    dimg = jnp.einsum("kxw,kbhxc->bhwc", wx, tmp)
    return dimg, None, None, None, None


fused_cutouts_normalize.defvjp(_fwd_rule, _bwd_rule)
