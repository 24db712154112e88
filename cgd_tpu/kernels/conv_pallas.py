"""Direct 3x3 stride-1 NHWC convolution as a Pallas TPU kernel.

Why: at batch 1, XLA:TPU rewrites the UNet's large spatial convs with a
space-to-batch pass — the MXU work itself runs at ~193 TF/s, but the
surrounding plumbing (pad / slice / layout copies) costs ~25 ms per guided
step at the 256px operating point (hlo_stats r2 profile: "data formatting"
22.5% + copy 6.8% + slice 3.2% + pad 1.6% of step time). This kernel
computes the convolution in place on the NHWC layout: the halo'd input rows
are DMA'd HBM->VMEM per tile and the 3x3 taps become nine
[TH*W, Cin] x [Cin, TCO] MXU matmuls accumulated in f32 — no layout
conversion, no space-to-batch glue, bias fused into the output write.

Every 3x3 conv in the real ADM checkpoints is stride-1 pad-1 (downsampling
is avg-pool inside ResBlocks, resblock_updown flags in
/root/reference/data/diffusion_model_flags.py), so this one kernel covers
the whole UNet hot path. 1x1 convs are plain matmuls and stay with XLA.

Gradient: input-gradient of a stride-1 pad-1 3x3 conv is the same conv with
spatially flipped, in/out-transposed weights — also this kernel. The weight
and bias gradients are computed with XLA in the custom_vjp backward (exact;
DCE'd in the sampling path, which differentiates w.r.t. the image only).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tiles(h: int, w: int, cin: int, cout: int):
    """Choose (row tile TH, cout tile TCO, cin tile TCI) under a VMEM budget.

    VMEM use ~= 2*(TH+2)*(W+2)*TCI*2B (double-buffered input)
              + 3*3*TCI*TCO*2B (weights) + TH*W*TCO*4B (f32 acc).
    """
    tco = min(cout, 256)
    tci = min(cin, 512)
    budget = 10 * 1024 * 1024
    th = min(h, 8)
    while True:
        use = (
            2 * (th + 2) * (w + 2) * tci * 2
            + 9 * tci * tco * 2
            + th * w * tco * 4
            + th * w * tco * 2
        )
        if use <= budget or (tci <= 128 and tco <= 128 and th <= 8):
            break
        if tci > 128:
            tci //= 2
        elif tco > 128:
            tco //= 2
        else:
            th = max(1, th // 2)
    # grow TH while budget allows (bigger matmuls amortize better)
    while th < h:
        nth = min(h, th * 2)
        use = (
            2 * (nth + 2) * (w + 2) * tci * 2
            + 9 * tci * tco * 2
            + nth * w * tco * 4
            + nth * w * tco * 2
        )
        if use > budget or nth * w > 4096:
            break
        th = nth
    return th, tco, tci


def _conv_kernel(x_hbm, w_ref, b_ref, out_ref, xt, acc, sem, *, th, w_dim, tci, n_ci):
    """Grid: (B, H/TH, Cout/TCO, Cin/TCI). x stays in HBM; rows DMA'd here."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    k = pl.program_id(3)

    # halo'd row block: rows [i*TH, i*TH + TH+2) of the pre-padded input
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * th, th + 2), :, pl.ds(k * tci, tci)], xt, sem
    )
    dma.start()

    @pl.when(k == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    dma.wait()

    # nine taps as 2-D MXU matmuls. The halo'd block is reshaped once per dx
    # shift ((th+2, w+2) rows collapse to sublanes; lanes stay Cin), then each
    # dy offset is a contiguous row-slice of the collapsed view.
    tco = acc.shape[-1]
    partial = jnp.zeros((th * w_dim, tco), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xs = xt[dy : dy + th, dx : dx + w_dim, :].reshape(th * w_dim, tci)
            ws = w_ref[dy, dx, :, :]
            partial += jax.lax.dot_general(
                xs, ws, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    acc[:] += partial.reshape(th, w_dim, tco)

    @pl.when(k == n_ci - 1)
    def _():
        out_ref[0] = (acc[:] + b_ref[0].astype(jnp.float32)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=())
def _conv3x3_pallas(x: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    """x [B,H,W,Cin] -> [B,H,W,Cout]; w [3,3,Cin,Cout] HWIO; stride 1, pad 1."""
    b, h, w_dim, cin = x.shape
    cout = w.shape[-1]
    th, tco, tci = _pick_tiles(h, w_dim, cin, cout)
    # pad: +1 halo each side spatially; round Cin/H up to tile multiples
    cin_p = -(-cin // tci) * tci
    h_p = -(-h // th) * th
    xp = jnp.pad(
        x, ((0, 0), (1, 1 + (h_p - h)), (1, 1), (0, cin_p - cin))
    )
    wp = jnp.pad(w, ((0, 0), (0, 0), (0, cin_p - cin), (0, 0)))
    n_ci = cin_p // tci

    grid = (b, h_p // th, cout // tco if cout % tco == 0 else -(-cout // tco), n_ci)
    cout_p = grid[2] * tco
    if cout_p != cout:
        wp = jnp.pad(wp, ((0, 0), (0, 0), (0, 0), (0, cout_p - cout)))
        bias_p = jnp.pad(bias, (0, cout_p - cout))[None]
    else:
        bias_p = bias[None]

    kern = functools.partial(
        _conv_kernel, th=th, w_dim=w_dim, tci=tci, n_ci=n_ci
    )
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # x: manual DMA
            pl.BlockSpec(
                (3, 3, tci, tco), lambda b, i, j, k: (0, 0, k, j),
                memory_space=pltpu.VMEM,
            ),
            # bias as a 2-D block — Mosaic rejects 1-D VMEM operands
            pl.BlockSpec((1, tco), lambda b, i, j, k: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, w_dim, tco), lambda b, i, j, k: (b, i, 0, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h_p, w_dim, cout_p), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2, w_dim + 2, tci), x.dtype),
            pltpu.VMEM((th, w_dim, tco), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h_p * w_dim * 9 * cin_p * cout_p,
            bytes_accessed=b * h_p * w_dim * (cin_p + cout_p) * 2,
            transcendentals=0,
        ),
    )(xp, wp, bias_p)
    return out[:, :h, :, :cout]


@jax.custom_vjp
def conv3x3(x: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-1 pad-1 NHWC conv (Pallas direct kernel), bias fused."""
    return _conv3x3_pallas(x, w, bias)


def _conv3x3_fwd(x, w, bias):
    return _conv3x3_pallas(x, w, bias), (x, w)


def _xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def _conv3x3_bwd(res, g):
    x, w = res
    # dx: same conv with flipped taps and I/O-transposed weights (exact for
    # stride 1, pad 1). Zero bias re-uses the fused-bias kernel.
    wt = jnp.flip(w, axis=(0, 1)).swapaxes(2, 3)
    dx = _conv3x3_pallas(g, wt.astype(w.dtype), jnp.zeros((w.shape[2],), w.dtype))
    # dw/db: exact, via XLA — dead-code-eliminated in the sampling path
    # (guidance differentiates w.r.t. the image only).
    _, w_vjp = jax.vjp(lambda w_: _xla_conv(x, w_), w)
    (dw,) = w_vjp(g.astype(x.dtype))
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2)).astype(g.dtype)
    return dx, dw, db


conv3x3.defvjp(_conv3x3_fwd, _conv3x3_bwd)


def conv3x3_available(x_shape, kernel_shape, stride: int, padding) -> bool:
    """Gate: kernel handles 3x3, stride 1, symmetric pad 1, W mult of 8."""
    kh, kw = kernel_shape[0], kernel_shape[1]
    if (kh, kw) != (3, 3) or stride != 1:
        return False
    if padding is not None and padding != ((1, 1), (1, 1)):
        return False
    h, w = x_shape[1], x_shape[2]
    return w % 8 == 0 and h >= 8 and np.prod(x_shape) > 0
