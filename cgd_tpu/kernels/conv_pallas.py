"""Direct 3x3 stride-1 NHWC convolution as a Pallas TPU kernel.

Why: at batch 1, XLA:TPU rewrites the UNet's large spatial convs with a
space-to-batch pass — the MXU work itself runs at ~193 TF/s, but the
surrounding plumbing (pad / slice / layout copies) costs ~25 ms per guided
step at the 256px operating point (hlo_stats r2 profile: "data formatting"
22.5% + copy 6.8% + slice 3.2% + pad 1.6% of step time). This kernel
computes the convolution in place on the NHWC layout: overlapping halo'd
row windows stream HBM->VMEM through the normal Pallas pipeline
(`pl.Element` windows — the remote Mosaic compiler rejects manual
multi-dim-strided DMAs from HBM refs, bisected 2026-08-16), and the 3x3
taps become nine [TH*W, Cin] x [Cin, TCO] MXU matmuls accumulated in f32 —
no space-to-batch, no layout conversion, bias fused into the output write.

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
from jax._src.pallas import core as pallas_core
from jax.experimental.pallas import tpu as pltpu

_W_BYTES_BUDGET = 4 * 1024 * 1024  # per-block weight bytes (double-buffered)


def _pick_tco(cin: int, cout: int):
    """Cout tile + the (possibly padded) Cout it tiles.

    Prefers a tile that divides cout exactly (a multiple of 128 per Mosaic's
    last-dim block rule, or the full cout); otherwise pads cout up to a
    multiple of the largest budget-fitting 128-tile (e.g. the 64px model's
    576-channel convs -> tiled as 5x128 over 640, sliced after). Returns
    None only when even a 128 tile's [3,3,Cin,128] weight block exceeds the
    VMEM budget."""
    def fits(c):
        return 9 * cin * c * 2 <= _W_BYTES_BUDGET

    for c in [cout] + [512, 384, 256, 128]:
        if 0 < c <= cout and cout % c == 0 and (c % 128 == 0 or c == cout) and fits(c):
            return c, cout
    for c in (512, 384, 256, 128):
        if fits(c):
            return c, -(-cout // c) * c
    return None


def _pick_th(h: int, w: int, cin: int, tco: int) -> int:
    """Row-window height: big enough that the [TH*W, Cin] matmul fills the
    MXU, small enough that x window + f32 acc fit VMEM comfortably."""
    th = 8
    while th < h and th * w < 2048:
        nth = th * 2
        if h % nth != 0:
            break
        use = 2 * (nth + 2) * (w + 2) * cin * 2 + nth * w * tco * 6
        if use > 8 * 1024 * 1024:
            break
        th = nth
    return th


def _conv_kernel(x_ref, w_ref, b_ref, out_ref, *, th, w_dim, cin):
    """One program: rows [i*TH, i*TH+TH) of one batch, one Cout tile.

    x_ref is the (TH+2, W+2, Cin) halo window of the host-padded input;
    the nine taps collapse (rows, cols) to matmul rows — Mosaic compiles
    the strided-slice reshape fine (it is the HBM DMA it rejects)."""
    tco = out_ref.shape[-1]
    acc = jnp.zeros((th * w_dim, tco), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xs = x_ref[dy : dy + th, dx : dx + w_dim, :].reshape(th * w_dim, cin)
            acc += jax.lax.dot_general(
                xs, w_ref[dy, dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    acc += b_ref[0].astype(jnp.float32)
    out_ref[:] = acc.reshape(th, w_dim, tco).astype(out_ref.dtype)


def _conv3x3_pallas(x: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    """x [B,H,W,Cin] -> [B,H,W,Cout]; w [3,3,Cin,Cout] HWIO; stride 1, pad 1.

    Skinny channel counts (the UNet's RGB-in / eps+sigma-out convs, where
    XLA picks pathological T(2,128) layouts — ~1.9 ms/step profiled) are
    zero-padded to a lane tile; the padded MXU work is still ~2x faster
    than XLA's layout shuffling at those shapes.
    """
    b, h, w_dim, cin = x.shape
    cout = w.shape[-1]
    cin_pad = (-cin) % 128 if cin % 64 else 0
    cout_pad = (-cout) % 128 if cout % 64 else 0
    if cin_pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cin_pad)))
        w = jnp.pad(w, ((0, 0), (0, 0), (0, cin_pad), (0, 0)))
        cin += cin_pad
    tco, cout_p = _pick_tco(cin, cout + cout_pad)
    if cout_p != cout:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, cout_p - cout)))
        bias = jnp.pad(bias, (0, cout_p - cout))
    th = _pick_th(h, w_dim, cin, tco)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))

    E = pallas_core.Element
    kern = functools.partial(_conv_kernel, th=th, w_dim=w_dim, cin=cin)
    # grid: h fastest so the (j)-indexed weight block stays resident across
    # a full column sweep; x windows re-stream once per Cout tile.
    out = pl.pallas_call(
        kern,
        grid=(b, cout_p // tco, h // th),
        in_specs=[
            pl.BlockSpec(
                (None, E(th + 2), E(w_dim + 2), E(cin)),
                lambda nb, j, i: (nb, i * th, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3, 3, cin, tco), lambda nb, j, i: (0, 0, 0, j),
                memory_space=pltpu.VMEM,
            ),
            # bias as a 2-D block — Mosaic rejects 1-D VMEM operands
            pl.BlockSpec((1, tco), lambda nb, j, i: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, th, w_dim, tco), lambda nb, j, i: (nb, i, 0, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w_dim, cout_p), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w_dim * 9 * cin * cout_p,
            bytes_accessed=b * h * w_dim * (cin * (cout_p // tco) + cout_p) * 2
            + 9 * cin * cout_p * 2 * b,
            transcendentals=0,
        ),
    )(xp, w, bias[None])
    return out[..., :cout] if cout_p != cout else out


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
    """Gate: 3x3 stride-1 symmetric-pad-1 NHWC shapes this kernel handles
    AND wins on (W >= 32 — smaller feature maps are XLA's to keep)."""
    kh, kw = kernel_shape[0], kernel_shape[1]
    if (kh, kw) != (3, 3) or stride != 1:
        return False
    if padding is not None and padding != ((1, 1), (1, 1)):
        return False
    h, w, cin = x_shape[1], x_shape[2], x_shape[3]
    cout = kernel_shape[3]
    # skinny channels are zero-padded to a lane tile inside the kernel
    cin_p = cin + ((-cin) % 128 if cin % 64 else 0)
    cout_p = cout + ((-cout) % 128 if cout % 64 else 0)
    # the custom-vjp input gradient runs the kernel with (cout, cin)
    # transposed weights — both orientations must tile within budget
    if _pick_tco(cin_p, cout_p) is None or _pick_tco(cout_p, cin_p) is None:
        return False
    return w >= 32 and h % 8 == 0 and np.prod(x_shape) > 0
