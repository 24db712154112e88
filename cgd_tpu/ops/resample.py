"""High-quality separable image resampling, numerically equivalent to the
reference's vendored ResizeRight (cgd/ResizeRight/resize_right.py:31-122,
interp_methods.py:35-70) for full output shapes.

TPU-native design: ResizeRight loops dim-by-dim doing a gather of each output
pixel's field of view and a weighted sum. All of that indexing is *static*
given (in_size, out_size, kernel), so we precompute one dense [out, in]
weight matrix per resized dim on the host (float64 numpy, like ResizeRight's
numpy path) and apply it as a tensordot — the whole resize becomes a couple
of MXU matmuls with no dynamic shapes. Zero-padding semantics (pad_mode
'constant', the reference call site's default) are folded into the matrix:
out-of-range taps are dropped after row normalization.

Parity notes:
- Weight math matches ResizeRight exactly: projected grid
  ``j/s + (in-1)/2 - (out-1)/(2s)``, ceil(grid - support/2 - eps) left
  boundary, antialiasing stretch ``s*k(s*x)`` for downscale, row
  normalization with zero-sum guard (resize_right.py:125-213,341-353).
  Golden-tested against the vendored oracle (tests/test_resample.py).
- Partial ``out_shape`` handling is deliberately NOT ResizeRight's: its numpy
  rule appends ``in_shape[:-k]`` (resize_right.py:289), which for an HWC
  image maps (H,W,C)+[s] -> (s,H,W) — garbage. It doesn't matter for parity:
  the reference's only call (cgd/clip_util.py:95-97) passes a PIL image,
  which ResizeRight rejects with AttributeError (it requires numpy/torch),
  so the reference's image-prompt resize never runs as written. We use the
  sane rule: ``out_shape`` replaces the leading dims, trailing dims kept.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Sequence

import jax.numpy as jnp
import numpy as np

_EPS = float(np.finfo(np.float32).eps)


def _lanczos3(x):
    return (
        (np.sin(np.pi * x) * np.sin(np.pi * x / 3) + _EPS)
        / ((np.pi**2 * x**2 / 3) + _EPS)
    ) * (np.abs(x) < 3)


def _lanczos2(x):
    return (
        (np.sin(np.pi * x) * np.sin(np.pi * x / 2) + _EPS)
        / ((np.pi**2 * x**2 / 2) + _EPS)
    ) * (np.abs(x) < 2)


def _cubic(x):
    absx = np.abs(x)
    absx2 = absx**2
    absx3 = absx**3
    return (1.5 * absx3 - 2.5 * absx2 + 1.0) * (absx <= 1.0) + (
        -0.5 * absx3 + 2.5 * absx2 - 4.0 * absx + 2.0
    ) * ((1.0 < absx) & (absx <= 2.0))


def _linear(x):
    return (x + 1) * ((-1 <= x) & (x < 0)) + (1 - x) * ((0 <= x) & (x <= 1))


def _box(x):
    return ((-1 <= x) & (x < 0)) + 1.0 * ((0 <= x) & (x <= 1))


_KERNELS = {
    "lanczos3": (_lanczos3, 6.0),
    "lanczos2": (_lanczos2, 4.0),
    "cubic": (_cubic, 4.0),
    "linear": (_linear, 2.0),
    "box": (_box, 1.0),
}


@lru_cache(maxsize=64)
def _resize_matrix(in_sz: int, out_sz: int, method: str, antialias: bool) -> np.ndarray:
    """Dense [out_sz, in_sz] float32 row-normalized resampling matrix."""
    kernel, support = _KERNELS[method]
    scale = out_sz / in_sz
    if antialias and scale < 1.0:
        kern = lambda x: scale * kernel(scale * x)
        support = support / scale
    else:
        kern = kernel

    grid = np.arange(out_sz, dtype=np.float64) / scale + (in_sz - 1) / 2 - (
        out_sz - 1
    ) / (2 * scale)
    left = np.ceil(grid - support / 2 - _EPS).astype(np.int64)
    taps = int(math.ceil(support - _EPS))
    fov = left[:, None] + np.arange(taps)[None, :]  # [out, taps]
    w = kern(grid[:, None] - fov)
    s = w.sum(axis=1, keepdims=True)
    s[s == 0] = 1.0
    w = w / s

    mat = np.zeros((out_sz, in_sz), np.float64)
    rows = np.repeat(np.arange(out_sz), taps)
    cols = fov.reshape(-1)
    ok = (cols >= 0) & (cols < in_sz)  # constant (zero) padding: drop taps
    np.add.at(mat, (rows[ok], cols[ok]), w.reshape(-1)[ok])
    return mat.astype(np.float32)


def resize(
    image: jnp.ndarray,
    out_shape: Sequence[int],
    method: str = "lanczos3",
    antialias: bool = True,
) -> jnp.ndarray:
    """Resize the leading ``len(out_shape)`` dims of ``image`` to ``out_shape``.

    Separable: one [out, in] matmul per resized dim, applied in ascending
    scale order exactly like ResizeRight's dim loop (resize_right.py:55-60),
    so results are bit-comparable to the reference oracle.
    """
    in_shape = tuple(image.shape)
    full = tuple(int(s) for s in out_shape) + in_shape[len(out_shape) :]
    dims = [d for d in range(len(full)) if full[d] != in_shape[d]]
    dims.sort(key=lambda d: full[d] / in_shape[d])
    x = image
    for d in dims:
        mat = jnp.asarray(_resize_matrix(in_shape[d], full[d], method, antialias))
        x = jnp.moveaxis(jnp.tensordot(mat, x, axes=(1, d)), 0, d)
    return x
