"""High-quality image resampling (the reference vendors ResizeRight for this:
cgd/ResizeRight/, used only for image-prompt preprocessing at
cgd/clip_util.py:95-97).

jax.image.resize already implements the same separable, antialiased
projected-grid resampling family (lanczos3/cubic/linear) on TPU as gathered
matmuls, so we use it rather than porting the torch/numpy implementation.

ResizeRight quirk replicated: a partial out_shape list only reshapes the
leading dims (out_shape=[s] on an HWC image resizes H only).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def resize(
    image: jnp.ndarray,
    out_shape: Sequence[int],
    method: str = "lanczos3",
    antialias: bool = True,
) -> jnp.ndarray:
    full_shape = tuple(out_shape) + tuple(image.shape[len(out_shape):])
    return jax.image.resize(image, full_shape, method=method, antialias=antialias)
