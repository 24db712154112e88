"""VGG16 feature taps + LPIPS perceptual distance.

Reimplements the used subset of lpips 0.1.4 (``LPIPS(net='vgg')``; external
dep of the reference, instantiated at cgd/cgd.py:146-148 and called as
``lpips_vgg(x_in, init_tensor)`` on [-1,1] NHWC images): torchvision VGG16
features at the 5 relu taps (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3),
input scaling layer, per-channel unit normalization, learned non-negative
1x1 linear heads, spatial + tap mean-sum.

Weights (torchvision VGG16 + lpips linear heads) are mapped in by
cgd_tpu/convert; random init is available for tests.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from cgd_tpu.ops import nn as cnn

# channels per conv layer, 'M' = maxpool (VGG16 feature stack)
VGG16_LAYOUT = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512]
# tap indices: after relu of the last conv in each block
TAP_AFTER_CONV = [1, 3, 6, 9, 12]  # 0-based index into conv list
TAP_CHANNELS = [64, 128, 256, 512, 512]

# LPIPS ScalingLayer constants (lpips 0.1.4 contract, input in [-1,1])
_SHIFT = jnp.array([-0.030, -0.088, -0.188], jnp.float32)
_SCALE = jnp.array([0.458, 0.448, 0.450], jnp.float32)


def init_vgg_lpips(key):
    keys = iter(jax.random.split(key, 64))
    convs = []
    cin = 3
    for c in VGG16_LAYOUT:
        if c == "M":
            continue
        convs.append(cnn.conv_init(next(keys), 3, 3, cin, c))
        cin = c
    lins = [
        {"kernel": jnp.abs(jax.random.normal(next(keys), (c, 1))) * 0.1}
        for c in TAP_CHANNELS
    ]
    return {"convs": convs, "lins": lins}


def _vgg_taps(params, x: jnp.ndarray) -> List[jnp.ndarray]:
    taps = []
    h = x
    conv_idx = 0
    for c in VGG16_LAYOUT:
        if c == "M":
            h = -jax.lax.reduce_window(
                -h, jnp.inf, jax.lax.min, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
            continue
        h = jax.nn.relu(cnn.conv2d(params["convs"][conv_idx], h))
        if conv_idx in TAP_AFTER_CONV:
            taps.append(h)
        conv_idx += 1
    return taps


def lpips_distance(params, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Perceptual distance. x, y: [B,H,W,3] in [-1,1]. Returns [B]."""
    def prep(im):
        return (im.astype(jnp.float32) - _SHIFT) / _SCALE

    taps_x = _vgg_taps(params, prep(x))
    taps_y = _vgg_taps(params, prep(y))
    total = 0.0
    for tx, ty, lin in zip(taps_x, taps_y, params["lins"]):
        # upstream normalize_tensor (lpips 0.1.4 lpips/__init__.py):
        # in_feat / (sqrt(sum(in_feat**2, dim=1)) + eps) — eps is added to
        # the NORM, not under the sqrt (audited r5; both this file and the
        # torch twin oracle previously had eps inside the sqrt, a shared
        # misreading that all crosschecks were blind to)
        nx = tx / (jnp.sqrt(jnp.sum(tx**2, -1, keepdims=True)) + 1e-10)
        ny = ty / (jnp.sqrt(jnp.sum(ty**2, -1, keepdims=True)) + 1e-10)
        diff = (nx - ny) ** 2
        w = lin["kernel"][:, 0]  # [C]
        per_pix = jnp.einsum("bhwc,c->bhw", diff, w)
        total = total + per_pix.mean(axis=(1, 2))
    return total
