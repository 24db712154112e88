"""Random cutouts as batched separable box-filter resamples (MXU-friendly).

Replaces the reference's MakeCutouts (cgd/modules.py:5-66) —
crop-then-adaptive_avg_pool2d with dynamic per-cutout sizes — which cannot be
expressed under XLA's static-shape model. TPU-native design (SURVEY.md §7
hard part #1):

  For each cutout k, sample (offset_x, offset_y, size) with the reference's
  distribution: size = floor(u^cut_pow * (max-min) + min), offsets uniform in
  [0, side-size]. Build two small weight matrices W_y: [cut, H], W_x: [cut, W]
  whose row i holds the overlap of output bin i (a box of width size/cut)
  with each input pixel cell. The cutout is then

      cutout_k = einsum(W_y^k, image, W_x^k)

  — two dense matmuls that tile straight onto the MXU, fully differentiable
  through the weights-free image path, identical in expectation to
  crop+box-pool (adaptive_avg_pool differs only in per-bin rounding).

Coordinate caching (--cached-cutouts, cgd/modules.py:26-36) falls out for
free: coords are data, so reusing them across steps is just reusing arrays.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class CutoutSpec(NamedTuple):
    """Per-cutout crop coordinates (all float32 arrays of shape [K])."""

    offset_x: jnp.ndarray
    offset_y: jnp.ndarray
    size: jnp.ndarray


def sample_cutout_coords(
    rng: jax.Array,
    num_cutouts: int,
    side_x: int,
    side_y: int,
    cut_size: int,
    cut_pow: float = 1.0,
) -> CutoutSpec:
    """Sample cutout coords with the reference's distribution
    (cgd/modules.py:43-47): size = int(rand^pow * (max-min) + min),
    max = min(side_x, side_y), min = min(side_x, side_y, cut_size)."""
    max_size = min(side_y, side_x)
    min_size = min(side_y, side_x, cut_size)
    k_size, k_x, k_y = jax.random.split(rng, 3)
    u = jax.random.uniform(k_size, (num_cutouts,))
    size = jnp.floor(u**cut_pow * (max_size - min_size) + min_size)
    # offsets: uniform integers in [0, side - size] (inclusive)
    ux = jax.random.uniform(k_x, (num_cutouts,))
    uy = jax.random.uniform(k_y, (num_cutouts,))
    offset_x = jnp.floor(ux * (side_x - size + 1.0))
    offset_y = jnp.floor(uy * (side_y - size + 1.0))
    return CutoutSpec(offset_x, offset_y, size)


def _box_weights(offset: jnp.ndarray, size: jnp.ndarray, in_size: int, out_size: int):
    """[K] offsets/sizes -> [K, out_size, in_size] box-filter matrices."""
    i = jnp.arange(out_size, dtype=jnp.float32)
    j = jnp.arange(in_size, dtype=jnp.float32)
    # bin i covers [offset + i*size/out, offset + (i+1)*size/out)
    scale = size[:, None] / out_size  # [K,1]
    lo = offset[:, None] + i[None, :] * scale  # [K,out]
    hi = lo + scale
    overlap = jnp.clip(
        jnp.minimum(hi[:, :, None], j[None, None, :] + 1.0)
        - jnp.maximum(lo[:, :, None], j[None, None, :]),
        0.0,
    )
    return overlap / scale[:, :, None]  # normalize: rows sum to 1


def make_cutouts(
    image: jnp.ndarray,
    spec: CutoutSpec,
    cut_size: int,
) -> jnp.ndarray:
    """Extract cutouts. image: [B,H,W,C]; returns [K*B, cut, cut, C] with the
    reference's concat-along-batch layout (cutout-major: cutout k's B images
    are contiguous... reference concatenates per-cutout crops of the full
    batch, giving index k*B+b — replicated here).
    """
    b, h, w, c = image.shape
    wy = _box_weights(spec.offset_y, spec.size, h, cut_size)  # [K,cut,H]
    wx = _box_weights(spec.offset_x, spec.size, w, cut_size)  # [K,cut,W]
    img = image.astype(jnp.float32)
    # contract H then W: [K,B,cut,W,C] -> [K,B,cut,cut,C]
    tmp = jnp.einsum("kyh,bhwc->kbywc", wy, img, preferred_element_type=jnp.float32)
    out = jnp.einsum("kxw,kbywc->kbyxc", wx, tmp, preferred_element_type=jnp.float32)
    return out.reshape(spec.size.shape[0] * b, cut_size, cut_size, c).astype(image.dtype)


# ---------------------------------------------------------------------------
# augmentations (--use_augs, reference cgd/modules.py:12-22)
# ---------------------------------------------------------------------------

def augment_cutouts(rng: jax.Array, cutouts: jnp.ndarray) -> jnp.ndarray:
    """TPU-native analog of the reference's aug pipeline: random hflip(0.5),
    gaussian noise (std 0.01, x4 through the pipeline), random affine
    (±15°, ±10% translate) + perspective (scale 0.4, p 0.7) composed into ONE
    projective warp (bilinear, static shapes), random grayscale (0.15).

    Statistically equivalent, not bitwise (torchvision transform RNG is not
    reproducible in JAX anyway — SURVEY.md §7 hard part #2).
    """
    n, hh, ww, c = cutouts.shape
    keys = jax.random.split(rng, 8)
    x = cutouts.astype(jnp.float32)

    # hflip
    flip = jax.random.bernoulli(keys[0], 0.5, (n, 1, 1, 1))
    x = jnp.where(flip, x[:, :, ::-1, :], x)

    # affine: rotation ±15°, translate ±0.1
    deg = jax.random.uniform(keys[1], (n,), minval=-15.0, maxval=15.0)
    theta = deg * (jnp.pi / 180.0)
    tx = jax.random.uniform(keys[2], (n,), minval=-0.1, maxval=0.1) * ww
    ty = jax.random.uniform(keys[3], (n,), minval=-0.1, maxval=0.1) * hh

    # perspective jitter of the 4 corners (distortion 0.4, p=0.7) — approx by
    # a random projective component
    p_on = jax.random.bernoulli(keys[4], 0.7, (n,))
    persp = jax.random.uniform(keys[5], (n, 2), minval=-0.4 / max(hh, ww), maxval=0.4 / max(hh, ww))
    persp = jnp.where(p_on[:, None], persp, 0.0)

    cos, sin = jnp.cos(theta), jnp.sin(theta)
    cy, cx = (hh - 1) / 2.0, (ww - 1) / 2.0

    yy = jnp.arange(hh, dtype=jnp.float32)[:, None]
    xx = jnp.arange(ww, dtype=jnp.float32)[None, :]

    def warp_one(img, cos1, sin1, tx1, ty1, p1):
        yc = yy - cy
        xc = xx - cx
        denom = 1.0 + p1[0] * xc + p1[1] * yc
        xs = (cos1 * xc + sin1 * yc) / denom + cx - tx1
        ys = (-sin1 * xc + cos1 * yc) / denom + cy - ty1
        coords = jnp.stack([
            jnp.broadcast_to(ys, (hh, ww)),
            jnp.broadcast_to(xs, (hh, ww)),
        ])
        return jnp.stack(
            [
                jax.scipy.ndimage.map_coordinates(img[..., ch], coords, order=1, mode="nearest")
                for ch in range(c)
            ],
            axis=-1,
        )

    x = jax.vmap(warp_one)(x, cos, sin, tx, ty, persp)

    # grayscale p=0.15 (ITU-R 601 luma, torchvision convention)
    gray_on = jax.random.bernoulli(keys[6], 0.15, (n, 1, 1, 1))
    luma = (0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2])[..., None]
    x = jnp.where(gray_on, jnp.broadcast_to(luma, x.shape), x)

    # noise: the reference injects 4 separate x+0.01*randn passes; equivalent
    # variance in one shot: std = 0.01*sqrt(4) = 0.02
    x = x + 0.02 * jax.random.normal(keys[7], x.shape)
    return x.astype(cutouts.dtype)
