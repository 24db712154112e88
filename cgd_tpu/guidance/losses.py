"""Guidance losses.

Same mathematical contracts as the reference's cgd/losses.py:5-22 (range,
spherical distance, total variation) and the inline saturation loss
(cgd/cgd.py:211-214), expressed over channels-last NHWC arrays and written to
fuse into the single guided-step XLA computation.
"""

from __future__ import annotations

import jax.numpy as jnp


def range_loss(x: jnp.ndarray) -> jnp.ndarray:
    """Mean squared overshoot outside [-1, 1]; per-batch reduction over HWC."""
    over = x - jnp.clip(x, -1.0, 1.0)
    return jnp.mean(over**2, axis=tuple(range(1, x.ndim)))


def spherical_dist_loss(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Squared half-chord arc distance between L2-normalized embeddings:
    2 * arcsin(||x^ - y^|| / 2)^2, broadcasting over leading dims."""
    xn = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    yn = y / jnp.linalg.norm(y, axis=-1, keepdims=True)
    chord = jnp.linalg.norm(xn - yn, axis=-1)
    return jnp.square(jnp.arcsin(chord / 2.0)) * 2.0


def tv_loss(x: jnp.ndarray) -> jnp.ndarray:
    """L2 total variation with replicate padding on the bottom/right edge
    (Mahendran et al. formulation), per-batch reduction. x: [B,H,W,C]."""
    xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)), mode="edge")
    x_diff = xp[:, :-1, 1:, :] - xp[:, :-1, :-1, :]
    y_diff = xp[:, 1:, :-1, :] - xp[:, :-1, :-1, :]
    return jnp.mean(x_diff**2 + y_diff**2, axis=(1, 2, 3))


def saturation_loss(x: jnp.ndarray) -> jnp.ndarray:
    """Mean absolute overshoot outside [-1, 1] (scalar; @nshepperd's sat loss,
    reference cgd/cgd.py:211-214)."""
    return jnp.abs(x - jnp.clip(x, -1.0, 1.0)).mean()
