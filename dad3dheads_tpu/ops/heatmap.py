"""Keypoint heatmap encoding (Gaussian splat) and decoding (argmax).

Behavioral spec: /root/reference/model_training/data/coder.py:16-23 and
data/utils.py:42-70 — per-keypoint Gaussian of radius r (sigma = (2r+1)/6),
max-composited at the integer-floored, stride-divided keypoint location,
quantized to uint8*255.

The reference renders each 11x11 Gaussian in a per-keypoint numpy loop on the
CPU dataloader worker. Here the whole (B, K, H, W) tensor is produced by one
vectorized broadcast on device — an elementwise exp over a (K, H, W) grid, a
VPU-friendly shape — so target generation can run inside the jitted input
pipeline at batch scale.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def encode_heatmap(
    keypoints: jax.Array,
    presence: jax.Array,
    img_size: int = 256,
    stride: int = 4,
    radius: int = 5,
) -> jax.Array:
    """Keypoints (..., K, 2) xy in input pixels -> heatmaps (..., K, S, S),
    S = img_size // stride, float32 in [0, 1] quantized to uint8 levels.

    Matches the reference's integer arithmetic: center = floor(kp) // stride
    (the dataset floors to int then floor-divides), Gaussian evaluated on the
    integer offset grid, cut off outside the (2r+1) box, zeroed where the
    Gaussian underflows machine eps relative to its max (always 1 here).
    """
    S = img_size // stride
    centers = (jnp.floor(keypoints).astype(jnp.int32) // stride).astype(jnp.float32)
    cx = centers[..., 0][..., None, None]  # (..., K, 1, 1)
    cy = centers[..., 1][..., None, None]

    ys = jax.lax.broadcasted_iota(jnp.float32, (S, S), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (S, S), 1)

    diameter = 2 * radius + 1
    sigma = diameter / 6.0
    dx = xs - cx
    dy = ys - cy
    g = jnp.exp(-(dx * dx + dy * dy) / (2.0 * sigma * sigma))
    # replicate the reference's box cutoff (the gaussian patch is (2r+1)^2)
    inside = (jnp.abs(dx) <= radius) & (jnp.abs(dy) <= radius)
    # and the eps-underflow zeroing of gaussian_2d
    g = jnp.where(inside & (g >= jnp.finfo(jnp.float32).eps), g, 0.0)
    g = g * presence[..., None, None].astype(g.dtype)
    # uint8 quantization round-trip (targets are stored as uint8 * 255);
    # TRUNCATE like the host coder / reference (np.uint8(255.0 * hm),
    # data/coder.py) — rounding differed by one level on ~half the texels
    return jnp.floor(g * 255.0).astype(jnp.uint8)


def decode_heatmap_uint8(heatmap_u8: jax.Array) -> jax.Array:
    """uint8 heatmap -> float32 in [0, 1] (the training-side dequantize)."""
    return heatmap_u8.astype(jnp.float32) / 255.0
