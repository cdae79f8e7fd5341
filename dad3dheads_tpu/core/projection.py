"""Projection / normalization utilities shared by losses, predictor, data.

Behavioral specs:
  - ``normalize_to_cube``: /root/reference/model_training/model/utils.py:55-68
  - ``calculate_paddings``: /root/reference/model_training/model/utils.py:71-77
  - ``project_vertices_onto_image``: y-flipped perspective projection,
    /root/reference/model_training/data/flame_dataset.py:129-141
  - heatmap argmax decode (``unravel_index``):
    /root/reference/model_training/model/utils.py:38-52 — ours is NHWC.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp


def normalize_to_cube(v: jax.Array) -> jax.Array:
    """Normalize mesh vertices into the unit cube anchored like the reference:
    shift min to 0, center by half the per-axis max, then divide by the global
    max extent. Accepts (V, 3) or (B, V, 3)."""
    if v.ndim == 2:
        v = v[None]
    v = v - jnp.min(v, axis=1, keepdims=True)
    v = v - 0.5 * jnp.max(v, axis=1, keepdims=True)
    return v / jnp.max(jnp.max(v, axis=-1, keepdims=True), axis=-2, keepdims=True)


def calculate_paddings(orig_h: int, orig_w: int) -> List[int]:
    """Symmetric square paddings [top, bottom, left, right] (python ints)."""
    max_side = max(orig_h, orig_w)
    pad_top = int((max_side - orig_h) / 2)
    pad_bottom = max_side - orig_h - pad_top
    pad_left = int((max_side - orig_w) / 2)
    pad_right = max_side - orig_w - pad_left
    return [pad_top, pad_bottom, pad_left, pad_right]


def project_vertices_onto_image(
    vertices_world_homo: jax.Array,
    projection_matrix: jax.Array,
    height: jax.Array,
    crop_x: jax.Array,
    crop_y: jax.Array,
) -> jax.Array:
    """Homogeneous world vertices (N, 4) -> image-plane xy (N, 2) with the
    dataset's y-flip and crop-origin shift."""
    v2d_homo = vertices_world_homo @ projection_matrix.T
    v2d = v2d_homo[:, :2] / v2d_homo[:, 3:4]
    v2d = jnp.stack([v2d[:, 0], height - v2d[:, 1]], axis=-1)
    return v2d - jnp.stack([crop_x, crop_y]).astype(v2d.dtype)


def weak_perspective_project(
    vertices: jax.Array, scale_param: jax.Array, translation: jax.Array, image_size
) -> jax.Array:
    """Rotated FLAME vertices (B, V, 3) + 3DMM scale/translation -> pixel
    coordinates (B, V, 3; slice [..., :2] for 2D).

    THE canonical weak-perspective projection (reference head_mesh.py:33-46):
    scale = clip(scale_param + 1, 1e-8), translation with its z zeroed,
    (v * s + t + 1) / 2 * image_size. The losses' shared decode, HeadMesh,
    and the predictor/AOT decode all call this one definition, so a tweak
    here can never desynchronize training from inference."""
    scale = jnp.clip(scale_param[:, None] + 1.0, min=1e-8)  # (B, 1, 1)
    t = translation.at[..., 2].set(0.0)
    return (vertices * scale + t[:, None] + 1.0) / 2.0 * image_size


def heatmap_to_keypoints(heatmap_nhwc: jax.Array, stride: int = 4) -> jax.Array:
    """Per-channel argmax of a (B, H, W, C) heatmap -> (B, C, 2) xy pixel
    coordinates at input resolution (multiplied by the stride)."""
    B, H, W, C = heatmap_nhwc.shape
    flat = heatmap_nhwc.reshape(B, H * W, C)
    idx = jnp.argmax(flat, axis=1)  # (B, C)
    ys = idx // W
    xs = idx % W
    return jnp.stack([xs, ys], axis=-1).astype(jnp.float32) * float(stride)


def landmarks_img_to_input(
    landmarks: jax.Array, paddings: Tuple[int, int, int, int], scale: float
) -> jax.Array:
    """Undo the square-pad + resize: network-space landmarks -> original image
    coordinates (predictor readjustment, /root/reference/predictor.py:147-152)."""
    return (landmarks - jnp.asarray([paddings[2], paddings[0]], landmarks.dtype)) / scale
