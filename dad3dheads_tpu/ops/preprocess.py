"""Image preprocessing: longest-max-size resize + center square pad +
ImageNet normalization, with the exact keypoint/3DMM readjustment inverses.

Behavioral spec: the reference composes albumentations LongestMaxSize +
PadIfNeeded(center, constant 0) + Normalize(imagenet)
(/root/reference/predictor.py:195-203, data/transforms.py:7-33); the inverse
adjustments live in predictor.py:117-176.

Two implementations:
  - host path (numpy + cv2): for the dataset's variable-size crops — the
    resize target is static (256) but sources vary, so this runs on CPU
    workers and feeds fixed-shape tensors to the device;
  - device path (pure jax, static shapes): normalization + optional resize of
    an already fixed-size batch, fused into the jitted pipeline.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from ..constants import IMAGENET_MEAN, IMAGENET_STD


def py3round(x: float) -> int:
    """Banker's rounding (python3 round), the rounding albumentations uses
    for resize targets."""
    return int(round(x))


def longest_max_size_params(h: int, w: int, img_size: int) -> Tuple[float, int, int]:
    """scale, new_h, new_w for aspect-preserving resize to longest side."""
    scale = img_size / float(max(h, w))
    return scale, py3round(h * scale), py3round(w * scale)


def pad_offsets(new_h: int, new_w: int, img_size: int) -> List[int]:
    """Center paddings [top, bottom, left, right] to a square img_size."""
    pad_top = (img_size - new_h) // 2
    pad_bottom = img_size - new_h - pad_top
    pad_left = (img_size - new_w) // 2
    pad_right = img_size - new_w - pad_left
    return [pad_top, pad_bottom, pad_left, pad_right]


def preprocess_image_np(
    image: np.ndarray,
    img_size: int = 256,
    normalize: str = "imagenet",
    mode: str = "longest_max_size",
):
    """RGB uint8 (H, W, 3) -> fp32 (img_size, img_size, 3) NHWC-ready tensor.

    ``mode`` selects between the reference's two resize transforms
    (data/transforms.py:7-24):
      - ``longest_max_size``: aspect-preserving resize + center square pad;
        returns (tensor, scalar scale, paddings[top, bottom, left, right]).
      - ``resize``: plain non-aspect-preserving resize, no padding; returns
        (tensor, np.array([sx, sy]), [0, 0, 0, 0]). The per-axis scale array
        broadcasts through the same keypoint transform/inverse functions.
    """
    import cv2

    h, w = image.shape[:2]
    if mode == "resize":
        scale = np.asarray([img_size / float(w), img_size / float(h)], np.float32)
        if (h, w) != (img_size, img_size):
            interp = cv2.INTER_AREA if float(scale.min()) < 1.0 else cv2.INTER_LINEAR
            image = cv2.resize(image, (img_size, img_size), interpolation=interp)
        pt = pb = pl = pr = 0
    elif mode == "longest_max_size":
        scale, new_h, new_w = longest_max_size_params(h, w, img_size)
        if (new_h, new_w) != (h, w):
            interp = cv2.INTER_AREA if scale < 1.0 else cv2.INTER_LINEAR
            image = cv2.resize(image, (new_w, new_h), interpolation=interp)
        pt, pb, pl, pr = pad_offsets(new_h, new_w, img_size)
        image = np.pad(image, ((pt, pb), (pl, pr), (0, 0)), mode="constant")
    else:
        raise KeyError(f"unknown resize mode {mode!r}")

    if normalize == "none":
        # keep uint8: the device normalizes in-graph (normalize_batch_jax),
        # and host->device transfer moves 4x fewer bytes
        return image, scale, [pt, pb, pl, pr]
    x = image.astype(np.float32) / 255.0
    if normalize == "imagenet":
        x = (x - np.asarray(IMAGENET_MEAN, np.float32)) / np.asarray(IMAGENET_STD, np.float32)
    elif normalize == "mean":
        x = (x - 0.5) / 0.5
    return x, scale, [pt, pb, pl, pr]


def transform_keypoints_np(
    keypoints: np.ndarray, scale: float, paddings: List[int]
) -> np.ndarray:
    """Map crop-space keypoints through the resize+pad: k*scale + (pl, pt)."""
    return keypoints * scale + np.asarray([paddings[2], paddings[0]], np.float32)


def readjust_landmarks_np(
    landmarks: np.ndarray, paddings: List[int], scale: float
) -> np.ndarray:
    """Inverse of the network-input transform, truncated to ints like the
    reference (predictor.py:147-152)."""
    out = (landmarks - np.asarray([[paddings[2], paddings[0]]])) / scale
    return out.astype(int)


def readjust_3dmm_np(
    pred_3dmm: np.ndarray,
    paddings: List[int],
    scale,
    img_size: int = 256,
    constants=None,
) -> np.ndarray:
    """Map predicted scale/translation from network space back to the
    original full image (predictor.py:154-176):
      scale'       = (scale + 1) / s - 1
      translation' = (translation + 1 - 2*[pl, pt, 0]/img) / s - 1
    Offsets are derived from the (configurable) FLAME constants split.

    ``scale`` may be the per-axis [sx, sy] array from resize mode: x/y
    translation then divide per axis; z translation and the isotropic FLAME
    scale use sy (exact when sx == sy, i.e. square crops).
    """
    from ..constants import flame_param_offset

    t0 = flame_param_offset("translation", constants)
    s0 = flame_param_offset("scale", constants)
    out = np.array(pred_3dmm, copy=True)
    t = out[:, t0 : t0 + 3]
    sc = out[:, s0 : s0 + 1]
    scale = np.asarray(scale, np.float32)
    if scale.ndim == 0:
        t_scale, s_scale = scale, scale
    else:
        t_scale = np.asarray([scale[0], scale[1], scale[1]], np.float32)
        s_scale = scale[1]
    shift = np.asarray([[paddings[2], paddings[0], 0.0]], np.float32) * 2.0 / img_size
    out[:, t0 : t0 + 3] = (t + 1.0 - shift) / t_scale - 1.0
    out[:, s0 : s0 + 1] = (sc + 1.0) / s_scale - 1.0
    return out


def normalize_batch_jax(images_u8, normalize: str = "imagenet"):
    """Device-side uint8 NHWC batch -> normalized fp32 (jit-friendly; on a
    sharded batch the elementwise math partitions with no collectives)."""
    import jax.numpy as jnp

    x = images_u8.astype(jnp.float32) / 255.0
    if normalize == "imagenet":
        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
        std = jnp.asarray(IMAGENET_STD, jnp.float32)
        x = (x - mean) / std
    elif normalize == "mean":
        x = (x - 0.5) / 0.5
    return x
