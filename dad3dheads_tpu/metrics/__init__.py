"""Evaluation metrics: keypoint NME, failure rate, soft IoU.

Behavioral specs:
  - keypoints_nme / percentage_of_errors_below_IOD:
    /root/reference/model_training/metrics/keypoints.py:19-52 — mean L2 error
    per sample, normalized by sqrt(bbox area) (2D) or 2.0 (3D unit cube);
    failure rate = fraction of samples with error beyond threshold * IOD.
  - soft_iou: /root/reference/model_training/metrics/iou.py:16-33.

Design: pure per-batch functions; cross-step averaging happens in the
Trainer's device-side ``MetricAccumulator`` (one jitted tree-merge per step)
and cross-device reduction is implicit: inside a pjit'd step over a data mesh
XLA inserts the collectives automatically (the torchmetrics
``dist_reduce_fx="sum"`` equivalent is a plain ``jnp.sum`` of sharded data).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


def _norm_distance(bbox: Optional[jax.Array], batch: int) -> jax.Array:
    """sqrt(w*h) per sample for 2D, or the constant 2.0 (unit cube) for 3D."""
    if bbox is None:
        return jnp.full((batch,), 2.0, jnp.float32)
    return jnp.sqrt(bbox[:, 2] * bbox[:, 3])


def keypoints_nme(
    output_kp: jax.Array,
    target_kp: jax.Array,
    bbox: Optional[jax.Array] = None,
    weight: float = 100.0,
) -> jax.Array:
    """Normalized mean error x100 averaged over the batch.

    output_kp/target_kp: (B, K, dim); bbox: (B, 4) [x, y, w, h] or None (3D).
    """
    err = jnp.mean(jnp.linalg.norm(output_kp - target_kp, axis=-1), axis=-1)  # (B,)
    nme = err / _norm_distance(bbox, output_kp.shape[0])
    return weight * jnp.mean(nme)


def failure_rate(
    output_kp: jax.Array,
    target_kp: jax.Array,
    bbox: Optional[jax.Array] = None,
    threshold: float = 0.05,
    below: bool = True,
) -> jax.Array:
    """Fraction of samples whose normalized error is below (or beyond) the
    threshold."""
    err = jnp.mean(jnp.linalg.norm(output_kp - target_kp, axis=-1), axis=-1)
    nd = _norm_distance(bbox, output_kp.shape[0])
    hit = err < threshold * nd if below else err > threshold * nd
    return jnp.mean(hit.astype(jnp.float32))


def soft_iou(output: jax.Array, target: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Soft IoU between probability heatmaps, NHWC (B, H, W, C), averaged."""

    def op_sum(x):
        return jnp.sum(x, axis=(1, 2))

    inter = op_sum(target * output)
    iou = (inter + eps) / (op_sum(target**2) + op_sum(output**2) - inter + eps)
    return jnp.mean(iou)


def compute_step_metrics(
    pred_landmarks: jax.Array,
    target_landmarks: jax.Array,
    pred_heatmap_probs: jax.Array,
    target_heatmap: jax.Array,
    reprojected_2d_face: jax.Array,
    target_full_2d_face: jax.Array,
    pred_vertices_norm: jax.Array,
    target_vertices_norm: jax.Array,
    bbox: jax.Array,
) -> Dict[str, jax.Array]:
    """The metric panel logged per train/val step (mirrors the metric
    collections and their inputs at
    /root/reference/model_training/train/flame_lightning_model.py:71-96,
    299-358): 2D landmarks are presence-masked pixel coordinates; the
    reprojection/3D metrics take the 'face' vertex subset; all failure rates
    use below=True at thresholds 0.05 / 0.1."""
    return {
        "heatmap_iou": soft_iou(pred_heatmap_probs, target_heatmap),
        "nme_2d": keypoints_nme(pred_landmarks, target_landmarks, bbox),
        "fr_2d_005": failure_rate(pred_landmarks, target_landmarks, bbox, 0.05),
        "fr_2d_01": failure_rate(pred_landmarks, target_landmarks, bbox, 0.1),
        "reproject_nme_2d": keypoints_nme(reprojected_2d_face, target_full_2d_face, bbox),
        "reproject_fr_2d_005": failure_rate(reprojected_2d_face, target_full_2d_face, bbox, 0.05),
        "reproject_fr_2d_01": failure_rate(reprojected_2d_face, target_full_2d_face, bbox, 0.1),
        "nme_3d": keypoints_nme(pred_vertices_norm, target_vertices_norm, None),
        "fr_3d_005": failure_rate(pred_vertices_norm, target_vertices_norm, None, 0.05),
        "fr_3d_01": failure_rate(pred_vertices_norm, target_vertices_norm, None, 0.1),
    }


__all__ = [
    "keypoints_nme",
    "failure_rate",
    "soft_iou",
    "compute_step_metrics",
]
