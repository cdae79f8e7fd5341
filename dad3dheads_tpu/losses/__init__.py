"""Losses + the config-driven weighted multi-loss aggregator.

Behavioral specs:
  - IoULoss: /root/reference/model_training/losses/keypoint_losses.py:5-31
  - Vertices3DLoss: losses/vertices_3d_loss.py:15-47 (zero-rotation decode,
    unit-cube normalization, weighted vertex subsets)
  - ReprojectionLoss: losses/reprojection_loss.py:14-46 (reprojected decode,
    weighted subsets)
  - LandmarksLossWVisibility: losses/landmarks_loss_w_visibility.py:11-26
  - LossModule: train/loss_module.py:8-106 (named criteria, weights,
    per-criterion epoch schedule, sum/mean/none reduction)

TPU-first redesign: the reference decodes FLAME **three times per step**
(once per geometry loss, once for metrics — SURVEY.md §3.2). Here the train
step decodes **once** (``SharedFlameDecode``): the zero-rotation LBS output is
computed a single time, the global rotation / weak-perspective projection are
cheap post-transforms, and every loss and metric reads from that shared
pytree. Losses are pure functions; the epoch schedule is a traced ``where`` so
the whole aggregator stays inside one jit.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from .. import assets
from ..constants import (
    OUTPUT_2D_LANDMARKS,
    OUTPUT_LANDMARKS_HEATMAP,
    TARGET_2D_FULL_LANDMARKS,
    TARGET_2D_LANDMARKS,
    TARGET_2D_LANDMARKS_PRESENCE,
    TARGET_3D_MODEL_VERTICES,
    TARGET_LANDMARKS_HEATMAP,
)
from ..core import normalize_to_cube, rot_mat_from_6dof
from ..core.flame import FlameParams, flame_decode
from ..core.head_mesh import HeadMesh
from ..core.projection import weak_perspective_project
from ..core.rotation import rotate_vertices

_EPS = 1e-6


# ---------------------------------------------------------------------------
# elementwise criteria (torch-equivalent reductions: mean over all elements)
# ---------------------------------------------------------------------------


def l1(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(pred - target))


def l2(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(pred - target))


def smooth_l1(pred: jax.Array, target: jax.Array, beta: float = 1.0) -> jax.Array:
    d = jnp.abs(pred - target)
    return jnp.mean(jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta))


CRITERIA: Dict[str, Callable[[jax.Array, jax.Array], jax.Array]] = {
    "l1": l1,
    "l2": l2,
    "smooth_l1": smooth_l1,
}


# ---------------------------------------------------------------------------
# the shared FLAME decode
# ---------------------------------------------------------------------------


@struct.dataclass
class SharedFlameDecode:
    """Everything the geometry losses/metrics need, decoded once.

    vertices_zero_rot: (B, V, 3) LBS output without the global rotation
    vertices_rot:      (B, V, 3) with the 6DoF rotation applied
    reprojected_2d:    (B, V, 2) weak-perspective projection to image pixels
    """

    vertices_zero_rot: jax.Array
    vertices_rot: jax.Array
    reprojected_2d: jax.Array


def shared_flame_decode_raw(
    model, params_3dmm: jax.Array, flame_constants: Dict[str, int], image_size: int
) -> SharedFlameDecode:
    params = FlameParams.from_3dmm(params_3dmm, flame_constants)
    v0 = flame_decode(model, params, zero_rot=True)
    R = rot_mat_from_6dof(params.rotation.astype(v0.dtype))
    v_rot = rotate_vertices(R, v0)
    proj = weak_perspective_project(v_rot, params.scale, params.translation, image_size)
    return SharedFlameDecode(
        vertices_zero_rot=v0, vertices_rot=v_rot, reprojected_2d=proj[..., :2]
    )


def shared_flame_decode(head_mesh: HeadMesh, params_3dmm: jax.Array) -> SharedFlameDecode:
    return shared_flame_decode_raw(
        head_mesh.model, params_3dmm, head_mesh.flame_constants, head_mesh.image_size
    )


# ---------------------------------------------------------------------------
# individual losses (pure functions over the shared decode)
# ---------------------------------------------------------------------------


def iou_loss(pred_heatmap_logits: jax.Array, target_heatmap: jax.Array) -> jax.Array:
    """1 - soft IoU between sigmoid(pred) and target, NHWC (B, H, W, C).

    ONE soft-IoU definition serves both this loss and the logged
    ``heatmap_iou`` metric — an eps/reduction tweak can never desynchronize
    them."""
    from ..metrics import soft_iou

    return 1.0 - soft_iou(jax.nn.sigmoid(pred_heatmap_logits), target_heatmap, eps=_EPS)


def landmarks_loss_w_visibility(
    pred_landmarks: jax.Array,
    pred_presence: jax.Array,
    target_landmarks: jax.Array,
    target_presence: jax.Array,
    criterion: str = "smooth_l1",
) -> jax.Array:
    crit = CRITERIA[criterion]
    return crit(
        pred_landmarks * pred_presence[..., None],
        target_landmarks * target_presence[..., None],
    )


class SubsetWeights(NamedTuple):
    """Static (weight, vertex-index) pairs for subset-weighted vertex losses."""

    weights: Tuple[float, ...]
    indices: Tuple[Any, ...]  # tuple of np.ndarray index arrays

    @classmethod
    def from_config(cls, weights: Dict[str, float]) -> "SubsetWeights":
        ws, idxs = [], []
        for name, w in weights.items():
            ws.append(float(w))
            idxs.append(assets.get_flame_indices(name))
        return cls(weights=tuple(ws), indices=tuple(idxs))


DEFAULT_V3D_SUBSETS = {"head": 0.5, "face_w_ears": 0.75, "face": 1.0}
DEFAULT_REPROJ_SUBSETS = {"face": 0.5, "face_w_ears": 0.5}


def vertices_3d_loss(
    pred_vertices_zero_rot: jax.Array,
    target_vertices: jax.Array,
    subsets: SubsetWeights,
    criterion: str = "l2",
) -> jax.Array:
    """Weighted per-subset loss between unit-cube-normalized meshes."""
    crit = CRITERIA[criterion]
    total = 0.0
    for w, idx in zip(subsets.weights, subsets.indices):
        idx = jnp.asarray(idx)
        total = total + w * crit(
            normalize_to_cube(pred_vertices_zero_rot[:, idx]),
            normalize_to_cube(target_vertices[:, idx]),
        )
    return total


def reprojection_loss(
    reprojected_2d: jax.Array,
    target_full_landmarks: jax.Array,
    subsets: SubsetWeights,
    criterion: str = "smooth_l1",
) -> jax.Array:
    crit = CRITERIA[criterion]
    total = 0.0
    for w, idx in zip(subsets.weights, subsets.indices):
        idx = jnp.asarray(idx)
        total = total + w * crit(reprojected_2d[:, idx], target_full_landmarks[:, idx])
    return total


# ---------------------------------------------------------------------------
# LossModule: config-driven aggregation
# ---------------------------------------------------------------------------

DEFAULT_LOSS_CONFIG: List[Dict[str, Any]] = [
    # mirrors /root/reference/model_training/config/loss/train_loss.yaml
    {"name": "heatmap_loss", "kind": "iou", "weight": 1.0, "epoch_start": 0},
    {
        "name": "vertices3d_loss",
        "kind": "vertices_3d",
        "criterion": "l2",
        "weight": 50.0,
        "epoch_start": 0,
        "subset_weights": DEFAULT_V3D_SUBSETS,
    },
    {
        "name": "reprojection_loss",
        "kind": "reprojection",
        "criterion": "smooth_l1",
        "weight": 0.05,
        "epoch_start": 0,
        "subset_weights": DEFAULT_REPROJ_SUBSETS,
    },
    {
        "name": "landmarks_loss",
        "kind": "landmarks_w_visibility",
        "criterion": "smooth_l1",
        "weight": 100.0,
        "epoch_start": 0,
    },
]


class LossModule:
    """Weighted multi-criterion aggregator with per-criterion epoch schedule.

    ``__call__(outputs, targets, shared, epoch)`` returns
    (total_loss, {name: weighted loss}). ``epoch`` may be a traced scalar;
    criteria whose ``epoch_start`` has not been reached contribute 0 (the
    jit-compatible equivalent of the reference's python-level schedule gate).
    """

    def __init__(self, criterions: Optional[List[Dict[str, Any]]] = None, reduction: str = "sum"):
        self.config = criterions if criterions is not None else DEFAULT_LOSS_CONFIG
        self.reduction = reduction
        self._subsets = {}
        for c in self.config:
            if c["kind"] in ("vertices_3d", "reprojection"):
                default = (
                    DEFAULT_V3D_SUBSETS if c["kind"] == "vertices_3d" else DEFAULT_REPROJ_SUBSETS
                )
                self._subsets[c["name"]] = SubsetWeights.from_config(
                    c.get("subset_weights", default)
                )

    def __call__(
        self,
        outputs: Dict[str, jax.Array],
        targets: Dict[str, jax.Array],
        shared: SharedFlameDecode,
        epoch: jax.Array | int = 0,
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        epoch = jnp.asarray(epoch)
        losses: Dict[str, jax.Array] = {}
        values = []
        gates = []
        for c in self.config:
            kind = c["kind"]
            if kind == "iou":
                val = iou_loss(
                    outputs[OUTPUT_LANDMARKS_HEATMAP], targets[TARGET_LANDMARKS_HEATMAP]
                )
            elif kind == "vertices_3d":
                val = vertices_3d_loss(
                    shared.vertices_zero_rot,
                    targets[TARGET_3D_MODEL_VERTICES],
                    self._subsets[c["name"]],
                    c.get("criterion", "l2"),
                )
            elif kind == "reprojection":
                val = reprojection_loss(
                    shared.reprojected_2d,
                    targets[TARGET_2D_FULL_LANDMARKS],
                    self._subsets[c["name"]],
                    c.get("criterion", "smooth_l1"),
                )
            elif kind == "landmarks_w_visibility":
                val = landmarks_loss_w_visibility(
                    outputs[OUTPUT_2D_LANDMARKS],
                    targets[TARGET_2D_LANDMARKS_PRESENCE],
                    targets[TARGET_2D_LANDMARKS],
                    targets[TARGET_2D_LANDMARKS_PRESENCE],
                    c.get("criterion", "smooth_l1"),
                )
            else:
                raise KeyError(kind)
            gate = (epoch >= c.get("epoch_start", 0)).astype(val.dtype)
            val = val * c.get("weight", 1.0) * gate
            losses[c["name"]] = val
            values.append(val)
            gates.append(gate)

        stack = jnp.stack(values)
        if self.reduction == "sum":
            total = stack.sum()
        elif self.reduction == "mean":
            # average over ACTIVE criteria only (the reference excludes
            # not-yet-scheduled losses from the stack entirely)
            total = stack.sum() / jnp.maximum(jnp.stack(gates).sum(), 1.0)
        elif self.reduction == "none":
            total = stack
        else:
            raise ValueError(self.reduction)
        return total, losses


__all__ = [
    "CRITERIA",
    "l1",
    "l2",
    "smooth_l1",
    "iou_loss",
    "landmarks_loss_w_visibility",
    "vertices_3d_loss",
    "reprojection_loss",
    "SubsetWeights",
    "SharedFlameDecode",
    "shared_flame_decode",
    "shared_flame_decode_raw",
    "LossModule",
    "DEFAULT_LOSS_CONFIG",
]
