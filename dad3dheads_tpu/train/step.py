"""The jitted train / eval steps.

Behavioral spec: /root/reference/model_training/train/flame_lightning_model.py
``_step_fn`` (:299-368) + ``optimizer_step`` warmup (:262-292). One step =
forward -> LossModule -> metric panel -> (train only) grad + optimizer update
with linear warmup scaling.

TPU-first design:
  - the whole step (loss, FLAME decode, metrics, optimizer) is ONE jit; FLAME
    is decoded once and shared by both geometry losses and all metrics
    (the reference decodes it three times — SURVEY.md §3.2);
  - the FLAME decoder constants are an explicit argument (never jit
    constants);
  - data parallelism: batches arrive sharded over the mesh ``data`` axis and
    the state replicated; XLA inserts the gradient all-reduce and the metric
    reductions (the NCCL DDP + torchmetrics sync equivalents) automatically;
  - BatchNorm batch statistics are computed over the *global* batch (the
    reductions span the sharded batch axis) — ``sync_bn: True`` for free;
  - the state is donated, so parameters/optimizer state update in place in
    HBM.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from .. import assets
from ..constants import (
    INPUT_BBOX_KEY,
    INPUT_IMAGE_KEY,
    OUTPUT_2D_LANDMARKS,
    OUTPUT_3DMM_PARAMS,
    OUTPUT_LANDMARKS_HEATMAP,
    TARGET_2D_FULL_LANDMARKS,
    TARGET_2D_LANDMARKS,
    TARGET_2D_LANDMARKS_PRESENCE,
    TARGET_3D_MODEL_VERTICES,
    TARGET_LANDMARKS_HEATMAP,
)
from ..core import normalize_to_cube
from ..core.flame import FlameModel
from ..losses import LossModule, SharedFlameDecode, shared_flame_decode_raw
from ..metrics import compute_step_metrics
from .schedulers import warmup_factor
from .state import TrainState


def _prepare_targets(
    batch: Dict[str, jax.Array],
    img_size: int = 256,
    heatmap_stride: int = 4,
    heatmap_radius: int = 5,
) -> Dict[str, jax.Array]:
    """Device-side input normalization (the reference's KeypointsDataMixin
    .get_input: uint8 heatmap -> fp32 in [0, 1]). Images may arrive uint8
    (4x cheaper host->device transfer); ImageNet normalization then runs on
    device.

    When the batch carries NO heatmap (FlameDataset ``device_heatmap: true``
    — loader threads skip the host HeatmapCoder entirely), the target is
    synthesized here from the normalized 2D landmarks by the device encoder
    (ops/heatmap.py, bit-equal to the host coder). The landmark de-normalize
    ``normalized * img_size`` is exact for power-of-two image sizes, so the
    Gaussian centers match the host path bit-for-bit."""
    targets = dict(batch)
    if TARGET_LANDMARKS_HEATMAP not in targets:
        from ..ops.heatmap import encode_heatmap

        kp = targets[TARGET_2D_LANDMARKS].astype(jnp.float32) * img_size
        hm_u8 = encode_heatmap(
            kp,
            targets[TARGET_2D_LANDMARKS_PRESENCE],
            img_size=img_size,
            stride=heatmap_stride,
            radius=heatmap_radius,
        )  # (B, K, S, S) uint8 -> HWC like the host loader emits
        targets[TARGET_LANDMARKS_HEATMAP] = jnp.transpose(hm_u8, (0, 2, 3, 1))
    hm = targets[TARGET_LANDMARKS_HEATMAP]
    if hm.dtype == jnp.uint8:
        targets[TARGET_LANDMARKS_HEATMAP] = hm.astype(jnp.float32) / 255.0
    img = targets[INPUT_IMAGE_KEY]
    if img.dtype == jnp.uint8:
        from ..ops.preprocess import normalize_batch_jax

        targets[INPUT_IMAGE_KEY] = normalize_batch_jax(img)
    targets[TARGET_2D_LANDMARKS_PRESENCE] = targets[TARGET_2D_LANDMARKS_PRESENCE].astype(
        jnp.float32
    )
    return targets


class _StepCommon:
    """Shared pieces between train and eval step builders."""

    def __init__(
        self,
        model,
        loss_module: Optional[LossModule] = None,
        img_size: int = 256,
        flame_constants: Optional[Dict[str, int]] = None,
        heatmap_stride: int = 4,
        heatmap_radius: int = 5,
    ):
        self.model = model
        self.loss_module = loss_module or LossModule()
        self.img_size = img_size
        self.heatmap_stride = heatmap_stride
        self.heatmap_radius = heatmap_radius
        from ..constants import FLAME_CONSTS

        self.flame_constants = dict(flame_constants or FLAME_CONSTS)
        self.face_idx = jnp.asarray(assets.get_flame_indices("face"))

    def forward_and_loss(
        self,
        params,
        batch_stats,
        flame: FlameModel,
        batch: Dict[str, jax.Array],
        epoch: jax.Array,
        dropout_rng: Optional[jax.Array],
        train: bool,
    ):
        targets = _prepare_targets(
            batch, self.img_size, self.heatmap_stride, self.heatmap_radius
        )
        variables = {"params": params, "batch_stats": batch_stats}
        if train:
            outputs, mutated = self.model.apply(
                variables,
                targets[INPUT_IMAGE_KEY],
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": dropout_rng},
            )
            new_batch_stats = mutated["batch_stats"]
        else:
            outputs = self.model.apply(variables, targets[INPUT_IMAGE_KEY], train=False)
            new_batch_stats = batch_stats

        shared = self._decode(flame, outputs[OUTPUT_3DMM_PARAMS])
        total_loss, loss_dict = self.loss_module(outputs, targets, shared, epoch)
        return total_loss, (outputs, new_batch_stats, shared, loss_dict, targets)

    def _decode(self, flame: FlameModel, params_3dmm: jax.Array) -> SharedFlameDecode:
        return shared_flame_decode_raw(
            flame, params_3dmm, self.flame_constants, self.img_size
        )

    def metrics(self, outputs, targets, shared: SharedFlameDecode) -> Dict[str, jax.Array]:
        presence = targets[TARGET_2D_LANDMARKS_PRESENCE][..., None]
        if OUTPUT_2D_LANDMARKS in outputs:
            pred_norm = outputs[OUTPUT_2D_LANDMARKS]
        else:
            # heatmap-only model variants: argmax-decode like the reference's
            # _get_keypoints_2d fallback (same precedence as api/predictor)
            from ..core.projection import heatmap_to_keypoints

            hm = outputs[OUTPUT_LANDMARKS_HEATMAP]
            pred_norm = (
                heatmap_to_keypoints(hm, self.img_size // hm.shape[1])
                / self.img_size
            )
        pred_2d = pred_norm * self.img_size * presence
        tgt_2d = targets[TARGET_2D_LANDMARKS] * presence * self.img_size
        fi = self.face_idx
        return compute_step_metrics(
            pred_landmarks=pred_2d,
            target_landmarks=tgt_2d,
            pred_heatmap_probs=jax.nn.sigmoid(outputs[OUTPUT_LANDMARKS_HEATMAP]),
            target_heatmap=targets[TARGET_LANDMARKS_HEATMAP],
            reprojected_2d_face=shared.reprojected_2d[:, fi],
            target_full_2d_face=targets[TARGET_2D_FULL_LANDMARKS][:, fi],
            pred_vertices_norm=normalize_to_cube(shared.vertices_zero_rot[:, fi]),
            target_vertices_norm=normalize_to_cube(
                targets[TARGET_3D_MODEL_VERTICES][:, fi]
            ),
            bbox=targets[INPUT_BBOX_KEY].astype(jnp.float32),
        )


def build_train_step(
    model,
    tx: optax.GradientTransformation,
    loss_module: Optional[LossModule] = None,
    img_size: int = 256,
    warmup_steps: int = 0,
    flame_constants: Optional[Dict[str, int]] = None,
    with_metrics: bool = True,
    jit: bool = True,
    heatmap_stride: int = 4,
    heatmap_radius: int = 5,
) -> Callable:
    """Returns jitted ``train_step(state, flame, batch, rng, lr_mult)`` ->
    (new_state, logs). ``lr_mult`` is the host-side plateau multiplier (1.0
    when unused); linear warmup is applied inside from ``state.step``.
    ``jit=False`` returns the raw traceable function (for embedding in an
    outer jit, e.g. a benchmark loop)."""
    common = _StepCommon(
        model, loss_module, img_size, flame_constants, heatmap_stride, heatmap_radius
    )

    def train_step(
        state: TrainState,
        flame: FlameModel,
        batch: Dict[str, jax.Array],
        rng: jax.Array,
        lr_mult: jax.Array,
    ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        dropout_rng = jax.random.fold_in(rng, state.step)

        grad_fn = jax.value_and_grad(
            lambda p: common.forward_and_loss(
                p, state.batch_stats, flame, batch, state.epoch, dropout_rng, True
            ),
            has_aux=True,
        )
        (total_loss, aux), grads = grad_fn(state.params)
        outputs, new_batch_stats, shared, loss_dict, targets = aux

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        scale = warmup_factor(state.step, warmup_steps) * jnp.asarray(lr_mult, jnp.float32)
        updates = jax.tree_util.tree_map(lambda u: u * scale, updates)
        new_params = optax.apply_updates(state.params, updates)

        new_state = state.replace(
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
            step=state.step + 1,
        )

        logs = {"loss": total_loss, **loss_dict}
        if with_metrics:
            logs.update(
                {f"metrics/{k}": v for k, v in common.metrics(outputs, targets, shared).items()}
            )
        logs["grad_norm"] = optax.global_norm(grads)
        return new_state, logs

    if jit:
        return jax.jit(train_step, donate_argnums=(0,))
    return train_step


def build_eval_step(
    model,
    loss_module: Optional[LossModule] = None,
    img_size: int = 256,
    flame_constants: Optional[Dict[str, int]] = None,
    heatmap_stride: int = 4,
    heatmap_radius: int = 5,
) -> Callable:
    """Returns jitted ``eval_step(state, flame, batch)`` -> logs dict."""
    common = _StepCommon(
        model, loss_module, img_size, flame_constants, heatmap_stride, heatmap_radius
    )

    @jax.jit
    def eval_step(
        state: TrainState, flame: FlameModel, batch: Dict[str, jax.Array]
    ) -> Dict[str, jax.Array]:
        total_loss, aux = common.forward_and_loss(
            state.params, state.batch_stats, flame, batch, state.epoch, None, False
        )
        outputs, _, shared, loss_dict, targets = aux
        logs = {"loss": total_loss, **loss_dict}
        logs.update(
            {f"metrics/{k}": v for k, v in common.metrics(outputs, targets, shared).items()}
        )
        return logs

    return eval_step
