"""DAD-3DNet: staged encoder + BiFPN + heatmap head + fusion + 3DMM heads.

Behavioral spec: /root/reference/model_training/model/flame_regression.py —
  - stages 0-3 of the encoder run on the image;
  - BiFPN consumes [stage1, stage2, stage3] outputs;
  - a 3x3 conv on the highest-resolution pyramid level predicts the 68-channel
    landmark heatmap (stride 4, zero-initialized bias);
  - FusionLayer: bilinear (align_corners) resize + sigmoid of the heatmap,
    concatenated with the stage-3 map and pyramid level 2, 1x1 conv, then
    multiplied back into the stage-3 map;
  - the final encoder stage runs on the fused map; three MLP heads (global
    average pool -> 512 -> out) regress shape+expr+jaw (tanh * limit),
    pose (rotation/translation/scale, linear), and 68 2D landmarks (ReLU);
  - outputs are the dict {heatmap, 413-dim 3DMM, (B, 68, 2) landmarks}.

Layout is NHWC throughout; the heatmap output is (B, H, W, 68).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import numpy as np
import jax.numpy as jnp

from ..constants import (
    OUTPUT_2D_LANDMARKS,
    OUTPUT_3DMM_PARAMS,
    OUTPUT_LANDMARKS_HEATMAP,
)
from .bifpn import BiFPN
from .resnet import ENCODER_CHANNELS, ResNet50Stages


def _interp_matrix(dst: int, src: int) -> np.ndarray:
    """(dst, src) align_corners=True bilinear interpolation matrix."""
    m = np.zeros((dst, src), np.float32)
    if dst == 1:
        m[0, 0] = 1.0
        return m
    pos = np.arange(dst) * ((src - 1) / (dst - 1))
    lo = np.clip(np.floor(pos).astype(int), 0, src - 1)
    hi = np.clip(lo + 1, 0, src - 1)
    frac = (pos - lo).astype(np.float32)
    m[np.arange(dst), lo] += 1.0 - frac
    m[np.arange(dst), hi] += frac
    return m


def resize_bilinear_align_corners(x: jax.Array, hw) -> jax.Array:
    """Bilinear resize with align_corners=True semantics (torch
    F.interpolate(..., mode='bilinear', align_corners=True)).

    Bilinear interpolation is separable, so it lowers to two small dense
    matmuls with static weight matrices — MXU work instead of 4 gathers."""
    B, H, W, C = x.shape
    h, w = hw
    if (H, W) == (h, w):
        return x
    wy = jnp.asarray(_interp_matrix(h, H))  # (h, H)
    wx = jnp.asarray(_interp_matrix(w, W))  # (w, W)
    out = jnp.einsum("hH,bHWc->bhWc", wy, x.astype(jnp.float32))
    out = jnp.einsum("wW,bhWc->bhwc", wx, out)
    return out.astype(x.dtype)


class ClassificationHead(nn.Module):
    num_classes: int
    linear_size: int = 512
    dropout: float = 0.3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = jnp.mean(x, axis=(1, 2))  # global average pool, NHWC
        f = nn.Dense(self.linear_size, dtype=self.dtype)(f)
        f = nn.relu(f)
        f = nn.Dropout(self.dropout, deterministic=not train)(f)
        return nn.Dense(self.num_classes, dtype=self.dtype)(f)


class FusionLayer(nn.Module):
    output_filters: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, heatmap, bifpn_map, train: bool = False):
        hm = resize_bilinear_align_corners(heatmap, x.shape[1:3])
        hm = nn.sigmoid(hm)
        fmap = jnp.concatenate([x, hm, bifpn_map], axis=-1)
        fmap = nn.Conv(self.output_filters, (1, 1), dtype=self.dtype)(fmap)
        return fmap * x


class DAD3DNet(nn.Module):
    """The flagship image -> (heatmap, 3DMM, landmarks) network."""

    backbone: str = "resnet50"
    num_filters: int = 256
    num_classes: int = 68
    limit_value: float = 3.0
    shape_output_size: int = 403  # shape 300 + expression 100 + jaw 3
    pose_output_size: int = 10  # rotation 6 + translation 3 + scale 1
    dropout: float = 0.3
    dtype: Any = jnp.float32

    def setup(self):
        if self.backbone == "resnet50":
            self.encoder = ResNet50Stages(dtype=self.dtype)
        elif self.backbone == "mobilenet_w1":
            from .mobilenet import MobileNetStages

            self.encoder = MobileNetStages(dtype=self.dtype)
        else:
            raise KeyError(self.backbone)
        ch = ENCODER_CHANNELS[self.backbone]
        self.bifpn = BiFPN(
            sizes=(ch["layer3"], ch["layer2"], ch["layer1"]),
            feature_size=self.num_filters,
            dtype=self.dtype,
        )
        self.head_conv = nn.Conv(
            self.num_classes,
            (3, 3),
            padding=[(1, 1), (1, 1)],
            dtype=self.dtype,
            bias_init=nn.initializers.zeros,
            name="heatmap_head",
        )
        self.fusion = FusionLayer(ch["layer1"], dtype=self.dtype)
        # regression heads always run fp32: bf16 resolution (~0.4% relative)
        # is about one pixel of landmark error at 256^2 — unacceptable for
        # the regression outputs while irrelevant for the conv trunk
        self.shape_head = ClassificationHead(
            self.shape_output_size, dropout=self.dropout, dtype=jnp.float32
        )
        self.pose_head = ClassificationHead(
            self.pose_output_size, dropout=self.dropout, dtype=jnp.float32
        )
        self.landmarks_head = ClassificationHead(
            self.num_classes * 2, dropout=self.dropout, dtype=jnp.float32
        )

    def neck(self, feats, train: bool = False):
        """BiFPN + heatmap head + fusion on the encoder taps. Split out so the
        int8 pipeline (models/quantized.py) can reuse the exact flax neck
        around its quantized encoder stages."""
        pyramid = self.bifpn(feats[1:], train)
        heatmap = self.head_conv(pyramid[0])
        fmap = self.fusion(feats[-1], heatmap, pyramid[2], train)
        return heatmap, fmap

    def heads(self, heatmap, fmap, train: bool = False) -> Dict[str, jax.Array]:
        """The three regression heads over the final encoder map."""
        fmap = fmap.astype(jnp.float32)
        shape = jnp.tanh(self.shape_head(fmap, train)) * self.limit_value
        pose = self.pose_head(fmap, train)
        landmarks = nn.relu(self.landmarks_head(fmap, train))
        B = landmarks.shape[0]
        landmarks = landmarks.reshape(B, self.num_classes, 2)
        return {
            OUTPUT_LANDMARKS_HEATMAP: heatmap.astype(jnp.float32),
            OUTPUT_3DMM_PARAMS: jnp.concatenate([shape, pose], axis=-1),
            OUTPUT_2D_LANDMARKS: landmarks,
        }

    def __call__(self, x: jax.Array, train: bool = False) -> Dict[str, jax.Array]:
        feats = self.encoder.stages_backbone(x, train)  # stages 0..3
        heatmap, fmap = self.neck(feats, train)
        fmap = self.encoder.final_stage(fmap, train)
        return self.heads(heatmap, fmap, train)


def load_model(
    config: Optional[Dict[str, Any]] = None,
    checkpoint_path: Optional[str] = None,
    img_size: int = 256,
    rng_seed: int = 0,
):
    """Model factory: build + init (+ optional checkpoint load).

    The reference's hydra-instantiate factory equivalent
    (/root/reference/model_training/model/__init__.py:6-11). Returns
    (model, variables)."""
    import jax

    model = create_model(config)
    x = jnp.zeros((1, img_size, img_size, 3), jnp.float32)
    variables = jax.jit(lambda r: model.init(r, x, train=False))(
        jax.random.PRNGKey(rng_seed)
    )
    if checkpoint_path:
        from flax import serialization

        with open(checkpoint_path, "rb") as f:
            variables = serialization.from_bytes(variables, f.read())
        # from_bytes yields host numpy leaves; re-put on device so repeated
        # apply() calls don't re-upload the weights every time
        variables = jax.tree_util.tree_map(jnp.asarray, variables)
    return model, variables


_DTYPES = {"float32": jnp.float32, "fp32": jnp.float32, "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16}


def create_model(config: Optional[Dict[str, Any]] = None) -> DAD3DNet:
    config = config or {}
    dtype = config.get("dtype", jnp.float32)
    if isinstance(dtype, str):
        dtype = _DTYPES[dtype]
    return DAD3DNet(
        backbone=config.get("backbone", "resnet50"),
        num_filters=config.get("num_filters", 256),
        num_classes=config.get("num_classes", 68),
        limit_value=config.get("limit_value", 3.0),
        dropout=config.get("dropout", 0.3),
        dtype=dtype,
    )
