"""MobileNet-w1 staged encoder (flax/linen, NHWC) — the reference's second
backbone (/root/reference/model_training/model/encoders.py:51-54, channel
table backbone.yaml: 64/128/256/512/1024).

Stage grouping follows the reference's non-staged ``Encoder``: stage 0 is the
init block + first depthwise stage, stages 1-4 are the remaining depthwise
stages; the DAD-3DNet assembly consumes stage outputs the same way it does for
ResNet-50.
"""

from __future__ import annotations

from typing import Any, Dict, List

import flax.linen as nn
import jax
import jax.numpy as jnp

from .resnet import BN_EPS, BN_MOMENTUM, ENCODER_CHANNELS


class DWSepBlock(nn.Module):
    """Depthwise 3x3 + BN + ReLU, then pointwise 1x1 + BN + ReLU."""

    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            x.shape[-1],
            (3, 3),
            strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)],
            feature_group_count=x.shape[-1],
            use_bias=False,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=self.dtype
        )(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=self.dtype
        )(x)
        return nn.relu(x)


class MobileNetStages(nn.Module):
    dtype: Any = jnp.float32

    def setup(self):
        self.init_conv = nn.Conv(
            32, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype
        )
        self.init_bn = nn.BatchNorm(momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=self.dtype)
        self.s1 = (DWSepBlock(64, 1, dtype=self.dtype),)
        self.s2 = (DWSepBlock(128, 2, dtype=self.dtype), DWSepBlock(128, 1, dtype=self.dtype))
        self.s3 = (DWSepBlock(256, 2, dtype=self.dtype), DWSepBlock(256, 1, dtype=self.dtype))
        self.s4 = tuple(
            [DWSepBlock(512, 2, dtype=self.dtype)]
            + [DWSepBlock(512, 1, dtype=self.dtype) for _ in range(5)]
        )
        self.s5 = (DWSepBlock(1024, 2, dtype=self.dtype), DWSepBlock(1024, 1, dtype=self.dtype))

    @property
    def encoder_channels(self) -> Dict[str, int]:
        return ENCODER_CHANNELS["mobilenet_w1"]

    def _run(self, blocks, x, train):
        for b in blocks:
            x = b(x, train)
        return x

    def stages_backbone(self, x, train: bool = False) -> List[jax.Array]:
        # init block + stage1 together form stage 0 (reference grouping)
        x = self.init_conv(x)
        x = nn.relu(self.init_bn(x, use_running_average=not train))
        return self._backbone_from_init(x, train)

    def _backbone_from_init(self, x, train):
        outs = []
        x = self._run(self.s1, x, train)
        outs.append(x)
        x = self._run(self.s2, x, train)
        outs.append(x)
        x = self._run(self.s3, x, train)
        outs.append(x)
        x = self._run(self.s4, x, train)
        outs.append(x)
        return outs

    def __call__(self, x, train: bool = False) -> List[jax.Array]:
        outs = self.stages_backbone(x, train)
        outs.append(self.final_stage(outs[-1], train))
        return outs

    def final_stage(self, x, train: bool = False) -> jax.Array:
        return self._run(self.s5, x, train)
