"""Staged ResNet encoder (flax/linen, NHWC) for DAD-3DNet.

Behavioral spec: the reference wraps pytorchcv's resnet50 features into five
stages (/root/reference/model_training/model/encoders.py:42-48): init block
(7x7/2 conv + BN + ReLU + 3x3/2 maxpool), then four bottleneck stages of
3/4/6/3 units with output channels 256/512/1024/2048 (strides 1/2/2/2).

TPU-first choices: NHWC layout (XLA's native conv layout on TPU), fused
conv+BN+ReLU left to XLA, bfloat16-friendly (params stay fp32; activations
follow the input dtype).
"""

from __future__ import annotations

from typing import Any, Dict, List

import flax.linen as nn
import jax
import jax.numpy as jnp

BN_MOMENTUM = 0.9  # matches torch BatchNorm2d default (torch momentum 0.1)
BN_EPS = 1e-5


class ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    use_relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.kernel // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            use_bias=False,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.dtype,
        )(x)
        return nn.relu(x) if self.use_relu else x


class Bottleneck(nn.Module):
    features: int  # output channels (4x the inner width)
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inner = self.features // 4
        identity = x
        y = ConvBN(inner, 1, 1, dtype=self.dtype)(x, train)
        y = ConvBN(inner, 3, self.stride, dtype=self.dtype)(y, train)
        y = ConvBN(self.features, 1, 1, use_relu=False, dtype=self.dtype)(y, train)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = ConvBN(
                self.features, 1, self.stride, use_relu=False, dtype=self.dtype
            )(x, train)
        return nn.relu(y + identity)


class ResNetInitBlock(nn.Module):
    features: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(self.features, 7, 2, dtype=self.dtype)(x, train)
        return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])


class ResNetStage(nn.Module):
    features: int
    num_units: int
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.num_units):
            x = Bottleneck(
                self.features, stride=self.stride if i == 0 else 1, dtype=self.dtype
            )(x, train)
        return x


# Per-backbone channel tables, keyed like the reference's backbone.yaml
# (layer0 = deepest). Used by the DAD-3DNet assembly.
ENCODER_CHANNELS: Dict[str, Dict[str, int]] = {
    "resnet50": {"layer0": 2048, "layer1": 1024, "layer2": 512, "layer3": 256, "layer4": 64},
    "mobilenet_w1": {"layer0": 1024, "layer1": 512, "layer2": 256, "layer3": 128, "layer4": 64},
}


class ResNet50Stages(nn.Module):
    """Exposes the five stages individually so the DAD-3DNet assembly can run
    stages 0-3, branch through BiFPN + fusion, then run stage 4 on the fused
    map (reference forward: flame_regression.py:87-95)."""

    dtype: Any = jnp.float32

    def setup(self):
        self.init_block = ResNetInitBlock(64, dtype=self.dtype)
        self.stage1 = ResNetStage(256, 3, 1, dtype=self.dtype)
        self.stage2 = ResNetStage(512, 4, 2, dtype=self.dtype)
        self.stage3 = ResNetStage(1024, 6, 2, dtype=self.dtype)
        self.stage4 = ResNetStage(2048, 3, 2, dtype=self.dtype)

    @property
    def encoder_channels(self) -> Dict[str, int]:
        return ENCODER_CHANNELS["resnet50"]

    def stages_backbone(self, x, train: bool = False) -> List[jax.Array]:
        """Run stages 0..3, returning each output (NHWC)."""
        outs = []
        x = self.init_block(x, train)
        outs.append(x)
        x = self.stage1(x, train)
        outs.append(x)
        x = self.stage2(x, train)
        outs.append(x)
        x = self.stage3(x, train)
        outs.append(x)
        return outs

    def final_stage(self, x, train: bool = False) -> jax.Array:
        return self.stage4(x, train)

    def __call__(self, x, train: bool = False) -> List[jax.Array]:
        outs = self.stages_backbone(x, train)
        outs.append(self.final_stage(outs[-1], train))
        return outs
