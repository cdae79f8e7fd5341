"""Layer zoo: separable conv blocks, pixel-shuffle upsampling, prediction
heads, and the block registries.

Behavioral spec: /root/reference/model_training/model/layers.py — SepConv /
MixSepConv conv blocks (depthwise k x k + pointwise, optionally multi-kernel
mixed), PixelShuffle upsample, IdentityLayer base, and the name -> block
factory registries used by configurable heads.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .resnet import BN_EPS, BN_MOMENTUM


class ConvBlock(nn.Module):
    """Plain conv + BN + ReLU."""

    features: int
    kernel: int = 3
    stride: int = 1
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
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=self.dtype
        )(x)
        return nn.relu(x)


class SepConv(nn.Module):
    """Depthwise separable conv block: depthwise k x k + BN + ReLU, then
    pointwise 1x1 + BN + ReLU."""

    features: int
    kernel: int = 3
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.kernel // 2
        x = nn.Conv(
            x.shape[-1],
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
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


class MixSepConv(nn.Module):
    """Mixed-kernel separable conv: the channel groups run depthwise convs of
    different kernel sizes (3/5/7), concatenated, then a pointwise merge."""

    features: int
    kernels: Sequence[int] = (3, 5, 7)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        C = x.shape[-1]
        n = len(self.kernels)
        split = [C // n] * n
        split[-1] += C - sum(split)
        outs = []
        start = 0
        for k, c in zip(self.kernels, split):
            part = x[..., start : start + c]
            pad = k // 2
            part = nn.Conv(
                c,
                (k, k),
                padding=[(pad, pad), (pad, pad)],
                feature_group_count=c,
                use_bias=False,
                dtype=self.dtype,
            )(part)
            outs.append(part)
            start += c
        x = jnp.concatenate(outs, axis=-1)
        x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=self.dtype
        )(x)
        return nn.relu(x)


def pixel_shuffle(x: jax.Array, upscale: int = 2) -> jax.Array:
    """(B, H, W, C*r^2) -> (B, H*r, W*r, C) depth-to-space."""
    B, H, W, C = x.shape
    r = upscale
    assert C % (r * r) == 0, (C, r)
    x = x.reshape(B, H, W, r, r, C // (r * r))
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(B, H * r, W * r, C // (r * r))


class PixelShuffleUpsample(nn.Module):
    """Conv to r^2 x features then depth-to-space upsample."""

    features: int
    upscale: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features * self.upscale**2, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype
        )(x)
        return pixel_shuffle(x, self.upscale)


class IdentityLayer(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        return x


CONV_BLOCKS: Dict[str, Callable[..., nn.Module]] = {
    "conv": ConvBlock,
    "sep_conv": SepConv,
    "mix_sep_conv": MixSepConv,
}


def get_conv_block(name: str) -> Callable[..., nn.Module]:
    return CONV_BLOCKS[name]


class MaskPredictionHead(nn.Module):
    """Configurable dense-prediction head: N conv blocks then a 1x1 logit
    conv (the mask/heatmap prediction-layer registry equivalent)."""

    num_classes: int
    num_filters: int = 128
    num_blocks: int = 2
    block: str = "sep_conv"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        blk = get_conv_block(self.block)
        for _ in range(self.num_blocks):
            x = blk(self.num_filters, dtype=self.dtype)(x, train)
        return nn.Conv(
            self.num_classes, (1, 1), bias_init=nn.initializers.zeros, dtype=self.dtype
        )(x)


PREDICTION_HEADS: Dict[str, Callable[..., nn.Module]] = {
    "mask": MaskPredictionHead,
}


def get_mask_prediction_layer(name: str = "mask") -> Callable[..., nn.Module]:
    return PREDICTION_HEADS[name]
