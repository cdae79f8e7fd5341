"""Pallas TPU kernel: fused uint8 -> normalized fp32 image preprocessing.

The serving input path (SURVEY.md §7 step 3): decode-side images arrive as
uint8 NHWC; the network wants (x/255 - mean)/std fp32. Fusing the dequantize,
scale, and normalize into one VMEM pass halves the HBM traffic vs
materializing the fp32 intermediate (uint8 read + fp32 write, instead of
uint8->fp32 write + fp32 read + fp32 write).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import IMAGENET_MEAN, IMAGENET_STD


def _kernel(img_ref, scale_ref, bias_ref, out_ref):
    # Mosaic has no direct uint8->f32 cast; hop through int32
    x = img_ref[:].astype(jnp.int32).astype(jnp.float32)
    # x/255/std - mean/std  ==  x * scale + bias, scale/bias per channel
    out_ref[:] = x * scale_ref[:] + bias_ref[:]


@functools.partial(jax.jit, static_argnames=("normalize", "interpret"))
def normalize_images_pallas(
    images_u8: jax.Array, normalize: str = "imagenet", interpret: bool = False
) -> jax.Array:
    """(B, H, W, 3) uint8 -> normalized fp32, one fused pass."""
    B, H, W, C = images_u8.shape
    if normalize == "imagenet":
        std = jnp.asarray(IMAGENET_STD, jnp.float32)
        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    elif normalize == "mean":
        std = jnp.asarray([0.5] * 3, jnp.float32)
        mean = jnp.asarray([0.5] * 3, jnp.float32)
    else:
        std = jnp.ones((3,), jnp.float32)
        mean = jnp.zeros((3,), jnp.float32)
    scale = (1.0 / (255.0 * std)).reshape(1, 1, 1, C)
    bias = (-mean / std).reshape(1, 1, 1, C)

    TILE_H = 8
    grid = (B, H // TILE_H) if H % TILE_H == 0 else (B, 1)
    th = TILE_H if H % TILE_H == 0 else H
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, th, W, C), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, C), lambda b, i: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, C), lambda b, i: (0, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, W, C), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(images_u8, scale, bias)


def normalize_images(images_u8: jax.Array, normalize: str = "imagenet") -> jax.Array:
    """Dispatch: Pallas on TPU, plain XLA elsewhere."""
    if jax.default_backend() == "tpu":
        return normalize_images_pallas(images_u8, normalize)
    from .preprocess import normalize_batch_jax

    return normalize_batch_jax(images_u8, normalize)
