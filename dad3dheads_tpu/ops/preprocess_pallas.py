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


# ---------------------------------------------------------------------------
# The north-star kernel: crop + resize + normalize, ONE fused Pallas program
# ---------------------------------------------------------------------------
#
# The separable resample out = Wy @ frame @ Wx^T (ops/preprocess_device.py)
# runs here as a single kernel per batch:
#   - the frame stays uint8 all the way into VMEM (4x less HBM read than the
#     XLA fp32 einsum path) and is converted on-chip;
#   - both matmuls run as SPLIT bf16 passes with fp32 accumulation: uint8
#     pixels are EXACT in bf16, and each fp32 weight matrix is decomposed as
#     w_hi + w_lo (two bf16 numbers), giving ~2^-16 relative error — fp32
#     quality at bf16 MXU rates (2 passes for the first matmul, 3 for the
#     second, vs 6 each for a HIGHEST-precision fp32 matmul);
#   - the intermediate (S, 3W) tile lives in VMEM scratch, never in HBM
#     (the XLA path materializes a (B, S, Wmax, 3) fp32 tensor bigger than
#     the input);
#   - the per-channel ImageNet normalize folds into the epilogue.
#
# Layout: channels ride the LANE dimension channel-planar — frames arrive as
# (B, Hmax, 3*Wmax) = concat([R, G, B], axis=-1) — so both contractions are
# plain MXU matmuls and the channel loop is a static 3-way unroll over lane
# slices. Grid is (B, Hmax/KH): the K (source-row) chunks accumulate into the
# scratch, and the last chunk runs the second matmul + normalize + store.


def _hilo(w: jax.Array):
    hi = w.astype(jnp.bfloat16)
    lo = (w - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _resample_kernel(S: int, W: int, scale: tuple, bias: tuple):
    f32 = jnp.float32

    def kernel(frame_ref, wy_ref, wx_ref, out_ref, acc_ref):
        k = pl.program_id(1)
        nk = pl.num_programs(1)

        @pl.when(k == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        # uint8 -> bf16 (exact for 0..255); Mosaic needs the int32 hop
        x = frame_ref[0].astype(jnp.int32).astype(f32).astype(jnp.bfloat16)
        wy_hi, wy_lo = _hilo(wy_ref[0])
        acc_ref[:] += jnp.dot(wy_hi, x, preferred_element_type=f32) + jnp.dot(
            wy_lo, x, preferred_element_type=f32
        )

        @pl.when(k == nk - 1)
        def _finish():
            tmp = acc_ref[:]
            wx_hi, wx_lo = _hilo(wx_ref[0])

            def dg(a, b):  # contract the shared W axis: (S, W) x (S, W) -> (S, S)
                return jax.lax.dot_general(
                    a, b, (((1,), (1,)), ((), ())), preferred_element_type=f32
                )

            for c in range(3):  # static unroll over channel-planar lane slices
                t = tmp[:, c * W : (c + 1) * W]
                t_hi, t_lo = _hilo(t)
                o = dg(t_hi, wx_hi) + dg(t_lo, wx_hi) + dg(t_hi, wx_lo)
                out_ref[0, c] = o * scale[c] + bias[c]

    return kernel


@functools.partial(jax.jit, static_argnames=("img_size", "normalize", "interpret"))
def resample_normalize_pallas(
    frames_u8: jax.Array,
    wy: jax.Array,
    wx: jax.Array,
    img_size: int = 256,
    normalize: str = "imagenet",
    interpret: bool = False,
) -> jax.Array:
    """(B, Hmax, Wmax, 3) uint8 + per-image resample matrices
    wy (B, S, Hmax) / wx (B, S, Wmax) fp32 -> (B, S, S, 3) normalized fp32.

    The single fused kernel of the crop+resize+normalize north star
    (BASELINE.json; reference host chain predictor.py:195-203). Weight
    matrices come from ops/preprocess_device.py's in-graph builder — this
    kernel replaces its two HIGHEST-precision fp32 einsums.
    """
    B, Hmax, Wmax, C = frames_u8.shape
    assert C == 3, frames_u8.shape
    S = img_size
    if normalize == "imagenet":
        std = [float(s) for s in IMAGENET_STD]
        mean = [float(m) for m in IMAGENET_MEAN]
        scale = tuple(1.0 / (255.0 * s) for s in std)
        bias = tuple(-m / s for m, s in zip(mean, std))
    elif normalize == "mean":
        scale = (2.0 / 255.0,) * 3
        bias = (-1.0,) * 3
    elif normalize == "none":
        scale = (1.0,) * 3
        bias = (0.0,) * 3
    else:
        raise KeyError(f"unknown normalize mode {normalize!r}")

    # channel-planar lanes: (B, Hmax, Wmax, 3) -> (B, Hmax, 3*Wmax)
    planar = jnp.transpose(frames_u8, (0, 1, 3, 2)).reshape(B, Hmax, 3 * Wmax)

    KH = 128 if Hmax % 128 == 0 else (64 if Hmax % 64 == 0 else Hmax)
    grid = (B, Hmax // KH)
    out = pl.pallas_call(
        _resample_kernel(S, Wmax, scale, bias),
        out_shape=jax.ShapeDtypeStruct((B, 3, S, S), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, KH, 3 * Wmax), lambda b, k: (b, k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, KH), lambda b, k: (b, 0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, Wmax), lambda b, k: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 3, S, S), lambda b, k: (b, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((S, 3 * Wmax), jnp.float32)],
        interpret=interpret,
    )(planar, wy, wx)
    return jnp.transpose(out, (0, 2, 3, 1))  # planar -> NHWC
