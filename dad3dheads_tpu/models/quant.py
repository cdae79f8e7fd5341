"""Post-training int8 quantization for the DAD-3DNet inference path.

Motivation (measured, see README "Roofline position"): the bf16 inference
pipeline sustains ~80% of v5e HBM bandwidth — it is byte-bound, so the only
way to go materially faster is to move fewer bytes. int8 halves activation
and weight traffic (a 3x3 256ch conv chain at the hot 64x64 shape measures
1.95x faster than bf16 on chip).

Where the win comes from (microbenched on chip, round 2): the speedup is
ENTIRELY the halved HBM traffic of int8-resident activations — the int8
matmul itself is no faster per FLOP than bf16 through XLA on v5e (a
1M x 256 x 256 int8 dot runs 2.05 ms vs 1.70 ms bf16), and the requant
epilogue fuses (0.07 ms standalone). A hand-written Pallas fused
matmul+requant kernel exactly ties XLA (2.37 vs 2.39 ms) — there is no
further kernel-level headroom to claim on this op.

Design (see models/quantized.py for the pipeline that uses these
primitives):
  * calibration = fp forward passes recording the running max |x| at every
    quantization site into a plain amax dict (saved as .npz);
  * int8 mode: BatchNorm is folded into the conv (eval-time running stats),
    weights are quantized per-output-channel, activations per-tensor; conv
    runs int8 x int8 -> int32 on the MXU with a dequant + bias + ReLU +
    requant epilogue, so inter-layer tensors stay int8-resident in HBM.

This is an inference-only, opt-in mode; training and the parity-checked fp
path are untouched. The reference has no quantized path (precision: 32,
backend/1gpu.yaml:5) — this is TPU-native headroom beyond parity.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class QTensor(NamedTuple):
    """int8 values + the fp32 scale that dequantizes them (x ≈ values * scale)."""

    values: jax.Array  # int8
    scale: jax.Array  # () fp32


def quantize(x: jax.Array, scale: jax.Array) -> QTensor:
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return QTensor(q.astype(jnp.int8), scale)


def dequantize(q: QTensor, dtype=jnp.float32) -> jax.Array:
    return (q.values.astype(jnp.float32) * q.scale).astype(dtype)


def _amax_scale(amax: jax.Array) -> jax.Array:
    return jnp.maximum(amax, 1e-8) / 127.0


def fold_bn(kernel, bn_scale, bn_bias, bn_mean, bn_var, eps):
    """Fold eval-mode BatchNorm into the preceding conv.

    kernel: (kh, kw, cin, cout). Returns (kernel', bias') with
    y = conv(x, kernel') + bias'  ==  BN(conv(x, kernel))."""
    inv = bn_scale / jnp.sqrt(bn_var + eps)  # (cout,)
    return kernel * inv[None, None, None, :], bn_bias - bn_mean * inv


def quantize_weights_per_channel(kernel: jax.Array):
    """(kh, kw, cin, cout) fp -> int8 kernel + per-cout fp32 scales."""
    amax = jnp.max(jnp.abs(kernel), axis=(0, 1, 2))  # (cout,)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(kernel / scale[None, None, None, :]), -127, 127)
    return q.astype(jnp.int8), scale


def conv_int8(
    xq: QTensor,
    kernel_q: jax.Array,  # int8 (kh, kw, cin, cout)
    w_scale: jax.Array,  # (cout,) fp32
    bias: jax.Array,  # (cout,) fp32 (BN-folded)
    stride: int,
    padding,
    out_scale: Optional[jax.Array] = None,
    relu: bool = True,
    out_dtype=jnp.bfloat16,
):
    """int8 conv with a fused dequant+bias(+ReLU)(+requant) epilogue.

    Returns a QTensor when ``out_scale`` is given (int8-resident chain), else
    a dense ``out_dtype`` tensor (chain boundary)."""
    dn = jax.lax.conv_dimension_numbers(
        xq.values.shape, kernel_q.shape, ("NHWC", "HWIO", "NHWC")
    )
    acc = jax.lax.conv_general_dilated(
        xq.values,
        kernel_q,
        (stride, stride),
        padding,
        dimension_numbers=dn,
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (xq.scale * w_scale)[None, None, None, :] + bias
    if relu:
        y = jnp.maximum(y, 0.0)
    if out_scale is None:
        return y.astype(out_dtype)
    return quantize(y, out_scale)


def add_relu_requant(a: QTensor, b: QTensor, out_scale: jax.Array) -> QTensor:
    """Residual join: dequantize both operands, add, ReLU, requantize."""
    y = a.values.astype(jnp.float32) * a.scale + b.values.astype(jnp.float32) * b.scale
    return quantize(jnp.maximum(y, 0.0), out_scale)
