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
#   - the per-image resample WEIGHTS are generated INSIDE the kernel from ten
#     int32 scalars (crop window, resized extents, pads, cv2-mode flags) via
#     iota — nothing but the frames and the (B, S, S, 3)-equivalent output
#     ever touches HBM. (The first version materialized (B, S, Hmax) /
#     (B, S, Wmax) fp32 weight tensors: building + re-reading them cost more
#     HBM time than the frames themselves.)
#   - both matmuls run as SPLIT bf16 passes with fp32 accumulation: uint8
#     pixels are EXACT in bf16, and each fp32 weight matrix is decomposed as
#     w_hi + w_lo (two bf16 numbers), giving ~2^-16 relative error — fp32
#     quality at bf16 MXU rates (2 passes for the first matmul, 3 for the
#     second, vs 6 each for a HIGHEST-precision fp32 matmul);
#   - when the CONSUMER is bf16 (out_dtype=bfloat16 — the CNN's input dtype
#     on the serving path), the lo-correction passes are dropped entirely:
#     resample weights are convex per output pixel (rows sum to 1), so
#     bf16-rounded weights give ~3*2^-9 relative output error, at or below
#     the bf16 OUTPUT's own ULP (2^-8) — invisible downstream, and the MXU
#     work falls from 5 dots to 2 (measured: the preproc-inclusive e2e gate
#     for the 5,000 img/s north star);
#   - the row matmul is BANDED on downscale: a KH-row source chunk can only
#     influence ~KH/f (+ taps) output rows, so the chunk contracts into a
#     BAND-row dynamic slice of the accumulator instead of all S rows, and
#     chunks that don't intersect the crop window skip the MXU entirely (a
#     face crop in a large frame touches a fraction of the chunks);
#   - the intermediate (S, 3W) tile lives in VMEM scratch, never in HBM
#     (the XLA path materializes a (B, S, Wmax, 3) fp32 tensor bigger than
#     the input);
#   - the per-channel ImageNet normalize folds into the epilogue, which can
#     emit bf16 directly (the CNN's input dtype) to halve the output bytes.
#
# Layout: channels ride the LANE dimension channel-planar — frames arrive as
# (B, Hmax, 3*Wmax) = concat([R, G, B], axis=-1), the serving wire format
# that pack_frames_host(planar=True) pastes at zero extra host cost — so
# both contractions are plain MXU matmuls and the channel loop is a static
# 3-way unroll over lane slices. Grid is (B, Hmax/KH): the K (source-row)
# chunks accumulate into the scratch, and the last chunk runs the second
# matmul + normalize + store.


def _hilo(w: jax.Array):
    hi = w.astype(jnp.bfloat16)
    lo = (w - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _gen_weights(
    mode: str,
    n_dst: int,
    n_src: int,
    dst0,
    src0,
    crop_lo,
    crop_len,
    new_len,
    pad_lo,
):
    """(n_dst, n_src) fp32 resample weights for one axis, generated from
    scalars — the same arithmetic as preprocess_device._axis_weights (row y =
    source taps of output pixel dst0+y), evaluated on iota index grids so no
    weight tensor exists outside VMEM. ``mode`` is STATIC ("area" — exact
    INTER_AREA box overlap; "gen2" — cv2's generic 2-tap area fallback;
    "linear" — INTER_LINEAR half-pixel taps): the caller branches per image
    on the flag scalars, so only the selected mode's VPU work runs."""
    f32 = jnp.float32
    dst = dst0 + jax.lax.broadcasted_iota(jnp.int32, (n_dst, n_src), 0)
    src = src0 + jax.lax.broadcasted_iota(jnp.int32, (n_dst, n_src), 1)
    r = (dst - pad_lo).astype(f32)
    valid = (r >= 0.0) & (r < new_len.astype(f32))

    crop_lo_f = crop_lo.astype(f32)
    f = crop_len.astype(f32) / jnp.maximum(new_len.astype(f32), 1.0)
    inv_f = 1.0 / f  # scalar reciprocal: elementwise VPU divides are slow
    src_f = src.astype(f32)
    hi_idx = crop_len.astype(f32) - 1.0

    if mode == "area":
        # exact INTER_AREA: overlap of source pixel [s, s+1) with the box
        # [lo + r*f, lo + (r+1)*f), normalized by the box length f
        box_lo = crop_lo_f + r * f
        box_hi = box_lo + f
        w = (
            jnp.clip(jnp.minimum(src_f + 1.0, box_hi) - jnp.maximum(src_f, box_lo), 0.0)
            * inv_f
        )
    elif mode == "gen2":
        # generic 2-tap area (cv2 resize INTER_AREA general path)
        s0 = jnp.floor(r * f)
        fx = (r + 1.0) - (s0 + 1.0) * inv_f
        fx = jnp.where(fx <= 0.0, 0.0, fx)
        g0 = crop_lo_f + jnp.clip(s0, 0.0, hi_idx)
        g1 = crop_lo_f + jnp.clip(s0 + 1.0, 0.0, hi_idx)
        w = (1.0 - fx) * (src_f == g0) + fx * (src_f == g1)
    else:
        # INTER_LINEAR: half-pixel source position, two taps, crop-edge clamp
        pos = r * f + 0.5 * f - 0.5
        l0 = jnp.floor(pos)
        frac = pos - l0
        t0 = crop_lo_f + jnp.clip(l0, 0.0, hi_idx)
        t1 = crop_lo_f + jnp.clip(l0 + 1.0, 0.0, hi_idx)
        w = (1.0 - frac) * (src_f == t0) + frac * (src_f == t1)
    return jnp.where(valid, w, 0.0)


def _resample_kernel(
    S: int, W: int, KH: int, scale: tuple, bias: tuple, out_dtype, fast: bool
):
    f32 = jnp.float32
    # per-image mode branch: only the selected cv2 scheme's weight-gen VPU
    # work (and dots) execute; the other branches are predicated off
    MODES = (
        ("area", lambda a, e: a & e),
        ("gen2", lambda a, e: a & jnp.logical_not(e)),
        ("linear", lambda a, e: jnp.logical_not(a)),
    )

    def kernel(s_ref, frame_ref, out_ref, acc_ref, wx_ref):
        b = pl.program_id(0)
        k = pl.program_id(1)
        nk = pl.num_programs(1)
        y0, bh = s_ref[b, 0], s_ref[b, 1]
        new_h, pad_t = s_ref[b, 2], s_ref[b, 3]
        x0, bw = s_ref[b, 4], s_ref[b, 5]
        new_w, pad_l = s_ref[b, 6], s_ref[b, 7]
        use_area = s_ref[b, 8] != 0
        use_exact = s_ref[b, 9] != 0

        @pl.when(k == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        src0 = k * KH
        # row chunks that don't intersect the crop window contribute nothing
        # (a face crop in a large frame touches a fraction of the chunks)
        overlap = (src0 < y0 + bh) & (src0 + KH > y0)

        for mode, cond in MODES:

            @pl.when(overlap & cond(use_area, use_exact))
            def _row(mode=mode):
                # uint8 -> bf16 (exact for 0..255) via Mosaic's int32 hop
                x = frame_ref[0].astype(jnp.int32).astype(jnp.bfloat16)
                wy = _gen_weights(mode, S, KH, 0, src0, y0, bh, new_h, pad_t)
                if fast:
                    acc_ref[:] += jnp.dot(
                        wy.astype(jnp.bfloat16), x, preferred_element_type=f32
                    )
                else:
                    wy_hi, wy_lo = _hilo(wy)
                    acc_ref[:] += jnp.dot(
                        wy_hi, x, preferred_element_type=f32
                    ) + jnp.dot(wy_lo, x, preferred_element_type=f32)

        @pl.when(k == nk - 1)
        def _finish():
            for mode, cond in MODES:

                @pl.when(cond(use_area, use_exact))
                def _wx(mode=mode):
                    wx_ref[:] = _gen_weights(mode, S, W, 0, 0, x0, bw, new_w, pad_l)

            tmp = acc_ref[:]

            def dg(a, b):  # contract the shared W axis: (S, W) x (S, W) -> (S, S)
                return jax.lax.dot_general(
                    a, b, (((1,), (1,)), ((), ())), preferred_element_type=f32
                )

            if fast:
                wx_b = wx_ref[:].astype(jnp.bfloat16)
            else:
                wx_hi, wx_lo = _hilo(wx_ref[:])
            for c in range(3):  # static unroll over channel-planar lane slices
                t = tmp[:, c * W : (c + 1) * W]
                if fast:
                    o = dg(t.astype(jnp.bfloat16), wx_b)
                else:
                    t_hi, t_lo = _hilo(t)
                    o = dg(t_hi, wx_hi) + dg(t_lo, wx_hi) + dg(t_hi, wx_lo)
                out_ref[0, c] = (o * scale[c] + bias[c]).astype(out_dtype)

    return kernel


def _resample_kernel_single(
    S: int, W: int, Hmax: int, scale: tuple, bias: tuple, out_dtype, fast: bool
):
    """Whole-frame variant (grid (B,), frame fits VMEM): no accumulator
    scratch, no zero-init, no read-modify-write — each mode branch runs the
    full row-matmul -> column-matmul -> normalize chain on values."""
    f32 = jnp.float32
    MODES = (
        ("area", lambda a, e: a & e),
        ("gen2", lambda a, e: a & jnp.logical_not(e)),
        ("linear", lambda a, e: jnp.logical_not(a)),
    )

    def kernel(s_ref, frame_ref, out_ref):
        b = pl.program_id(0)
        y0, bh = s_ref[b, 0], s_ref[b, 1]
        new_h, pad_t = s_ref[b, 2], s_ref[b, 3]
        x0, bw = s_ref[b, 4], s_ref[b, 5]
        new_w, pad_l = s_ref[b, 6], s_ref[b, 7]
        use_area = s_ref[b, 8] != 0
        use_exact = s_ref[b, 9] != 0

        def dg(a, b_):  # contract the shared W axis: (S, W) x (S, W) -> (S, S)
            return jax.lax.dot_general(
                a, b_, (((1,), (1,)), ((), ())), preferred_element_type=f32
            )

        for mode, cond in MODES:

            @pl.when(cond(use_area, use_exact))
            def _all(mode=mode):
                # uint8 -> bf16 (exact for 0..255) via Mosaic's int32 hop
                x = frame_ref[0].astype(jnp.int32).astype(jnp.bfloat16)
                wy = _gen_weights(mode, S, Hmax, 0, 0, y0, bh, new_h, pad_t)
                wx = _gen_weights(mode, S, W, 0, 0, x0, bw, new_w, pad_l)
                if fast:
                    tmp = jnp.dot(
                        wy.astype(jnp.bfloat16), x, preferred_element_type=f32
                    )
                    wx_b = wx.astype(jnp.bfloat16)
                else:
                    wy_hi, wy_lo = _hilo(wy)
                    tmp = jnp.dot(wy_hi, x, preferred_element_type=f32) + jnp.dot(
                        wy_lo, x, preferred_element_type=f32
                    )
                    wx_hi, wx_lo = _hilo(wx)
                for c in range(3):  # static unroll over planar lane slices
                    t = tmp[:, c * W : (c + 1) * W]
                    if fast:
                        o = dg(t.astype(jnp.bfloat16), wx_b)
                    else:
                        t_hi, t_lo = _hilo(t)
                        o = dg(t_hi, wx_hi) + dg(t_lo, wx_hi) + dg(t_hi, wx_lo)
                    out_ref[0, c] = (o * scale[c] + bias[c]).astype(out_dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("img_size", "normalize", "out_dtype", "interpret", "weights"),
)
def resample_normalize_pallas(
    frames_planar: jax.Array,
    scalars: jax.Array,
    img_size: int = 256,
    normalize: str = "imagenet",
    out_dtype=jnp.float32,
    interpret: bool = False,
    weights: str = "auto",
) -> jax.Array:
    """(B, Hmax, 3*Wmax) channel-planar uint8 frames + per-image scalars
    (B, 10) int32 [y0, bh, new_h, pad_top, x0, bw, new_w, pad_left,
    use_area, use_exact_area] -> (B, 3, S, S) normalized ``out_dtype``.

    The single fused kernel of the crop+resize+normalize north star
    (BASELINE.json; reference host chain predictor.py:195-203); the caller
    (ops/preprocess_device.py) computes the scalar table with the exact cv2
    rounding semantics. NCHW-planar output — the caller transposes to NHWC
    (or feeds a planar-aware consumer).

    ``weights``: "split" = hi+lo bf16 weight decomposition (~2^-16 relative,
    fp32 quality — 5 MXU passes); "bf16" = single-rounded bf16 weights
    (~3*2^-9 relative — 2 MXU passes, 2.3x less preproc MXU time); "auto" =
    "bf16" when ``out_dtype`` is bfloat16 (the error is below the OUTPUT
    dtype's ULP, so the cheap path is exactly as good), else "split"."""
    B, Hmax, W3 = frames_planar.shape
    assert W3 % 3 == 0, frames_planar.shape
    Wmax = W3 // 3
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

    if weights not in ("auto", "split", "bf16"):
        raise KeyError(f"unknown weights mode {weights!r}")
    fast = weights == "bf16" or (
        weights == "auto" and jnp.dtype(out_dtype) == jnp.dtype(jnp.bfloat16)
    )

    if Hmax <= 512:
        # whole frame fits VMEM (<= 768 KB uint8): scratch-free single-pass
        # kernel, grid over images only
        return pl.pallas_call(
            _resample_kernel_single(S, Wmax, Hmax, scale, bias, out_dtype, fast),
            out_shape=jax.ShapeDtypeStruct((B, 3, S, S), out_dtype),
            grid=(B,),
            in_specs=[
                pl.BlockSpec((B, 10), lambda b: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (1, Hmax, 3 * Wmax), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 3, S, S), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
            interpret=interpret,
        )(scalars, frames_planar)

    # large frames: chunk source rows so only KH rows live in VMEM at a time;
    # KH = 128 keeps the row-matmul's contraction dim a full MXU tile
    # (K=64 measured ~40% slower end to end)
    KH = 128 if Hmax % 128 == 0 else (64 if Hmax % 64 == 0 else Hmax)
    grid = (B, Hmax // KH)
    return pl.pallas_call(
        _resample_kernel(S, Wmax, KH, scale, bias, out_dtype, fast),
        out_shape=jax.ShapeDtypeStruct((B, 3, S, S), out_dtype),
        grid=grid,
        in_specs=[
            # whole scalar table in SMEM (B x 10 int32 — tiny); the kernel
            # rows-indexes it by program_id(0)
            pl.BlockSpec((B, 10), lambda b, k: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, KH, 3 * Wmax), lambda b, k: (b, k, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 3, S, S), lambda b, k: (b, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((S, 3 * Wmax), jnp.float32),  # row-resampled rows
            pltpu.VMEM((S, Wmax), jnp.float32),  # per-image wx weights
        ],
        # images are independent; only the source-row chunks accumulate
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        interpret=interpret,
    )(scalars, frames_planar)
