"""Device-side fused preprocessing: full frame uint8 + bbox -> normalized
network tensor, entirely on the TPU.

The reference preprocesses on host: cv2 bbox crop + albumentations
LongestMaxSize/PadIfNeeded + Normalize (/root/reference/predictor.py:195-203,
model_training/data/flame_dataset.py:94-112). On TPU that host work is the
serving bottleneck; here the whole chain — crop, aspect-preserving resize,
center pad, ImageNet normalize — is one fused XLA program over static shapes.

TPU-first design: resampling is separable, so the resize is expressed as two
dense matmuls with PER-IMAGE weight matrices built in-graph from the dynamic
(frame size, bbox) scalars:

    out[y, x] = sum_h sum_w  Wy[y, h] * frame[h, w] * Wx[x, w]

The (S, Hmax)/(S, Wmax) weight matrices encode, per image, the crop window,
cv2's INTER_AREA box-overlap weights (downscale) or INTER_LINEAR half-pixel
weights (upscale), the center padding (zero rows), and the 1/255 dequantize —
so the FLOPs land on the MXU as (B, S, Hmax) x (B, Hmax, Wmax*3) batched
matmuls instead of serial gathers, and XLA fuses the final per-channel
normalize. Shapes stay static for any frame/bbox: recompilation happens only
when the padded frame buffer size changes.

The resized-edge rounding (python3 banker's round in the host path,
ops/preprocess.py:26-29) is reproduced EXACTLY with integer math on the
rational bh*S/maxside, so the device scale/padding metadata matches the host
readjustment inverses bit-for-bit.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..constants import IMAGENET_MEAN, IMAGENET_STD


def pack_frames_host(
    frames, bboxes, batch_size: int, bucket: int = 64, planar: bool = False,
    fixed_shape=None,
):
    """Paste a chunk of variable-size uint8 frames into one padded device
    buffer — the ONLY host work in the device-preprocess serving path.

    Returns (buf (B, Hmax, Wmax, 3) uint8, sizes (B, 2) int32 [h, w],
    boxes (B, 4) int32); Hmax/Wmax round up to ``bucket`` to bound
    recompilation, and pad rows repeat the last frame so every row is a
    valid image for the fixed compile shape.

    ``planar=True`` pastes channel-planar (B, Hmax, 3*Wmax) — the Pallas
    kernel's wire format (``preprocess_frames_device(layout="planar")``):
    the host memcpys the same bytes either way, and the device skips the
    NHWC->planar relayout copy.

    ``fixed_shape=(H, W)`` pins the buffer extents instead of the bucketed
    max (every frame must fit) — used to hit a statically-shaped exported
    program (api/export.py TPU-specialized frames entry) exactly."""
    import numpy as np

    count = len(frames)
    assert 0 < count <= batch_size, (count, batch_size)
    if fixed_shape is not None:
        hmax, wmax = int(fixed_shape[0]), int(fixed_shape[1])
        bad = [f.shape[:2] for f in frames if f.shape[0] > hmax or f.shape[1] > wmax]
        assert not bad, f"frames {bad} exceed fixed_shape {(hmax, wmax)}"
    else:
        hmax = ((max(f.shape[0] for f in frames) + bucket - 1) // bucket) * bucket
        wmax = ((max(f.shape[1] for f in frames) + bucket - 1) // bucket) * bucket
    if planar:
        buf = np.zeros((batch_size, hmax, 3 * wmax), np.uint8)
    else:
        buf = np.zeros((batch_size, hmax, wmax, 3), np.uint8)
    sizes = np.zeros((batch_size, 2), np.int32)
    boxes = np.zeros((batch_size, 4), np.int32)
    for j, f in enumerate(frames):
        if f.dtype != np.uint8:
            f = np.clip(np.round(f), 0, 255).astype(np.uint8)
        if planar:
            h, w = f.shape[:2]
            for c in range(3):
                buf[j, :h, c * wmax : c * wmax + w] = f[:, :, c]
        else:
            buf[j, : f.shape[0], : f.shape[1]] = f
        sizes[j] = (f.shape[0], f.shape[1])
        boxes[j] = bboxes[j]
    for j in range(count, batch_size):
        buf[j] = buf[count - 1]
        sizes[j] = sizes[count - 1]
        boxes[j] = boxes[count - 1]
    return buf, sizes, boxes


def _round_half_even_ratio(p: jax.Array, q: jax.Array) -> jax.Array:
    """Banker's round of the exact rational p/q (int32) — the in-graph
    equivalent of python3 round(bh * scale)."""
    n = p // q
    r = p % q
    up = (2 * r > q) | ((2 * r == q) & (n % 2 == 1))
    return n + up.astype(jnp.int32)


def _axis_weights(
    src_max: int,
    out_size: int,
    crop_lo: jax.Array,
    crop_len: jax.Array,
    new_len: jax.Array,
    pad_lo: jax.Array,
    use_area: jax.Array,
    use_exact_area: jax.Array,
) -> jax.Array:
    """(out_size, src_max) fp32 resample matrix for one axis of one image.

    Row y holds the source weights of output pixel y: zero outside the
    padded window; inside, one of cv2's three resample schemes (selected per
    image to match the host path exactly):
      - exact INTER_AREA box overlap — what cv2 runs when BOTH axes shrink;
      - cv2's generic 2-tap area approximation — what it falls back to under
        INTER_AREA when either axis enlarges (resize-mode mixed scales);
      - INTER_LINEAR half-pixel taps (upscale).
    All positions are expressed relative to the crop window."""
    dst = jnp.arange(out_size, dtype=jnp.int32)[:, None]  # (S, 1)
    src = jnp.arange(src_max, dtype=jnp.int32)[None, :]  # (1, M)
    r = (dst - pad_lo).astype(jnp.float32)  # position within the resized crop
    valid = (r >= 0) & (r < new_len.astype(jnp.float32))

    crop_lo_f = crop_lo.astype(jnp.float32)
    f = crop_len.astype(jnp.float32) / jnp.maximum(new_len.astype(jnp.float32), 1.0)
    src_f = src.astype(jnp.float32)
    hi_idx = crop_len.astype(jnp.float32) - 1.0

    # exact INTER_AREA: overlap of source pixel [s, s+1) with the box
    # [lo + r*f, lo + (r+1)*f), normalized by the box length f
    box_lo = crop_lo_f + r * f
    box_hi = box_lo + f
    w_area = (
        jnp.clip(jnp.minimum(src_f + 1.0, box_hi) - jnp.maximum(src_f, box_lo), 0.0)
        / f
    )

    # generic 2-tap area (cv2 resize INTER_AREA general path):
    # s0 = floor(r*f); fx = (r+1) - (s0+1)/f; single tap when fx <= 0
    s0 = jnp.floor(r * f)
    fx = (r + 1.0) - (s0 + 1.0) / f
    fx = jnp.where(fx <= 0.0, 0.0, fx)
    g0 = crop_lo_f + jnp.clip(s0, 0.0, hi_idx)
    g1 = crop_lo_f + jnp.clip(s0 + 1.0, 0.0, hi_idx)
    w_gen = (1.0 - fx) * (src_f == g0) + fx * (src_f == g1)

    # INTER_LINEAR: half-pixel source position, two taps, crop-edge clamp
    pos = r * f + 0.5 * f - 0.5  # relative to the crop
    l0 = jnp.floor(pos)
    frac = pos - l0
    t0 = crop_lo_f + jnp.clip(l0, 0.0, hi_idx)
    t1 = crop_lo_f + jnp.clip(l0 + 1.0, 0.0, hi_idx)
    w_lin = (1.0 - frac) * (src_f == t0) + frac * (src_f == t1)

    w = jnp.where(use_area, jnp.where(use_exact_area, w_area, w_gen), w_lin)
    return jnp.where(valid, w, 0.0)


@functools.partial(
    jax.jit,
    static_argnames=("img_size", "normalize", "mode", "impl", "layout", "out_dtype"),
)
def preprocess_frames_device(
    frames_u8: jax.Array,
    sizes: jax.Array,
    bboxes: jax.Array,
    img_size: int = 256,
    normalize: str = "imagenet",
    mode: str = "longest_max_size",
    impl: str = "auto",
    layout: str = "nhwc",
    out_dtype=jnp.float32,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused device preprocess for a batch of padded full frames.

    Args:
      frames_u8: (B, Hmax, Wmax, 3) uint8; each frame occupies the top-left
        (h, w) region, the rest is ignored. With ``layout="planar"``:
        (B, Hmax, 3*Wmax) channel-planar — the serving wire format
        ``pack_frames_host(planar=True)`` pastes at zero extra host cost,
        which saves the on-device relayout copy on the Pallas path.
      sizes: (B, 2) int32 [h, w] true frame sizes.
      bboxes: (B, 4) int32 [x0, y0, x1, y1] crop windows (pass
        [0, 0, w, h] to preprocess the whole frame). Clamped in-graph to the
        true frame extents from ``sizes`` so a loose box can never average
        the zero padding outside the frame into the resample.

    Returns (images, scales, paddings) matching the host path
    (ops/preprocess.py preprocess_image_np on the cropped frame):
      images: (B, img_size, img_size, 3) ``out_dtype``, normalized;
      scales: (B, 2) fp32 [sx, sy] (equal for longest_max_size);
      paddings: (B, 4) int32 [top, bottom, left, right].
    """
    if layout == "planar":
        B, Hmax, W3 = frames_u8.shape
        assert W3 % 3 == 0, frames_u8.shape
        Wmax = W3 // 3
    else:
        B, Hmax, Wmax, C = frames_u8.shape
    bboxes = bboxes.astype(jnp.int32)
    h = sizes[:, 0].astype(jnp.int32)
    w = sizes[:, 1].astype(jnp.int32)
    x0 = jnp.clip(bboxes[:, 0], 0, w - 1)
    y0 = jnp.clip(bboxes[:, 1], 0, h - 1)
    bw = jnp.clip(bboxes[:, 2], x0 + 1, w) - x0
    bh = jnp.clip(bboxes[:, 3], y0 + 1, h) - y0

    if mode == "longest_max_size":
        long_side = jnp.maximum(bh, bw)
        new_h = _round_half_even_ratio(bh * img_size, long_side)
        new_w = _round_half_even_ratio(bw * img_size, long_side)
        scale = img_size / long_side.astype(jnp.float32)
        scales = jnp.stack([scale, scale], axis=-1)
        use_area = scale < 1.0
        use_exact_area = use_area  # aspect preserved: both axes shrink
        pad_top = (img_size - new_h) // 2
        pad_left = (img_size - new_w) // 2
        paddings = jnp.stack(
            [pad_top, img_size - new_h - pad_top, pad_left, img_size - new_w - pad_left],
            axis=-1,
        )
    elif mode == "resize":
        new_h = jnp.full((B,), img_size, jnp.int32)
        new_w = jnp.full((B,), img_size, jnp.int32)
        scales = jnp.stack(
            [img_size / bw.astype(jnp.float32), img_size / bh.astype(jnp.float32)],
            axis=-1,
        )
        use_area = jnp.min(scales, axis=-1) < 1.0
        # cv2 runs the exact area algorithm only when neither axis enlarges;
        # with mixed scales it falls back to the generic 2-tap scheme
        use_exact_area = jnp.max(scales, axis=-1) <= 1.0
        pad_top = pad_left = jnp.zeros((B,), jnp.int32)
        paddings = jnp.zeros((B, 4), jnp.int32)
    else:
        raise KeyError(f"unknown resize mode {mode!r}")

    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl in ("pallas", "pallas_interpret"):
        # the fused north-star kernel: uint8 read side, weights generated
        # in-kernel from these ten scalars, banded split-bf16 MXU matmuls,
        # VMEM-resident intermediate, normalize in the epilogue
        from .preprocess_pallas import resample_normalize_pallas

        scalars = jnp.stack(
            [
                y0, bh, new_h, pad_top,
                x0, bw, new_w, pad_left,
                use_area.astype(jnp.int32),
                use_exact_area.astype(jnp.int32),
            ],
            axis=-1,
        )
        planar = (
            frames_u8
            if layout == "planar"
            else jnp.transpose(frames_u8, (0, 1, 3, 2)).reshape(B, Hmax, 3 * Wmax)
        )
        out = resample_normalize_pallas(
            planar, scalars, img_size, normalize,
            out_dtype=out_dtype, interpret=(impl == "pallas_interpret"),
        )
        return jnp.transpose(out, (0, 2, 3, 1)), scales, paddings

    wy = jax.vmap(
        lambda *a: _axis_weights(Hmax, img_size, *a)
    )(y0, bh, new_h, pad_top, use_area, use_exact_area)  # (B, S, Hmax)
    wx = jax.vmap(
        lambda *a: _axis_weights(Wmax, img_size, *a)
    )(x0, bw, new_w, pad_left, use_area, use_exact_area)  # (B, S, Wmax)

    if layout == "planar":
        # (B, Hmax, 3W) planar -> NHWC for the einsum reference path
        frames_u8 = jnp.transpose(
            frames_u8.reshape(B, Hmax, 3, Wmax), (0, 1, 3, 2)
        )
    x = frames_u8.astype(jnp.float32)
    # (B, S, Hmax) x (B, Hmax, Wmax, C) -> (B, S, Wmax, C), then over W
    out = jnp.einsum("byh,bhwc->bywc", wy, x, precision=jax.lax.Precision.HIGHEST)
    out = jnp.einsum("bxw,bywc->byxc", wx, out, precision=jax.lax.Precision.HIGHEST)

    if normalize == "imagenet":
        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
        std = jnp.asarray(IMAGENET_STD, jnp.float32)
        out = out * (1.0 / (255.0 * std)) - mean / std
    elif normalize == "mean":
        out = out * (2.0 / 255.0) - 1.0
    elif normalize == "none":
        pass  # raw 0..255 resampled values (host-path "none" keeps uint8)
    else:
        raise KeyError(f"unknown normalize mode {normalize!r}")
    return out.astype(out_dtype), scales, paddings
