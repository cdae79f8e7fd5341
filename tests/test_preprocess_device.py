"""Parity of the fused device preprocess (ops/preprocess_device.py) against
the host cv2 path (ops/preprocess.py preprocess_image_np) — the north-star
"crop + resize + normalize on device" kernel.

Tolerances: the host path resizes uint8 (cv2 rounds the resample result to
int before normalizing, a +-0.5/255 quantization -> ~0.009 after /std) and
cv2's INTER_LINEAR runs in 11-bit fixed point; the device path keeps floats
throughout. Scale/padding metadata must match EXACTLY (the banker's-round
edge math is reproduced with integer arithmetic)."""

import numpy as np
import pytest

from dad3dheads_tpu.ops.preprocess import preprocess_image_np
from dad3dheads_tpu.ops.preprocess_device import preprocess_frames_device

S = 64


def _random_frames(rng, n, hmax, wmax):
    frames = np.zeros((n, hmax, wmax, 3), np.uint8)
    sizes, bboxes = [], []
    for i in range(n):
        h = int(rng.integers(24, hmax + 1))
        w = int(rng.integers(24, wmax + 1))
        frames[i, :h, :w] = (rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8)
        # mix of whole-frame and strict-interior bboxes
        if i % 2 == 0:
            bb = [0, 0, w, h]
        else:
            x0 = int(rng.integers(0, w // 3))
            y0 = int(rng.integers(0, h // 3))
            bb = [x0, y0, int(rng.integers(x0 + 12, w + 1)), int(rng.integers(y0 + 12, h + 1))]
        sizes.append([h, w])
        bboxes.append(bb)
    return frames, np.asarray(sizes, np.int32), np.asarray(bboxes, np.int32)


@pytest.mark.parametrize("mode", ["longest_max_size", "resize"])
def test_device_preprocess_matches_host(rng, mode):
    frames, sizes, bboxes = _random_frames(rng, 8, 96, 120)
    imgs, scales, pads = preprocess_frames_device(
        frames, sizes, bboxes, img_size=S, mode=mode
    )
    imgs, scales, pads = np.asarray(imgs), np.asarray(scales), np.asarray(pads)

    for i in range(len(frames)):
        h, w = sizes[i]
        x0, y0, x1, y1 = bboxes[i]
        crop = frames[i, y0:y1, x0:x1]
        ref, ref_scale, ref_pads = preprocess_image_np(crop, S, mode=mode)

        # metadata exact: the host readjustment inverses must be reusable
        # host longest_max_size returns a scalar (== both axes); resize mode
        # returns [sx, sy] — the same order the device path emits
        ref_scale = np.broadcast_to(np.asarray(ref_scale, np.float32), (2,))
        np.testing.assert_allclose(scales[i], ref_scale, rtol=1e-6)
        assert pads[i].tolist() == ref_pads

        diff = np.abs(imgs[i] - ref)
        assert diff.max() < 0.08, (mode, i, diff.max())
        assert diff.mean() < 0.01, (mode, i, diff.mean())


def test_device_preprocess_identity_crop(rng):
    """A bbox already at img_size passes through exactly (no resample)."""
    frames = (rng.uniform(size=(2, S, S, 3)) * 255).astype(np.uint8)
    sizes = np.asarray([[S, S]] * 2, np.int32)
    bboxes = np.asarray([[0, 0, S, S]] * 2, np.int32)
    imgs, scales, pads = preprocess_frames_device(frames, sizes, bboxes, img_size=S)
    ref, _, _ = preprocess_image_np(frames[0], S)
    np.testing.assert_allclose(np.asarray(imgs[0]), ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(scales), 1.0)
    assert np.asarray(pads).sum() == 0


def test_device_preprocess_readjustment_roundtrip(rng):
    """The device-returned (scale, paddings) feed the host inverse functions:
    a crop-space point mapped through the forward transform and back is
    recovered (the predictor readjustment contract, predictor.py:147-152)."""
    from dad3dheads_tpu.ops.preprocess import (
        readjust_landmarks_np,
        transform_keypoints_np,
    )

    frames, sizes, bboxes = _random_frames(rng, 4, 96, 120)
    _, scales, pads = preprocess_frames_device(frames, sizes, bboxes, img_size=S)
    for i in range(len(frames)):
        x0, y0, x1, y1 = bboxes[i]
        pts = rng.uniform(size=(7, 2)) * [x1 - x0, y1 - y0]
        s = float(np.asarray(scales)[i][0])
        p = np.asarray(pads)[i].tolist()
        net_pts = transform_keypoints_np(pts, s, p)
        back = readjust_landmarks_np(net_pts, p, s)
        np.testing.assert_allclose(back, pts.astype(int), atol=1.0)


def test_device_preprocess_clamps_loose_bboxes(rng):
    """A bbox extending past the frame into the zero-padded buffer region is
    clamped in-graph — identical output to the pre-clamped box, never black
    padding averaged into the resample."""
    frames, sizes, _ = _random_frames(rng, 2, 96, 120)
    h0, w0 = sizes[0]
    loose = np.asarray([[-20, -10, w0 + 50, h0 + 30], [0, 0, 10_000, 10_000]], np.int32)
    clamped = np.asarray([[0, 0, w0, h0], [0, 0, sizes[1][1], sizes[1][0]]], np.int32)
    a = preprocess_frames_device(frames, sizes, loose, img_size=S)
    b = preprocess_frames_device(frames, sizes, clamped, img_size=S)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def test_pallas_kernel_matches_xla_path(rng):
    """The fused Pallas crop+resize+normalize (split-bf16 MXU matmuls,
    uint8 read side — ops/preprocess_pallas.py resample_normalize_pallas)
    == the XLA HIGHEST-precision einsum path to ~2^-16 relative (the hi+lo
    bf16 decomposition error), with identical scale/pad metadata."""
    frames, sizes, bboxes = _random_frames(rng, 4, 96, 120)
    for mode in ("longest_max_size", "resize"):
        ref, s1, p1 = preprocess_frames_device(
            frames, sizes, bboxes, img_size=S, mode=mode, impl="xla"
        )
        out, s2, p2 = preprocess_frames_device(
            frames, sizes, bboxes, img_size=S, mode=mode, impl="pallas_interpret"
        )
        diff = np.abs(np.asarray(out) - np.asarray(ref))
        assert diff.max() < 1e-3, (mode, diff.max())
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_pallas_kernel_identity_crop_exact(rng):
    """Identity crops resample with 0/1 weights: uint8 is exact in bf16 and
    the hi/lo split leaves no residual, so the kernel is EXACT (matches the
    host atol used in test_device_preprocess_identity_crop)."""
    frames = (rng.uniform(size=(2, S, S, 3)) * 255).astype(np.uint8)
    sizes = np.asarray([[S, S]] * 2, np.int32)
    bboxes = np.asarray([[0, 0, S, S]] * 2, np.int32)
    ref, _, _ = preprocess_frames_device(frames, sizes, bboxes, img_size=S, impl="xla")
    out, _, _ = preprocess_frames_device(
        frames, sizes, bboxes, img_size=S, impl="pallas_interpret"
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_pallas_bf16_fast_weights_close_to_split(rng):
    """out_dtype=bfloat16 auto-selects single-rounded bf16 resample weights
    (2 MXU passes instead of 5 — the preproc-inclusive north-star gate). The
    weights are convex per output pixel, so the error is ~3*2^-9 relative to
    the pre-normalize pixel value — at most 4.4/0.225sigma * 3*2^-9 ~ 0.026
    in post-normalize units, i.e. ~1-2 ULP of the bf16 OUTPUT itself
    (ULP(4.4) = 2^-8*4 ~ 0.016) — invisible to the bf16-input CNN."""
    import jax.numpy as jnp

    frames, sizes, bboxes = _random_frames(rng, 4, 96, 120)
    for mode in ("longest_max_size", "resize"):
        ref, s1, p1 = preprocess_frames_device(
            frames, sizes, bboxes, img_size=S, mode=mode, impl="pallas_interpret"
        )
        out, s2, p2 = preprocess_frames_device(
            frames, sizes, bboxes, img_size=S, mode=mode,
            impl="pallas_interpret", out_dtype=jnp.bfloat16,
        )
        diff = np.abs(np.asarray(out, np.float32) - np.asarray(ref))
        assert diff.max() < 3e-2, (mode, diff.max())
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_pallas_chunked_tall_frames_match_xla(rng):
    """Frames taller than 512 take the CHUNKED kernel (row chunks accumulate
    in a VMEM scratch; non-overlapping chunks skip); parity with the XLA path
    and with the single-pass kernel's tolerances."""
    frames, sizes, bboxes = _random_frames(rng, 2, 600, 96)
    frames = np.concatenate([frames, frames[:, :40]], axis=1)  # Hmax=640
    ref, s1, p1 = preprocess_frames_device(
        frames, sizes, bboxes, img_size=S, impl="xla"
    )
    out, s2, p2 = preprocess_frames_device(
        frames, sizes, bboxes, img_size=S, impl="pallas_interpret"
    )
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 1e-3
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))

    # the chunked kernel's bf16 fast-weight path (same bound as single-pass)
    import jax.numpy as jnp

    fast, _, _ = preprocess_frames_device(
        frames, sizes, bboxes, img_size=S, impl="pallas_interpret",
        out_dtype=jnp.bfloat16,
    )
    assert np.abs(np.asarray(fast, np.float32) - np.asarray(ref)).max() < 3e-2
