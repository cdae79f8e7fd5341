"""Resize transform modes: the reference offers plain non-aspect 'resize' as
well as 'longest_max_size' (/root/reference/model_training/data/transforms.py
:7-24). Round-trip tests of the keypoint/3DMM readjustment inverses, plus the
draw_pose matrix-column endpoints against the classic trig formulation."""

import numpy as np

from dad3dheads_tpu.ops.preprocess import (
    preprocess_image_np,
    readjust_3dmm_np,
    readjust_landmarks_np,
    transform_keypoints_np,
)


def test_resize_mode_shapes_and_roundtrip(rng):
    # power-of-two scales so the fp32 round-trip is exact under the
    # reference's int truncation
    img = (rng.random((128, 256, 3)) * 255).astype(np.uint8)
    tensor, scale, pads = preprocess_image_np(img, 64, mode="resize")
    assert tensor.shape == (64, 64, 3)
    assert pads == [0, 0, 0, 0]
    np.testing.assert_allclose(scale, [64 / 256, 64 / 128])

    kps = np.asarray([[10.0, 30.0], [150.0, 90.0]], np.float32)
    t = transform_keypoints_np(kps, scale, pads)
    np.testing.assert_allclose(t, kps * scale[None], rtol=1e-6)
    # inverse truncates to int, exactly like the reference predictor
    back = readjust_landmarks_np(t, pads, scale)
    np.testing.assert_array_equal(back, kps.astype(int))


def test_resize_mode_square_matches_longest_max_size(rng):
    """On square inputs the two modes coincide (same scale, no padding) —
    including the 3DMM scale/translation inverse."""
    img = (rng.random((128, 128, 3)) * 255).astype(np.uint8)
    t1, s1, p1 = preprocess_image_np(img, 64, mode="longest_max_size")
    t2, s2, p2 = preprocess_image_np(img, 64, mode="resize")
    np.testing.assert_allclose(t1, t2)
    assert p1 == p2 == [0, 0, 0, 0]
    np.testing.assert_allclose(np.broadcast_to(s1, (2,)), s2)

    mm = rng.normal(size=(2, 413)).astype(np.float32)
    np.testing.assert_allclose(
        readjust_3dmm_np(mm, p1, s1, 64), readjust_3dmm_np(mm, p2, s2, 64), rtol=1e-6
    )


def test_dataset_config_selects_resize_mode():
    from dad3dheads_tpu.data.dataset import FlameDataset

    ds = FlameDataset(
        data=[], config={"img_size": 64, "transform": {"resize_mode": "resize"}}
    )
    assert ds.resize_mode == "resize"
    ds2 = FlameDataset(data=[], config={"img_size": 64})
    assert ds2.resize_mode == "longest_max_size"


def test_draw_pose_endpoints_match_trig_oracle():
    """The rotation-matrix-column endpoints equal the classic per-endpoint
    trig expressions (behavior parity with /root/reference/demo_utils.py
    :68-94) for a grid of angles."""
    for roll_d, pitch_d, yaw_d in [(10, -20, 35), (0, 0, 0), (-75, 40, -10)]:
        roll, pitch = np.radians(roll_d), np.radians(pitch_d)
        yaw = -np.radians(yaw_d)
        cr, sr = np.cos(roll), np.sin(roll)
        cp, sp = np.cos(pitch), np.sin(pitch)
        cy, sy = np.cos(yaw), np.sin(yaw)
        rot_x = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
        rot_y = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        rot_z = np.array([[cr, -sr, 0], [sr, cr, 0], [0, 0, 1]])
        M = (rot_x @ rot_y @ rot_z)[:2, :].T  # rows: x/y/z axis endpoints

        oracle = np.array(
            [
                [cy * cr, cp * sr + cr * sp * sy],
                [-cy * sr, cp * cr - sp * sy * sr],
                [sy, -cy * sp],
            ]
        )
        np.testing.assert_allclose(M, oracle, atol=1e-12)
