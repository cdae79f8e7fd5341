"""End-to-end: rendered synthetic dataset -> real data pipeline -> benchmark
ground truth. Validates that the generator's annotation geometry is
consistent with what FlameDataset and the benchmark harness compute."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("synth"))
    env = dict(os.environ, DAD3D_PLATFORM="cpu")
    subprocess.run(
        [
            sys.executable,
            "tools/make_synthetic_dataset.py",
            "--out",
            out,
            "--subset",
            "val",
            "--num",
            "3",
        ],
        check=True,
        env=env,
        capture_output=True,
    )
    return out


def test_dataset_loads_rendered_data(synth_root):
    from dad3dheads_tpu.constants import (
        INPUT_IMAGE_KEY,
        TARGET_2D_LANDMARKS,
        TARGET_2D_LANDMARKS_PRESENCE,
        TARGET_LANDMARKS_HEATMAP,
    )
    from dad3dheads_tpu.data.dataset import FlameDataset

    base = os.path.join(synth_root, "DAD-3DHeadsDataset", "val")
    ds = FlameDataset.from_config(
        {
            "ann_path": os.path.join(base, "val.json"),
            "dataset_root": base,
            "img_size": 256,
            "stride": 4,
            "num_classes": 68,
            "keypoints": {"2d_subset_name": "multipie_keypoints"},
            "transform": {"normalize": "imagenet"},
        }
    )
    item = ds[0]
    assert item is not None
    assert item[INPUT_IMAGE_KEY].shape == (256, 256, 3)
    # the rendered head is within the bbox crop: most landmarks present
    presence = np.asarray(item[TARGET_2D_LANDMARKS_PRESENCE])
    assert presence.mean() > 0.8, presence.mean()
    lms = np.asarray(item[TARGET_2D_LANDMARKS])
    assert lms.min() >= -0.05 and lms.max() <= 1.05
    assert int(np.asarray(item[TARGET_LANDMARKS_HEATMAP]).max()) == 255


def test_generate_gt_and_perfect_eval(synth_root, tmp_path):
    """generate_gt folds the synthetic annotations; a GT-derived submission
    scores perfectly — the complete reference acceptance workflow."""
    import jax.numpy as jnp

    from dad3dheads_tpu.benchmark_harness import DADEvaluator, generate_gt
    from dad3dheads_tpu.benchmark_harness.evaluate import SEVEN_LMK_INDICES, HeadAnnotation

    gt_path = generate_gt(synth_root, "val", output_dir=str(tmp_path))
    with open(gt_path) as f:
        gt = json.load(f)
    assert len(gt) == 3 and gt[0]["image_height"] == 256

    ev = DADEvaluator(gt_path, gt_path)  # submission path replaced below
    submission = {}
    for cfg in gt:
        a = HeadAnnotation.from_config(cfg)
        g68 = ev.gt_landmarks_68_2d(a)
        world = a.vertices3d_world_homo[:, :3]
        lms = ev._landmarks68_3d(world)
        svn = lms[SEVEN_LMK_INDICES]
        scale = 20.0 / np.linalg.norm(svn[1] - svn[2])
        scaled = world * scale
        svn_scaled = ev._landmarks68_3d(scaled)[SEVEN_LMK_INDICES]
        submission[cfg["id"]] = {
            "68_landmarks_2d": g68.tolist(),
            "N_landmarks_3d": (-scaled).tolist(),
            "7_landmarks_3d": (-svn_scaled).tolist(),
            "rotation_matrix": ev.get_gt_rot_mat(a).tolist(),
        }
    sub_path = str(tmp_path / "sub.json")
    with open(sub_path, "w") as f:
        json.dump(submission, f)

    overall, _ = DADEvaluator(gt_path, sub_path)()
    assert overall["nme_reprojection"] == pytest.approx(0.0, abs=1e-3)
    assert overall["pose_error"] == pytest.approx(0.0, abs=1e-4)
    assert overall["z5_accuracy"] == pytest.approx(1.0, abs=1e-6)
    assert overall["chamfer"] == pytest.approx(0.0, abs=5e-3)


def test_generate_submission_batched(synth_root, tmp_path):
    """generate_submission runs the batched predict_images path over a real
    dataset directory and writes schema-valid entries for every item."""
    import json

    from dad3dheads_tpu.benchmark_harness.submission import generate_submission

    out = str(tmp_path / "sub.json")
    path = generate_submission(synth_root, subset="val", output_path=out)
    with open(path) as f:
        sub = json.load(f)
    assert len(sub) == 3
    for entry in sub.values():
        assert set(entry) == {
            "68_landmarks_2d", "N_landmarks_3d", "7_landmarks_3d", "rotation_matrix",
        }
        assert np.asarray(entry["68_landmarks_2d"]).shape == (68, 2)
        assert np.asarray(entry["rotation_matrix"]).shape == (3, 3)


def test_visualize_gt_cli(synth_root, tmp_path):
    """The GT visualizer projects dataset annotations onto the image and
    writes <id>_GT_landmarks.png (reference visualize.py behavior)."""
    from dad3dheads_tpu.cli.visualize import visualize

    ann_dir = os.path.join(synth_root, "DAD-3DHeadsDataset", "val", "annotations")
    item_id = os.path.splitext(os.listdir(ann_dir)[0])[0]
    out = visualize("val", item_id, base_path=synth_root, outputs_folder=str(tmp_path))
    assert out.endswith("_GT_landmarks.png") and os.path.isfile(out)
    import cv2

    img = cv2.imread(out)
    assert img is not None and img.sum() > 0


def test_mesh_sidecar_cache(synth_root):
    """_load_mesh caches parsed annotations as raw .npy sidecars (86% of the
    per-item cost was json parsing); the cached read must be bit-identical
    and stale caches must be ignored."""
    import glob
    import time

    from dad3dheads_tpu.data.dataset import FlameDataset

    ann = sorted(
        glob.glob(os.path.join(synth_root, "DAD-3DHeadsDataset", "val", "annotations", "*.json"))
    )[0]
    for f in glob.glob(ann + ".cache.npy*"):
        os.remove(f)
    cold = FlameDataset._load_mesh(ann)
    assert os.path.isfile(ann + ".cache.npy")
    warm = FlameDataset._load_mesh(ann)
    for a, b in zip(cold, warm):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # stale cache (json newer) is ignored: corrupt it, mark the json newer,
    # and the reparse must still return the true values
    with open(ann + ".cache.npy", "wb") as f:
        f.write(b"garbage")
    now = time.time() + 10
    os.utime(ann, (now, now))
    re = FlameDataset._load_mesh(ann)
    for a, b in zip(cold, re):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_device_heatmap_defers_encoding_to_step(synth_root):
    """FlameDataset(device_heatmap=true) omits the heatmap from the sample
    (loader threads skip the host coder — the biggest per-item cost after
    JPEG decode); the step-side preparer then synthesizes it on device
    BYTE-EQUAL to the host coder's target (reference does this work in every
    dataloader worker: model_training/data/flame_dataset.py:64-71)."""
    import jax.numpy as jnp

    from dad3dheads_tpu.constants import TARGET_LANDMARKS_HEATMAP
    from dad3dheads_tpu.data.dataset import FlameDataset, collate
    from dad3dheads_tpu.train.step import _prepare_targets

    base = os.path.join(synth_root, "DAD-3DHeadsDataset", "val")
    cfg = {
        "ann_path": os.path.join(base, "val.json"),
        "dataset_root": base,
        "img_size": 256,
        "stride": 4,
        "num_classes": 68,
        "keypoints": {"2d_subset_name": "multipie_keypoints"},
        "transform": {"normalize": "imagenet"},
        "output_uint8": True,
        "seed": 3,
    }
    ds_host = FlameDataset.from_config(cfg)
    ds_dev = FlameDataset.from_config({**cfg, "device_heatmap": True})

    host_samples = [ds_host[i] for i in range(2)]
    dev_samples = [ds_dev[i] for i in range(2)]
    assert all(TARGET_LANDMARKS_HEATMAP not in s for s in dev_samples)

    batch = collate(dev_samples)
    batch = {
        k: jnp.asarray(v) for k, v in batch.items() if isinstance(v, np.ndarray)
    }
    targets = _prepare_targets(batch, img_size=256, heatmap_stride=4, heatmap_radius=5)
    got = np.round(np.asarray(targets[TARGET_LANDMARKS_HEATMAP]) * 255.0).astype(np.uint8)
    want = collate(host_samples)[TARGET_LANDMARKS_HEATMAP]
    np.testing.assert_array_equal(got, want)
