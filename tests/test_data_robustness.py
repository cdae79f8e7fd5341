"""Failure-path tests for the data pipeline (the reference's only failure
handling is collate_skip_none; ours must match or exceed it)."""

import json
import os

import numpy as np
import pytest

from dad3dheads_tpu.data.bbox import ensure_bbox_boundaries, extend_bbox
from dad3dheads_tpu.data.dataset import DataLoader, FlameDataset, collate


def test_extend_and_clamp_bbox():
    bbox = np.array([10, 20, 100, 50])
    grown = extend_bbox(bbox, 0.1)
    np.testing.assert_array_equal(grown, [0, 15, 120, 60])
    # tuple forms
    np.testing.assert_array_equal(extend_bbox(bbox, (0.1, 0.0)), [0, 20, 120, 50])
    clamped = ensure_bbox_boundaries(np.array([-5, -5, 200, 100]), (60, 80))
    assert clamped[0] >= 0 and clamped[1] >= 0
    assert clamped[0] + clamped[2] <= 80 and clamped[1] + clamped[3] <= 60


def test_collate_replaces_failed_samples():
    good = {"a": np.ones((2, 2)), "name": "x"}
    out = collate([good, None, None])
    assert out["a"].shape == (3, 2, 2)
    assert out["name"] == ["x", "x", "x"]
    with pytest.raises(RuntimeError):
        collate([None, None])


def test_dataset_returns_none_on_bad_annotation(tmp_path):
    import cv2

    os.makedirs(tmp_path / "images", exist_ok=True)
    cv2.imwrite(str(tmp_path / "images" / "0.png"), np.zeros((50, 50, 3), np.uint8))
    anno = [
        {"img_path": "images/0.png", "annotation_path": "missing.json", "bbox": [5, 5, 30, 30]},
        {"img_path": "missing.png", "annotation_path": "missing.json", "bbox": [5, 5, 30, 30]},
    ]
    ann_path = tmp_path / "train.json"
    ann_path.write_text(json.dumps(anno))
    ds = FlameDataset.from_config(
        {
            "ann_path": str(ann_path),
            "dataset_root": str(tmp_path),
            "img_size": 64,
            "keypoints": {"2d_subset_name": "multipie_keypoints"},
            "transform": {},
        }
    )
    assert ds[0] is None  # missing mesh json
    assert ds[1] is None  # missing image (cv2 returns None -> PIL raises)


def test_dataset_uint8_mode(tmp_path, rng):
    """output_uint8 defers normalization to the device."""
    import cv2

    from dad3dheads_tpu.constants import INPUT_IMAGE_KEY

    os.makedirs(tmp_path / "images", exist_ok=True)
    os.makedirs(tmp_path / "annos", exist_ok=True)
    img = (rng.uniform(size=(80, 80, 3)) * 255).astype(np.uint8)
    cv2.imwrite(str(tmp_path / "images" / "0.png"), img)
    verts = (rng.normal(size=(5023, 3)) * 0.1).astype(np.float32)
    (tmp_path / "annos" / "0.json").write_text(
        json.dumps(
            {
                "vertices": verts.tolist(),
                "model_view_matrix": np.eye(4).tolist(),
                "projection_matrix": (np.eye(4) * 40).tolist(),
            }
        )
    )
    (tmp_path / "train.json").write_text(
        json.dumps([{"img_path": "images/0.png", "annotation_path": "annos/0.json", "bbox": [5, 5, 60, 60]}])
    )
    ds = FlameDataset.from_config(
        {
            "ann_path": str(tmp_path / "train.json"),
            "dataset_root": str(tmp_path),
            "img_size": 64,
            "output_uint8": True,
            "keypoints": {"2d_subset_name": "multipie_keypoints"},
            "transform": {},
        }
    )
    item = ds[0]
    assert item[INPUT_IMAGE_KEY].dtype == np.uint8

    # the train step normalizes uint8 images on device
    import jax.numpy as jnp

    from dad3dheads_tpu.train.step import _prepare_targets

    batch = collate([item])
    batch.pop("SAMPLE_INDEX_KEY")
    batch.pop("IMAGE_FILENAME_KEY")
    prepared = _prepare_targets({k: jnp.asarray(v) for k, v in batch.items()})
    x = np.asarray(prepared[INPUT_IMAGE_KEY])
    assert x.dtype == np.float32
    assert x.min() < -0.5  # imagenet-normalized range


def test_loader_drop_last_and_order(tmp_path, rng):
    class FakeDS:
        def __len__(self):
            return 5

        def __getitem__(self, i):
            return {"i": np.asarray([i])}

    loader = DataLoader(FakeDS(), batch_size=2, shuffle=False, num_workers=1, drop_last=True)
    batches = list(loader)
    assert len(batches) == 2  # 5 // 2, last dropped
    np.testing.assert_array_equal(batches[0]["i"].reshape(-1), [0, 1])

    loader2 = DataLoader(FakeDS(), batch_size=2, shuffle=False, num_workers=1, drop_last=False)
    assert len(list(loader2)) == 3
