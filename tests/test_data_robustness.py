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
    # pixel VALUES are the raw resized crop — an old rescale bug saturated
    # every pixel >= 1 to 255 (garbage binary inputs through the whole
    # uint8 training path)
    from dad3dheads_tpu.ops.preprocess import preprocess_image_np

    assert item[INPUT_IMAGE_KEY].max() < 255 or img.max() == 255
    assert len(np.unique(item[INPUT_IMAGE_KEY])) > 10

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


def test_loader_relays_worker_exceptions(tmp_path):
    """A producer-thread crash must raise in the consumer, not silently end
    the epoch early (a truncated epoch on one host desyncs per-process batch
    counts and deadlocks cross-host collectives)."""
    class ExplodingDS:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i >= 4:
                raise RuntimeError("boom at sample 4")
            return {"x": np.zeros((2,), np.float32)}

    dl = DataLoader(ExplodingDS(), batch_size=2, shuffle=False, num_workers=2)
    seen = 0
    with pytest.raises(RuntimeError, match="boom at sample 4"):
        for _ in dl:
            seen += 1
    assert seen == 2  # the two good batches arrived before the crash


def test_device_heatmap_encoder_matches_host_coder(rng):
    """encode_heatmap (device) == HeatmapCoder (host) bit-for-bit, including
    the uint8 TRUNCATION the reference uses (np.uint8(255 * hm))."""
    import jax.numpy as jnp

    from dad3dheads_tpu.data.dataset import HeatmapCoder
    from dad3dheads_tpu.ops.heatmap import encode_heatmap

    coder = HeatmapCoder(64, 4, radius=5, num_classes=68)
    pts = (rng.uniform(size=(68, 2)) * 64).astype(np.float32)
    presence = rng.uniform(size=(68,)) > 0.2
    host = coder(pts, presence)  # (C, S, S) uint8
    dev = np.asarray(
        encode_heatmap(
            jnp.asarray(pts[None]), jnp.asarray(presence[None]),
            img_size=64, stride=4, radius=5,
        )
    )[0]
    np.testing.assert_array_equal(dev, host)  # both (K, S, S)


class _ArithDS:
    """Module-level (picklable) deterministic dataset for process-mode tests."""

    def __len__(self):
        return 12

    def __getitem__(self, i):
        if i == 999:  # never hit; keeps the class generic
            raise RuntimeError("unreachable")
        return {"i": np.asarray([i]), "x": np.full((3,), float(i), np.float32)}


class _ExplodingArithDS(_ArithDS):
    def __getitem__(self, i):
        if i >= 6:
            raise RuntimeError(f"boom at sample {i}")
        return super().__getitem__(i)


def test_process_loader_matches_thread_loader():
    """worker_mode='process' (persistent spawn-context workers, batch-level IPC) must
    yield byte-identical batches in the same order as thread mode — the
    assignment is round-robin by batch ordinal and each worker walks its
    slice in order."""
    kw = dict(batch_size=3, shuffle=False, drop_last=True)
    ref = list(DataLoader(_ArithDS(), num_workers=2, **kw))
    for n_w in (1, 2, 3):
        got = list(DataLoader(_ArithDS(), num_workers=n_w, worker_mode="process", **kw))
        assert len(got) == len(ref)
        for a, b in zip(got, ref):
            assert set(a) == set(b)
            for k in a:
                np.testing.assert_array_equal(a[k], b[k])


def test_process_loader_relays_worker_exceptions():
    dl = DataLoader(
        _ExplodingArithDS(), batch_size=3, shuffle=False, num_workers=2,
        worker_mode="process",
    )
    with pytest.raises(RuntimeError, match="boom at sample"):
        list(dl)


def test_process_loader_shuffle_reproducible():
    """Same seed -> same shuffled order in both worker modes."""
    a = list(DataLoader(_ArithDS(), batch_size=3, shuffle=True, seed=7, num_workers=1))
    b = list(
        DataLoader(
            _ArithDS(), batch_size=3, shuffle=True, seed=7, num_workers=2,
            worker_mode="process",
        )
    )
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x["i"], y["i"])


def test_thread_workers_clamp_to_cpu_count():
    """Thread mode clamps surplus GIL-bound workers to the CPU count (the
    r04 anomaly: 8 threads measured SLOWER than 1 on a 1-core host); process
    mode does NOT clamp — worker processes scale past the GIL."""
    import os as _os

    cpus = _os.cpu_count() or 1
    t = DataLoader(_ArithDS(), batch_size=3, num_workers=cpus + 7, worker_mode="thread")
    assert t.num_workers == cpus
    p = DataLoader(_ArithDS(), batch_size=3, num_workers=cpus + 7, worker_mode="process")
    assert p.num_workers == cpus + 7


def test_invalid_worker_mode_rejected():
    with pytest.raises(ValueError, match="worker_mode"):
        DataLoader(_ArithDS(), batch_size=3, worker_mode="greenlet")
