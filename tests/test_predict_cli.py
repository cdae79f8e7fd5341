"""Bulk serving path: FaceMeshPredictor.predict_images + cli/predict.py.

The batched path must reproduce the single-image ``__call__`` contract per
image (original-frame coordinates) while running fixed-shape device batches.
"""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def small_predictor():
    from dad3dheads_tpu.api.predictor import FaceMeshPredictor

    return FaceMeshPredictor(
        {"img_size": 64, "model": {"backbone": "resnet50", "num_classes": 68}}
    )


def _images(rng, n=5):
    # varied sizes/aspects exercise per-image readjustment inside one batch
    sizes = [(80, 60), (50, 90), (64, 64), (100, 40), (70, 70)]
    return [
        (rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8)
        for h, w in sizes[:n]
    ]


def test_predict_images_matches_single_calls(small_predictor, rng):
    imgs = _images(rng)
    bulk = small_predictor.predict_images(imgs, batch_size=2, num_workers=2)
    assert len(bulk) == len(imgs)
    for img, got in zip(imgs, bulk):
        ref = small_predictor(img)
        assert set(got) == set(ref)
        # integer-truncated points may flip by 1px at rounding boundaries
        assert np.max(np.abs(got["points"] - ref["points"])) <= 1
        np.testing.assert_allclose(
            got["3dmm_params"], ref["3dmm_params"], atol=1e-3
        )
        np.testing.assert_allclose(
            got["3d_vertices"], ref["3d_vertices"], atol=1e-3
        )
        assert got["projected_vertices"].shape == ref["projected_vertices"].shape


def test_predict_images_empty(small_predictor):
    assert small_predictor.predict_images([]) == []


def test_predict_cli_jsonl_and_obj(tmp_path, rng, monkeypatch):
    import cv2

    from dad3dheads_tpu.cli.predict import list_images, main

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i, img in enumerate(_images(rng, 3)):
        cv2.imwrite(str(img_dir / f"im{i}.png"), img[..., ::-1])
    assert len(list_images(str(img_dir))) == 3
    assert list_images(str(img_dir / "*.png")) == list_images(str(img_dir))

    out = tmp_path / "out"
    path = main(
        [
            "--input", str(img_dir), "--output", str(out), "--batch", "2",
            "--img-size", "64", "--dtype", "fp32", "--allow-random-weights",
        ]
    )
    with open(path) as f:
        lines = [json.loads(l) for l in f]
    assert len(lines) == 3
    assert all(len(l["points"]) == 68 and len(l["3dmm_params"]) == 413 for l in lines)

    out2 = tmp_path / "out_obj"
    main(
        [
            "--input", str(img_dir), "--output", str(out2), "--format", "obj",
            "--batch", "2", "--img-size", "64", "--dtype", "fp32",
            "--allow-random-weights",
        ]
    )
    objs = sorted(os.listdir(out2))
    assert objs == ["im0.obj", "im1.obj", "im2.obj"]
    first = (out2 / "im0.obj").read_text().splitlines()
    assert sum(1 for l in first if l.startswith("v ")) == 5023
    assert sum(1 for l in first if l.startswith("f ")) == 9976


def test_predict_images_without_mesh(small_predictor, rng):
    imgs = _images(rng, 3)
    bulk = small_predictor.predict_images(imgs, batch_size=2, with_mesh=False)
    full = small_predictor.predict_images(imgs, batch_size=2)
    assert all(set(p) == {"points", "3dmm_params"} for p in bulk)
    for a, b in zip(bulk, full):
        np.testing.assert_array_equal(a["points"], b["points"])
        np.testing.assert_array_equal(a["3dmm_params"], b["3dmm_params"])


def test_predict_images_accepts_float_inputs(small_predictor, rng):
    """float 0-255 images must match the uint8 path (the pipeline only
    normalizes uint8 batches in-graph, so floats are coerced on host)."""
    img_u8 = (rng.uniform(size=(80, 60, 3)) * 255).astype(np.uint8)
    a = small_predictor.predict_images([img_u8], batch_size=1)[0]
    b = small_predictor.predict_images([img_u8.astype(np.float32)], batch_size=1)[0]
    np.testing.assert_array_equal(a["points"], b["points"])
    np.testing.assert_allclose(a["3dmm_params"], b["3dmm_params"], atol=1e-6)


def test_missing_checkpoint_fails_loudly(tmp_path, rng):
    """Without a checkpoint the CLIs must error with a download/port hint
    (reference downloads or fails, predictor.py:29-65); random weights only
    behind the explicit flag — which must note the loaded state."""
    import cv2

    from dad3dheads_tpu.api.predictor import FaceMeshPredictor
    from dad3dheads_tpu.cli.predict import main

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    img = (rng.uniform(size=(64, 64, 3)) * 255).astype(np.uint8)
    cv2.imwrite(str(img_dir / "im0.png"), img[..., ::-1])

    with pytest.raises(FileNotFoundError, match="port_torch_weights"):
        main(
            [
                "--input", str(img_dir), "--output", str(tmp_path / "o"),
                "--img-size", "64", "--dtype", "fp32",
                "--checkpoint", str(tmp_path / "nonexistent.msgpack"),
            ]
        )

    # the programmatic API stays permissive by default but records that no
    # checkpoint was loaded
    p = FaceMeshPredictor({"img_size": 64, "model": {"backbone": "mobilenet_w1", "dtype": "fp32"}})
    assert p.loaded_checkpoint is None
