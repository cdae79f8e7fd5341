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


def test_predict_images_device_resident_inputs(small_predictor, rng):
    """Device-resident jax arrays flow through predict_images with no host
    preprocessing (the serving-bench path) and yield identical outputs."""
    import jax.numpy as jnp

    host = [(rng.uniform(size=(64, 64, 3)) * 255).astype(np.uint8) for _ in range(3)]
    dev = [jnp.asarray(im) for im in host]
    b = small_predictor.predict_images(host, batch_size=2, with_mesh=False)
    a = small_predictor.predict_images(dev, batch_size=2, with_mesh=False)
    # one contiguous (N, S, S, 3) device batch: per-batch packed dispatches
    # with vectorized readjustment — a different compiled program, so allow
    # last-ulp fusion noise
    c = small_predictor.predict_images(
        jnp.stack(dev), batch_size=2, with_mesh=False
    )
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x["points"], y["points"])
        np.testing.assert_allclose(x["3dmm_params"], y["3dmm_params"], atol=1e-6)
    for x, y in zip(c, b):
        np.testing.assert_array_equal(x["points"], y["points"])
        np.testing.assert_allclose(x["3dmm_params"], y["3dmm_params"], atol=1e-5)
    # with_mesh=True on the bulk-device path decodes FLAME per chunk
    m = small_predictor.predict_images(jnp.stack(dev), batch_size=2)
    ref = small_predictor.predict_images(host, batch_size=2)
    for x, y in zip(m, ref):
        np.testing.assert_array_equal(x["points"], y["points"])
        np.testing.assert_allclose(x["3d_vertices"], y["3d_vertices"], atol=1e-4)


def test_predict_frames_identity_matches_predict_images(small_predictor, rng):
    """When the frame is already img_size (no resampling), the on-device
    preprocess path must reproduce the host-preprocess path exactly — the
    network input is bit-identical modulo the fused normalize."""
    imgs = [(rng.uniform(size=(64, 64, 3)) * 255).astype(np.uint8) for _ in range(3)]
    via_frames = small_predictor.predict_frames(imgs, batch_size=2)
    via_host = small_predictor.predict_images(imgs, batch_size=2)
    for a, b in zip(via_frames, via_host):
        np.testing.assert_allclose(a["points"], b["points"], atol=1)
        np.testing.assert_allclose(a["3dmm_params"], b["3dmm_params"], atol=1e-4)
        np.testing.assert_allclose(a["3d_vertices"], b["3d_vertices"], atol=1e-4)


def test_predict_frames_bbox_coordinates(small_predictor, rng):
    """A bbox crop served from the full frame equals serving the host-cropped
    image, with points shifted back to full-frame coordinates."""
    frame = (rng.uniform(size=(96, 120, 3)) * 255).astype(np.uint8)
    bbox = (28, 16, 28 + 64, 16 + 64)  # 64x64 crop -> no resampling at all
    crop = frame[bbox[1] : bbox[3], bbox[0] : bbox[2]]

    via_frames = small_predictor.predict_frames([frame], bboxes=[bbox], batch_size=1)[0]
    via_crop = small_predictor.predict_images([crop], batch_size=1)[0]
    np.testing.assert_allclose(
        via_frames["points"] - np.asarray([[bbox[0], bbox[1]]]),
        via_crop["points"],
        atol=1,
    )
    np.testing.assert_allclose(
        via_frames["3dmm_params"], via_crop["3dmm_params"], atol=1e-4
    )


def test_predict_frames_resampled_close_to_host(small_predictor, rng):
    """With real resampling the device (float) and host (cv2/uint8) paths
    round differently; outputs must still agree closely."""
    frames = [
        (rng.uniform(size=(90, 70, 3)) * 255).astype(np.uint8),
        (rng.uniform(size=(40, 55, 3)) * 255).astype(np.uint8),
    ]
    via_frames = small_predictor.predict_frames(frames, batch_size=2, with_mesh=False)
    via_host = small_predictor.predict_images(frames, batch_size=2, with_mesh=False)
    for a, b in zip(via_frames, via_host):
        # landmark decode is in original-image pixels; the uint8-rounding
        # input noise moves an untrained net's outputs by a few px at most
        assert np.abs(a["points"] - b["points"]).max() <= 6
        np.testing.assert_allclose(a["3dmm_params"], b["3dmm_params"], atol=0.05)


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


def test_predict_cli_bboxes_device_preprocess(tmp_path, rng):
    """--bboxes routes through predict_frames (device crop/resize/normalize)
    and reports points in full-frame coordinates."""
    import cv2

    from dad3dheads_tpu.cli.predict import main

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    frame = (rng.uniform(size=(96, 120, 3)) * 255).astype(np.uint8)
    cv2.imwrite(str(img_dir / "im0.png"), frame[..., ::-1])
    bbox = [28, 16, 92, 80]  # 64x64 -> no resampling at img-size 64
    with open(tmp_path / "bb.json", "w") as f:
        json.dump({"im0.png": bbox}, f)

    out = tmp_path / "out"
    path = main(
        [
            "--input", str(img_dir), "--output", str(out), "--batch", "1",
            "--img-size", "64", "--dtype", "fp32", "--allow-random-weights",
            "--bboxes", str(tmp_path / "bb.json"),
        ]
    )
    with open(path) as f:
        (line,) = [json.loads(l) for l in f]
    pts = np.asarray(line["points"])
    assert pts.shape == (68, 2) and len(line["3dmm_params"]) == 413

    # same crop through the host-preprocess predictor == full-frame points
    # minus the bbox origin
    from dad3dheads_tpu.api.predictor import FaceMeshPredictor

    p = FaceMeshPredictor(
        {"img_size": 64, "model": {"backbone": "resnet50", "dtype": "fp32"}}
    )
    crop = frame[bbox[1] : bbox[3], bbox[0] : bbox[2]]
    ref = p.predict_images([crop], batch_size=1, with_mesh=False)[0]
    np.testing.assert_allclose(
        pts - np.asarray([[bbox[0], bbox[1]]]), ref["points"], atol=1
    )


def test_predict_images_float_device_arrays_are_normalized(small_predictor, rng):
    """Float-dtype DEVICE arrays must take the same normalize-in-graph route
    as uint8 (previously raw 0-255 floats reached the network unnormalized)."""
    import jax.numpy as jnp

    img = (rng.uniform(size=(64, 64, 3)) * 255).astype(np.uint8)
    ref = small_predictor.predict_images([img], batch_size=1, with_mesh=False)[0]
    # per-image device float
    a = small_predictor.predict_images(
        [jnp.asarray(img, jnp.float32)], batch_size=1, with_mesh=False
    )[0]
    # contiguous device float bulk
    b = small_predictor.predict_images(
        jnp.asarray(img, jnp.float32)[None], batch_size=1, with_mesh=False
    )[0]
    np.testing.assert_array_equal(a["points"], ref["points"])
    np.testing.assert_allclose(a["3dmm_params"], ref["3dmm_params"], atol=1e-5)
    np.testing.assert_array_equal(b["points"], ref["points"])
    np.testing.assert_allclose(b["3dmm_params"], ref["3dmm_params"], atol=1e-5)


def test_explicit_missing_checkpoint_errors_even_with_model_url(tmp_path):
    """A typo'd --checkpoint must error, not silently fall back to the
    cache/model_url download."""
    from dad3dheads_tpu.api.predictor import FaceMeshPredictor

    with pytest.raises(FileNotFoundError, match="checkpoint not found"):
        FaceMeshPredictor(
            {"img_size": 64, "model": {"backbone": "resnet50", "dtype": "fp32"},
             "model_url": "https://example.invalid/ck.msgpack"},
            checkpoint_path=str(tmp_path / "typo.msgpack"),
        )


def test_bulk_serving_sharded_over_mesh(small_predictor, rng):
    """predict_images / predict_frames with a data mesh shard every batch
    over the 8 CPU devices and reproduce the single-device outputs."""
    import jax

    from dad3dheads_tpu.api.predictor import FaceMeshPredictor
    from dad3dheads_tpu.parallel.mesh import make_mesh

    sharded = FaceMeshPredictor(
        {"img_size": 64, "model": {"backbone": "resnet50", "num_classes": 68}},
        mesh=make_mesh(jax.devices()),
    )
    imgs = [(rng.uniform(size=(64, 64, 3)) * 255).astype(np.uint8) for _ in range(8)]

    a = sharded.predict_images(imgs, batch_size=8, with_mesh=False)
    b = small_predictor.predict_images(imgs, batch_size=8, with_mesh=False)
    for x, y in zip(a, b):
        # GSPMD partitioning changes fusion/reduction order -> last-ulp noise
        assert np.abs(x["points"] - y["points"]).max() <= 1
        np.testing.assert_allclose(x["3dmm_params"], y["3dmm_params"], atol=1e-3)
    # the batch really shards: 8 devices x 1 image each
    x8 = sharded._put(jax.numpy.zeros((8, 64, 64, 3), jax.numpy.uint8))
    assert x8.addressable_shards[0].data.shape[0] == 1

    frames = [(rng.uniform(size=(80, 90, 3)) * 255).astype(np.uint8) for _ in range(8)]
    fa = sharded.predict_frames(frames, batch_size=8, with_mesh=True)
    fb = small_predictor.predict_frames(frames, batch_size=8, with_mesh=True)
    for x, y in zip(fa, fb):
        np.testing.assert_allclose(x["points"], y["points"], atol=1)
        np.testing.assert_allclose(x["3dmm_params"], y["3dmm_params"], atol=1e-4)
        np.testing.assert_allclose(x["3d_vertices"], y["3d_vertices"], atol=1e-4)
