"""End-to-end predictor / demo CLI / dataset tests (CPU)."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from dad3dheads_tpu import assets


@pytest.fixture(scope="module")
def predictor():
    from dad3dheads_tpu.api import FaceMeshPredictor

    return FaceMeshPredictor.dad_3dnet()


def test_predictor_output_contract(predictor, rng):
    image = (rng.uniform(size=(120, 90, 3)) * 255).astype(np.uint8)
    out = predictor(image)
    assert set(out) == {"points", "projected_vertices", "3d_vertices", "3dmm_params"}
    assert out["points"].shape == (68, 2)
    assert out["projected_vertices"].shape == (1, 5023, 2)
    assert out["3d_vertices"].shape == (5023, 3)
    assert out["3dmm_params"].shape == (1, 413)
    assert np.all(np.isfinite(out["3dmm_params"]))


def test_predictor_batch(predictor, rng):
    imgs = (rng.uniform(size=(2, 256, 256, 3)) * 255).astype(np.uint8)
    out = predictor.predict_batch(imgs)
    assert out["points"].shape == (2, 68, 2)
    assert out["3d_vertices"].shape == (2, 5023, 3)


def test_predictor_batch_sharded_matches_single_device(predictor, rng):
    """predict_batch over an 8-device data mesh == the unsharded result,
    including the odd-batch padding round-trip (B=5 on 8 devices)."""
    import jax

    from dad3dheads_tpu.api import FaceMeshPredictor
    from dad3dheads_tpu.parallel.mesh import make_mesh

    sharded = FaceMeshPredictor.dad_3dnet(mesh=make_mesh(jax.devices()))
    # reuse the module predictor's (random-init) weights for comparability
    from dad3dheads_tpu.parallel.mesh import replicate

    sharded.variables = replicate(predictor.variables, sharded.mesh)

    imgs = (rng.uniform(size=(5, 256, 256, 3)) * 255).astype(np.uint8)
    ref = predictor.predict_batch(imgs)
    got = sharded.predict_batch(imgs)
    for k in ref:
        assert got[k].shape == ref[k].shape, k
        np.testing.assert_allclose(got[k], ref[k], rtol=2e-4, atol=2e-4, err_msg=k)


def test_checkpoint_roundtrip(predictor, tmp_path):
    from dad3dheads_tpu.api import FaceMeshPredictor, save_predictor_checkpoint

    path = save_predictor_checkpoint(predictor.variables, str(tmp_path / "ck.msgpack"))
    p2 = FaceMeshPredictor.dad_3dnet(checkpoint_path=path)
    a = jax.tree_leaves_shape = None  # noqa: F841
    import jax as _jax

    l1 = _jax.tree_util.tree_leaves(predictor.variables)
    l2 = _jax.tree_util.tree_leaves(p2.variables)
    assert all(np.allclose(x, y) for x, y in zip(l1, l2))


def test_demo_cli_outputs(predictor, rng, tmp_path, monkeypatch):
    import cv2

    from dad3dheads_tpu.cli.demo import demo, demo_funcs

    assert set(demo_funcs) == {
        "68_landmarks",
        "191_landmarks",
        "445_landmarks",
        "head_mesh",
        "face_mesh",
        "pose",
        "uv_texture",
        "pncc",
        "3d_mesh",
        "flame_params",
    }

    img_path = str(tmp_path / "head.png")
    cv2.imwrite(img_path, (rng.uniform(size=(64, 64, 3)) * 255).astype(np.uint8))

    # patch the predictor factory so the module-scoped instance is reused
    import dad3dheads_tpu.cli.demo as demo_mod

    monkeypatch.setattr(
        demo_mod.FaceMeshPredictor,
        "dad_3dnet",
        classmethod(lambda cls, checkpoint_path=None, **kw: predictor),
    )

    for output_type in ("68_landmarks", "head_mesh", "pose", "3d_mesh", "flame_params", "pncc"):
        out_path = demo(img_path, str(tmp_path / "out"), output_type)
        assert os.path.isfile(out_path), output_type

    with open(tmp_path / "out" / "head_flame_params.json") as f:
        params = json.load(f)
    assert len(params["shape"]) == 300 and len(params["rotation"]) == 6

    with open(tmp_path / "out" / "head_3d_mesh.obj") as f:
        first = f.readline()
    assert first.startswith("v ")


def _write_tiny_dataset(root, rng, n=3):
    import cv2

    anno = []
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "annos"), exist_ok=True)
    for i in range(n):
        img = (rng.uniform(size=(100, 80, 3)) * 255).astype(np.uint8)
        ipath = f"images/{i}.png"
        cv2.imwrite(os.path.join(root, ipath), img)
        verts = rng.normal(size=(5023, 3)).astype(np.float32) * 0.1
        mv = np.eye(4, dtype=np.float32)
        # orthographic-ish projection matrix mapping x,y to pixels
        proj = np.diag([40.0, 50.0, 1.0, 1.0]).astype(np.float32)
        proj[0, 3] = 40.0
        proj[1, 3] = 50.0
        apath = f"annos/{i}.json"
        with open(os.path.join(root, apath), "w") as f:
            json.dump(
                {
                    "vertices": verts.tolist(),
                    "model_view_matrix": mv.tolist(),
                    "projection_matrix": proj.tolist(),
                },
                f,
            )
        anno.append({"img_path": ipath, "annotation_path": apath, "bbox": [10, 10, 60, 80]})
    with open(os.path.join(root, "train.json"), "w") as f:
        json.dump(anno, f)
    return os.path.join(root, "train.json")


def test_flame_dataset_and_loader(tmp_path, rng):
    from dad3dheads_tpu.constants import (
        INPUT_BBOX_KEY,
        INPUT_IMAGE_KEY,
        TARGET_2D_LANDMARKS,
        TARGET_LANDMARKS_HEATMAP,
    )
    from dad3dheads_tpu.data.dataset import DataLoader, FlameDataset

    ann_path = _write_tiny_dataset(str(tmp_path), rng)
    ds = FlameDataset.from_config(
        {
            "ann_path": ann_path,
            "dataset_root": str(tmp_path),
            "img_size": 256,
            "stride": 4,
            "num_classes": 68,
            "keypoints": {"2d_subset_name": "multipie_keypoints"},
            "transform": {"normalize": "imagenet"},
        }
    )
    assert len(ds) == 3
    item = ds[0]
    assert item is not None
    assert item[INPUT_IMAGE_KEY].shape == (256, 256, 3)
    assert item[TARGET_LANDMARKS_HEATMAP].shape == (64, 64, 68)
    assert item[TARGET_2D_LANDMARKS].shape == (68, 2)

    loader = DataLoader(ds, batch_size=2, num_workers=2, drop_last=True)
    batches = list(loader)
    assert len(batches) == 1
    assert batches[0][INPUT_IMAGE_KEY].shape == (2, 256, 256, 3)
    assert batches[0][INPUT_BBOX_KEY].shape == (2, 4)


def test_keypoint_subset_dataset(tmp_path, rng):
    from dad3dheads_tpu.data.dataset import FlameDataset

    ann_path = _write_tiny_dataset(str(tmp_path), rng)
    ds = FlameDataset.from_config(
        {
            "ann_path": ann_path,
            "dataset_root": str(tmp_path),
            "img_size": 256,
            "num_classes": 191,
            "keypoints": {"2d_subset_name": "keypoints_191"},
            "transform": {},
        }
    )
    item = ds[0]
    from dad3dheads_tpu.constants import TARGET_2D_LANDMARKS

    assert item[TARGET_2D_LANDMARKS].shape == (191, 2)


import jax  # noqa: E402  (used in checkpoint test)
