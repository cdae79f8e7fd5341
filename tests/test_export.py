"""AOT deployment artifact tests: export -> load -> numerical parity with the
live predictor, batch-size polymorphism, and self-containedness (the loader
touches neither model code nor FLAME assets).

Reference parity target: torch.jit.trace export + torch.jit.load deployment
(/root/reference/model_training/train/flame_lightning_model.py:384-401,
/root/reference/predictor.py:72)."""

import json

import numpy as np
import pytest


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    from dad3dheads_tpu.api.export import export_predictor
    from dad3dheads_tpu.api.predictor import FaceMeshPredictor

    cfg = {
        "img_size": 128,
        "stride": 4,
        "model": {"backbone": "mobilenet_w1", "num_classes": 68, "num_filters": 64},
    }
    predictor = FaceMeshPredictor(cfg)
    path = str(tmp_path_factory.mktemp("export") / "dad3dnet.aot.npz")
    export_predictor(
        predictor.model,
        predictor.variables,
        predictor.flame,
        path,
        img_size=128,
        stride=4,
        platforms=("cpu",),  # CI runs on the CPU backend
    )
    return predictor, path


def test_exported_matches_live_predictor(exported, rng):
    from dad3dheads_tpu.api.export import ExportedFaceMeshPredictor

    predictor, path = exported
    loaded = ExportedFaceMeshPredictor(path)

    image = (rng.uniform(size=(180, 150, 3)) * 255).astype(np.uint8)
    ref = predictor(image)
    got = loaded(image)
    assert set(got) == {"points", "projected_vertices", "3d_vertices", "3dmm_params"}
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(ref[k]), rtol=1e-4, atol=1e-4, err_msg=k
        )


def test_exported_batch_polymorphism(exported, rng):
    from dad3dheads_tpu.api.export import ExportedFaceMeshPredictor

    _, path = exported
    loaded = ExportedFaceMeshPredictor(path)
    for batch in (1, 3):
        images = (rng.uniform(size=(batch, 128, 128, 3)) * 255).astype(np.uint8)
        out = loaded.predict_batch(images)
        assert out["points"].shape == (batch, 68, 2)
        assert out["3d_vertices"].shape == (batch, 5023, 3)
        assert out["projected_vertices"].shape == (batch, 5023, 2)
        assert out["3dmm_params"].shape == (batch, 413)
        assert np.isfinite(out["3d_vertices"]).all()


def test_exported_uint8_matches_f32(exported, rng):
    from dad3dheads_tpu.api.export import ExportedFaceMeshPredictor
    from dad3dheads_tpu.constants import IMAGENET_MEAN, IMAGENET_STD

    _, path = exported
    loaded = ExportedFaceMeshPredictor(path)
    u8 = (rng.uniform(size=(2, 128, 128, 3)) * 255).astype(np.uint8)
    f32 = (u8.astype(np.float32) / 255.0 - np.asarray(IMAGENET_MEAN, np.float32)) / np.asarray(
        IMAGENET_STD, np.float32
    )
    a = loaded.predict_batch(u8)
    b = loaded.predict_batch(f32)
    np.testing.assert_allclose(a["3dmm_params"], b["3dmm_params"], atol=1e-4)


def test_archive_metadata(exported):
    _, path = exported
    with np.load(path) as z:
        meta = json.loads(bytes(z["meta"]).decode())
    assert meta["img_size"] == 128
    assert meta["platforms"] == ["cpu"]
    assert meta["constants"]["shape"] == 300
    assert meta["n_weight_leaves"] > 0 and meta["n_flame_leaves"] > 0


def test_exported_int8_artifact(tmp_path, rng):
    """int8 export: the artifact carries int8 kernels, strips the folded fp
    leaves (compressed), and reproduces the live int8 predictor."""
    import os

    from dad3dheads_tpu.api.export import ExportedFaceMeshPredictor, export_predictor
    from dad3dheads_tpu.api.predictor import FaceMeshPredictor
    from dad3dheads_tpu.models.quantized import calibrate

    cfg = {"img_size": 64, "model": {"backbone": "resnet50", "num_classes": 68}}
    base = FaceMeshPredictor(cfg)
    import jax
    import jax.numpy as jnp

    x = jax.random.normal(jax.random.PRNGKey(3), (2, 64, 64, 3), jnp.float32)
    amax = calibrate(base.model, base.variables, [x], dtype=jnp.float32)

    fp_path = str(tmp_path / "fp.aot.npz")
    q_path = str(tmp_path / "int8.aot.npz")
    export_predictor(
        base.model, base.variables, base.flame, fp_path,
        img_size=64, platforms=("cpu",),
    )
    export_predictor(
        base.model, base.variables, base.flame, q_path,
        img_size=64, platforms=("cpu",), quant_amax=amax,
    )
    # stripped + compressed: the int8 artifact is much smaller than fp
    assert os.path.getsize(q_path) < 0.55 * os.path.getsize(fp_path)

    live = FaceMeshPredictor({**cfg, "quant_amax": amax})
    loaded = ExportedFaceMeshPredictor(q_path)
    assert loaded.meta["quantized"] is True

    image = (rng.uniform(size=(90, 70, 3)) * 255).astype(np.uint8)
    ref = live(image)
    got = loaded(image)
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(got[k]).astype(np.float32),
            np.asarray(ref[k]).astype(np.float32),
            rtol=2e-3, atol=2e-3, err_msg=k,
        )


def test_exported_predict_images_matches_call(exported, rng):
    """Bulk deployment serving: predict_images on the artifact reproduces the
    per-image __call__ contract, including the ragged last chunk."""
    from dad3dheads_tpu.api.export import ExportedFaceMeshPredictor

    _, path = exported
    loaded = ExportedFaceMeshPredictor(path)
    images = [
        (rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8)
        for h, w in [(150, 120), (90, 160), (128, 128)]
    ]
    bulk = loaded.predict_images(images, batch_size=2, num_workers=2)
    assert len(bulk) == 3
    for img, got in zip(images, bulk):
        ref = loaded(img)
        assert set(got) == set(ref)
        np.testing.assert_array_equal(got["points"], ref["points"])
        np.testing.assert_allclose(got["3dmm_params"], ref["3dmm_params"], atol=1e-5)
        np.testing.assert_allclose(got["3d_vertices"], ref["3d_vertices"], atol=1e-5)
    slim = loaded.predict_images(images, batch_size=2, with_mesh=False)
    assert all(set(p) == {"points", "3dmm_params"} for p in slim)


def test_exported_predict_frames_matches_live(exported, rng):
    """The v3 stablehlo_frames program (fused device preprocess inside the
    artifact) reproduces the live predictor's predict_frames, including
    full-frame point coordinates and symbolic frame extents."""
    from dad3dheads_tpu.api.export import ExportedFaceMeshPredictor

    predictor, path = exported
    ep = ExportedFaceMeshPredictor(path)
    frames = [
        (rng.uniform(size=(160, 140, 3)) * 255).astype(np.uint8),
        (rng.uniform(size=(96, 200, 3)) * 255).astype(np.uint8),  # other bucket
        (rng.uniform(size=(128, 128, 3)) * 255).astype(np.uint8),
    ]
    bb = [(10, 12, 120, 150), (0, 0, 200, 96), (4, 4, 124, 124)]
    a = ep.predict_frames(frames, bboxes=bb, batch_size=4)
    b = predictor.predict_frames(frames, bboxes=bb, batch_size=4)
    for x, y in zip(a, b):
        np.testing.assert_allclose(x["points"], y["points"], atol=1)
        np.testing.assert_allclose(x["3dmm_params"], y["3dmm_params"], atol=1e-5)
        np.testing.assert_allclose(x["3d_vertices"], y["3d_vertices"], atol=1e-4)


def test_tpu_bucket_frames_program_interpret(exported, rng, tmp_path, monkeypatch):
    """v4 artifacts can carry TPU-specialized per-bucket frames programs
    (fused Pallas preprocess, static shapes). Exported with
    tpu_interpret=True they run on the CPU backend: chunks that fit a bucket
    route through the bucket program (packed planar at the bucket's
    fixed_shape), oversize chunks fall back to the portable symbolic-shape
    program, and both agree with the live predictor."""
    from dad3dheads_tpu.api.export import ExportedFaceMeshPredictor, export_predictor

    predictor, _ = exported
    path = str(tmp_path / "tpu_bucket.aot.npz")
    export_predictor(
        predictor.model, predictor.variables, predictor.flame, path,
        img_size=128, stride=4, platforms=("cpu",),
        tpu_frames_specs=[(4, 192, 256)], tpu_interpret=True,
    )
    ep = ExportedFaceMeshPredictor(path)
    assert ep.meta["format_version"] == 4
    assert ep.meta["tpu_frames_specs"] == [[4, 192, 256]]

    import dad3dheads_tpu.ops.preprocess_device as pd

    packed_kw = []
    orig = pd.pack_frames_host

    def spy(*a, **kw):
        packed_kw.append(kw)
        return orig(*a, **kw)

    monkeypatch.setattr(pd, "pack_frames_host", spy)

    frames = [
        (rng.uniform(size=(160, 140, 3)) * 255).astype(np.uint8),
        (rng.uniform(size=(96, 200, 3)) * 255).astype(np.uint8),
        (rng.uniform(size=(128, 128, 3)) * 255).astype(np.uint8),
    ]
    bb = [(10, 12, 120, 150), (0, 0, 200, 96), (4, 4, 124, 124)]
    a = ep.predict_frames(frames, bboxes=bb, batch_size=4)
    assert any(kw.get("fixed_shape") == (192, 256) for kw in packed_kw)
    b = predictor.predict_frames(frames, bboxes=bb, batch_size=4)
    for x, y in zip(a, b):
        np.testing.assert_allclose(x["points"], y["points"], atol=1)
        np.testing.assert_allclose(x["3dmm_params"], y["3dmm_params"], atol=1e-4)
        np.testing.assert_allclose(x["3d_vertices"], y["3d_vertices"], atol=1e-3)

    # oversize frame -> portable fallback (no fixed_shape pack), still works
    packed_kw.clear()
    big = (rng.uniform(size=(260, 300, 3)) * 255).astype(np.uint8)
    out = ep.predict_frames([big], batch_size=4)
    assert not any("fixed_shape" in kw and kw["fixed_shape"] for kw in packed_kw)
    assert out[0]["points"].shape == (68, 2)
    assert np.isfinite(out[0]["3d_vertices"]).all()


def test_plain_artifact_stays_v3(exported):
    """Artifacts without TPU bucket programs stamp format_version 3 so v3
    loaders keep reading them."""
    _, path = exported
    with np.load(path) as z:
        meta = json.loads(bytes(z["meta"]).decode())
    assert meta["format_version"] == 3
    assert meta["tpu_frames_specs"] == []


def test_v2_artifact_without_frames_program_raises(exported, tmp_path):
    """Artifacts predating v3 load fine but predict_frames points at the
    re-export path instead of crashing on a missing archive key."""
    from dad3dheads_tpu.api.export import ExportedFaceMeshPredictor

    _, path = exported
    with np.load(path) as z:
        arrays = {k: z[k] for k in z.files if k != "stablehlo_frames"}
    meta = json.loads(bytes(arrays["meta"]).decode())
    meta["format_version"] = 2
    arrays["meta"] = np.frombuffer(json.dumps(meta).encode(), np.uint8)
    old = tmp_path / "v2.aot.npz"
    with open(old, "wb") as f:
        np.savez(f, **arrays)

    ep = ExportedFaceMeshPredictor(str(old))
    img = np.zeros((128, 128, 3), np.uint8)
    assert ep(img)["points"].shape == (68, 2)  # v2 surface still works
    with pytest.raises(ValueError, match="re-export"):
        ep.predict_frames([img])
