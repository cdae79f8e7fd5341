"""int8 PTQ pipeline tests: fp-mirror parity vs the flax model, calibration +
int8 numerical sanity, and predictor plumbing.

On-chip results recorded in BENCH/README: 1.31x throughput over bf16, val
NME 3.0115 (int8) vs 3.0053 (fp) on the trained acceptance checkpoint."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def fp_model():
    from dad3dheads_tpu.models import create_model

    model = create_model({"backbone": "resnet50"})
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3), jnp.float32)
    v = jax.jit(lambda r: model.init(r, x, train=False))(jax.random.PRNGKey(0))
    return model, v, x


def test_fp_mirror_matches_flax(fp_model):
    """The functional mirror in fp mode must equal the flax forward — this is
    the drift guard for the quantized encoder/BiFPN re-implementation."""
    from dad3dheads_tpu.models.quantized import quantized_forward

    model, v, x = fp_model
    ref = jax.jit(lambda v, x: model.apply(v, x, train=False))(v, x)
    fp, _ = jax.jit(
        lambda v, x: quantized_forward(model, v, x, mode="fp", dtype=jnp.float32)
    )(v, x)
    for k in ref:
        np.testing.assert_allclose(np.asarray(ref[k]), np.asarray(fp[k]), atol=2e-4, err_msg=k)


def test_calibrate_and_int8_forward(fp_model):
    from dad3dheads_tpu.models.quantized import calibrate, quantized_forward

    model, v, x = fp_model
    amax = calibrate(model, v, [x], dtype=jnp.float32)
    assert len(amax) > 150  # encoder + bifpn + heatmap head sites
    assert all(float(a) > 0 for a in amax.values())

    ref = jax.jit(lambda v, x: model.apply(v, x, train=False))(v, x)
    q, _ = jax.jit(
        lambda v, x, a: quantized_forward(model, v, x, amax=a, mode="int8", dtype=jnp.float32)
    )(v, x, amax)
    for k in ref:
        r, o = np.asarray(ref[k]), np.asarray(q[k])
        assert np.isfinite(o).all(), k
        # int8 tracks fp within a quantization-noise budget on random weights
        assert np.max(np.abs(r - o)) < 0.25 * max(np.max(np.abs(r)), 1e-3), k


def test_amax_roundtrip(fp_model, tmp_path):
    from dad3dheads_tpu.models.quantized import calibrate, load_amax, save_amax

    model, v, x = fp_model
    amax = calibrate(model, v, [x], dtype=jnp.float32)
    p = save_amax(amax, str(tmp_path / "amax.npz"))
    loaded = load_amax(p)
    assert set(loaded) == set(amax)
    for k in amax:
        np.testing.assert_allclose(np.asarray(loaded[k]), np.asarray(amax[k]))


def test_predictor_int8_plumbing(fp_model, tmp_path, rng):
    """FaceMeshPredictor with quant_amax runs the int8 pipeline end to end
    and keeps the output contract."""
    from dad3dheads_tpu.api.predictor import FaceMeshPredictor, save_predictor_checkpoint
    from dad3dheads_tpu.models.quantized import calibrate, save_amax

    model, v, x = fp_model
    ckpt = save_predictor_checkpoint(v, str(tmp_path / "ck.msgpack"))
    amax_path = save_amax(calibrate(model, v, [x], dtype=jnp.float32), str(tmp_path / "amax.npz"))

    predictor = FaceMeshPredictor(
        {
            "img_size": 64,
            "model": {"backbone": "resnet50", "num_classes": 68, "num_filters": 256},
            "quant_amax": amax_path,
        },
        checkpoint_path=ckpt,
    )
    assert predictor.quant_amax is not None and len(predictor.quant_amax) > 150
    image = (rng.uniform(size=(90, 70, 3)) * 255).astype(np.uint8)
    out = predictor(image)
    assert set(out) == {"points", "projected_vertices", "3d_vertices", "3dmm_params"}
    assert np.isfinite(out["3dmm_params"]).all()

    # the device-preprocess serving path composes with int8 too: an
    # identity-size bbox (64x64 crop, no resample) makes the network input
    # bit-identical, so the quantized outputs must match the host-crop path
    bbox = (3, 13, 3 + 64, 13 + 64)
    crop = image[bbox[1] : bbox[3], bbox[0] : bbox[2]]
    via_frames = predictor.predict_frames(
        [image], bboxes=[bbox], batch_size=1, with_mesh=False
    )[0]
    via_crop = predictor.predict_images([crop], batch_size=1, with_mesh=False)[0]
    np.testing.assert_allclose(
        via_frames["points"] - np.asarray([[bbox[0], bbox[1]]]),
        via_crop["points"],
        atol=1,
    )
    np.testing.assert_allclose(
        via_frames["3dmm_params"], via_crop["3dmm_params"], atol=1e-4
    )

def test_prepared_qparams_match_inline(fp_model):
    """prepare_int8_params must reproduce the inline fold up to 1-ulp
    reassociation: fold+requant compiled standalone vs fused into the forward
    can round a borderline weight to the neighboring int8 bin, so the two
    int8 forwards agree far within the int8-vs-fp noise budget but not
    bit-for-bit."""
    from dad3dheads_tpu.models.quantized import (
        calibrate,
        prepare_int8_params,
        quantized_forward,
    )

    model, v, x = fp_model
    amax = calibrate(model, v, [x], dtype=jnp.float32)
    qp = prepare_int8_params(model, v, dtype=jnp.float32, img_size=64)
    # every conv site collected: 53 resnet + 21 bifpn + heatmap head +
    # fusion conv = 76
    assert len(qp) == 76
    inline, _ = jax.jit(
        lambda v, x, a: quantized_forward(model, v, x, amax=a, mode="int8", dtype=jnp.float32)
    )(v, x, amax)
    prepared, _ = jax.jit(
        lambda v, x, a, qp: quantized_forward(
            model, v, x, amax=a, mode="int8", dtype=jnp.float32, qparams=qp
        )
    )(v, x, amax, qp)
    ref = jax.jit(lambda v, x: model.apply(v, x, train=False))(v, x)
    for k in inline:
        a, b, r = np.asarray(inline[k]), np.asarray(prepared[k]), np.asarray(ref[k])
        assert np.isfinite(b).all(), k
        # the two int8 variants agree far closer than either is to fp...
        assert np.max(np.abs(a - b)) < 0.10 * max(np.max(np.abs(a)), 1e-3), k
        # ...and the prepared path stays within the int8-vs-fp noise budget
        assert np.max(np.abs(r - b)) < 0.25 * max(np.max(np.abs(r)), 1e-3), k


def test_int8_rejects_non_flagship_backbone(tmp_path):
    """quant_amax + a non-resnet50 backbone must fail at config-load time
    with a clear message, not deep inside the quantized forward."""
    from dad3dheads_tpu.api.predictor import FaceMeshPredictor

    with pytest.raises(ValueError, match="resnet50"):
        FaceMeshPredictor(
            {
                "img_size": 64,
                "model": {"backbone": "mobilenet_w1", "dtype": "fp32"},
                "quant_amax": str(tmp_path / "whatever.npz"),
            }
        )


def test_save_amax_suffixless_path(fp_model, tmp_path):
    """save_amax must return a path that exists even without a .npz suffix."""
    import os

    from dad3dheads_tpu.models.quantized import calibrate, load_amax, save_amax

    model, v, x = fp_model
    amax = calibrate(model, v, [x], dtype=jnp.float32)
    p = save_amax(amax, str(tmp_path / "amax"))
    assert os.path.isfile(p)
    assert set(load_amax(p)) == set(amax)


def test_int8_accuracy_fixture(fp_model):
    """Pin int8 accuracy with concrete checked-in numbers (replaces the
    25%-of-amplitude smoke bound as the regression guard).

    tests/fixtures/int8_accuracy.npz (tools/make_int8_fixture.py) records the
    input batch, the calibrated amax table, the fp and int8 decoded outputs
    (landmarks px + 3DMM), and accuracy bounds observed at generation time.
    Any change to calibration, quantize/dequantize scales, rounding, or the
    folded conv math shows up as a mismatch here."""
    import os

    from dad3dheads_tpu.api.predictor import decode_pipeline_outputs
    from dad3dheads_tpu.models.quantized import calibrate, quantized_forward

    path = os.path.join(os.path.dirname(__file__), "fixtures", "int8_accuracy.npz")
    fx = np.load(path, allow_pickle=False)
    model, v, _ = fp_model
    images = jnp.asarray(fx["images"])
    B = images.shape[0]

    # calibration reproduces the recorded amax table exactly (same sites,
    # same values)
    amax = calibrate(model, v, [images], dtype=jnp.float32)
    assert sorted(amax) == list(fx["amax_names"])
    np.testing.assert_allclose(
        np.asarray([float(amax[n]) for n in sorted(amax)]),
        fx["amax_values"],
        rtol=1e-5,
        err_msg="calibrated amax drifted from the recorded table",
    )

    fp_out = jax.jit(lambda v, x: model.apply(v, x, train=False))(v, images)
    fp = decode_pipeline_outputs(fp_out, stride=4, img_size=images.shape[1])
    q_out, _ = jax.jit(
        lambda v, x, a: quantized_forward(model, v, x, amax=a, mode="int8", dtype=jnp.float32)
    )(v, images, amax)
    q = decode_pipeline_outputs(q_out, stride=4, img_size=images.shape[1])

    fp_lms = np.asarray(fp["landmarks"]).reshape(B, 68, 2)
    q_lms = np.asarray(q["landmarks"]).reshape(B, 68, 2)

    # seeded-init fp reproducibility and a tight pin on the full int8 path
    np.testing.assert_allclose(fp_lms, fx["fp_landmarks"], atol=5e-3)
    np.testing.assert_allclose(np.asarray(fp["3dmm"]), fx["fp_3dmm"], atol=1e-4)
    np.testing.assert_allclose(q_lms, fx["q_landmarks"], atol=5e-2)
    np.testing.assert_allclose(np.asarray(q["3dmm"]), fx["q_3dmm"], atol=1e-3)

    # the accuracy bounds themselves (recorded with 2x headroom)
    disp = np.linalg.norm(fp_lms - q_lms, axis=-1)
    assert disp.max() <= float(fx["max_landmark_disp_px"])
    assert np.max(np.abs(np.asarray(fp["3dmm"]) - np.asarray(q["3dmm"]))) <= float(
        fx["max_3dmm_drift"]
    )


def test_int8_composes_with_mesh_sharding(fp_model, tmp_path, rng):
    """int8 inference x data-parallel mesh: predict_batch shards the batch
    over the 8-device mesh while running the quantized pipeline."""
    from dad3dheads_tpu.api.predictor import FaceMeshPredictor, save_predictor_checkpoint
    from dad3dheads_tpu.models.quantized import calibrate, save_amax
    from dad3dheads_tpu.parallel.mesh import make_mesh

    model, v, x = fp_model
    ckpt = save_predictor_checkpoint(v, str(tmp_path / "ck.msgpack"))
    amax_path = save_amax(calibrate(model, v, [x], dtype=jnp.float32), str(tmp_path / "amax.npz"))

    mesh = make_mesh()  # 8 CPU devices on the data axis
    predictor = FaceMeshPredictor(
        {
            "img_size": 64,
            "model": {"backbone": "resnet50", "num_classes": 68},
            "quant_amax": amax_path,
        },
        checkpoint_path=ckpt,
        mesh=mesh,
    )
    images = (rng.uniform(size=(8, 64, 64, 3)) * 255).astype(np.uint8)
    out = predictor.predict_batch(images)
    assert out["points"].shape == (8, 68, 2)
    assert out["3d_vertices"].shape == (8, 5023, 3)
    assert np.isfinite(out["3dmm_params"]).all()
