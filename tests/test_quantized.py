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
    # every conv site collected: 53 resnet + 21 bifpn + heatmap head = 75
    assert len(qp) == 75
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


def test_save_amax_suffixless_path(fp_model, tmp_path):
    """save_amax must return a path that exists even without a .npz suffix."""
    import os

    from dad3dheads_tpu.models.quantized import calibrate, load_amax, save_amax

    model, v, x = fp_model
    amax = calibrate(model, v, [x], dtype=jnp.float32)
    p = save_amax(amax, str(tmp_path / "amax"))
    assert os.path.isfile(p)
    assert set(load_amax(p)) == set(amax)


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
