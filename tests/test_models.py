"""Shape/structure tests for the DAD-3DNet flax model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dad3dheads_tpu.constants import (
    OUTPUT_2D_LANDMARKS,
    OUTPUT_3DMM_PARAMS,
    OUTPUT_LANDMARKS_HEATMAP,
)
from dad3dheads_tpu.models import DAD3DNet, create_model
from dad3dheads_tpu.models.dad3dnet import resize_bilinear_align_corners


@pytest.fixture(scope="module")
def tiny_model_and_vars():
    # Full resnet50 at 64x64 input: cheap enough for CI, exercises every layer.
    model = create_model({"backbone": "resnet50"})
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, variables


def test_forward_shapes(tiny_model_and_vars):
    model, variables = tiny_model_and_vars
    x = jnp.ones((2, 64, 64, 3), jnp.float32)
    out = model.apply(variables, x, train=False)
    H = 64 // 4
    assert out[OUTPUT_LANDMARKS_HEATMAP].shape == (2, H, H, 68)
    assert out[OUTPUT_3DMM_PARAMS].shape == (2, 413)
    assert out[OUTPUT_2D_LANDMARKS].shape == (2, 68, 2)


def test_output_ranges(tiny_model_and_vars):
    model, variables = tiny_model_and_vars
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 64, 3)), jnp.float32)
    out = model.apply(variables, x, train=False)
    mm = np.asarray(out[OUTPUT_3DMM_PARAMS])
    # shape/expr/jaw block is tanh * 3
    assert np.all(np.abs(mm[:, :403]) <= 3.0 + 1e-6)
    # landmarks are ReLU'd
    assert np.all(np.asarray(out[OUTPUT_2D_LANDMARKS]) >= 0)


def test_train_mode_updates_batch_stats(tiny_model_and_vars):
    model, variables = tiny_model_and_vars
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 64, 64, 3)), jnp.float32)
    out, mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(1)}
    )
    assert "batch_stats" in mutated
    # at least one running stat changed
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(o, n) for o, n in zip(old, new))


def test_resize_bilinear_align_corners_matches_torch_semantics():
    # 2x2 -> 4x4 align_corners=True has known corner-preserving values.
    x = jnp.asarray([[1.0, 2.0], [3.0, 4.0]]).reshape(1, 2, 2, 1)
    y = np.asarray(resize_bilinear_align_corners(x, (4, 4)))[0, :, :, 0]
    np.testing.assert_allclose(y[0, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(y[0, -1], 2.0, atol=1e-6)
    np.testing.assert_allclose(y[-1, 0], 3.0, atol=1e-6)
    np.testing.assert_allclose(y[-1, -1], 4.0, atol=1e-6)
    np.testing.assert_allclose(y[0, 1], 1.0 + 1.0 / 3.0, atol=1e-5)


def test_mobilenet_backbone_forward():
    model = create_model({"backbone": "mobilenet_w1"})
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    # mobilenet stage0 = init(s2) + stage1, so the first pyramid level sits at
    # stride 4 like resnet50
    assert out[OUTPUT_LANDMARKS_HEATMAP].shape == (1, 16, 16, 68)
    assert out[OUTPUT_3DMM_PARAMS].shape == (1, 413)


def test_resize_nearest_matmul_matches_gather(rng):
    """The MXU replication-matmul upsample must equal torch-nearest exactly."""
    from dad3dheads_tpu.models.bifpn import _resize_nearest

    x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
    up = np.asarray(_resize_nearest(x, (16, 16)))
    ref = np.asarray(x)[:, np.arange(16) // 2][:, :, np.arange(16) // 2]
    np.testing.assert_array_equal(up, ref)
    # 4x (still integer multiple)
    up4 = np.asarray(_resize_nearest(x, (32, 32)))
    ref4 = np.asarray(x)[:, np.arange(32) // 4][:, :, np.arange(32) // 4]
    np.testing.assert_array_equal(up4, ref4)
    # down 2x = strided slice
    dn = np.asarray(_resize_nearest(x, (4, 4)))
    np.testing.assert_array_equal(dn, np.asarray(x)[:, ::2, ::2])
