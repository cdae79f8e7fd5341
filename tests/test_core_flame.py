"""Golden tests of the FLAME geometry core against independent numpy oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from dad3dheads_tpu.constants import FLAME_CONSTS, MESH_OFFSET_Z, total_3dmm_size
from dad3dheads_tpu.core import (
    FlameParams,
    flame_decode,
    rodrigues,
    rot_mat_from_6dof,
)
from dad3dheads_tpu.core.lbs import lbs

from .oracles import lbs_single, rodrigues_single, rot6dof_single


def test_3dmm_roundtrip(rng):
    x = rng.normal(size=(4, total_3dmm_size())).astype(np.float32)
    params = FlameParams.from_3dmm(jnp.asarray(x))
    assert params.shape.shape == (4, 300)
    assert params.expression.shape == (4, 100)
    assert params.jaw.shape == (4, 3)
    assert params.rotation.shape == (4, 6)
    assert params.eyeballs.shape == (4, 0)
    assert params.neck.shape == (4, 0)
    assert params.translation.shape == (4, 3)
    assert params.scale.shape == (4, 1)
    np.testing.assert_array_equal(np.asarray(params.to_3dmm_tensor()), x)


def test_3dmm_slice_order_jaw_before_rotation(rng):
    """The packed layout puts jaw (3) before rotation (6) after shape+expr."""
    x = np.zeros((1, 413), np.float32)
    x[0, 400:403] = [1, 2, 3]  # jaw
    x[0, 403:409] = [4, 5, 6, 7, 8, 9]  # rotation
    params = FlameParams.from_3dmm(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(params.jaw[0]), [1, 2, 3])
    np.testing.assert_array_equal(np.asarray(params.rotation[0]), [4, 5, 6, 7, 8, 9])


def test_rodrigues_matches_oracle(rng):
    aa = rng.normal(size=(8, 3)).astype(np.float32)
    ours = np.asarray(rodrigues(jnp.asarray(aa)))
    for i in range(8):
        ref = rodrigues_single(aa[i].astype(np.float64))
        np.testing.assert_allclose(ours[i], ref, atol=1e-5)
    # rotations are orthonormal with det +1
    eye = np.einsum("bij,bkj->bik", ours, ours)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(ours), 1.0, atol=1e-5)


def test_rot6dof_matches_oracle(rng):
    v = rng.normal(size=(8, 6)).astype(np.float32)
    ours = np.asarray(rot_mat_from_6dof(jnp.asarray(v)))
    for i in range(8):
        np.testing.assert_allclose(ours[i], rot6dof_single(v[i]), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(ours), 1.0, atol=1e-4)


def test_lbs_matches_oracle(flame_model_arrays, rng):
    m = flame_model_arrays
    B = 2
    betas = (rng.normal(size=(B, 400)) * 0.5).astype(np.float32)
    pose = (rng.normal(size=(B, 15)) * 0.3).astype(np.float32)

    verts, joints = lbs(
        jnp.asarray(betas),
        jnp.asarray(pose),
        jnp.asarray(m.v_template),
        jnp.asarray(m.shapedirs),
        jnp.asarray(m.posedirs),
        jnp.asarray(m.j_regressor),
        list(m.parents),
        jnp.asarray(m.lbs_weights),
    )
    verts = np.asarray(verts)
    assert verts.shape == (B, 5023, 3)
    assert joints.shape == (B, 5, 3)
    for b in range(B):
        ref = lbs_single(
            betas[b],
            pose[b],
            m.v_template,
            m.shapedirs,
            m.posedirs,
            m.j_regressor,
            list(m.parents),
            m.lbs_weights,
        )
        # fp32 production vs fp64 oracle: the 400-term blendshape reduction
        # accumulates ~1e-4-scale fp32 error (verified exact in fp64).
        np.testing.assert_allclose(verts[b], ref, atol=1.5e-3)


def test_flame_decode_zero_params_is_offset_template(flame_model, flame_model_arrays):
    x = jnp.zeros((1, 413), jnp.float32)
    # zero 6dof would be degenerate; zero_rot skips the global rotation.
    params = FlameParams.from_3dmm(x)
    verts = np.asarray(flame_decode(flame_model, params, zero_rot=True))[0]
    expected = flame_model_arrays.v_template.copy()
    expected[:, 2] += MESH_OFFSET_Z
    np.testing.assert_allclose(verts, expected, atol=2e-5)


def test_flame_decode_rotation_applied(flame_model, rng):
    x = np.zeros((2, 413), np.float32)
    x[:, 403:409] = rng.normal(size=(2, 6))  # rotation 6dof
    params = FlameParams.from_3dmm(jnp.asarray(x))
    v_rot = np.asarray(flame_decode(flame_model, params))
    v_norot = np.asarray(flame_decode(flame_model, params, zero_rot=True))
    R = np.asarray(rot_mat_from_6dof(jnp.asarray(x[:, 403:409])))
    np.testing.assert_allclose(
        v_rot, np.einsum("bxy,bvy->bvx", R, v_norot), atol=1e-5
    )


def test_flame_decode_jit_and_batch(flame_model, rng):
    import jax

    x = rng.normal(size=(8, 413)).astype(np.float32) * 0.1
    fn = jax.jit(lambda t: flame_decode(flame_model, FlameParams.from_3dmm(t)))
    out = fn(jnp.asarray(x))
    assert out.shape == (8, 5023, 3)
    # batch consistency: decoding rows independently gives the same result
    one = fn(jnp.asarray(x[:1]))
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(one[0]), atol=1e-5)


def test_flame_decode_differentiable(flame_model):
    import jax

    def loss(t):
        return jnp.sum(flame_decode(flame_model, FlameParams.from_3dmm(t)) ** 2)

    g = jax.grad(loss)(jnp.ones((1, 413), jnp.float32) * 0.01)
    assert g.shape == (1, 413)
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.abs(g).max()) > 0
