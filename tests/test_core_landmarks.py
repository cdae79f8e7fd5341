"""Tests for the 68-landmark barycentric embedding, head-mesh facade, and
projection utilities."""

import jax.numpy as jnp
import numpy as np
import pytest

from dad3dheads_tpu import assets
from dad3dheads_tpu.core import (
    HeadMesh,
    calculate_paddings,
    get_68_landmarks,
    heatmap_to_keypoints,
    normalize_to_cube,
)
from dad3dheads_tpu.core.landmarks import LandmarkEmbedding, dynamic_landmark_bin


@pytest.fixture(scope="module")
def embedding():
    return LandmarkEmbedding.load()


def _oracle_barycentric(verts, faces, face_idx, bary):
    """Literal re-derivation: landmark k = sum_i bary[k,i] * verts[faces[face_idx[k]][i]]."""
    out = np.zeros((len(face_idx), 3))
    for k, f in enumerate(face_idx):
        tri = faces[f]
        for i in range(3):
            out[k] += bary[k, i] * verts[tri[i]]
    return out


def test_static_landmarks_match_oracle(embedding, rng):
    verts = rng.normal(size=(5023, 3)).astype(np.float32)
    emb_np = assets.load_landmark_embeddings()
    faces = assets.get_faces()
    ref = _oracle_barycentric(
        verts, faces, emb_np["static_lmk_face_idx"], emb_np["static_lmk_b_coords"]
    )
    ours = np.asarray(get_68_landmarks(jnp.asarray(verts[None]), embedding))[0]
    np.testing.assert_allclose(ours[17:], ref, atol=1e-5)


def test_dynamic_landmarks_zero_pose_is_bin0(embedding, rng):
    verts = rng.normal(size=(5023, 3)).astype(np.float32)
    emb_np = assets.load_landmark_embeddings()
    faces = assets.get_faces()
    ref = _oracle_barycentric(
        verts, faces, emb_np["dynamic_lmk_face_idx"][0], emb_np["dynamic_lmk_b_coords"][0]
    )
    ours = np.asarray(get_68_landmarks(jnp.asarray(verts[None]), embedding))[0]
    np.testing.assert_allclose(ours[:17], ref, atol=1e-5)


def test_dynamic_bin_selection():
    # zero pose -> bin 0
    pose = jnp.zeros((1, 15))
    assert int(dynamic_landmark_bin(pose)[0]) == 0
    # a +30 degree yaw of the global joint -> asin(R[0,2]) = sin(30deg) with
    # rotation about y: R[0, 2] = sin(30deg) -> bin = -(-30)?  sign check only:
    pose = jnp.zeros((1, 15)).at[0, 1].set(np.radians(30.0))
    b = int(dynamic_landmark_bin(pose)[0])
    assert 0 <= b <= 78 and b != 0


def test_head_mesh_reprojection_semantics(flame_model):
    hm = HeadMesh(model=flame_model, image_size=256)
    x = np.zeros((1, 413), np.float32)
    x[0, 403:409] = [1, 0, 0, 0, 1, 0]  # identity-ish 6dof rotation
    x[0, 409:412] = [0.1, -0.2, 0.7]  # translation (z should be zeroed)
    x[0, 412] = 0.5  # scale -> 1.5
    t = jnp.asarray(x)

    v3d = np.asarray(hm.vertices_3d(t))
    proj = np.asarray(hm.reprojected_vertices(t, to_2d=False))
    expected = (v3d * 1.5 + np.array([0.1, -0.2, 0.0])) / 2.0 * 256 + 128
    np.testing.assert_allclose(proj, expected, atol=1e-3)
    proj2d = np.asarray(hm.reprojected_vertices(t, to_2d=True))
    np.testing.assert_allclose(proj2d, proj[..., :2], atol=1e-6)


def test_head_mesh_padding_adjustment(flame_model):
    hm = HeadMesh(model=flame_model, image_size=256)
    x = jnp.zeros((1, 413), jnp.float32)
    adjusted = np.asarray(hm.adjust_3dmm_to_paddings(x, [10, 0, 20, 0]))
    # translation x += 20*2/256, y += 10*2/256
    np.testing.assert_allclose(adjusted[0, 409], 20 * 2 / 256, atol=1e-6)
    np.testing.assert_allclose(adjusted[0, 410], 10 * 2 / 256, atol=1e-6)
    assert adjusted[0, 411] == 0


def test_normalize_to_cube_matches_reference_semantics(rng):
    v = rng.normal(size=(2, 100, 3)).astype(np.float32) * 5 + 3
    out = np.asarray(normalize_to_cube(jnp.asarray(v)))
    # reference semantics: shift min to 0, subtract half per-axis max, divide
    # by global max
    ref = v - v.min(1, keepdims=True)
    ref = ref - 0.5 * ref.max(1, keepdims=True)
    ref = ref / ref.max(-1, keepdims=True).max(-2, keepdims=True)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_calculate_paddings():
    assert calculate_paddings(100, 100) == [0, 0, 0, 0]
    assert calculate_paddings(100, 60) == [0, 0, 20, 20]
    assert calculate_paddings(57, 100) == [21, 22, 0, 0]


def test_heatmap_to_keypoints():
    hm = np.zeros((1, 64, 64, 68), np.float32)
    hm[0, 10, 20, 0] = 1.0  # channel 0 peak at y=10, x=20
    hm[0, 5, 7, 67] = 1.0
    kp = np.asarray(heatmap_to_keypoints(jnp.asarray(hm), stride=4))
    np.testing.assert_array_equal(kp[0, 0], [80, 40])  # xy * stride
    np.testing.assert_array_equal(kp[0, 67], [28, 20])


def test_calculate_rpy_matches_scipy(rng):
    """RPY extraction parity with the reference's scipy-based math
    (flame.py:254-259: transpose, xyz-euler degrees, remap + limit)."""
    import jax.numpy as jnp
    from scipy.spatial.transform import Rotation

    from dad3dheads_tpu.core.rotation import calculate_rpy, rot_mat_from_6dof

    v6 = rng.normal(size=(5, 6)).astype(np.float32)
    rpy = calculate_rpy(jnp.asarray(v6))
    R = np.asarray(rot_mat_from_6dof(jnp.asarray(v6)))
    for i in range(5):
        ang = Rotation.from_matrix(R[i].T).as_euler("xyz", degrees=True)

        def limit(a):
            while a > 180:
                a -= 360
            while a < -180:
                a += 360
            return a

        assert float(rpy.roll[i]) == pytest.approx(limit(ang[2]), abs=1e-3)
        assert float(rpy.pitch[i]) == pytest.approx(limit(ang[0] - 180), abs=1e-3)
        assert float(rpy.yaw[i]) == pytest.approx(limit(ang[1]), abs=1e-3)


def test_dynamic_bin_matches_smplx_oracle_mixed_rotation(rng):
    """Mixed yaw+pitch+roll poses: the bin must follow smplx's
    rot_mat_to_euler (atan2(-R[2,0], sqrt(R[0,0]^2 + R[1,0]^2))) applied to
    the [global @ neck] chain product — a plain asin only agrees for
    pure-yaw rotations (reference engine: smplx find_dynamic_lmk_idx...)."""
    from scipy.spatial.transform import Rotation

    aa = rng.normal(size=(16, 5, 3)).astype(np.float32) * 0.6
    pose = jnp.asarray(aa.reshape(16, 15))
    bins = np.asarray(dynamic_landmark_bin(pose))

    for i in range(16):
        R = (Rotation.from_rotvec(aa[i, 0]) * Rotation.from_rotvec(aa[i, 1])).as_matrix()
        y_deg = -np.degrees(np.arctan2(-R[2, 0], np.hypot(R[0, 0], R[1, 0])))
        y = int(np.round(np.clip(y_deg, None, 39.0)))
        expected = (78 if y < -39 else 39 - y) if y < 0 else y
        assert bins[i] == expected, (i, bins[i], expected, y_deg)


def test_rotation_gradients_finite_at_zero():
    """A zero-initialized rotation head (step 0) feeds exact zeros into
    rodrigues and rot_mat_from_6dof; their gradients must be finite (the
    torch reference's norm/normalize backward is finite at zero — a NaN here
    poisons every parameter via the optimizer on the first step)."""
    import jax

    from dad3dheads_tpu.core.rotation import rodrigues, rot_mat_from_6dof

    g = jax.grad(lambda aa: jnp.sum(rodrigues(aa) ** 2))(jnp.zeros((2, 3)))
    assert np.isfinite(np.asarray(g)).all()

    g6 = jax.grad(lambda v: jnp.sum(rot_mat_from_6dof(v) ** 2))(jnp.zeros((2, 6)))
    assert np.isfinite(np.asarray(g6)).all()

    # degenerate 6dof: vy parallel to vx (cross product exactly zero)
    v = jnp.asarray([[1.0, 0, 0, 2.0, 0, 0]])
    gp = jax.grad(lambda v: jnp.sum(rot_mat_from_6dof(v) ** 2))(v)
    assert np.isfinite(np.asarray(gp)).all()
