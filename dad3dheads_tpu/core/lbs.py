"""Linear blend skinning, re-derived natively for TPU (no smplx).

The algorithm (behavioral spec: the FLAME decode used by the reference via
``smplx.lbs`` at /root/reference/model_training/model/flame.py:212-221):

  1. v_shaped  = v_template + shapedirs . betas            (blendshapes)
  2. joints    = J_regressor . v_shaped                    (joint regression)
  3. rot_mats  = rodrigues(pose)                           (per-joint rotation)
  4. v_posed   = v_shaped + posedirs . (rot_mats[1:] - I)  (pose correctives)
  5. A         = kinematic-chain rigid transforms over the parent tree
  6. verts     = (sum_j lbs_weights[:, j] * A[j]) . v_posed  (skinning)

TPU mapping: steps 1, 2, 4, 6 are single large matmuls (MXU); step 3 is
elementwise (VPU); step 5 is a static 5-step scan over joints. Everything is
static-shape, fp32, and jit/vmap/pjit-compatible. The fused blendshape matmul
has a Pallas fast path in ``dad3dheads_tpu.ops.blendshapes``.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from .rotation import rodrigues

# Geometry matmuls run in full fp32 on the MXU (Precision.HIGHEST). The TPU
# default (bf16 multiplies) costs ~2e-4 absolute vertex error — the analogue
# of the reference pinning fp32 in its geometry losses via autocast(False)
# (/root/reference/model_training/losses/vertices_3d_loss.py:30).
PRECISION = jax.lax.Precision.HIGHEST


def blend_shapes(betas: jax.Array, shape_dirs: jax.Array) -> jax.Array:
    """betas (B, L) x shape_dirs (V, 3, L) -> per-vertex offsets (B, V, 3).

    Implemented as one (B, L) @ (L, V*3) matmul so XLA tiles it onto the MXU.
    """
    V = shape_dirs.shape[0]
    mat = shape_dirs.reshape(V * 3, -1).T  # (L, V*3)
    out = jnp.dot(betas, mat, precision=PRECISION, preferred_element_type=jnp.float32)
    return out.reshape(betas.shape[0], V, 3)


def vertices2joints(j_regressor: jax.Array, vertices: jax.Array) -> jax.Array:
    """j_regressor (J, V) x vertices (B, V, 3) -> joints (B, J, 3)."""
    return jnp.einsum("jv,bvc->bjc", j_regressor, vertices, precision=PRECISION)


def batch_rigid_transform(
    rot_mats: jax.Array, joints: jax.Array, parents: Sequence[int]
) -> Tuple[jax.Array, jax.Array]:
    """Rigid transforms along a kinematic tree.

    Args:
      rot_mats: (B, J, 3, 3) per-joint rotations.
      joints:   (B, J, 3) rest-pose joint locations.
      parents:  static python list of parent indices, parents[0] == -1.
    Returns:
      posed_joints: (B, J, 3)
      rel_transforms: (B, J, 4, 4) transforms that map *rest-pose* points
        rigged to joint j into posed space (translation column already has the
        rest-pose joint position subtracted out).
    """
    B, J = joints.shape[0], joints.shape[1]
    rel_joints = joints - jnp.where(
        (jnp.asarray(parents) < 0)[None, :, None],
        jnp.zeros_like(joints),
        joints[:, jnp.maximum(jnp.asarray(parents), 0)],
    )

    def make_tf(R, t):
        top = jnp.concatenate([R, t[..., None]], axis=-1)  # (..., 3, 4)
        bottom = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), top.shape[:-2] + (1, 4)
        )
        return jnp.concatenate([top, bottom], axis=-2)  # (..., 4, 4)

    local_tf = make_tf(rot_mats, rel_joints)  # (B, J, 4, 4)

    # The tree is tiny (5 joints) and static: unroll the chain accumulation.
    chains = [local_tf[:, 0]]
    for j in range(1, J):
        chains.append(jnp.matmul(chains[parents[j]], local_tf[:, j], precision=PRECISION))
    transforms = jnp.stack(chains, axis=1)  # (B, J, 4, 4)

    posed_joints = transforms[:, :, :3, 3]

    # Subtract the transformed rest joints from the translation column so the
    # transforms act on rest-pose vertex coordinates directly.
    rot_joint = jnp.einsum(
        "bjxy,bjy->bjx", transforms[:, :, :3, :3], joints, precision=PRECISION
    )
    rel = transforms.at[:, :, :3, 3].add(-rot_joint)
    return posed_joints, rel


def lbs_from_shaped(
    v_shaped: jax.Array,
    pose: jax.Array,
    posedirs: jax.Array,
    j_regressor: jax.Array,
    parents: Sequence[int],
    lbs_weights: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """LBS steps 2-6 given the already-blendshaped vertices (B, V, 3)."""
    B, V = v_shaped.shape[0], v_shaped.shape[1]
    J = j_regressor.shape[0]

    joints = vertices2joints(j_regressor, v_shaped)  # (B, J, 3)
    rot_mats = rodrigues(pose.reshape(B, J, 3))  # (B, J, 3, 3)

    eye = jnp.eye(3, dtype=v_shaped.dtype)
    pose_feature = (rot_mats[:, 1:] - eye).reshape(B, (J - 1) * 9)
    pose_offsets = jnp.dot(
        pose_feature, posedirs, precision=PRECISION, preferred_element_type=jnp.float32
    ).reshape(B, V, 3)
    v_posed = v_shaped + pose_offsets

    posed_joints, rel_tf = batch_rigid_transform(rot_mats, joints, parents)

    # Skinning: T = W (V, J) x A (B, J, 16) -> (B, V, 4, 4) as one matmul.
    T = jnp.einsum("vj,bjpq->bvpq", lbs_weights, rel_tf, precision=PRECISION)
    verts = (
        jnp.einsum("bvxy,bvy->bvx", T[:, :, :3, :3], v_posed, precision=PRECISION)
        + T[:, :, :3, 3]
    )
    return verts, posed_joints


def lbs(
    betas: jax.Array,
    pose: jax.Array,
    v_template: jax.Array,
    shapedirs: jax.Array,
    posedirs: jax.Array,
    j_regressor: jax.Array,
    parents: Sequence[int],
    lbs_weights: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Full linear-blend-skinning decode.

    Args:
      betas: (B, L) shape+expression coefficients.
      pose:  (B, J*3) axis-angle pose (root first).
      v_template: (V, 3); shapedirs: (V, 3, L); posedirs: ((J-1)*9, V*3);
      j_regressor: (J, V); parents: static list len J; lbs_weights: (V, J).
    Returns:
      vertices (B, V, 3), posed joints (B, J, 3).
    """
    v_shaped = v_template[None] + blend_shapes(betas, shapedirs)  # (B, V, 3)
    return lbs_from_shaped(v_shaped, pose, posedirs, j_regressor, parents, lbs_weights)
