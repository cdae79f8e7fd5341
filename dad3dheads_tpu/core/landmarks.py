"""68-landmark barycentric embedding (51 static + 17 pose-dependent contour).

Behavioral spec: /root/reference/model_training/data/utils.py:120-206 —
static landmarks come from a fixed barycentric face embedding; the 17 jawline
contour landmarks are selected from a 79-bin yaw table. The reference always
evaluates the table at *zero pose* (data/utils.py:178-184), i.e. bin 0; the
full pose-dependent selection is implemented here as well for parity with the
underlying FLAME capability.

Output order matches the reference: [17 dynamic contour | 51 static] = 68.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from .. import assets
from .rotation import rodrigues


@struct.dataclass
class LandmarkEmbedding:
    """Precomputed gather tables. The face indices are resolved to vertex ids
    ahead of time so runtime is two gathers + one weighted sum."""

    static_vertex_ids: jax.Array  # (51, 3) int32
    static_bary: jax.Array  # (51, 3) f32
    dynamic_vertex_ids: jax.Array  # (79, 17, 3) int32
    dynamic_bary: jax.Array  # (79, 17, 3) f32

    @classmethod
    def load(cls, faces: Optional[jnp.ndarray] = None) -> "LandmarkEmbedding":
        emb = assets.load_landmark_embeddings()
        f = faces if faces is not None else assets.get_faces()
        f = jnp.asarray(f, jnp.int32)
        static_ids = f[jnp.asarray(emb["static_lmk_face_idx"], jnp.int32)]
        dyn_ids = f[jnp.asarray(emb["dynamic_lmk_face_idx"], jnp.int32)]
        return cls(
            static_vertex_ids=static_ids,
            static_bary=jnp.asarray(emb["static_lmk_b_coords"], jnp.float32),
            dynamic_vertex_ids=dyn_ids,
            dynamic_bary=jnp.asarray(emb["dynamic_lmk_b_coords"], jnp.float32),
        )


def barycentric_points(
    vertices: jax.Array, vertex_ids: jax.Array, bary: jax.Array
) -> jax.Array:
    """Evaluate barycentric-embedded points on a batch of meshes.

    Args:
      vertices: (B, V, 3).
      vertex_ids: (..., K, 3) int vertex indices.
      bary: (..., K, 3) barycentric weights (matching vertex_ids shape).
    Returns:
      (B, ..., K, 3) embedded points.
    """
    tri = vertices[:, vertex_ids]  # (B, ..., K, 3verts, 3xyz)
    return jnp.sum(tri * bary[None, ..., None], axis=-2)


def dynamic_landmark_bin(full_pose: jax.Array) -> jax.Array:
    """Yaw bin (0..78) of the contour table from a (B, 15) axis-angle pose.

    Reproduces the neck-chain relative-rotation binning (smplx
    find_dynamic_lmk_idx_and_bcoords + rot_mat_to_euler, the engine behind
    the reference's 68-landmark extraction): the chain is [neck(1),
    global(0)]; bin = round(-atan2(-R[2,0], sqrt(R[0,0]^2 + R[1,0]^2)) in
    degrees) — NOT a plain asin, which only agrees for pure-yaw rotations —
    with negative yaw mapped to bins 40..78 and clamped at the extremes.
    """
    B = full_pose.shape[0]
    aa = full_pose.reshape(B, -1, 3)
    rot_g = rodrigues(aa[:, 0])
    rot_n = rodrigues(aa[:, 1])
    rel = jnp.einsum("bxy,byz->bxz", rot_g, rot_n)
    sy = jnp.sqrt(rel[:, 0, 0] ** 2 + rel[:, 1, 0] ** 2)
    y_deg = -jnp.degrees(jnp.arctan2(-rel[:, 2, 0], sy))
    y = jnp.round(jnp.clip(y_deg, max=39.0)).astype(jnp.int32)
    neg_vals = jnp.where(y < -39, 78, 39 - y)
    return jnp.where(y < 0, neg_vals, y)


def get_68_landmarks(
    vertices: jax.Array,
    embedding: Optional[LandmarkEmbedding] = None,
    full_pose: Optional[jax.Array] = None,
) -> jax.Array:
    """Mesh vertices (B, 5023, 3) -> 68 3D landmarks (B, 68, 3).

    ``full_pose`` selects the contour-yaw bin; None means zero pose (bin 0),
    which is what the reference training/benchmark paths use.
    """
    if vertices.ndim == 2:
        vertices = vertices[None]
    emb = embedding if embedding is not None else LandmarkEmbedding.load()

    static = barycentric_points(vertices, emb.static_vertex_ids, emb.static_bary)

    if full_pose is None:
        bins = jnp.zeros((vertices.shape[0],), jnp.int32)
    else:
        bins = dynamic_landmark_bin(full_pose)
    dyn_ids = emb.dynamic_vertex_ids[bins]  # (B, 17, 3)
    dyn_bary = emb.dynamic_bary[bins]  # (B, 17, 3)
    # per-sample barycentric evaluation (same weighted-sum semantics as
    # barycentric_points, with per-sample id/bary tables)
    dynamic = jax.vmap(lambda v, ids, b: jnp.sum(v[ids] * b[..., None], axis=-2))(
        vertices, dyn_ids, dyn_bary
    )

    return jnp.concatenate([dynamic, static], axis=1)
