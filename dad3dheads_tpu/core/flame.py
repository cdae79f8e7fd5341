"""FLAME parameter pytree and the differentiable FLAME decoder.

Behavioral spec (re-derived, not ported):
  - 413-dim packed 3DMM vector slicing:
    /root/reference/model_training/model/flame.py:40-101.
  - decode semantics (beta padding, full-pose assembly with zeroed root
    rotation, LBS, +0.05 z offset, 6DoF rotation):
    /root/reference/model_training/model/flame.py:182-229.

Everything is a pytree of jnp arrays: ``FlameParams`` flows through jit /
vmap / pjit; ``FlameModel`` (the decoder constants) is passed as an argument
so a sharded train step can place it replicated (or shard the blendshape
matrix over a model axis) via NamedSharding.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import struct

from .. import assets
from ..constants import (
    EYE_COEFFS,
    FLAME_3DMM_ORDER,
    FLAME_CONSTS,
    JAW_COEFFS,
    MAX_EXPRESSION,
    MAX_SHAPE,
    MESH_OFFSET_Z,
    NECK_COEFFS,
    ROT_COEFFS,
)
from .lbs import lbs_from_shaped
from .rotation import rot_mat_from_6dof


@struct.dataclass
class FlameParams:
    """Unpacked FLAME 3DMM parameters. All fields are (B, k) arrays; groups
    configured with size 0 are empty (B, 0) arrays."""

    shape: jax.Array
    expression: jax.Array
    rotation: jax.Array
    translation: jax.Array
    scale: jax.Array
    jaw: jax.Array
    eyeballs: jax.Array
    neck: jax.Array

    @classmethod
    def from_3dmm(
        cls,
        tensor_3dmm: jax.Array,
        constants: Optional[Dict[str, int]] = None,
        zero_expr: bool = False,
    ) -> "FlameParams":
        """Slice a packed (B, 413) 3DMM vector into named groups."""
        constants = constants or FLAME_CONSTS
        assert tensor_3dmm.ndim == 2, tensor_3dmm.shape
        out = {}
        idx = 0
        for key in FLAME_3DMM_ORDER:
            size = constants.get(key, 0)
            out[key] = tensor_3dmm[:, idx : idx + size]
            idx += size
        if zero_expr:
            out["expression"] = jnp.zeros_like(out["expression"])
        return cls(**out)

    def to_3dmm_tensor(self) -> jax.Array:
        return jnp.concatenate(
            [getattr(self, key) for key in FLAME_3DMM_ORDER], axis=-1
        )


@struct.dataclass
class FlameModel:
    """FLAME decoder constants as a device pytree.

    ``shapedirs`` is stored pre-transposed in the (L, V*3) matmul-native
    layout so the blendshape contraction is a single (B, L) @ (L, V*3) MXU
    pass with no per-step transpose."""

    v_template: jax.Array  # (V, 3)
    shapedirs: jax.Array  # (400, V*3)
    posedirs: jax.Array  # (36, V*3)
    j_regressor: jax.Array  # (J, V)
    lbs_weights: jax.Array  # (V, J)
    parents: tuple = struct.field(pytree_node=False, default=(-1, 0, 1, 1, 1))

    @classmethod
    def from_arrays(cls, arrays: assets.FlameModelArrays, dtype=jnp.float32) -> "FlameModel":
        V = arrays.v_template.shape[0]
        return cls(
            v_template=jnp.asarray(arrays.v_template, dtype),
            shapedirs=jnp.asarray(arrays.shapedirs.reshape(V * 3, -1).T, dtype),
            posedirs=jnp.asarray(arrays.posedirs, dtype),
            j_regressor=jnp.asarray(arrays.j_regressor, dtype),
            lbs_weights=jnp.asarray(arrays.lbs_weights, dtype),
            parents=tuple(int(p) for p in arrays.parents),
        )

    @classmethod
    def load(cls, path: Optional[str] = None, dtype=jnp.float32) -> "FlameModel":
        return cls.from_arrays(assets.load_flame_model(path), dtype)

    @property
    def num_vertices(self) -> int:
        return self.v_template.shape[0]

    @property
    def shapedirs_vcl(self) -> jax.Array:
        """shapedirs in the (V, 3, L) layout."""
        return self.shapedirs.T.reshape(self.num_vertices, 3, -1)


def _pad_group(x: jax.Array, full: int) -> jax.Array:
    """Right-pad a (B, k) coefficient group with zeros up to k == full."""
    missing = full - x.shape[-1]
    if missing == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, missing)))


def _pose_group(x: jax.Array, size: int) -> jax.Array:
    """A pose group: empty (B, 0) groups decode as zeros (neutral pose)."""
    if x.shape[-1] == 0:
        return jnp.zeros(x.shape[:-1] + (size,), dtype=x.dtype)
    assert x.shape[-1] == size, (x.shape, size)
    return x


def flame_decode(
    model: FlameModel,
    params: FlameParams,
    zero_rot: bool = False,
    zero_jaw: bool = False,
) -> jax.Array:
    """FLAME 3DMM parameters -> mesh vertices (B, V, 3).

    Mirrors the reference decode: betas are the packed [shape|expression]
    coefficients zero-padded to 300+100; the root rotation inside LBS is
    always zero (global rotation is applied afterwards from the 6DoF vector);
    the mesh is shifted +MESH_OFFSET_Z in z before rotating.
    """
    B = params.shape.shape[0]
    dtype = model.v_template.dtype

    betas = jnp.concatenate(
        [
            _pad_group(params.shape.astype(dtype), MAX_SHAPE),
            _pad_group(params.expression.astype(dtype), MAX_EXPRESSION),
        ],
        axis=-1,
    )

    jaw = _pose_group(params.jaw.astype(dtype), JAW_COEFFS)
    if zero_jaw:
        jaw = jnp.zeros_like(jaw)
    full_pose = jnp.concatenate(
        [
            jnp.zeros((B, ROT_COEFFS), dtype),
            _pose_group(params.neck.astype(dtype), NECK_COEFFS),
            jaw,
            _pose_group(params.eyeballs.astype(dtype), EYE_COEFFS),
        ],
        axis=-1,
    )

    from ..ops.blendshapes import blend_shapes_fused

    v_shaped = blend_shapes_fused(betas, model.shapedirs, model.v_template)
    vertices, _ = lbs_from_shaped(
        v_shaped,
        full_pose,
        model.posedirs,
        model.j_regressor,
        list(model.parents),
        model.lbs_weights,
    )

    vertices = vertices.at[:, :, 2].add(jnp.asarray(MESH_OFFSET_Z, dtype))
    if not zero_rot:
        from .rotation import rotate_vertices

        R = rot_mat_from_6dof(params.rotation.astype(dtype))  # (B, 3, 3)
        vertices = rotate_vertices(R, vertices)
    return vertices
