"""HeadMesh facade: packed 3DMM vector -> 3D vertices / reprojected vertices.

Behavioral spec: /root/reference/model_training/head_mesh.py:24-60. Unlike the
reference (an nn.Module holding buffers), this is a thin immutable facade over
the pure ``flame_decode``.

Performance note: the FLAME constants (~25 MB of blendshapes) are always
passed to ``jit`` as *arguments*, never captured as closure constants —
baking them in as XLA constants makes compilation pathologically slow and
bloats the executable. The facade pre-builds jitted kernels with the model as
the first argument; calling these inside an outer jit simply inlines them.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..constants import FLAME_CONSTS
from .flame import FlameModel, FlameParams, flame_decode


@functools.partial(jax.jit, static_argnames=("consts", "zero_rotation"))
def _vertices_3d(
    model: FlameModel, params_3dmm: jax.Array, consts: Tuple, zero_rotation: bool
) -> jax.Array:
    params = FlameParams.from_3dmm(params_3dmm, dict(consts))
    return flame_decode(model, params, zero_rot=zero_rotation)


@functools.partial(jax.jit, static_argnames=("consts", "image_size", "to_2d"))
def _reprojected(
    model: FlameModel,
    params_3dmm: jax.Array,
    consts: Tuple,
    image_size: int,
    to_2d: bool,
) -> jax.Array:
    from .projection import weak_perspective_project

    params = FlameParams.from_3dmm(params_3dmm, dict(consts))
    vertices = flame_decode(model, params, zero_rot=False)
    projected = weak_perspective_project(
        vertices, params.scale, params.translation, image_size
    )
    return projected[..., :2] if to_2d else projected


class HeadMesh:
    def __init__(
        self,
        flame_config: Optional[Dict[str, int]] = None,
        image_size: int = 256,
        model: Optional[FlameModel] = None,
        flame_path: Optional[str] = None,
    ):
        self.flame_constants = dict(flame_config or FLAME_CONSTS)
        self._consts_key = tuple(sorted(self.flame_constants.items()))
        self.model = model if model is not None else FlameModel.load(flame_path)
        self.image_size = image_size

    def flame_params(self, params_3dmm: jax.Array) -> FlameParams:
        return FlameParams.from_3dmm(params_3dmm, self.flame_constants)

    def vertices_3d(self, params_3dmm: jax.Array, zero_rotation: bool = False) -> jax.Array:
        """(B, 413) -> (B, V, 3) mesh vertices in model space."""
        return _vertices_3d(self.model, params_3dmm, self._consts_key, zero_rotation)

    def reprojected_vertices(self, params_3dmm: jax.Array, to_2d: bool = True) -> jax.Array:
        """(B, 413) -> (B, V, 2|3) vertices projected to image pixels via the
        weak-perspective model: v' = clamp(scale+1) * v + [tx, ty, 0], then
        map [-1, 1] -> [0, image_size]."""
        return _reprojected(
            self.model, params_3dmm, self._consts_key, self.image_size, to_2d
        )

    def adjust_3dmm_to_paddings(
        self, params_3dmm: jax.Array, paddings: Sequence[int]
    ) -> jax.Array:
        """Shift translation for [top, bottom, left, right] paddings (positive
        = image enlarged, negative = cropped)."""
        params = self.flame_params(params_3dmm)
        shift = (
            jnp.asarray([[paddings[2], paddings[0], 0.0]], params_3dmm.dtype)
            * 2.0
            / self.image_size
        )
        params = params.replace(translation=params.translation + shift)
        return params.to_3dmm_tensor()
