"""PNCC (projected normalized coordinate code) rendering.

Behavioral spec: /root/reference/inference/pncc_estimator.py — the predicted
mesh is reprojected to image space, z is flipped, and the face-without-ears
triangle subset is rasterized with per-vertex NCC colors (the template
vertices normalized to the unit cube over the subset).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from .. import assets
from ..core.head_mesh import HeadMesh
from .rasterizer import rasterize


def compute_ncc_color_codes(
    template_face: np.ndarray, subset_indexes: Optional[np.ndarray] = None
) -> np.ndarray:
    """Normalized coordinate codes: template vertices scaled to [0, 1] per
    axis over the (optional) vertex subset."""
    if template_face.ndim != 2 or template_face.shape[1] != 3:
        raise ValueError(f"template_face must be [N,3], got {template_face.shape}")
    sub = template_face[subset_indexes] if subset_indexes is not None else template_face
    u_min = sub.min(axis=0, keepdims=True)
    u_max = sub.max(axis=0, keepdims=True)
    return (template_face - u_min) / (u_max - u_min)


def pncc(
    img: np.ndarray,
    vertices: np.ndarray,
    faces: np.ndarray,
    colors: np.ndarray,
    with_bg_flag: bool = True,
) -> np.ndarray:
    """Render per-vertex NCC colors over (a copy of) the image or black."""
    bg = img.copy() if with_bg_flag else np.zeros_like(img)
    return np.asarray(rasterize(vertices, faces, colors, bg=jnp.asarray(bg)))


class PNCCEstimator:
    def __init__(self, head_mesh: Optional[HeadMesh] = None):
        self.head_mesh = head_mesh if head_mesh is not None else HeadMesh()
        self.faces_wo_ears = assets.get_flame_indices("faces_wo_ears_remapped").astype(np.int32)
        v_template = np.asarray(self.head_mesh.model.v_template)
        self.colors = compute_ncc_color_codes(
            v_template, np.unique(self.faces_wo_ears)
        ).astype(np.float32)

    def __call__(
        self, image: np.ndarray, predictions: Dict[str, Any], with_background: bool = False
    ) -> np.ndarray:
        mm = jnp.asarray(np.asarray(predictions["3dmm_params"]), jnp.float32)
        verts = np.array(self.head_mesh.reprojected_vertices(mm, to_2d=False))[0]
        verts[:, 2] *= -1.0  # z-flip: the raster keeps max-z as closest
        return pncc(image, verts, self.faces_wo_ears, self.colors, with_background)
