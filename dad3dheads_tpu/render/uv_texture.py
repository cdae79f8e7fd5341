"""UV texture extraction: sample the source image at projected mesh points
into a UV-space texture map.

Behavioral spec: /root/reference/inference/uv_texture.py — for every texel of
a (res x res) UV map, precomputed (triangle id, barycentric weights) sample
the *projected* mesh to get an image coordinate, then bilinearly sample the
image there. The reference's per-texel embedding (``texture_data.npy``) and
its FLAME UV layout (``generic_model.pkl``) are absent LFS blobs upstream; a
licensed FLAME UV table can be supplied via ``uv_data_path`` (an .npz with
``tri_id`` (res, res) int32 [-1 = empty] and ``bary`` (res, res, 3)).
Without it, a deterministic fallback UV atlas is derived from a spherical
unwrap of the template so the API stays functional end-to-end.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

from .. import assets
from ..core.head_mesh import HeadMesh


def spherical_uv_embedding(
    v_template: np.ndarray, faces: np.ndarray, resolution: int = 256
):
    """Fallback per-texel (triangle, barycentric) table from a spherical
    unwrap of the template mesh (front hemisphere)."""
    import jax.numpy as jnp

    from .rasterizer import rasterize_buffers

    c = v_template - v_template.mean(0, keepdims=True)
    r = np.linalg.norm(c, axis=1) + 1e-12
    theta = np.arctan2(c[:, 0], c[:, 2] + 1e-12)  # azimuth
    phi = np.arcsin(np.clip(c[:, 1] / r, -1, 1))  # elevation
    u = (theta / np.pi + 1.0) / 2.0 * (resolution - 1)
    v = (phi / (np.pi / 2) + 1.0) / 2.0 * (resolution - 1)
    uv_verts = np.stack([u, v, r], axis=1).astype(np.float32)

    depth, tri_id, bary = rasterize_buffers(
        jnp.asarray(uv_verts), jnp.asarray(faces, jnp.int32), resolution, resolution,
        tile_rows=32 if resolution % 32 == 0 else 1,
    )
    return np.asarray(tri_id), np.asarray(bary)


class UVTextureCreator:
    def __init__(
        self,
        resolution: int = 256,
        head_mesh: Optional[HeadMesh] = None,
        uv_data_path: Optional[str] = None,
    ):
        self.resolution = resolution
        self.head_mesh = head_mesh if head_mesh is not None else HeadMesh()
        self.faces = assets.get_faces().astype(np.int32)

        uv_data_path = uv_data_path or os.environ.get("DAD3D_UV_DATA_PATH")
        if uv_data_path and os.path.isfile(uv_data_path):
            with np.load(uv_data_path) as z:
                self.tri_id, self.bary = z["tri_id"], z["bary"]
            self.resolution = self.tri_id.shape[0]
        else:
            self.tri_id, self.bary = spherical_uv_embedding(
                np.asarray(self.head_mesh.model.v_template), self.faces, resolution
            )

    def _compute_texture_map(self, image: np.ndarray, projected: np.ndarray) -> np.ndarray:
        """Bilinear-sample the image at the barycentric-interpolated projected
        points of each covered texel."""
        h, w = image.shape[:2]
        covered = self.tri_id >= 0
        safe_tri = np.maximum(self.tri_id, 0)
        corners = projected[self.faces[safe_tri]]  # (R, R, 3, 2)
        pts = np.sum(corners * self.bary[..., None], axis=-2)  # (R, R, 2)

        x = np.clip(pts[..., 0], 0, w - 1.001)
        y = np.clip(pts[..., 1], 0, h - 1.001)
        x0, y0 = x.astype(np.int32), y.astype(np.int32)
        fx, fy = (x - x0)[..., None], (y - y0)[..., None]
        img = image.astype(np.float32)
        tex = (
            img[y0, x0] * (1 - fx) * (1 - fy)
            + img[y0, x0 + 1] * fx * (1 - fy)
            + img[y0 + 1, x0] * (1 - fx) * fy
            + img[y0 + 1, x0 + 1] * fx * fy
        )
        tex[~covered] = 0
        return tex.astype(np.uint8)

    def __call__(self, image: np.ndarray, predictions: Dict[str, Any]) -> np.ndarray:
        import jax.numpy as jnp

        mm = jnp.asarray(np.asarray(predictions["3dmm_params"]), jnp.float32)
        projected = np.asarray(self.head_mesh.reprojected_vertices(mm, to_2d=True))[0]
        # map from the network's 256-frame to this image's frame
        scale = max(image.shape[:2]) / float(self.head_mesh.image_size)
        return self._compute_texture_map(image, projected * scale)
