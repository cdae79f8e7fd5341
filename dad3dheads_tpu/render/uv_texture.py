"""UV texture extraction: sample the source image at projected mesh points
into a UV-space texture map.

Behavioral spec: /root/reference/inference/uv_texture.py — for every texel of
a (res x res) UV map, precomputed (triangle id, barycentric weights) sample
the *projected* mesh to get an image coordinate, then bilinearly sample the
image there. The reference's per-texel embedding (``texture_data.npy``) and
its FLAME UV layout (``generic_model.pkl``) are absent LFS blobs upstream; a
licensed FLAME texture-space asset can be supplied via ``uv_data_path``
(``DAD3D_UV_DATA_PATH``) in any of three forms:

  * an ``.npz`` with a precomputed table — ``tri_id`` (res, res) int32
    [-1 = empty] and ``bary`` (res, res, 3);
  * an ``.npz`` with the raw FLAME UV layout — ``vt`` (Vt, 2) texture
    coordinates in [0, 1] (OBJ convention, v up) and ``ft`` (F, 3) int
    per-face texture-vertex indices, row-aligned with the mesh faces — the
    per-texel table is then built here by rasterizing the UV-space triangles
    with this repo's own rasterizer (the same computation that produced the
    reference's ``texture_data.npy`` offline);
  * a FLAME template ``.obj`` carrying ``vt`` / ``f v/vt`` records.

Without any of these, a deterministic fallback UV atlas is derived from a
spherical unwrap of the template so the API stays functional end-to-end.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

from .. import assets
from ..core.head_mesh import HeadMesh


def uv_embedding_from_layout(
    vt: np.ndarray, ft: np.ndarray, resolution: int = 256
):
    """Per-texel (triangle, barycentric) table from a FLAME UV layout.

    ``vt`` are texture coordinates in [0, 1] (OBJ convention: v grows upward),
    ``ft`` indexes ``vt`` per face corner, row-aligned with the mesh faces, so
    the rasterized triangle ids index straight into the mesh ``faces`` array.
    UV charts never overlap, so depth is a constant and the z-buffer argmax
    reduces to plain coverage.
    """
    import jax.numpy as jnp

    from .rasterizer import rasterize_buffers

    vt = np.asarray(vt, np.float32)
    ft = np.asarray(ft, np.int64)
    u = vt[:, 0] * (resolution - 1)
    v = (1.0 - vt[:, 1]) * (resolution - 1)  # OBJ v-up -> image row-down
    uv_verts = np.stack([u, v, np.ones_like(u)], axis=1).astype(np.float32)

    depth, tri_id, bary = rasterize_buffers(
        jnp.asarray(uv_verts), jnp.asarray(ft, jnp.int32), resolution, resolution,
        tile_rows=32 if resolution % 32 == 0 else 1,
    )
    return np.asarray(tri_id), np.asarray(bary)


def parse_obj_uv_layout(path: str):
    """Extract (vt, ft) from an OBJ file with ``vt`` and ``f v/vt`` records.

    Returns None if the file carries no texture coordinates. Only the
    texture-index slot of each face corner is read; faces without one are
    rejected (the table must stay row-aligned with the mesh faces).
    """
    vts, fts = [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "vt":
                vts.append((float(parts[1]), float(parts[2])))
            elif parts[0] == "f":
                if len(parts) != 4:
                    # quads/ngons would silently misalign the table with the
                    # triangulated mesh faces — fail loudly instead
                    raise ValueError(
                        f"{path}: only triangular faces are supported for the "
                        f"UV layout (got a {len(parts) - 1}-gon); triangulate "
                        "the OBJ first"
                    )
                corner_ts = []
                for corner in parts[1:4]:
                    fields = corner.split("/")
                    if len(fields) < 2 or not fields[1]:
                        return None
                    corner_ts.append(int(fields[1]) - 1)  # OBJ is 1-indexed
                fts.append(corner_ts)
    if not vts or not fts:
        return None
    return np.asarray(vts, np.float32), np.asarray(fts, np.int64)


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
            if uv_data_path.endswith(".obj"):
                layout = parse_obj_uv_layout(uv_data_path)
                if layout is None:
                    raise ValueError(
                        f"{uv_data_path} carries no per-corner texture "
                        "coordinates (vt / f v/vt records)"
                    )
                vt, ft = layout
                if len(ft) != len(self.faces):
                    raise ValueError(
                        f"{uv_data_path}: UV face table has {len(ft)} rows but "
                        f"the mesh has {len(self.faces)} faces — the layout "
                        "must be row-aligned with the FLAME topology"
                    )
                self.tri_id, self.bary = uv_embedding_from_layout(vt, ft, resolution)
            else:
                with np.load(uv_data_path) as z:
                    if "tri_id" in z:
                        self.tri_id, self.bary = z["tri_id"], z["bary"]
                        self.resolution = self.tri_id.shape[0]
                    else:
                        if len(z["ft"]) != len(self.faces):
                            raise ValueError(
                                f"{uv_data_path}: UV face table has "
                                f"{len(z['ft'])} rows but the mesh has "
                                f"{len(self.faces)} faces — the layout must "
                                "be row-aligned with the FLAME topology"
                            )
                        self.tri_id, self.bary = uv_embedding_from_layout(
                            z["vt"], z["ft"], resolution
                        )
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
