"""Native C++ rasterizer: build, run, and pixel-parity vs the JAX path."""

import jax.numpy as jnp
import numpy as np
import pytest

from dad3dheads_tpu.render import rasterize, rasterize_buffers, get_normal
from dad3dheads_tpu.render.native import (
    native_available,
    rasterize_buffers_native,
    rasterize_native,
    vertex_normals_native,
)

pytestmark = pytest.mark.skipif(not native_available(), reason="g++ build unavailable")


def _random_mesh(rng, n_tris=50, size=64):
    verts = rng.uniform(0, size - 1, size=(n_tris * 3, 3)).astype(np.float32)
    verts[:, 2] = rng.uniform(0, 10, size=n_tris * 3)
    faces = np.arange(n_tris * 3, dtype=np.int32).reshape(n_tris, 3)
    return verts, faces


def test_buffers_parity_with_jax(rng):
    verts, faces = _random_mesh(rng)
    d_n, t_n, b_n = rasterize_buffers_native(verts, faces, 64, 64)
    d_j, t_j, b_j = rasterize_buffers(jnp.asarray(verts), jnp.asarray(faces), 64, 64, tile_rows=32)
    d_j, t_j, b_j = np.asarray(d_j), np.asarray(t_j), np.asarray(b_j)

    # coverage may differ on exact triangle boundaries; demand >99% agreement
    agree = (t_n == t_j).mean()
    assert agree > 0.99, agree
    both = (t_n == t_j) & (t_n >= 0)
    np.testing.assert_allclose(d_n[both], d_j[both], atol=1e-3)
    np.testing.assert_allclose(b_n[both], b_j[both], atol=1e-3)


def test_rasterize_parity(rng):
    verts, faces = _random_mesh(rng)
    colors = rng.uniform(size=(len(verts), 3)).astype(np.float32)
    bg = np.zeros((64, 64, 3), np.uint8)
    img_n = rasterize_native(verts, faces, colors, bg=bg)
    img_j = np.asarray(rasterize(jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(colors), bg=jnp.asarray(bg)))
    diff = np.abs(img_n.astype(int) - img_j.astype(int))
    # near-identical away from triangle edges
    assert (diff <= 1).mean() > 0.99


def test_normals_parity(rng):
    verts, faces = _random_mesh(rng, n_tris=20)
    n_native = vertex_normals_native(verts, faces)
    n_jax = np.asarray(get_normal(jnp.asarray(verts), jnp.asarray(faces)))
    np.testing.assert_allclose(n_native, n_jax, atol=1e-4)
