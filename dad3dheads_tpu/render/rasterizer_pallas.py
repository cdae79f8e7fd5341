"""Pallas TPU kernel: tiled z-buffer rasterization.

The serial z-buffer of the reference's C++ rasterizer cannot map to TPU (no
atomics, no ordered writes); this kernel is the explicitly-tiled version of
the same redesign as render.rasterizer: each program owns one (8 x 128)
pixel tile, streams the whole triangle list through VMEM in 128-triangle
chunks, computes all pixel-in-triangle barycentrics as (1024, 128) VPU ops,
and keeps a running per-pixel argmax over depth. One pass, no intermediate
HBM traffic — the triangle buffer (~0.4 MB for the 9,976-face FLAME mesh)
stays resident in VMEM across the whole grid.

Outputs match ``rasterizer.rasterize_buffers``.

Status: EXPERIMENTAL — numerically validated against the XLA rasterizer in
interpret mode; on one observed TPU runtime the compiled kernel stalled
(suspected Mosaic issue with the long fori_loop + argmax body), so the XLA
path in ``rasterizer.py`` remains the production TPU renderer.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 8
TILE_W = 128
CHUNK = 128
_ZBUF_INIT = -1e8


def _kernel(tri_ref, nvalid_ref, depth_ref, id_ref, b0_ref, b1_ref, b2_ref):
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    P = TILE_H * TILE_W

    pix = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    py = (ti * TILE_H + pix // TILE_W).astype(jnp.float32)  # (P, 1)
    px = (tj * TILE_W + pix % TILE_W).astype(jnp.float32)

    n_chunks = tri_ref.shape[0] // CHUNK
    n_valid = nvalid_ref[0]

    def body(c, carry):
        best_z, best_id, b0, b1, b2 = carry
        t = tri_ref[pl.ds(c * CHUNK, CHUNK), :]  # (CHUNK, 9)
        x0, y0, z0 = t[:, 0], t[:, 1], t[:, 2]
        x1, y1, z1 = t[:, 3], t[:, 4], t[:, 5]
        x2, y2, z2 = t[:, 6], t[:, 7], t[:, 8]

        area = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)  # (CHUNK,)
        ok = jnp.abs(area) > 1e-12
        tid = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1) + c * CHUNK
        ok = ok[None, :] & (tid < n_valid)
        inv_area = jnp.where(jnp.abs(area) > 1e-12, 1.0 / area, 0.0)[None, :]

        w0 = ((x1[None] - px) * (y2[None] - py) - (x2[None] - px) * (y1[None] - py)) * inv_area
        w1 = ((x2[None] - px) * (y0[None] - py) - (x0[None] - px) * (y2[None] - py)) * inv_area
        w2 = 1.0 - w0 - w1  # (P, CHUNK)

        eps = 1e-5
        inside = (w0 >= -eps) & (w1 >= -eps) & (w2 >= -eps) & ok
        z = w0 * z0[None] + w1 * z1[None] + w2 * z2[None]
        z = jnp.where(inside, z, _ZBUF_INIT)

        # per-pixel winner inside the chunk, selected with a one-hot
        # reduction (Mosaic does not support row-wise gathers)
        k = jnp.argmax(z, axis=1, keepdims=True)  # (P, 1)
        zk = jnp.max(z, axis=1, keepdims=True)
        cols = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
        onehot = (cols == k).astype(jnp.float32)
        take = zk > best_z
        best_z = jnp.where(take, zk, best_z)
        best_id = jnp.where(take, k.astype(jnp.int32) + c * CHUNK, best_id)
        b0 = jnp.where(take, jnp.sum(w0 * onehot, axis=1, keepdims=True), b0)
        b1 = jnp.where(take, jnp.sum(w1 * onehot, axis=1, keepdims=True), b1)
        b2 = jnp.where(take, jnp.sum(w2 * onehot, axis=1, keepdims=True), b2)
        return best_z, best_id, b0, b1, b2

    init = (
        jnp.full((P, 1), _ZBUF_INIT, jnp.float32),
        jnp.full((P, 1), -1, jnp.int32),
        jnp.zeros((P, 1), jnp.float32),
        jnp.zeros((P, 1), jnp.float32),
        jnp.zeros((P, 1), jnp.float32),
    )
    best_z, best_id, b0, b1, b2 = jax.lax.fori_loop(0, n_chunks, body, init)

    depth_ref[:] = best_z.reshape(TILE_H, TILE_W)
    id_ref[:] = best_id.reshape(TILE_H, TILE_W)
    b0_ref[:] = b0.reshape(TILE_H, TILE_W)
    b1_ref[:] = b1.reshape(TILE_H, TILE_W)
    b2_ref[:] = b2.reshape(TILE_H, TILE_W)


@functools.partial(jax.jit, static_argnames=("height", "width", "interpret"))
def rasterize_buffers_pallas(
    vertices: jax.Array,
    faces: jax.Array,
    height: int,
    width: int,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Pallas path of rasterize_buffers: (V, 3) x (T, 3) -> depth/id/bary."""
    assert height % TILE_H == 0 and width % TILE_W == 0, (height, width)
    tri = vertices.astype(jnp.float32)[faces].reshape(-1, 9)  # (T, 9)
    T = tri.shape[0]
    pad = (-T) % CHUNK
    tri = jnp.pad(tri, ((0, pad), (0, 0)))
    n_valid = jnp.asarray([T], jnp.int32)

    grid = (height // TILE_H, width // TILE_W)
    out_shapes = (
        jax.ShapeDtypeStruct((height, width), jnp.float32),
        jax.ShapeDtypeStruct((height, width), jnp.int32),
        jax.ShapeDtypeStruct((height, width), jnp.float32),
        jax.ShapeDtypeStruct((height, width), jnp.float32),
        jax.ShapeDtypeStruct((height, width), jnp.float32),
    )
    tile_spec = pl.BlockSpec(
        (TILE_H, TILE_W), lambda i, j: (i, j), memory_space=pltpu.VMEM
    )
    depth, tri_id, b0, b1, b2 = pl.pallas_call(
        _kernel,
        out_shape=out_shapes,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full triangle buffer
            pl.BlockSpec(memory_space=pltpu.SMEM),  # n_valid scalar
        ],
        out_specs=(tile_spec, tile_spec, tile_spec, tile_spec, tile_spec),
        interpret=interpret,
    )(tri, n_valid)
    return depth, tri_id, jnp.stack([b0, b1, b2], axis=-1)
