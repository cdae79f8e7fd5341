"""Phong-style per-vertex lighting pipeline.

Behavioral spec: /root/reference/Sim3DR/lighting.py — ambient + diffuse +
specular per-vertex intensities computed on normalized-to-[-1,1] vertices
with one directional light, multiplied into per-vertex colors and rasterized.
Fully vectorized JAX (the reference is already numpy; here the whole
lighting + raster pass can live inside one jit).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .rasterizer import get_normal, rasterize


def _norm(v: jax.Array) -> jax.Array:
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)


def norm_vertices(vertices: jax.Array) -> jax.Array:
    """Shift-scale vertices like the reference: min -> 0, /global-max, *2,
    then subtract half the per-axis max."""
    v = vertices - jnp.min(vertices, axis=0, keepdims=True)
    v = v / jnp.max(v)
    v = v * 2.0
    return v - jnp.max(v, axis=0, keepdims=True) / 2.0


class RenderPipeline:
    def __init__(
        self,
        intensity_ambient: float = 0.3,
        intensity_directional: float = 0.6,
        intensity_specular: float = 0.1,
        specular_exp: float = 5.0,
        color_ambient: Tuple[float, float, float] = (1, 1, 1),
        color_directional: Tuple[float, float, float] = (1, 1, 1),
        light_pos: Tuple[float, float, float] = (0, 0, 5),
        view_pos: Tuple[float, float, float] = (0, 0, 5),
    ):
        self.intensity_ambient = intensity_ambient
        self.intensity_directional = intensity_directional
        self.intensity_specular = intensity_specular
        self.specular_exp = specular_exp
        self.color_ambient = jnp.asarray(color_ambient, jnp.float32)
        self.color_directional = jnp.asarray(color_directional, jnp.float32)
        self.light_pos = jnp.asarray(light_pos, jnp.float32)
        self.view_pos = jnp.asarray(view_pos, jnp.float32)

    def update_light_pos(self, light_pos) -> None:
        self.light_pos = jnp.asarray(light_pos, jnp.float32)

    def compute_light(self, vertices: jax.Array, triangles: jax.Array) -> jax.Array:
        """Per-vertex RGB light intensities in [0, 1]."""
        normal = get_normal(vertices, triangles)
        light = jnp.zeros_like(vertices)
        if self.intensity_ambient > 0:
            light = light + self.intensity_ambient * self.color_ambient

        if self.intensity_directional > 0:
            vn = norm_vertices(vertices)
            direction = _norm(self.light_pos[None] - vn)
            cos = jnp.sum(normal * direction, axis=1, keepdims=True)
            light = light + self.intensity_directional * (
                self.color_directional * jnp.clip(cos, 0.0, 1.0)
            )
            if self.intensity_specular > 0:
                v2v = _norm(self.view_pos[None] - vn)
                reflection = 2.0 * cos * normal - direction
                spe = jnp.sum((v2v * reflection) ** self.specular_exp, axis=1, keepdims=True)
                spe = jnp.where(cos != 0, jnp.clip(spe, 0.0, 1.0), 0.0)
                light = light + self.intensity_specular * self.color_directional * jnp.clip(
                    spe, 0.0, 1.0
                )
        return jnp.clip(light, 0.0, 1.0)

    def __call__(
        self,
        vertices: jax.Array,
        triangles: jax.Array,
        bg: jax.Array,
        texture: Optional[jax.Array] = None,
    ) -> jax.Array:
        light = self.compute_light(jnp.asarray(vertices, jnp.float32), triangles)
        colors = light if texture is None else jnp.asarray(texture) * light
        return rasterize(vertices, triangles, colors, bg=bg)
