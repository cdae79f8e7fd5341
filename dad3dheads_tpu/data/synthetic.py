"""Synthetic self-consistent training batches.

Generates batches whose targets are *derived from* random FLAME parameters
through the framework's own geometry (decode -> project -> embed landmarks ->
splat heatmaps), so a training run on synthetic data is a genuine end-to-end
learnability check — the reference has no equivalent (its only integration
test is a 1-epoch run on 1% of the real dataset,
/root/reference/model_training/config/utility_overrides/local_fast.yaml).

Everything is jittable; use ``make_batch_fn`` to get a jitted generator.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from ..constants import (
    INPUT_BBOX_KEY,
    INPUT_IMAGE_KEY,
    TARGET_2D_FULL_LANDMARKS,
    TARGET_2D_LANDMARKS,
    TARGET_2D_LANDMARKS_PRESENCE,
    TARGET_3D_MODEL_VERTICES,
    TARGET_LANDMARKS_HEATMAP,
    total_3dmm_size,
)
from ..core.flame import FlameModel, FlameParams, flame_decode
from ..core.landmarks import LandmarkEmbedding, get_68_landmarks
from ..core.rotation import rot_mat_from_6dof
from ..ops.heatmap import encode_heatmap


def random_3dmm(rng: jax.Array, batch: int, dtype=jnp.float32) -> jax.Array:
    """Plausible random packed 3DMM vectors (rotation near identity).

    The weak-perspective scale parameter is sampled around 4 (decoded scale
    ~5) so the ~0.22-unit head spans most of the [-1, 1] image frame — the
    regime real face crops live in; near-zero scale renders a head a few
    pixels wide."""
    from ..constants import flame_param_offset

    k1, k2, k3, k4 = jax.random.split(rng, 4)
    n = total_3dmm_size()
    o_rot = flame_param_offset("rotation")
    o_tr = flame_param_offset("translation")
    o_sc = flame_param_offset("scale")
    x = jax.random.normal(k1, (batch, n), dtype) * 0.1
    # rotation 6dof near the identity frame
    base_rot = jnp.asarray([1.0, 0, 0, 0, 1.0, 0], dtype)
    rot = base_rot + jax.random.normal(k2, (batch, 6), dtype) * 0.1
    x = x.at[:, o_rot : o_rot + 6].set(rot)
    x = x.at[:, o_tr : o_tr + 3].set(jax.random.normal(k3, (batch, 3), dtype) * 0.1)
    scale = 4.0 + jax.random.normal(k4, (batch, 1), dtype) * 0.7
    x = x.at[:, o_sc : o_sc + 1].set(jnp.clip(scale, 2.5, 6.0))
    return x


def synthetic_batch(
    rng: jax.Array,
    flame: FlameModel,
    embedding: LandmarkEmbedding,
    batch: int,
    img_size: int = 256,
    stride: int = 4,
) -> Dict[str, jax.Array]:
    """One self-consistent batch keyed with the standard schema."""
    k_params, k_img = jax.random.split(rng)
    params_3dmm = random_3dmm(k_params, batch)
    params = FlameParams.from_3dmm(params_3dmm)

    v0 = flame_decode(flame, params, zero_rot=True)
    R = rot_mat_from_6dof(params.rotation)
    v_rot = jnp.einsum("bxy,bvy->bvx", R, v0, precision=jax.lax.Precision.HIGHEST)
    scale = jnp.clip(params.scale[:, None] + 1.0, min=1e-8)
    translation = params.translation.at[..., 2].set(0.0)
    proj = (v_rot * scale + translation[:, None] + 1.0) / 2.0 * img_size  # (B, V, 3)
    full_2d = proj[..., :2]

    lms_3d = get_68_landmarks(proj, embedding)
    lms_2d = lms_3d[..., :2]
    presence = (
        (lms_2d[..., 0] > 0)
        & (lms_2d[..., 0] < img_size)
        & (lms_2d[..., 1] > 0)
        & (lms_2d[..., 1] < img_size)
    )

    heatmap = encode_heatmap(lms_2d, presence, img_size, stride)  # (B, 68, S, S) uint8
    heatmap = jnp.transpose(heatmap, (0, 2, 3, 1))  # NHWC

    image = jax.random.normal(k_img, (batch, img_size, img_size, 3), jnp.float32)

    return {
        INPUT_IMAGE_KEY: image,
        INPUT_BBOX_KEY: jnp.tile(
            jnp.asarray([[0.0, 0.0, float(img_size), float(img_size)]], jnp.float32),
            (batch, 1),
        ),
        TARGET_3D_MODEL_VERTICES: v0,
        TARGET_2D_FULL_LANDMARKS: full_2d,
        TARGET_2D_LANDMARKS: lms_2d / img_size,
        TARGET_2D_LANDMARKS_PRESENCE: presence,
        TARGET_LANDMARKS_HEATMAP: heatmap,
    }


def make_batch_fn(flame: FlameModel, embedding: LandmarkEmbedding, batch: int, img_size: int = 256):
    """jitted rng -> batch generator (flame/embedding passed as args to avoid
    constant capture)."""

    @functools.partial(jax.jit, static_argnames=())
    def fn(rng, flame, embedding):
        return synthetic_batch(rng, flame, embedding, batch, img_size)

    return lambda rng: fn(rng, flame, embedding)
