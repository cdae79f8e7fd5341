"""Pallas kernel tests (interpret mode on the CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dad3dheads_tpu.ops.blendshapes import blend_shapes_fused, blend_shapes_fused_pallas


def test_fused_blendshapes_interpret_matches_xla(rng):
    B, L, V = 8, 400, 128  # small V for the interpreter
    betas = jnp.asarray(rng.normal(size=(B, L)), jnp.float32)
    dirs = jnp.asarray(rng.normal(size=(L, V * 3)) * 1e-3, jnp.float32)
    template = jnp.asarray(rng.normal(size=(V, 3)), jnp.float32)

    ref = blend_shapes_fused(betas, dirs, template, force_xla=True)

    pad = (-(V * 3)) % 512
    dirs_p = jnp.pad(dirs, ((0, 0), (0, pad)))
    tmpl_p = jnp.pad(template.reshape(-1), (0, pad))
    out = blend_shapes_fused_pallas(betas, dirs_p, tmpl_p, interpret=True)
    out = out[:, : V * 3].reshape(B, V, 3)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_blendshapes_cpu_dispatch(rng):
    # on CPU the wrapper must take the XLA path and still be correct
    B, L, V = 4, 400, 64
    betas = jnp.asarray(rng.normal(size=(B, L)), jnp.float32)
    dirs = jnp.asarray(rng.normal(size=(L, V * 3)) * 1e-3, jnp.float32)
    template = jnp.asarray(rng.normal(size=(V, 3)), jnp.float32)
    out = blend_shapes_fused(betas, dirs, template)
    assert out.shape == (B, V, 3)
    manual = np.asarray(betas) @ np.asarray(dirs) + np.asarray(template).reshape(-1)
    np.testing.assert_allclose(np.asarray(out).reshape(B, -1), manual, atol=1e-4)


def test_normalize_images_pallas_interpret(rng):
    from dad3dheads_tpu.ops.preprocess import normalize_batch_jax
    from dad3dheads_tpu.ops.preprocess_pallas import normalize_images_pallas

    imgs = jnp.asarray((rng.uniform(size=(2, 32, 128, 3)) * 255).astype(np.uint8))
    out = normalize_images_pallas(imgs, interpret=True)
    ref = normalize_batch_jax(imgs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
