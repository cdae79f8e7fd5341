"""Pallas TPU kernel: fused FLAME blendshape + template accumulation.

The widest matmul of the FLAME decode is
  v_shaped = v_template + betas @ shapedirs      (B, 400) x (400, V*3)
(reference hot path via smplx blend_shapes, SURVEY.md §3.4). XLA already maps
the matmul onto the MXU; the win here is fusing the template broadcast-add
into the same kernel (one HBM write instead of matmul-out + add) and keeping
fp32 accumulation explicit.

Grid: (B tiles, V*3 tiles). Each program computes a (TB, TN) output tile as
betas_tile (TB, 400) @ shapedirs_tile (400, TN) on the MXU, adds the
broadcast template row slice, and writes once.

``blend_shapes_fused`` dispatches to the kernel on TPU and to a plain XLA
expression elsewhere (CPU tests run the kernel in interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(betas_ref, dirs_ref, template_ref, out_ref):
    acc = jnp.dot(
        betas_ref[:], dirs_ref[:], preferred_element_type=jnp.float32
    )
    out_ref[:] = acc + template_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def blend_shapes_fused_pallas(
    betas: jax.Array,
    shapedirs_flat: jax.Array,
    v_template_flat: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """betas (B, L) x shapedirs (L, N) + template (N,) -> (B, N), N = V*3.

    N (15069) is padded to a multiple of 128 lanes by the caller-visible
    wrapper; this function requires aligned shapes.
    """
    B, L = betas.shape
    N = shapedirs_flat.shape[1]
    TB = B if B <= 128 else next(t for t in (128, 64, 32, 16, 8) if B % t == 0)
    TN = 512
    assert N % TN == 0, (N, TN)
    assert B % TB == 0, (B, TB)

    grid = (B // TB, N // TN)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, L), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, TN), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, TN), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * L * N,
            bytes_accessed=4 * (B * L + L * N + B * N + N),
            transcendentals=0,
        ),
    )(betas.astype(jnp.float32), shapedirs_flat, v_template_flat[None, :])


# pallas_call has no autodiff rule; the kernel computes a plain affine map,
# so the exact VJP is two matmuls + a reduction (training differentiates
# through the FLAME decode via the losses).
@jax.custom_vjp
def _fused_flat(betas_p: jax.Array, dirs: jax.Array, tmpl: jax.Array) -> jax.Array:
    return blend_shapes_fused_pallas(betas_p, dirs, tmpl)


def _fused_flat_fwd(betas_p, dirs, tmpl):
    return _fused_flat(betas_p, dirs, tmpl), (betas_p, dirs)


def _fused_flat_bwd(res, g):
    betas_p, dirs = res
    hi = jax.lax.Precision.HIGHEST
    d_betas = jnp.dot(g, dirs.T, precision=hi, preferred_element_type=jnp.float32)
    d_dirs = jnp.dot(betas_p.T, g, precision=hi, preferred_element_type=jnp.float32)
    d_tmpl = jnp.sum(g, axis=0)
    return d_betas, d_dirs, d_tmpl


_fused_flat.defvjp(_fused_flat_fwd, _fused_flat_bwd)


def blend_shapes_fused(
    betas: jax.Array,
    shapedirs_flat: jax.Array,  # (L, V*3) — note: transposed vs FlameModel storage
    v_template: jax.Array,  # (V, 3)
    force_xla: bool = False,
) -> jax.Array:
    """v_template + blend offsets, shape (B, V, 3). Pads the vertex axis to
    the 128-lane boundary for the Pallas path."""
    B = betas.shape[0]
    V = v_template.shape[0]
    N = V * 3
    platform = jax.default_backend()
    # a symbolic batch dim (jax.export shape polymorphism) cannot drive the
    # concrete Pallas block sizing below — use the XLA matmul, which lowers
    # polymorphically
    if force_xla or platform not in ("tpu",) or not isinstance(B, int):
        out = (
            jnp.dot(
                betas,
                shapedirs_flat,
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            + v_template.reshape(-1)[None, :]
        )
        return out.reshape(B, V, 3)

    pad = (-N) % 512
    dirs = jnp.pad(shapedirs_flat, ((0, 0), (0, pad)))
    tmpl = jnp.pad(v_template.reshape(-1), (0, pad))
    # pad the batch to a multiple of 8 sublanes; any >128 batch also needs to
    # tile evenly, so round up to the next multiple of 128 in that case
    pad_b = (-B) % (8 if B <= 128 else 128)
    betas_p = jnp.pad(betas, ((0, pad_b), (0, 0)))
    out = _fused_flat(betas_p, dirs, tmpl)
    return out[:B, :N].reshape(B, V, 3)
