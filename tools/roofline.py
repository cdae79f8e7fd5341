"""Measured roofline position of the two hot compute paths.

Derives, for the e2e inference pipeline (B=256) and the full train step
(B=128), the per-iteration HBM bytes and FLOPs from XLA's compiled cost
model (``Compiled.cost_analysis()`` of the SAME jits bench.py times) and
combines them with a bench-style traced-iteration timing to place each path
on the v5e roofline: sustained GB/s, TFLOP/s, arithmetic intensity, percent
of peak HBM bandwidth, and the traffic-preserving speed-of-light throughput
(what a perfect-bandwidth chip would reach moving the same bytes).

The README's roofline paragraphs are generated from this tool's output so
they can be re-derived after any kernel/lowering change (the r5 upsample
relowering cut ~800 MB/iter of HBM intermediates and moved every number).

  python tools/roofline.py [--mode e2e|int8|train|both|all] [--iters 32] [--out FILE]

Default mode is "all" (e2e + int8 + train) — the set ROOFLINE_r05.json and
the README paragraphs carry.

Reference for the numbers' role: README "Roofline position"; BASELINE.json
north star (5,000 img/s/chip e2e).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

V5E_PEAK_HBM_GBPS = 819.0  # public v5e spec: 16 GB HBM2 @ 819 GB/s
V5E_PEAK_BF16_TFLOPS = 197.0


def _cost(compiled):
    """cost_analysis() across jax versions: dict or [dict]."""
    c = compiled.cost_analysis()
    if isinstance(c, (list, tuple)):
        c = c[0]
    return {
        "bytes": float(c.get("bytes accessed", 0.0)),
        "flops": float(c.get("flops", 0.0)),
    }


def _time_ips(run, batch, iters, reps=3):
    """bench.py methodology: one jit containing a fori_loop of the step, and
    a 1-iteration baseline subtracted from every N-iteration run so constant
    dispatch + result-fetch overhead (multi-ms through the TPU tunnel) does
    not inflate the per-iteration time; min over reps."""
    run(1)  # warm/compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        run(1)
        t1 = time.perf_counter()
        run(iters)
        t2 = time.perf_counter()
        dt = ((t2 - t1) - (t1 - t0)) / (iters - 1)
        best = min(best, dt)
    return batch / best, best


def build_e2e(batch):
    import jax
    import jax.numpy as jnp

    from dad3dheads_tpu.constants import OUTPUT_3DMM_PARAMS
    from dad3dheads_tpu.core.flame import FlameModel, FlameParams, flame_decode
    from dad3dheads_tpu.core.landmarks import LandmarkEmbedding, get_68_landmarks
    from dad3dheads_tpu.core.projection import weak_perspective_project
    from dad3dheads_tpu.core.rotation import rot_mat_from_6dof, rotate_vertices
    from dad3dheads_tpu.models import create_model

    dtype = os.environ.get("BENCH_DTYPE", "bf16")
    in_dtype = jnp.bfloat16 if dtype in ("bf16", "bfloat16") else jnp.float32
    model = create_model({"backbone": "resnet50", "dtype": dtype})
    x_init = jnp.zeros((1, 256, 256, 3), jnp.float32)
    variables = jax.jit(lambda r: model.init(r, x_init, train=False))(
        jax.random.PRNGKey(0)
    )
    flame = FlameModel.load()
    embedding = LandmarkEmbedding.load()

    def pipeline(variables, flame, embedding, images):
        out = model.apply(variables, images, train=False)
        mm = out[OUTPUT_3DMM_PARAMS].astype(jnp.float32)
        params = FlameParams.from_3dmm(mm)
        v0 = flame_decode(flame, params, zero_rot=True)
        v = rotate_vertices(rot_mat_from_6dof(params.rotation), v0)
        proj = weak_perspective_project(v, params.scale, params.translation, 256.0)
        lms = get_68_landmarks(v, embedding)
        return v, proj[..., :2], lms

    images = jnp.zeros((batch, 256, 256, 3), in_dtype)
    single = jax.jit(pipeline)
    cost = _cost(single.lower(variables, flame, embedding, images).compile())

    @jax.jit
    def run_j(seed, n_iters):
        imgs0 = jax.random.normal(seed, (batch, 256, 256, 3), in_dtype)

        def body(i, carry):
            imgs, acc = carry
            v, proj, lms = pipeline(variables, flame, embedding, imgs)
            chk = jnp.mean(lms) + 1e-20 * (jnp.sum(v[:, 0]) + jnp.sum(proj[:, 0]))
            imgs = imgs.at[0, 0, 0, 0].add((chk * 1e-30).astype(imgs.dtype))
            return imgs, acc + chk

        _, acc = jax.lax.fori_loop(0, n_iters, body, (imgs0, jnp.zeros(())))
        return acc

    key = jax.random.PRNGKey(7)
    return cost, lambda n: jax.block_until_ready(run_j(key, n))


def build_int8(batch):
    """bench.py's int8 loop: quantized CNN + fp32 geometry (no projection —
    same body bench times for int8_inference_ips)."""
    import jax
    import jax.numpy as jnp

    from dad3dheads_tpu.constants import OUTPUT_3DMM_PARAMS
    from dad3dheads_tpu.core.flame import FlameModel, FlameParams, flame_decode
    from dad3dheads_tpu.core.landmarks import LandmarkEmbedding, get_68_landmarks
    from dad3dheads_tpu.core.rotation import rot_mat_from_6dof, rotate_vertices
    from dad3dheads_tpu.models import create_model
    from dad3dheads_tpu.models.quantized import (
        calibrate,
        prepare_int8_params,
        quantized_forward,
    )

    dtype = os.environ.get("BENCH_DTYPE", "bf16")
    in_dtype = jnp.bfloat16 if dtype in ("bf16", "bfloat16") else jnp.float32
    model = create_model({"backbone": "resnet50", "dtype": dtype})
    x_init = jnp.zeros((1, 256, 256, 3), jnp.float32)
    variables = jax.jit(lambda r: model.init(r, x_init, train=False))(
        jax.random.PRNGKey(0)
    )
    flame = FlameModel.load()
    embedding = LandmarkEmbedding.load()
    amax = calibrate(
        model, variables,
        [jax.random.normal(jax.random.PRNGKey(7), (32, 256, 256, 3), in_dtype)],
        dtype=in_dtype,
    )
    qparams = prepare_int8_params(model, variables, dtype=in_dtype)

    def qpipe(variables, qparams, amax, flame, embedding, imgs):
        out, _ = quantized_forward(
            model, variables, imgs, amax=amax, mode="int8",
            dtype=in_dtype, qparams=qparams,
        )
        mm = out[OUTPUT_3DMM_PARAMS].astype(jnp.float32)
        params = FlameParams.from_3dmm(mm)
        v0 = flame_decode(flame, params, zero_rot=True)
        v = rotate_vertices(rot_mat_from_6dof(params.rotation), v0)
        lms = get_68_landmarks(v, embedding)
        return v, lms

    images = jnp.zeros((batch, 256, 256, 3), in_dtype)
    single = jax.jit(qpipe)
    cost = _cost(
        single.lower(variables, qparams, amax, flame, embedding, images).compile()
    )

    @jax.jit
    def run_q(seed, n_iters):
        imgs0 = jax.random.normal(seed, (batch, 256, 256, 3), in_dtype)

        def body(i, carry):
            imgs, acc = carry
            v, lms = qpipe(variables, qparams, amax, flame, embedding, imgs)
            chk = jnp.mean(lms) + 1e-20 * jnp.sum(v[:, 0])
            imgs = imgs.at[0, 0, 0, 0].add((chk * 1e-30).astype(imgs.dtype))
            return imgs, acc + chk

        _, acc = jax.lax.fori_loop(0, n_iters, body, (imgs0, jnp.zeros(())))
        return acc

    key = jax.random.PRNGKey(7)
    return cost, lambda n: jax.block_until_ready(run_q(key, n))


def build_train(batch):
    import jax
    import jax.numpy as jnp

    from dad3dheads_tpu.core.flame import FlameModel
    from dad3dheads_tpu.core.landmarks import LandmarkEmbedding
    from dad3dheads_tpu.data import synthetic_batch
    from dad3dheads_tpu.models import create_model
    from dad3dheads_tpu.train import build_train_step, get_optimizer, init_train_state

    dtype = os.environ.get("BENCH_DTYPE", "bf16")
    model = create_model({"backbone": "resnet50", "dtype": dtype})
    tx = get_optimizer({"name": "adam", "lr": 1e-4}, gradient_clip_val=5.0)
    state = init_train_state(model, tx, jax.random.PRNGKey(0), (1, 256, 256, 3))
    flame = FlameModel.load()
    emb = LandmarkEmbedding.load()
    step_fn = build_train_step(model, tx, img_size=256, jit=False, with_metrics=False)

    rng = jax.random.PRNGKey(1)
    data = jax.jit(lambda r: synthetic_batch(r, flame, emb, batch, 256))(rng)
    lr = jnp.ones((), jnp.float32)
    single = jax.jit(step_fn)
    cost = _cost(single.lower(state, flame, data, rng, lr).compile())

    @jax.jit
    def run(n):
        d = synthetic_batch(rng, flame, emb, batch, 256)

        def body(i, carry):
            s, r = carry
            r = jax.random.fold_in(r, i)
            s, _ = step_fn(s, flame, d, r, lr)
            return s, r

        s, _ = jax.lax.fori_loop(0, n, body, (state, rng))
        return s.params["shape_head"]["Dense_0"]["bias"][0]

    return cost, lambda n: float(run(n))


def analyze(name, cost, run, batch, iters):
    ips, sec_per_iter = _time_ips(run, batch, iters)
    gbps = cost["bytes"] / sec_per_iter / 1e9
    tflops = cost["flops"] / sec_per_iter / 1e12
    ai = cost["flops"] / max(cost["bytes"], 1.0)
    sol_ips = V5E_PEAK_HBM_GBPS * 1e9 / max(cost["bytes"], 1.0) * batch
    return {
        "path": name,
        "batch": batch,
        "bytes_per_iter_gb": round(cost["bytes"] / 1e9, 2),
        "flops_per_iter_g": round(cost["flops"] / 1e9, 1),
        "iter_ms": round(sec_per_iter * 1e3, 2),
        "ips": round(ips, 1),
        "sustained_hbm_gbps": round(gbps, 1),
        "pct_peak_hbm": round(100 * gbps / V5E_PEAK_HBM_GBPS, 1),
        "sustained_tflops": round(tflops, 1),
        "pct_peak_bf16_mxu": round(100 * tflops / V5E_PEAK_BF16_TFLOPS, 1),
        "arithmetic_intensity_flop_per_byte": round(ai, 1),
        "speed_of_light_ips_at_same_traffic": round(sol_ips, 1),
        "pct_of_speed_of_light": round(100 * ips / sol_ips, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--mode", default="all", choices=["e2e", "int8", "train", "both", "all"]
    )
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    out = {"peak_hbm_gbps": V5E_PEAK_HBM_GBPS, "peak_bf16_tflops": V5E_PEAK_BF16_TFLOPS}
    if args.mode in ("e2e", "both", "all"):
        b = int(os.environ.get("BENCH_BATCH", 256))
        cost, run = build_e2e(b)
        out["e2e"] = analyze("e2e_image_to_mesh", cost, run, b, args.iters)
        print(json.dumps(out["e2e"]), flush=True)
    if args.mode in ("int8", "all"):
        b = int(os.environ.get("BENCH_BATCH", 256))
        cost, run = build_int8(b)
        out["int8"] = analyze("int8_inference", cost, run, b, args.iters)
        print(json.dumps(out["int8"]), flush=True)
    if args.mode in ("train", "both", "all"):
        b = int(os.environ.get("BENCH_TRAIN_BATCH", 128))
        cost, run = build_train(b)
        out["train"] = analyze("train_step", cost, run, b, args.iters)
        print(json.dumps(out["train"]), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
