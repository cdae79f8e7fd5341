"""Per-op device profile of the serving pipelines (bench.py's loops).

Captures a jax.profiler trace of the preproc-inclusive e2e loop (and
optionally the crop-free e2e loop), then ranks device ops by total time so
the optimization targets are measured, not guessed (VERDICT r05 tasks 2/8).

  python tools/profile_pipeline.py [--mode preproc|e2e] [--iters 8] [--top 30]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def build_run(mode: str, batch: int):
    """Rebuild bench.py's serving loop (same models, dtypes, loop body)."""
    import jax
    import jax.numpy as jnp

    from dad3dheads_tpu.constants import OUTPUT_3DMM_PARAMS
    from dad3dheads_tpu.core.flame import FlameModel, FlameParams, flame_decode
    from dad3dheads_tpu.core.landmarks import LandmarkEmbedding, get_68_landmarks
    from dad3dheads_tpu.core.projection import weak_perspective_project
    from dad3dheads_tpu.core.rotation import rot_mat_from_6dof, rotate_vertices
    from dad3dheads_tpu.models import create_model
    from dad3dheads_tpu.ops.preprocess_device import preprocess_frames_device

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

    if mode == "e2e":

        @jax.jit
        def run_j(seed, n_iters):
            images = jax.random.normal(seed, (batch, 256, 256, 3), in_dtype)

            def body(i, carry):
                imgs, acc = carry
                v, proj, lms = pipeline(variables, flame, embedding, imgs)
                chk = jnp.mean(lms) + 1e-20 * (jnp.sum(v[:, 0]) + jnp.sum(proj[:, 0]))
                imgs = imgs.at[0, 0, 0, 0].add((chk * 1e-30).astype(imgs.dtype))
                return imgs, acc + chk

            _, acc = jax.lax.fori_loop(0, n_iters, body, (images, jnp.zeros(())))
            return acc

        return lambda n: jax.block_until_ready(run_j(jax.random.PRNGKey(7), n))

    FRAME = 512

    @jax.jit
    def run_p(seed, n_iters):
        k1, k2 = jax.random.split(seed)
        frames = jax.random.randint(k1, (batch, FRAME, 3 * FRAME), 0, 256, jnp.uint8)
        sizes = jnp.tile(jnp.asarray([[FRAME, FRAME]], jnp.int32), (batch, 1))
        off = jax.random.randint(k2, (batch, 2), 0, 128, jnp.int32)
        boxes = jnp.concatenate([off, off + 320], axis=-1)

        def body(i, carry):
            bx, acc = carry
            imgs, _, _ = preprocess_frames_device(
                frames, sizes, bx, 256, layout="planar", out_dtype=in_dtype
            )
            v, proj, lms = pipeline(variables, flame, embedding, imgs.astype(in_dtype))
            chk = jnp.mean(lms) + 1e-20 * (jnp.sum(v[:, 0]) + jnp.sum(proj[:, 0]))
            bx = bx.at[0, 0].add((chk * 1e-30).astype(bx.dtype))
            return bx, acc + chk

        _, acc = jax.lax.fori_loop(0, n_iters, body, (boxes, jnp.zeros(())))
        return acc

    return lambda n: jax.block_until_ready(run_p(jax.random.PRNGKey(7), n))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="preproc", choices=["preproc", "e2e"])
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--trace-dir", default="/tmp/jaxprof_pipeline")
    args = ap.parse_args()

    import jax

    run = build_run(args.mode, int(os.environ.get("BENCH_BATCH", 256)))
    run(1)  # compile + warm outside the trace
    jax.profiler.start_trace(args.trace_dir)
    run(args.iters)
    jax.profiler.stop_trace()

    traces = sorted(glob.glob(
        os.path.join(args.trace_dir, "plugins/profile/*/*.trace.json.gz")
    ))
    assert traces, f"no trace written under {args.trace_dir}"
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]

    # device pid: the '/device:TPU:0' process
    dev_pids = {
        e["pid"]
        for e in events
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    per_op = defaultdict(float)
    counts = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            name = e.get("name", "?")
            dur = float(e.get("dur", 0.0))
            per_op[name] += dur
            counts[name] += 1
            total += dur
    ranked = sorted(per_op.items(), key=lambda kv: -kv[1])
    print(f"mode={args.mode} iters={args.iters} device-total={total/1e3:.2f} ms")
    print(f"{'us_total':>10}  {'%':>5}  {'n':>4}  op")
    for name, dur in ranked[: args.top]:
        print(f"{dur:10.0f}  {100 * dur / max(total, 1e-9):5.1f}  {counts[name]:4d}  {name[:110]}")


if __name__ == "__main__":
    main()
