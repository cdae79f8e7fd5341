"""Device-rate benchmark of the AOT artifact's two frames programs.

Exports a resnet50 predictor with a (B, 512, 512) TPU bucket, then times —
entirely on device, bench.py's chained-fori-loop methodology — the portable
symbolic-shape XLA-resample program vs the TPU-specialized fused-Pallas
bucket program on identical packed inputs. Records the delta the export
docs cite (VERDICT r04 weak #6).

  python tools/bench_export_frames.py [--batch 256] [--iters 20] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--frame", type=int, default=512)
    ap.add_argument("--out", default="/tmp/export_frames_bench")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dad3dheads_tpu.api.export import ExportedFaceMeshPredictor, export_predictor
    from dad3dheads_tpu.api.predictor import FaceMeshPredictor

    B, F = args.batch, args.frame
    t0 = time.perf_counter()
    say = lambda m: print(f"[t+{time.perf_counter() - t0:6.1f}s] {m}", file=sys.stderr, flush=True)

    say("building predictor (random weights — throughput only)")
    predictor = FaceMeshPredictor(
        {"img_size": 256, "stride": 4, "model": {"backbone": "resnet50", "dtype": "bf16"}}
    )
    path = os.path.join(args.out, "rn50_bucket.aot.npz")
    os.makedirs(args.out, exist_ok=True)
    say("exporting (portable + TPU bucket)")
    export_predictor(
        predictor.model, predictor.variables, predictor.flame, path,
        img_size=256, stride=4, platforms=("tpu", "cpu"),
        tpu_frames_specs=[(B, F, F)],
    )
    say(f"artifact: {os.path.getsize(path) / 1e6:.1f} MB")
    ep = ExportedFaceMeshPredictor(path)

    rng = np.random.default_rng(0)
    planar = jnp.asarray(rng.integers(0, 256, (B, F, 3 * F), np.uint8))
    nhwc = jnp.asarray(
        np.ascontiguousarray(
            np.asarray(planar).reshape(B, F, 3, F).transpose(0, 1, 3, 2)
        )
    )
    sizes = jnp.tile(jnp.asarray([[F, F]], jnp.int32), (B, 1))
    off = rng.integers(0, 128, (B, 2)).astype(np.int32)
    boxes = jnp.asarray(np.concatenate([off, off + 320], axis=-1))

    results = {}
    for label, prog, frames in (
        ("portable_xla", ep._frames, nhwc),
        ("tpu_bucket_pallas", ep._frames_tpu[0][1], planar),
    ):
        weights = ep._weights

        @jax.jit
        def run(w, fr, sz, bx, n_iters):
            def body(i, carry):
                bx_, acc = carry
                lms, mm, sc, pd = prog.call(w, fr, sz, bx_)
                chk = jnp.sum(mm[:, 0].astype(jnp.float32)) + jnp.sum(
                    lms[:, 0].astype(jnp.float32)
                )
                bx_ = bx_.at[0, 0].add((chk * 1e-30).astype(bx_.dtype))
                return bx_, acc + chk

            _, acc = jax.lax.fori_loop(0, n_iters, body, (bx, jnp.zeros(())))
            return acc

        say(f"{label}: compiling")
        float(run(weights, frames, sizes, boxes, 1))
        say(f"{label}: measuring")

        def timed(n, reps):
            best = float("inf")
            for _ in range(reps):
                s = time.perf_counter()
                float(run(weights, frames, sizes, boxes, n))
                best = min(best, time.perf_counter() - s)
            return best

        t1 = timed(1, args.reps)
        samples = []
        for _ in range(args.reps):
            s = time.perf_counter()
            float(run(weights, frames, sizes, boxes, 1 + args.iters))
            per = max(((time.perf_counter() - s) - t1) / args.iters, 1e-9)
            samples.append(B / per)
        samples.sort()
        results[label] = round(samples[len(samples) // 2], 1)
        say(f"{label}: {results[label]} img/s (spread {samples[0]:.0f}..{samples[-1]:.0f})")

    results["speedup"] = round(results["tpu_bucket_pallas"] / results["portable_xla"], 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
