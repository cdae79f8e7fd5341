"""Training-step throughput on the attached TPU chip.

Times the FULL train step (forward, four losses over one shared FLAME
decode, metrics, backward, adam update) on synthetic self-consistent batches,
using the same device-loop methodology as bench.py.

  python tools/train_throughput.py [--batch 64] [--img 256] [--dtype bf16]
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
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--img", type=int, default=256)
    ap.add_argument("--dtype", default="bf16")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from dad3dheads_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from dad3dheads_tpu.core.flame import FlameModel
    from dad3dheads_tpu.core.landmarks import LandmarkEmbedding
    from dad3dheads_tpu.data import synthetic_batch
    from dad3dheads_tpu.models import create_model
    from dad3dheads_tpu.train import build_train_step, get_optimizer, init_train_state

    model = create_model({"backbone": "resnet50", "dtype": args.dtype})
    tx = get_optimizer({"name": "adam", "lr": 1e-4}, gradient_clip_val=5.0)
    state = init_train_state(model, tx, jax.random.PRNGKey(0), (1, args.img, args.img, 3))
    flame = FlameModel.load()
    emb = LandmarkEmbedding.load()

    step_fn = build_train_step(model, tx, img_size=args.img, jit=False, with_metrics=False)

    def looped(n):
        @jax.jit
        def run(state, flame, emb, rng):
            batch = synthetic_batch(rng, flame, emb, args.batch, args.img)

            def body(i, carry):
                s, r = carry
                r = jax.random.fold_in(r, i)
                s, logs = step_fn(s, flame, batch, r, jnp.ones((), jnp.float32))
                return s, r

            s, _ = jax.lax.fori_loop(0, n, body, (state, rng))
            return s.step, s.params["shape_head"]["Dense_0"]["bias"][0]

        return run

    r1, rn = looped(1), looped(1 + args.iters)
    k = jax.random.PRNGKey(1)
    float(r1(state, flame, emb, k)[1])
    float(rn(state, flame, emb, k)[1])

    def timed(fn):
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            float(fn(state, flame, emb, jax.random.PRNGKey(2 + i))[1])
            best = min(best, time.perf_counter() - t0)
        return best

    per_iter = max((timed(rn) - timed(r1)) / args.iters, 1e-9)
    print(
        json.dumps(
            {
                "metric": "train_step_throughput",
                "value": round(args.batch / per_iter, 1),
                "unit": "images/sec/chip",
                "batch": args.batch,
                "dtype": args.dtype,
                "step_ms": round(per_iter * 1e3, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
