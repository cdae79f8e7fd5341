"""Worker for the two-process ``jax.distributed`` integration test.

Spawned by tests/test_distributed_multiprocess.py. Each process initializes
the distributed runtime over localhost, owns 4 virtual CPU devices of a
shared 8-device (data=4, model=2) mesh, feeds its rank's slice of a
deterministic synthetic dataset through ``DataLoader(process_index=r,
process_count=N)`` + ``device_prefetch``, and runs real train steps whose
gradient all-reduce / global-batch BN / metric reductions are cross-process
Gloo collectives. Per-step losses go to ``--out`` as JSON.

With ``--num-processes 1`` (8 local devices) the same script produces the
single-process reference losses; the parent asserts the two match to fp
tolerance — the contract the reference gets from running PL DDP for real
(/root/reference/model_training/train/flame_lightning_model.py:182-186).

Not a pytest file (no ``test_`` prefix) — run only via the parent test.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

IMG = 64
GLOBAL_BS = 8


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--model-axis", type=int, default=2)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import jax

    # the axon TPU plugin prepends itself to JAX_PLATFORMS; force the CPU
    # backend (with xla_force_host_platform_device_count from the parent env)
    jax.config.update("jax_platforms", "cpu")
    if args.num_processes > 1:
        jax.distributed.initialize(
            f"localhost:{args.port}",
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    import jax.numpy as jnp
    import numpy as np

    from dad3dheads_tpu.core.flame import FlameModel
    from dad3dheads_tpu.core.landmarks import LandmarkEmbedding
    from dad3dheads_tpu.data import synthetic_batch
    from dad3dheads_tpu.data.dataset import DataLoader
    from dad3dheads_tpu.models.dad3dnet import DAD3DNet
    from dad3dheads_tpu.parallel.mesh import batch_sharding, make_mesh, replicate
    from dad3dheads_tpu.parallel.prefetch import device_prefetch
    from dad3dheads_tpu.train import build_train_step, get_optimizer, init_train_state

    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 8 // args.num_processes

    # deterministic synthetic dataset: every process derives the IDENTICAL
    # row set from the same seed, then its DataLoader takes only its rank's
    # interleaved slice (DistributedSampler semantics)
    flame = FlameModel.load()
    emb = LandmarkEmbedding.load()
    n_items = args.steps * GLOBAL_BS
    rows = jax.jit(lambda r, f, e: synthetic_batch(r, f, e, n_items, IMG))(
        jax.random.PRNGKey(7), flame, emb
    )
    rows = {k: np.asarray(v) for k, v in rows.items()}

    class RowDataset:
        def __len__(self):
            return n_items

        def __getitem__(self, idx: int):
            return {k: v[idx] for k, v in rows.items()}

    mesh = make_mesh(model=args.model_axis)
    multihost_branch = not batch_sharding(mesh).is_fully_addressable
    assert multihost_branch == (args.num_processes > 1)

    loader = DataLoader(
        RowDataset(), GLOBAL_BS, shuffle=True, num_workers=2, seed=5
    )
    assert len(loader) == args.steps
    assert loader.local_batch_size == GLOBAL_BS // args.num_processes

    # dropout masks index by batch position and the two runs assemble the
    # global batch in different row orders; zero it so losses are
    # order-invariant means
    net = DAD3DNet(backbone="mobilenet_w1", dropout=0.0)
    # SGD, not adam: adam's first-step update is ~sign(grad)*lr, so the
    # ~1e-7 reduction-order noise between Gloo and single-process all-reduce
    # flips near-zero gradient signs and the runs diverge chaotically; SGD
    # amplifies the same noise only linearly, keeping the oracle comparison
    # meaningful
    tx = get_optimizer({"name": "sgd", "lr": 1e-2})
    state = init_train_state(net, tx, jax.random.PRNGKey(0), (1, IMG, IMG, 3))
    state = replicate(state, mesh)
    flame_r = replicate(flame, mesh)

    train_step = build_train_step(net, tx, img_size=IMG, warmup_steps=0)
    losses, nmes, grad_norms = [], [], []
    for batch in device_prefetch(iter(loader), mesh):
        state, logs = train_step(
            state, flame_r, batch, jax.random.PRNGKey(3), jnp.ones((), jnp.float32)
        )
        losses.append(float(logs["loss"]))
        nmes.append(float(logs["metrics/reproject_nme_2d"]))
        grad_norms.append(float(logs["grad_norm"]))

    result = {
        "process_id": args.process_id,
        "num_processes": args.num_processes,
        "device_count": jax.device_count(),
        "local_device_count": jax.local_device_count(),
        "mesh": dict(mesh.shape),
        "multihost_branch": multihost_branch,
        "losses": losses,
        "reproject_nme_2d": nmes,
        "grad_norms": grad_norms,
        "final_step": int(state.step),
    }
    with open(args.out, "w") as f:
        json.dump(result, f)
    print(f"worker {args.process_id}/{args.num_processes}: {losses}", flush=True)


if __name__ == "__main__":
    main()
