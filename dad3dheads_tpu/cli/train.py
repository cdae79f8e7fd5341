"""Training CLI.

Behavioral spec: /root/reference/train.py — compose the config, snapshot it
to a timestamped experiment dir, build datasets/model/trainer, fit, evaluate
the best checkpoint, export the inference artifact.

Usage:
  python -m dad3dheads_tpu.cli.train --config configs/train.yaml \
      [--synthetic N_STEPS] [key=value overrides...]

``--synthetic`` trains on device-generated self-consistent FLAME batches
(no dataset needed) — the end-to-end smoke/integration mode.
"""

from __future__ import annotations

import argparse
import logging
import os
from typing import Any, Dict

logging.basicConfig(
    level=logging.INFO, format="%(asctime)s %(name)s %(levelname)s - %(message)s"
)
logger = logging.getLogger("dad3d.train")


class SyntheticLoader:
    """Iterable of device-generated self-consistent batches."""

    def __init__(self, flame, embedding, batch_size: int, img_size: int, steps: int, seed: int = 0):
        import jax

        from ..data import synthetic_batch

        self.steps = steps
        self._rng = jax.random.PRNGKey(seed)
        self._fn = jax.jit(
            lambda r, f, e: synthetic_batch(r, f, e, batch_size, img_size)
        )
        self._flame = flame
        self._emb = embedding

    def __iter__(self):
        import jax

        rng = self._rng
        for _ in range(self.steps):
            rng, k = jax.random.split(rng)
            yield self._fn(k, self._flame, self._emb)

    def __len__(self):
        return self.steps


def build_loaders(config: Dict[str, Any]):
    from ..data.dataset import DataLoader, FlameDataset

    batch_size = int(config.get("batch_size", 64))
    num_workers = int(config.get("num_workers", 8))
    # "thread" (default: zero IPC, clamped to cpu_count) or "process"
    # (persistent spawn-context workers — the reference's num_workers
    # semantics, flame_dataset.py usage; scales past the GIL on multi-core
    # hosts; spawn because fork-under-JAX deadlocks, see data/dataset.py)
    worker_mode = str(config.get("worker_mode", "thread"))
    train_ds = FlameDataset.from_config(config["train"])
    val_ds = FlameDataset.from_config({**config["val"], "train_mode": False})
    frac = float(config.get("train_percent", 1.0))
    if frac < 1.0:
        train_ds.data = train_ds.data[: max(1, int(len(train_ds.data) * frac))]
    vfrac = float(config.get("val_percent", 1.0))
    if vfrac < 1.0:
        val_ds.data = val_ds.data[: max(1, int(len(val_ds.data) * vfrac))]
    return (
        DataLoader(
            train_ds, batch_size, shuffle=True, num_workers=num_workers,
            worker_mode=worker_mode,
        ),
        DataLoader(
            val_ds, batch_size, shuffle=False, num_workers=num_workers,
            worker_mode=worker_mode,
        ),
    )


def main() -> None:

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="configs/train.yaml")
    ap.add_argument("--synthetic", type=int, default=0, help="train on N synthetic steps/epoch")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("overrides", nargs="*", help="dotted key=value config overrides")
    args = ap.parse_args()

    from ..utils import enable_compilation_cache

    enable_compilation_cache()

    from ..core.flame import FlameModel
    from ..core.landmarks import LandmarkEmbedding
    from ..models import create_model
    from ..parallel import make_mesh
    from ..train.config import load_config, prepare_experiment_dir

    config = load_config(args.config, args.overrides)
    prepare_experiment_dir(config)
    logger.info("experiment dir: %s", config["experiment_dir"])

    model = create_model(config.get("model", {}))
    flame = FlameModel.load()

    mesh_cfg = config.get("mesh", {"data": -1, "model": 1})
    import jax

    if config.get("distributed"):
        jax.distributed.initialize()
    model_axis = int(mesh_cfg.get("model", 1))
    mesh = make_mesh(model=model_axis)

    if args.synthetic:
        embedding = LandmarkEmbedding.load()
        batch_size = int(config.get("batch_size", 8))
        img_size = int(config.get("img_size", 256))
        train_loader = SyntheticLoader(flame, embedding, batch_size, img_size, args.synthetic)
        val_loader = SyntheticLoader(
            flame, embedding, batch_size, img_size, max(args.synthetic // 4, 1), seed=1
        )
    else:
        train_loader, val_loader = build_loaders(config)

    from ..train.loop import Trainer

    trainer = Trainer(model, config, train_loader, val_loader, flame=flame, mesh=mesh)
    trainer.fit(resume=args.resume)


if __name__ == "__main__":
    main()
