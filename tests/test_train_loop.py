"""Trainer loop / checkpointing / config / scheduler tests."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dad3dheads_tpu.train.checkpoint import CheckpointManager
from dad3dheads_tpu.train.config import deep_merge, load_config, resolve_interpolations
from dad3dheads_tpu.train.schedulers import (
    EarlyStopping,
    ReduceLROnPlateau,
    flat_cosine_schedule,
    warmup_factor,
)


def test_config_composition(tmp_path):
    (tmp_path / "optimizer").mkdir()
    (tmp_path / "optimizer" / "adam.yaml").write_text("optimizer:\n  name: adam\n  lr: 0.0001\n")
    (tmp_path / "root.yaml").write_text(
        "defaults:\n  - optimizer: adam\nbatch_size: 64\nimg_size: 256\n"
        "train:\n  size: ${img_size}\n"
    )
    cfg = load_config(str(tmp_path / "root.yaml"), overrides=["optimizer.lr=0.01", "batch_size=8"])
    assert cfg["optimizer"]["name"] == "adam"
    assert cfg["optimizer"]["lr"] == 0.01
    assert cfg["batch_size"] == 8
    assert cfg["train"]["size"] == 256  # interpolation


def test_repo_configs_compose():
    cfg = load_config("configs/train.yaml")
    assert cfg["model"]["backbone"] == "resnet50"
    assert cfg["optimizer"]["name"] == "adam"
    assert len(cfg["loss"]) == 4
    assert cfg["constants"]["shape"] == 300
    assert cfg["train"]["ann_path"].startswith("dataset/")


def test_warmup_and_flat_cosine():
    assert float(warmup_factor(0, 10)) == pytest.approx(0.1)
    assert float(warmup_factor(9, 10)) == pytest.approx(1.0)
    assert float(warmup_factor(100, 10)) == pytest.approx(1.0)

    sched = flat_cosine_schedule(1.0, t_max=100, t_flat=30)
    assert float(sched(0)) == pytest.approx(1.0)
    assert float(sched(30)) == pytest.approx(1.0)
    assert float(sched(100)) == pytest.approx(0.0, abs=1e-6)
    assert 0.4 < float(sched(65)) < 0.6


def test_plateau_and_early_stopping():
    pl = ReduceLROnPlateau(patience=2, factor=0.5)
    lr = 1.0
    for v in [1.0, 0.9, 0.9, 0.9, 0.9]:  # 3 bad epochs after the best
        m = pl.step(v, lr)
    assert m == pytest.approx(0.5)

    es = EarlyStopping(patience=2)
    stops = [es.step(v) for v in [1.0, 0.5, 0.6, 0.7]]
    assert stops == [False, False, False, True]


def test_checkpoint_top_k(tmp_path):
    from dad3dheads_tpu.train.state import TrainState

    mgr = CheckpointManager(str(tmp_path), monitor="m", mode="min", save_top_k=2)
    state = {"w": jnp.arange(4.0)}
    for epoch, m in enumerate([5.0, 3.0, 4.0, 1.0]):
        state = {"w": jnp.arange(4.0) + epoch}
        mgr.save(state, epoch, {"m": m})
    assert mgr.best["value"] == 1.0
    # only top-2 kept (+ last + registry)
    files = [f for f in os.listdir(tmp_path) if f.endswith(".msgpack") and f != "last.msgpack"]
    assert len(files) == 2
    restored = mgr.restore({"w": jnp.zeros(4)})
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.arange(4.0) + 3)
    last = mgr.restore_last({"w": jnp.zeros(4)})
    np.testing.assert_array_equal(np.asarray(last["w"]), np.arange(4.0) + 3)


def test_checkpoint_async_roundtrip(tmp_path):
    """Async mode: writes land after flush(); restore/best drain the queue."""
    mgr = CheckpointManager(str(tmp_path), monitor="m", mode="min", save_top_k=2,
                            async_save=True)
    for epoch, m in enumerate([5.0, 3.0, 4.0]):
        mgr.save({"w": jnp.arange(4.0) + epoch}, epoch, {"m": m})
    assert mgr.best["value"] == 3.0  # property flushes
    restored = mgr.restore({"w": jnp.zeros(4)})  # best = epoch 1
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.arange(4.0) + 1)
    last = mgr.restore_last({"w": jnp.zeros(4)})
    np.testing.assert_array_equal(np.asarray(last["w"]), np.arange(4.0) + 2)


def test_checkpoint_weights_only_top_k(tmp_path):
    """Top-k checkpoints store weights only (reference ModelCheckpoint
    weights_only); restore grafts them onto the template TrainState."""
    import optax

    from dad3dheads_tpu.train.state import TrainState

    tx = optax.adam(1e-3)
    params = {"w": jnp.ones(3)}
    state = TrainState(
        params=params,
        batch_stats={"bn": jnp.zeros(2)},
        opt_state=tx.init(params),
        step=jnp.asarray(7, jnp.int32),
        epoch=jnp.asarray(1, jnp.int32),
    )
    mgr = CheckpointManager(str(tmp_path), monitor="m", mode="min", save_top_k=1)
    mgr.save(state.replace(params={"w": jnp.full(3, 2.0)}), 0, {"m": 1.0})

    template = state.replace(step=jnp.asarray(99, jnp.int32))
    restored = mgr.restore(template)
    np.testing.assert_array_equal(np.asarray(restored.params["w"]), 2.0)
    assert int(restored.step) == 99  # template's optimizer state/step kept
    # weights-only file is smaller than the full state in last.msgpack
    top_k_file = mgr.best["path"]
    assert os.path.getsize(top_k_file) < os.path.getsize(
        os.path.join(str(tmp_path), "last.msgpack")
    )


def test_trainer_fit_synthetic(tmp_path):
    """Two-epoch fit on synthetic data end-to-end (tiny net shapes)."""
    from dad3dheads_tpu.cli.train import SyntheticLoader
    from dad3dheads_tpu.core.flame import FlameModel
    from dad3dheads_tpu.core.landmarks import LandmarkEmbedding
    from dad3dheads_tpu.models import create_model
    from dad3dheads_tpu.train.loop import Trainer

    flame = FlameModel.load()
    emb = LandmarkEmbedding.load()
    model = create_model({"backbone": "resnet50"})
    config = {
        "img_size": 64,
        "max_epochs": 2,
        "batch_size": 8,
        "optimizer": {"name": "adam", "lr": 1e-4},
        "scheduler": {"name": "plateau", "patience": 2, "warmup_steps": 2},
        "gradient_clip_val": 5.0,
        "experiment_dir": str(tmp_path / "exp"),
        "save_top_k": 2,
        "early_stopping": 5,
        "images_log_freq": 2,
        "export_aot": True,
    }

    class FakeTB:  # records what the Trainer logs to TensorBoard
        def __init__(self):
            self.scalars, self.images = [], []

        def add_scalar(self, tag, value, step):
            self.scalars.append((tag, value, step))

        def add_image(self, tag, img, step, dataformats="HWC"):
            assert img.ndim == 3 and img.dtype == np.uint8, (tag, img.shape, img.dtype)
            self.images.append((tag, img.shape, step))

    # batch must divide the 8-device data axis
    loader = SyntheticLoader(flame, emb, batch_size=8, img_size=64, steps=2)
    val = SyntheticLoader(flame, emb, batch_size=8, img_size=64, steps=1, seed=9)
    trainer = Trainer(model, config, loader, val, flame=flame)
    trainer._tb = FakeTB()
    state = trainer.fit()
    assert int(state.step) == 4  # 2 epochs x 2 steps

    # image panels were logged at the configured frequency (steps 2 and 4)
    panel_tags = {t for t, _, _ in trainer._tb.images}
    assert panel_tags == {"train/landmarks", "train/heatmap"}
    assert len(trainer._tb.images) == 4

    # metrics were logged; the final line is the post-fit best-ckpt eval
    with open(tmp_path / "exp" / "metrics.jsonl") as f:
        lines = [json.loads(l) for l in f]
    assert len(lines) == 3
    assert "train/loss" in lines[1] and "valid/loss" in lines[1]
    assert "best/loss" in lines[-1] and "best/metrics/reproject_nme_2d" in lines[-1]

    # checkpoints + inference export exist
    ckpt_dir = tmp_path / "exp" / "checkpoints"
    assert (ckpt_dir / "last.msgpack").exists()
    assert (ckpt_dir / "dad_3dnet.msgpack").exists()

    # the AOT artifact loads and predicts without the model definition
    from dad3dheads_tpu.api.export import ExportedFaceMeshPredictor

    aot = ExportedFaceMeshPredictor(str(ckpt_dir / "dad_3dnet.aot.npz"))
    out = aot.predict_batch(np.zeros((2, 64, 64, 3), np.uint8))
    assert out["3d_vertices"].shape == (2, 5023, 3)

    # resume restores the step counter
    trainer2 = Trainer(model, {**config, "max_epochs": 2, "export_aot": False}, loader, val, flame=flame)
    state2 = trainer2.fit(resume=True)
    assert int(state2.step) >= 4


def test_checkpoint_saves_on_improvement_between_intervals(tmp_path):
    """With checkpoint_every_n_epochs > max_epochs, epochs that improve the
    monitored metric must still reach the top-k registry — otherwise early
    stopping could end a run with the best weights never on disk (round-2
    review fix)."""
    import json as _json

    from dad3dheads_tpu.cli.train import SyntheticLoader
    from dad3dheads_tpu.core.flame import FlameModel
    from dad3dheads_tpu.core.landmarks import LandmarkEmbedding
    from dad3dheads_tpu.models import create_model
    from dad3dheads_tpu.train.loop import Trainer

    flame = FlameModel.load()
    emb = LandmarkEmbedding.load()
    model = create_model({"backbone": "resnet50"})
    config = {
        "img_size": 64,
        "max_epochs": 2,
        "batch_size": 8,
        "optimizer": {"name": "adam", "lr": 1e-4},
        "experiment_dir": str(tmp_path / "exp"),
        "save_top_k": 3,
        "checkpoint_every_n_epochs": 50,  # interval never fires on its own
    }
    loader = SyntheticLoader(flame, emb, batch_size=8, img_size=64, steps=1)
    val = SyntheticLoader(flame, emb, batch_size=8, img_size=64, steps=1, seed=9)
    trainer = Trainer(model, config, loader, val, flame=flame)
    trainer.fit()

    with open(tmp_path / "exp" / "checkpoints" / "registry.json") as f:
        registry = _json.load(f)
    # the epoch with the best monitored metric must be on disk despite the
    # 50-epoch interval (pre-fix: only the last epoch was ever saved; the
    # between-interval best is held as a device snapshot and flushed at fit
    # end, so intermediate improvements cost no checkpoint IO)
    with open(tmp_path / "exp" / "metrics.jsonl") as f:
        rows = [_json.loads(l) for l in f]
    per_epoch = [r["valid/metrics/reproject_nme_2d"] for r in rows[:2]]
    best_epoch = int(np.argmin(per_epoch))
    entries = {e["epoch"]: e["value"] for e in registry}
    assert best_epoch in entries
    assert abs(entries[best_epoch] - per_epoch[best_epoch]) < 1e-3


def test_checkpoint_save_without_updating_last(tmp_path):
    """save(update_last=False) — used to flush a held best-epoch snapshot —
    must enter the top-k registry without clobbering the resume state."""
    import os

    from dad3dheads_tpu.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(tmp_path), monitor="m", mode="min", save_top_k=2)
    state = {"params": {"w": np.ones(3, np.float32)}, "batch_stats": {"s": np.zeros(2, np.float32)}}
    mgr.save(state, 0, {"m": 5.0})
    last0 = (tmp_path / "last.msgpack").read_bytes()

    better = {"params": {"w": np.full(3, 2.0, np.float32)}, "batch_stats": {"s": np.ones(2, np.float32)}}
    p = mgr.save(better, 1, {"m": 3.0}, update_last=False)
    assert p is not None and os.path.isfile(p)
    assert (tmp_path / "last.msgpack").read_bytes() == last0  # untouched
    assert mgr.best["epoch"] == 1 and mgr.best["value"] == 3.0


def test_checkpoint_hold_and_flush(tmp_path):
    """hold() keeps the save_top_k best between-interval epochs as device
    snapshots with zero host IO; flush_held() writes them into the registry
    without touching 'last'."""
    mgr = CheckpointManager(str(tmp_path), monitor="m", mode="min", save_top_k=2)
    for epoch, m in enumerate([5.0, 3.0, 4.0, 1.0]):
        mgr.hold(
            {"params": {"w": np.full(2, float(epoch), np.float32)}, "batch_stats": {}},
            epoch,
            {"m": m},
        )
        assert not os.listdir(tmp_path) or os.listdir(tmp_path) == ["registry.json"]
    assert len(mgr._held) == 2  # capped at save_top_k, best kept
    mgr.flush_held()
    assert sorted(e["value"] for e in mgr._registry) == [1.0, 3.0]
    assert not os.path.exists(tmp_path / "last.msgpack")
    assert mgr._held == []
    # the best entry restores to epoch 3's weights
    restored = mgr.restore({"params": {"w": np.zeros(2, np.float32)}, "batch_stats": {}})
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]), 3.0)


def _tiny_trainer_parts():
    from dad3dheads_tpu.cli.train import SyntheticLoader
    from dad3dheads_tpu.core.flame import FlameModel
    from dad3dheads_tpu.core.landmarks import LandmarkEmbedding
    from dad3dheads_tpu.models import create_model

    flame = FlameModel.load()
    emb = LandmarkEmbedding.load()
    model = create_model({"backbone": "resnet50"})
    return flame, emb, model


def test_sanity_val_fails_fast(tmp_path):
    """A broken val pipeline aborts fit BEFORE any train step (the PL
    num_sanity_val_steps behavior, reference train/utils.py:70-77)."""
    from dad3dheads_tpu.cli.train import SyntheticLoader
    from dad3dheads_tpu.train.loop import Trainer

    flame, emb, model = _tiny_trainer_parts()

    class BrokenValLoader:
        def __iter__(self):
            raise ValueError("val pipeline is broken")

    class CountingLoader:
        def __init__(self, inner):
            self.inner, self.count = inner, 0

        def __iter__(self):
            self.count += 1
            return iter(self.inner)

    train = CountingLoader(SyntheticLoader(flame, emb, batch_size=8, img_size=64, steps=1))
    config = {
        "img_size": 64,
        "max_epochs": 1,
        "optimizer": {"name": "adam", "lr": 1e-4},
        "experiment_dir": str(tmp_path / "exp"),
    }
    trainer = Trainer(model, config, train, BrokenValLoader(), flame=flame)
    import signal

    before = (signal.getsignal(signal.SIGTERM), signal.getsignal(signal.SIGINT))
    with pytest.raises(ValueError, match="val pipeline is broken"):
        trainer.fit()
    assert train.count == 0  # no training happened
    # the fit-local preemption handlers must not leak when sanity val raises
    after = (signal.getsignal(signal.SIGTERM), signal.getsignal(signal.SIGINT))
    assert after == before

    # sanity_val_steps=0 disables the pre-flight check: the same broken
    # loader now fails only at the epoch-end validation
    trainer2 = Trainer(
        model, {**config, "sanity_val_steps": 0}, train, BrokenValLoader(), flame=flame
    )
    with pytest.raises(ValueError, match="val pipeline is broken"):
        trainer2.fit()
    assert train.count == 1


def test_val_check_interval_mid_epoch(tmp_path):
    """val_check_interval=1 runs a full validation after every train step,
    logging valid/* at the step and holding improving snapshots."""
    from dad3dheads_tpu.cli.train import SyntheticLoader
    from dad3dheads_tpu.train.loop import Trainer

    flame, emb, model = _tiny_trainer_parts()
    config = {
        "img_size": 64,
        "max_epochs": 1,
        "optimizer": {"name": "adam", "lr": 1e-4},
        "experiment_dir": str(tmp_path / "exp"),
        "val_check_interval": 1,
        "sanity_val_steps": 1,
        "eval_best": False,
    }
    train = SyntheticLoader(flame, emb, batch_size=8, img_size=64, steps=2)
    val = SyntheticLoader(flame, emb, batch_size=8, img_size=64, steps=1, seed=9)
    trainer = Trainer(model, config, train, val, flame=flame)
    trainer.fit()

    with open(tmp_path / "exp" / "metrics.jsonl") as f:
        rows = [json.loads(l) for l in f]
    val_rows = [r for r in rows if "valid/loss" in r]
    # steps 1 and 2 mid-epoch + the end-of-epoch validation
    assert len(val_rows) == 3
    assert {r["step"] for r in val_rows[:2]} == {1, 2}


def test_resolve_val_interval_fraction(tmp_path):
    """Float intervals resolve against the measured epoch length; epoch 0
    (unknown length) falls back to end-of-epoch validation only."""
    from dad3dheads_tpu.cli.train import SyntheticLoader
    from dad3dheads_tpu.train.loop import Trainer

    flame, emb, model = _tiny_trainer_parts()
    config = {
        "img_size": 64,
        "max_epochs": 1,
        "optimizer": {"name": "adam", "lr": 1e-4},
        "experiment_dir": str(tmp_path / "exp"),
        "val_check_interval": 0.25,
    }
    val = SyntheticLoader(flame, emb, batch_size=8, img_size=64, steps=1, seed=9)
    trainer = Trainer(model, config, None, val, flame=flame)
    assert trainer._resolve_val_interval(None) is None
    assert trainer._resolve_val_interval(100) == 25
    assert trainer._resolve_val_interval(2) == 1
    trainer.val_check_interval = 200
    assert trainer._resolve_val_interval(None) == 200
    trainer.val_loader = None
    assert trainer._resolve_val_interval(100) is None


def test_trainer_auto_knobs(tmp_path):
    """auto_lr (LR-range test), auto_bs (batch-doubling probe) and
    check_val_every_n_epoch — the last PL trainer-factory knobs
    (reference train/utils.py:64,77,79)."""
    from dad3dheads_tpu.cli.train import SyntheticLoader
    from dad3dheads_tpu.train.loop import Trainer

    flame, emb, model = _tiny_trainer_parts()
    config = {
        "img_size": 64,
        "max_epochs": 2,
        "optimizer": {"name": "adam", "lr": 1e-4},
        "experiment_dir": str(tmp_path / "exp"),
        "sanity_val_steps": 0,
        "auto_lr": True,
        "auto_lr_steps": 6,
        "auto_bs": True,
        "auto_bs_max_trials": 2,
        "auto_bs_max": 16,
        "check_val_every_n_epoch": 2,
        "eval_best": False,
    }
    loader = SyntheticLoader(flame, emb, batch_size=8, img_size=64, steps=2)
    val = SyntheticLoader(flame, emb, batch_size=8, img_size=64, steps=1, seed=9)
    trainer = Trainer(model, config, loader, val, flame=flame)
    state = trainer.fit()

    # both tuners ran and recorded their results
    assert trainer.tuned_lr is not None and trainer.tuned_lr > 0
    assert trainer.tuned_batch_size in (8, 16)  # probe from 8, one doubling
    # the tuners used throwaway states: real training still ran 2x2 steps
    assert int(state.step) == 4

    # check_val_every_n_epoch=2: valid/* metrics only on the 2nd epoch line
    with open(tmp_path / "exp" / "metrics.jsonl") as f:
        rows = [json.loads(l) for l in f]
    epoch_rows = [r for r in rows if "train/loss" in r]
    assert len(epoch_rows) == 2
    assert "valid/loss" not in epoch_rows[0]
    assert "valid/loss" in epoch_rows[1]


def test_tune_lr_suggests_within_swept_range(tmp_path):
    """tune_lr returns an LR inside [min_lr, max_lr] and never mutates the
    trainer's base LR."""
    from dad3dheads_tpu.cli.train import SyntheticLoader
    from dad3dheads_tpu.train.loop import Trainer

    flame, emb, model = _tiny_trainer_parts()
    config = {
        "img_size": 64,
        "max_epochs": 1,
        "optimizer": {"name": "adam", "lr": 1e-4},
        "experiment_dir": str(tmp_path / "exp"),
    }
    loader = SyntheticLoader(flame, emb, batch_size=8, img_size=64, steps=3)
    trainer = Trainer(model, config, loader, None, flame=flame)
    lr = trainer.tune_lr(num_steps=5, min_lr=1e-5, max_lr=1e-2)
    assert 1e-5 <= lr <= 1e-2
    assert trainer.base_lr == 1e-4


def test_dataloader_set_batch_size():
    """The auto_scale_batch_size hook rebinds global + local batch sizes and
    rejects sizes that don't divide across processes."""
    import pytest

    from dad3dheads_tpu.data.dataset import DataLoader

    class _DS:
        def __len__(self):
            return 64

    dl = DataLoader(_DS(), 8, num_workers=1, process_index=0, process_count=2)
    # 64 items / 2 processes = 32 local; local batch 4 -> 8 batches/epoch
    assert dl.local_batch_size == 4 and len(dl) == 8
    dl.set_batch_size(16)
    assert dl.batch_size == 16 and dl.local_batch_size == 8 and len(dl) == 4
    with pytest.raises(ValueError):
        dl.set_batch_size(9)
