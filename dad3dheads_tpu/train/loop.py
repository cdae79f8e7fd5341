"""The training loop (DAD3DTrainer equivalent).

Behavioral spec: /root/reference/model_training/train/trainer.py +
flame_lightning_model.py — fit over epochs with per-step losses/metrics,
validation each epoch, checkpoint top-k on the monitored metric, early
stopping, plateau LR, TensorBoard + console logging, inference export of the
best checkpoint.

TPU-first: the loop body is host-side orchestration only; every numeric op
lives in the two jitted steps. Batches are device_put with the data-axis
NamedSharding before the step (DP over the mesh); metric scalars are fetched
once per logging interval to keep the host-device traffic off the step path.
"""

from __future__ import annotations

import json
import logging
import os
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.flame import FlameModel
from ..losses import LossModule
from ..parallel import local_data_parallel_mesh, replicated
from .checkpoint import CheckpointManager
from .optimizers import get_optimizer
from .schedulers import EarlyStopping, ReduceLROnPlateau, get_schedule
from .state import TrainState, init_train_state
from .step import build_eval_step, build_train_step

logger = logging.getLogger(__name__)


class MetricAccumulator:
    """Accumulates per-step metric scalars ON DEVICE; the host fetch happens
    once in ``means()`` — one sync per epoch instead of one per step per
    metric (which is ruinous over a remote TPU attachment). The whole logs
    dict is merged by ONE jitted tree-add per step, so the per-step dispatch
    cost is a single call rather than one op per metric."""

    _merge = None  # class-level jit cache (same fn for every accumulator)

    def __init__(self):
        self._sums: Optional[Dict[str, jax.Array]] = None
        self._n = 0
        if MetricAccumulator._merge is None:
            MetricAccumulator._merge = jax.jit(
                lambda s, o: jax.tree_util.tree_map(jnp.add, s, o)
            )

    def add(self, logs: Dict[str, jax.Array]) -> None:
        self._n += 1
        self._sums = dict(logs) if self._sums is None else MetricAccumulator._merge(self._sums, logs)

    def means(self) -> Dict[str, float]:
        if self._sums is None:
            return {}
        host = jax.device_get(self._sums)
        return {k: float(v) / max(self._n, 1) for k, v in host.items()}


class Trainer:
    """Orchestrates fit/validate/checkpoint/early-stop for DAD-3DNet."""

    def __init__(
        self,
        model,
        config: Dict[str, Any],
        train_loader: Optional[Iterable] = None,
        val_loader: Optional[Iterable] = None,
        flame: Optional[FlameModel] = None,
        mesh=None,
    ):
        self.model = model
        self.config = config
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.flame = flame if flame is not None else FlameModel.load()
        self.mesh = mesh if mesh is not None else local_data_parallel_mesh()

        if config.get("debug_nans"):
            from ..utils import enable_nan_debugging

            enable_nan_debugging()

        self.img_size = int(config.get("img_size", 256))
        self.max_epochs = int(config.get("max_epochs", 100))
        self.min_epochs = int(config.get("min_epochs", 0))
        self.monitor = config.get("metric_to_monitor", "metrics/reproject_nme_2d")
        self.monitor_mode = config.get("metric_mode", "min")
        self.experiment_dir = config.get("experiment_dir", "experiments/run")
        os.makedirs(self.experiment_dir, exist_ok=True)

        opt_cfg = dict(config.get("optimizer", {"name": "adam", "lr": 1e-4}))
        self.base_lr = float(opt_cfg.get("lr", 1e-4))
        sched_cfg = config.get("scheduler", {}) or {}
        self.warmup_steps = int(sched_cfg.get("warmup_steps", 0))
        self.schedule = get_schedule(sched_cfg, base_lr=1.0)  # factor-style schedule
        self.plateau = (
            ReduceLROnPlateau(
                mode=self.monitor_mode,
                factor=float(sched_cfg.get("factor", 0.5)),
                patience=int(sched_cfg.get("patience", 8)),
            )
            if sched_cfg.get("name") == "plateau"
            else None
        )
        self.early_stopping = (
            EarlyStopping(patience=int(config["early_stopping"]), mode=self.monitor_mode)
            if config.get("early_stopping")
            else None
        )

        self.tx = get_optimizer(
            opt_cfg, gradient_clip_val=float(config.get("gradient_clip_val", 0.0))
        )
        loss_module = LossModule(config.get("loss"))
        # heatmap geometry for the in-step device encoder (used when the
        # loader defers heatmap encoding — FlameDataset device_heatmap: true)
        hm_stride = int(config.get("stride", 4))
        hm_radius = int(config.get("radius", 5))
        self.train_step = build_train_step(
            model,
            self.tx,
            loss_module=loss_module,
            img_size=self.img_size,
            warmup_steps=self.warmup_steps,
            heatmap_stride=hm_stride,
            heatmap_radius=hm_radius,
        )
        self.eval_step = build_eval_step(
            model,
            loss_module,
            img_size=self.img_size,
            heatmap_stride=hm_stride,
            heatmap_radius=hm_radius,
        )

        self.ckpt = CheckpointManager(
            os.path.join(self.experiment_dir, "checkpoints"),
            monitor=f"valid/{self.monitor}" if not self.monitor.startswith("valid") else self.monitor,
            mode=self.monitor_mode,
            save_top_k=int(config.get("save_top_k", 3)),
            # async: the device->host fetch of the full TrainState overlaps
            # the next epoch instead of stalling the loop
            async_save=bool(config.get("async_checkpoint", True)),
        )
        self.checkpoint_every_n_epochs = int(config.get("checkpoint_every_n_epochs", 1))
        # Fail-fast + mid-epoch validation (reference: PL's num_sanity_val_steps
        # default and Trainer(val_check_interval=...), train/utils.py:70-77):
        # sanity_val_steps runs K val batches through the eval step BEFORE any
        # training so a broken val pipeline or metric-key typo surfaces
        # immediately, not after epoch 1; val_check_interval is either an int
        # (validate every N train steps) or a float fraction of an epoch
        # (resolved once the first epoch establishes the epoch length).
        self.sanity_val_steps = int(config.get("sanity_val_steps", 2))
        self.val_check_interval = config.get("val_check_interval")
        if isinstance(self.val_check_interval, float) and not (
            0.0 < self.val_check_interval <= 1.0
        ):
            raise ValueError(
                f"val_check_interval={self.val_check_interval}: a float must "
                "be a fraction of an epoch in (0, 1]; pass an int for a step "
                "count"
            )
        # validate every N epochs (PL Trainer(check_val_every_n_epoch=...),
        # reference train/utils.py:79)
        self.check_val_every_n_epoch = int(config.get("check_val_every_n_epoch", 1))
        if self.check_val_every_n_epoch < 1:
            raise ValueError(
                f"check_val_every_n_epoch={self.check_val_every_n_epoch}: must be >= 1"
            )
        # opt-in auto-tuners (PL auto_lr_find / auto_scale_batch_size,
        # reference train/utils.py:64,77); results land in tuned_lr /
        # tuned_batch_size when fit runs them
        self.auto_lr = bool(config.get("auto_lr", False))
        self.auto_bs = bool(config.get("auto_bs", False))
        self.tuned_lr: Optional[float] = None
        self.tuned_batch_size: Optional[int] = None
        # pred-vs-GT image panels every N steps (reference mixins.py:55-171,
        # freq from train_stage images_log_freq; 0 disables)
        self.images_log_freq = int(config.get("images_log_freq", 0))
        self._viz_forward = None
        # panel fetch + drawing runs off the step path (one worker thread,
        # <= 2 panels in flight); _drain_panels() joins it at fit end
        self._panel_pool = None
        self._panel_futs = []
        self._tb = None
        self._log_file = open(os.path.join(self.experiment_dir, "metrics.jsonl"), "a")

    # -- logging ----------------------------------------------------------
    def _tb_writer(self):
        if self._tb is None:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(os.path.join(self.experiment_dir, "tb"))
            except Exception:  # tensorboard optional
                self._tb = False
        return self._tb

    def log_metrics(self, metrics: Dict[str, float], step: int) -> None:
        tb = self._tb_writer()
        if tb:
            for k, v in metrics.items():
                tb.add_scalar(k, v, step)
        self._log_file.write(json.dumps({"step": step, **metrics}) + "\n")
        self._log_file.flush()

    def log_image_panels(self, state: TrainState, batch: Dict[str, Any], step: int) -> None:
        """TensorBoard pred-vs-GT landmark + heatmap-overlay panels on the
        current (device) batch. A dedicated jitted eval forward runs only at
        log steps, so the train step itself stays panel-free."""
        tb = self._tb_writer()
        if not tb:
            return
        from ..constants import (
            INPUT_IMAGE_KEY,
            OUTPUT_2D_LANDMARKS,
            OUTPUT_LANDMARKS_HEATMAP,
            TARGET_2D_LANDMARKS,
        )
        from .visualization import heatmap_panel_from_batch, landmarks_panel_from_batch

        if self._viz_forward is None:
            from ..constants import IMAGENET_MEAN, IMAGENET_STD
            from ..ops.preprocess import normalize_batch_jax

            norm_mode = self.config.get("normalize", "imagenet")

            def fwd(params, batch_stats, img_full, tgt_full):
                # slice to the panel rows INSIDE the jit: a host-side [:n] on a
                # device array is its own dispatch (one extra RPC per event on
                # remote-attached setups)
                n = min(8, img_full.shape[0])
                img = img_full[:n]
                x = normalize_batch_jax(img) if img.dtype == jnp.uint8 else img
                out = self.model.apply(
                    {"params": params, "batch_stats": batch_stats}, x, train=False
                )
                # panels need only: uint8 images, the max-over-channel heatmap
                # probability map, and the 2D landmarks — reduce ON DEVICE so
                # the async host fetch is ~1.6 MB, not ~16 MB
                if img.dtype == jnp.uint8:
                    img_u8 = img
                else:
                    d = img
                    if norm_mode == "imagenet":
                        d = d * jnp.asarray(IMAGENET_STD, d.dtype) + jnp.asarray(
                            IMAGENET_MEAN, d.dtype
                        )
                    elif norm_mode == "mean":
                        d = d * 0.5 + 0.5
                    img_u8 = jnp.clip(d * 255.0, 0, 255).astype(jnp.uint8)
                probs = jax.nn.sigmoid(
                    out[OUTPUT_LANDMARKS_HEATMAP].astype(jnp.float32)
                ).max(axis=-1, keepdims=True)
                hm_u8 = jnp.round(probs * 255.0).astype(jnp.uint8)
                # pack pred + GT landmarks into one (n, 272) fp32 buffer: tiny
                # trailing dims like (n, 68, 2) force a device-side layout
                # repack on fetch, and one buffer means one d2h stream
                pred_lmks = out[OUTPUT_2D_LANDMARKS].astype(jnp.float32).reshape(n, -1)
                gt_lmks = tgt_full[:n].astype(jnp.float32).reshape(n, -1)
                # the host unpack splits this buffer at its midpoint, which is
                # only valid when the model's landmark count matches the GT's
                assert pred_lmks.shape[-1] == gt_lmks.shape[-1], (
                    "panel landmark count mismatch: model predicts "
                    f"{pred_lmks.shape[-1] // 2} landmarks but the batch "
                    f"carries {gt_lmks.shape[-1] // 2}"
                )
                lmks = jnp.concatenate([pred_lmks, gt_lmks], axis=-1)
                return img_u8, hm_u8, lmks

            self._viz_forward = jax.jit(fwd)

        n = min(8, int(batch[INPUT_IMAGE_KEY].shape[0]))
        img_u8, hm_u8, lmks_packed = self._viz_forward(
            state.params,
            state.batch_stats,
            batch[INPUT_IMAGE_KEY],
            batch[TARGET_2D_LANDMARKS],
        )
        # start the device->host copies now; the worker thread below blocks on
        # them, not the training loop (total per event: 1 jit dispatch + 3
        # async copies)
        for leaf in (img_u8, hm_u8, lmks_packed):
            if hasattr(leaf, "copy_to_host_async"):
                leaf.copy_to_host_async()
        normalize = self.config.get("normalize", "imagenet")
        img_size = self.img_size

        def draw_and_write():
            lmks = np.asarray(lmks_packed)
            k = lmks.shape[-1] // 2
            host_batch = {
                INPUT_IMAGE_KEY: np.asarray(img_u8),
                TARGET_2D_LANDMARKS: lmks[:, k:].reshape(n, -1, 2),
            }
            host_out = {
                OUTPUT_2D_LANDMARKS: lmks[:, :k].reshape(n, -1, 2),
                OUTPUT_LANDMARKS_HEATMAP: np.asarray(hm_u8),
            }
            tb.add_image(
                "train/landmarks",
                landmarks_panel_from_batch(host_batch, host_out, img_size, normalize=normalize),
                step,
                dataformats="HWC",
            )
            tb.add_image(
                "train/heatmap",
                heatmap_panel_from_batch(host_batch, host_out, normalize=normalize),
                step,
                dataformats="HWC",
            )

        if self._panel_pool is None:
            self._panel_pool = ThreadPoolExecutor(1, thread_name_prefix="tb-panels")
        self._panel_futs = [f for f in self._panel_futs if not f.done()]
        while len(self._panel_futs) >= 2:  # backpressure: bound device refs held
            self._panel_futs.pop(0).result()
        self._panel_futs.append(self._panel_pool.submit(draw_and_write))

    def _drain_panels(self) -> None:
        """Join in-flight panel writes; re-raises any worker exception."""
        futs, self._panel_futs = self._panel_futs, []
        for f in futs:
            f.result()

    # -- validation --------------------------------------------------------
    def _validate(self, state, flame, max_steps: Optional[int] = None) -> Dict[str, float]:
        """Run the jitted eval step over the val loader (optionally only the
        first ``max_steps`` batches) and return ``valid/*`` metric means."""
        from ..parallel.prefetch import device_prefetch

        vacc = MetricAccumulator()
        for i, batch in enumerate(device_prefetch(self.val_loader, self.mesh)):
            if max_steps is not None and i >= max_steps:
                break
            vacc.add(self.eval_step(state, flame, batch))
        return {f"valid/{k}": v for k, v in vacc.means().items()}

    def _resolve_val_interval(self, steps_per_epoch: Optional[int]) -> Optional[int]:
        """val_check_interval in train steps: ints pass through; float
        fractions need a known epoch length (None until epoch 1)."""
        v = self.val_check_interval
        if v is None or self.val_loader is None:
            return None
        if isinstance(v, float):
            if not 0.0 < v <= 1.0:
                raise ValueError(
                    f"val_check_interval={v}: a float must be a fraction of an "
                    "epoch in (0, 1]; pass an int for a step count"
                )
            if steps_per_epoch is None:
                return None
            return max(1, int(steps_per_epoch * v))
        return max(1, int(v))

    # -- auto-tuners --------------------------------------------------------
    def _fresh_state(self, seed: int = 17) -> TrainState:
        return jax.device_put(
            init_train_state(
                self.model,
                self.tx,
                jax.random.PRNGKey(seed),
                (1, self.img_size, self.img_size, 3),
            ),
            replicated(self.mesh),
        )

    def tune_lr(
        self,
        num_steps: int = 60,
        min_lr: float = 1e-6,
        max_lr: float = 1.0,
        beta: float = 0.9,
        flame=None,
    ) -> float:
        """LR-range test (PL ``auto_lr_find`` equivalent, reference
        train/utils.py:64): up to ``num_steps`` train steps on a THROWAWAY
        state with exponentially increasing LR, tracking the EMA-smoothed
        loss and aborting once it exceeds 4x its best. The suggestion is the
        LR at the steepest descent of the smoothed curve. Never mutates the
        trainer; ``fit`` folds the suggestion into the LR multiplier."""
        if self.train_loader is None:
            raise ValueError("tune_lr requires a train_loader")
        from ..parallel.prefetch import device_prefetch

        flame = flame if flame is not None else jax.device_put(self.flame, replicated(self.mesh))
        state = self._fresh_state()
        rng = jax.random.PRNGKey(23)
        lrs = np.geomspace(min_lr, max_lr, num_steps)
        losses: list = []
        avg, best = 0.0, float("inf")

        def batches():
            while True:
                for b in device_prefetch(self.train_loader, self.mesh):
                    yield b

        for i, batch in zip(range(num_steps), batches()):
            # cancel the step's built-in linear warmup so exactly lrs[i]
            # is applied (the step scales updates by warmup * lr_mult)
            wu = min(1.0, (i + 1.0) / self.warmup_steps) if self.warmup_steps > 0 else 1.0
            factor = lrs[i] / (self.base_lr * wu)
            state, logs = self.train_step(
                state, flame, batch, rng, jnp.asarray(factor, jnp.float32)
            )
            loss = float(logs["loss"])
            if not np.isfinite(loss):
                break
            avg = beta * avg + (1.0 - beta) * loss
            smoothed = avg / (1.0 - beta ** (i + 1))
            if losses and smoothed > 4.0 * best:
                break  # diverged — the sweep has passed the useful range
            best = min(best, smoothed)
            losses.append(smoothed)
        if len(losses) < 4:
            logger.warning(
                "tune_lr: only %d finite steps — keeping base lr %.3g",
                len(losses),
                self.base_lr,
            )
            return self.base_lr
        # steepest descent of the smoothed loss over the swept (log-spaced)
        # LRs — the classic LR-range-test suggestion point
        k = int(np.argmin(np.gradient(np.asarray(losses))))
        suggested = float(lrs[k])
        logger.info(
            "tune_lr: suggested lr %.3g after %d steps (smoothed loss %.4f)",
            suggested,
            len(losses),
            losses[k],
        )
        return suggested

    def tune_batch_size(
        self, max_trials: int = 6, max_batch_size: int = 8192, flame=None
    ) -> int:
        """Batch-size probe (PL ``auto_scale_batch_size`` 'power' mode,
        reference train/utils.py:77): doubles the batch from the loader's
        current size until the compiled train step no longer fits on the
        device (OOM) or a cap is hit; returns the largest batch that ran.
        Each probe compiles one fresh step shape on a throwaway state."""
        if self.train_loader is None:
            raise ValueError("tune_batch_size requires a train_loader")
        from ..parallel.mesh import pad_batch_to_devices, shard_batch

        flame = flame if flame is not None else jax.device_put(self.flame, replicated(self.mesh))
        sample = next(iter(self.train_loader))
        sample = {k: np.asarray(v) for k, v in sample.items()}
        bs0 = int(next(iter(sample.values())).shape[0])
        rng = jax.random.PRNGKey(29)
        good: Optional[int] = None
        bs = bs0
        for _ in range(max_trials):
            bs_p = pad_batch_to_devices(bs, self.mesh)
            reps = -(-bs_p // bs0)
            probe = {
                k: np.concatenate([v] * reps, axis=0)[:bs_p] for k, v in sample.items()
            }
            try:
                state = self._fresh_state()
                state, logs = self.train_step(
                    state,
                    flame,
                    shard_batch(probe, self.mesh),
                    rng,
                    jnp.ones((), jnp.float32),
                )
                jax.block_until_ready(logs["loss"])
                del state
                good = bs_p
                logger.info("tune_batch_size: batch %d fits", bs_p)
            except Exception as e:  # noqa: BLE001 — only OOM is expected
                msg = repr(e)
                if any(
                    s in msg
                    for s in ("RESOURCE_EXHAUSTED", "Out of memory", "out of memory", "OOM")
                ):
                    logger.info("tune_batch_size: batch %d OOMs — stopping", bs_p)
                    break
                raise
            if bs_p * 2 > max_batch_size:
                break
            bs = bs_p * 2
        return good if good is not None else bs0

    # -- fit ---------------------------------------------------------------
    def fit(self, state: Optional[TrainState] = None, resume: bool = False) -> TrainState:
        if state is None:
            state = init_train_state(
                self.model,
                self.tx,
                jax.random.PRNGKey(int(self.config.get("seed", 0))),
                (1, self.img_size, self.img_size, 3),
            )
        if resume:
            try:
                state = self.ckpt.restore_last(state)
                logger.info("resumed from last checkpoint at step %d", int(state.step))
            except FileNotFoundError:
                logger.info("no checkpoint to resume from; starting fresh")
        state = jax.device_put(state, replicated(self.mesh))
        flame = jax.device_put(self.flame, replicated(self.mesh))

        rng = jax.random.PRNGKey(int(self.config.get("seed", 0)) + 1)
        lr_mult = 1.0
        # opt-in auto-tuners before any real training (reference
        # train/utils.py:64,77 — PL auto_scale_batch_size / auto_lr_find)
        if self.auto_bs and self.train_loader is not None:
            self.tuned_batch_size = self.tune_batch_size(
                max_trials=int(self.config.get("auto_bs_max_trials", 6)),
                max_batch_size=int(self.config.get("auto_bs_max", 8192)),
                flame=flame,
            )
            for loader in (self.train_loader, self.val_loader):
                if loader is not None and hasattr(loader, "set_batch_size"):
                    loader.set_batch_size(self.tuned_batch_size)
            logger.info("auto_bs: using batch size %d", self.tuned_batch_size)
        if self.auto_lr and self.train_loader is not None:
            self.tuned_lr = self.tune_lr(
                num_steps=int(self.config.get("auto_lr_steps", 60)), flame=flame
            )
            # applied as a multiplier on the optimizer's base LR so plateau /
            # schedule composition keeps working unchanged
            lr_mult = self.tuned_lr / self.base_lr
            logger.info(
                "auto_lr: lr %.3g (multiplier %.3g on base %.3g)",
                self.tuned_lr,
                lr_mult,
                self.base_lr,
            )

        # Preemption safety (TPU pods are preemptible): on SIGTERM/SIGINT,
        # finish the current step, save 'last', and exit cleanly so
        # ``fit(resume=True)`` continues from it. The reference has no
        # preemption handling at all (SURVEY.md §5).
        import signal

        preempted = {"flag": False}

        def _on_signal(signum, frame):
            logger.warning("signal %d received — checkpointing and stopping", signum)
            preempted["flag"] = True

        old_handlers = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                old_handlers[sig] = signal.signal(sig, _on_signal)
            except ValueError:  # non-main thread
                pass

        start_epoch = int(state.epoch)
        host_step = int(state.step)  # host mirror: no per-step device fetch
        steps_per_epoch: Optional[int] = None
        # best-so-far monitored value, tracked locally: reading ckpt.best
        # every epoch would flush (join) the async checkpoint writer
        best_seen = self.ckpt.best_value()
        try:
            # fail fast: K val batches through the eval step before any
            # training (PL num_sanity_val_steps; a broken val loader/metric
            # key aborts here) — inside the try so the signal handlers are
            # restored even when sanity validation raises
            if self.val_loader is not None and self.sanity_val_steps > 0:
                self._validate(state, flame, max_steps=self.sanity_val_steps)
                logger.info(
                    "sanity validation (%d steps) passed", self.sanity_val_steps
                )

            for epoch in range(start_epoch, self.max_epochs):
                state = state.replace(epoch=jnp.asarray(epoch, jnp.int32))
                t0 = time.time()
                acc = MetricAccumulator()
                n_batches = 0
                from ..parallel.prefetch import device_prefetch

                # epoch-granular schedule factor (the reference steps its LR
                # schedulers once per epoch; per-step warmup is separate)
                sched_factor = float(self.schedule(epoch)) if self.schedule else 1.0
                val_interval = self._resolve_val_interval(steps_per_epoch)
                for batch in device_prefetch(self.train_loader, self.mesh):
                    host_step += 1
                    state, logs = self.train_step(
                        state,
                        flame,
                        batch,
                        rng,
                        jnp.asarray(lr_mult * sched_factor, jnp.float32),
                    )
                    acc.add(logs)
                    n_batches += 1
                    if self.images_log_freq and host_step % self.images_log_freq == 0:
                        self.log_image_panels(state, batch, host_step)
                    if val_interval and host_step % val_interval == 0:
                        mid_val = self._validate(state, flame)
                        self.log_metrics(mid_val, host_step)
                        mv = mid_val.get(self.ckpt.monitor, float("nan"))
                        # mid-epoch improvements become held device snapshots;
                        # plateau/early-stop state machines stay epoch-granular
                        if np.isfinite(mv) and (
                            best_seen is None or self.ckpt.is_better(mv, best_seen)
                        ):
                            best_seen = mv
                            self.ckpt.hold(state, epoch, {self.ckpt.monitor: mv, **mid_val})
                    if preempted["flag"]:
                        break
                if preempted["flag"]:
                    self.ckpt.save(state, epoch, {})
                    self.ckpt.flush_held()
                    self.ckpt.flush()
                    logger.info("preemption checkpoint saved at step %d", host_step)
                    break
                train_metrics = {f"train/{k}": v for k, v in acc.means().items()}
                steps_per_epoch = n_batches

                val_metrics: Dict[str, float] = {}
                if self.val_loader is not None and (
                    (epoch + 1) % self.check_val_every_n_epoch == 0
                ):
                    val_metrics = self._validate(state, flame)

                # the LR actually applied this epoch: base * plateau-mult *
                # epoch-schedule factor * linear warmup at the current step
                warmup = (
                    min(1.0, (host_step + 1.0) / self.warmup_steps) if self.warmup_steps > 0 else 1.0
                )
                actual_lr = self.base_lr * lr_mult * sched_factor * warmup
                epoch_metrics = {**train_metrics, **val_metrics, "train/learning_rate": actual_lr}
                self.log_metrics(epoch_metrics, int(state.step))
                logger.info(
                    "epoch %d done in %.1fs (%d batches): loss=%.4f %s",
                    epoch,
                    time.time() - t0,
                    n_batches,
                    epoch_metrics.get("train/loss", float("nan")),
                    {k: round(v, 4) for k, v in val_metrics.items() if "nme" in k},
                )

                monitored_key = self.ckpt.monitor
                monitored = epoch_metrics.get(
                    monitored_key, epoch_metrics.get("train/loss", float("nan"))
                )
                is_last_epoch = epoch + 1 >= self.max_epochs
                # skipped epochs (checkpoint_every_n_epochs > 1) must still save
                # when the monitored metric improves — otherwise early stopping
                # could end the run with the best weights never on disk and
                # resume would silently lose the skipped epochs
                improved = np.isfinite(monitored) and (
                    best_seen is None or self.ckpt.is_better(monitored, best_seen)
                )
                if improved:
                    best_seen = monitored
                saved = (epoch + 1) % self.checkpoint_every_n_epochs == 0 or is_last_epoch
                if saved:
                    self.ckpt.save(state, epoch, {monitored_key: monitored, **epoch_metrics})
                elif improved:
                    # the best epochs between checkpoint intervals must not be
                    # lost, but a full disk save per improvement stalls training
                    # behind checkpoint IO: the manager keeps device snapshots
                    # and writes them at early stop, preemption, or fit end
                    self.ckpt.hold(state, epoch, {monitored_key: monitored, **epoch_metrics})

                if self.plateau is not None and np.isfinite(monitored):
                    lr_mult = self.plateau.step(monitored, self.base_lr * lr_mult)
                if (
                    self.early_stopping is not None
                    and epoch + 1 >= self.min_epochs
                    and np.isfinite(monitored)
                    and self.early_stopping.step(monitored)
                ):
                    logger.info("early stopping at epoch %d", epoch)
                    if not saved:
                        self.ckpt.save(state, epoch, {})  # refresh 'last' for resume
                    break

        finally:
            for sig, handler in old_handlers.items():
                signal.signal(sig, handler)
            # durability: held best-epoch snapshots reach disk even when
            # fit raises mid-run (loader failure, debug_nans abort, ...)
            self.ckpt.flush_held()
            try:
                self._drain_panels()
            except Exception:  # don't mask an in-flight fit exception
                logger.exception("image-panel writer failed")

        # export the best checkpoint (by the monitored metric) for inference,
        # falling back to the final state (reference exports the best too —
        # trainer.py:47-52)
        self.ckpt.flush()  # drain any in-flight async write before restoring
        export_state = state
        restored_best = False
        if self.ckpt.best is not None:
            try:
                export_state = self.ckpt.restore(state)
                restored_best = True
            except (FileNotFoundError, OSError):
                pass
        # post-fit evaluation of the best checkpoint (reference runs test_fn
        # on the best ckpt after fit — trainer.py:36-45)
        if (
            restored_best
            and self.val_loader is not None
            and self.config.get("eval_best", True)
        ):
            from ..parallel.prefetch import device_prefetch

            bacc = MetricAccumulator()
            for batch in device_prefetch(self.val_loader, self.mesh):
                bacc.add(self.eval_step(export_state, flame, batch))
            best_metrics = {f"best/{k}": v for k, v in bacc.means().items()}
            self.log_metrics(best_metrics, host_step)
            logger.info(
                "best-checkpoint eval: %s",
                {k: round(v, 4) for k, v in best_metrics.items() if "nme" in k or k == "best/loss"},
            )
        export_path = self.ckpt.export_inference(export_state)
        logger.info("exported inference checkpoint to %s", export_path)
        # optional AOT artifact (StableHLO + weights, the .trcd equivalent —
        # reference: flame_lightning_model.py:384-401); off by default since
        # the msgpack export above already serves the in-repo predictor
        if self.config.get("export_aot", False):
            from ..api.export import export_predictor

            aot_path = export_path.rsplit(".", 1)[0] + ".aot.npz"
            variables = {
                "params": export_state.params,
                "batch_stats": export_state.batch_stats,
            }
            platforms = ("tpu", "cpu") if jax.default_backend() == "tpu" else ("cpu",)
            export_predictor(
                self.model, variables, flame, aot_path,
                img_size=self.img_size, platforms=platforms,
            )
            logger.info("exported AOT inference artifact to %s", aot_path)
        return state
