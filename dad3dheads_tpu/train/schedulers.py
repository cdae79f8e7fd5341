"""LR schedules.

Behavioral spec: /root/reference/model_training/train/schedulers.py —
plateau / multi_step / exponential / cosine / cyclic / flat_cosine (flat for
T_flat epochs then cosine to eta_min), plus the linear warmup the reference
applies per-step inside ``optimizer_step``
(flame_lightning_model.py:262-292).

Two kinds here:
  - pure optax schedules (step -> lr factor) for everything shape-static —
    they compose into the jitted update via ``optax.scale_by_schedule``;
  - ``ReduceLROnPlateau``, which depends on a monitored metric, runs host-side
    between epochs and feeds a scalar multiplier into the injected
    hyperparameter (optax.inject_hyperparams-free: we pass the factor down
    as a plain scalar argument of the train step).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import optax


def flat_cosine_schedule(
    base_lr: float, t_max: int, t_flat: int, eta_min: float = 0.0
) -> Callable[[Any], Any]:
    """Flat at base_lr for t_flat epochs, then cosine anneal to eta_min by
    t_max (closed form of the reference's FlatCosineAnnealingLR,
    schedulers.py:81-92)."""

    import jax.numpy as jnp

    def schedule(epoch):
        e = jnp.asarray(epoch, jnp.float32)
        denom = max(t_max - t_flat, 1)
        prog = jnp.clip((e - t_flat) / denom, 0.0, 1.0)
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * prog))
        return jnp.where(e <= t_flat, base_lr, eta_min + (base_lr - eta_min) * cos)

    return schedule


def get_schedule(
    config: Optional[Dict[str, Any]], base_lr: float, steps_per_epoch: int = 1
) -> Optional[Callable]:
    """Epoch-granular schedule from a config dict (name + params). Returns an
    optax-style ``schedule(step) -> lr``; step granularity is per-epoch to
    match the reference's epoch-stepped schedulers. Returns None for
    'plateau' (handled by ReduceLROnPlateau host-side)."""
    if not config:
        return None
    config = dict(config)
    config.pop("warmup_steps", None)
    name = config.pop("name", None)
    if name is None or name == "plateau":
        return None
    if name == "multi_step":
        milestones = sorted(config.get("milestones", []))
        gamma = config.get("gamma", 0.1)
        boundaries = {int(m) * steps_per_epoch: gamma for m in milestones}
        return optax.piecewise_constant_schedule(base_lr, boundaries)
    if name == "exponential":
        gamma = config.get("gamma", 0.95)
        return optax.exponential_decay(
            base_lr, transition_steps=steps_per_epoch, decay_rate=gamma
        )
    if name == "cosine":
        t_max = config.get("T_max", 100)
        eta_min = config.get("eta_min", 0.0)
        return optax.cosine_decay_schedule(
            base_lr, decay_steps=t_max * steps_per_epoch, alpha=eta_min / max(base_lr, 1e-12)
        )
    if name == "cyclic":
        base = config.get("base_lr", base_lr * 0.1)
        max_lr = config.get("max_lr", base_lr)
        step_up = config.get("step_size_up", 2000)
        return _triangular_cyclic(base, max_lr, step_up)
    if name == "flat_cosine":
        return flat_cosine_schedule(
            base_lr,
            t_max=config.get("T_max", 100) * steps_per_epoch,
            t_flat=config.get("T_flat", 0) * steps_per_epoch,
            eta_min=config.get("eta_min", 0.0),
        )
    raise KeyError(f"Unsupported scheduler {name!r}")


def _triangular_cyclic(base_lr: float, max_lr: float, step_size_up: int) -> Callable:
    """torch CyclicLR 'triangular' mode."""
    import jax.numpy as jnp

    def schedule(step):
        s = jnp.asarray(step, jnp.float32)
        cycle = jnp.floor(1 + s / (2 * step_size_up))
        x = jnp.abs(s / step_size_up - 2 * cycle + 1)
        return base_lr + (max_lr - base_lr) * jnp.maximum(0.0, 1.0 - x)

    return schedule


def warmup_factor(step: Any, warmup_steps: int):
    """Linear warmup multiplier: min(1, (step+1)/warmup_steps) — the
    per-step scaling the reference applies inside optimizer_step."""
    import jax.numpy as jnp

    if warmup_steps <= 0:
        return jnp.ones((), jnp.float32)
    return jnp.minimum(1.0, (jnp.asarray(step, jnp.float32) + 1.0) / warmup_steps)


class ReduceLROnPlateau:
    """Host-side plateau scheduler: multiplies the LR by ``factor`` after
    ``patience`` epochs without improvement of the monitored metric
    (torch ReduceLROnPlateau semantics; reference default patience 8,
    factor 0.5 — config/scheduler/plateau_min.yaml)."""

    def __init__(
        self,
        mode: str = "min",
        factor: float = 0.5,
        patience: int = 8,
        min_lr: float = 0.0,
        threshold: float = 1e-4,
    ):
        assert mode in ("min", "max")
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.threshold = threshold
        self.best: Optional[float] = None
        self.bad_epochs = 0
        self.multiplier = 1.0

    def _improved(self, value: float) -> bool:
        if self.best is None:
            return True
        if self.mode == "min":
            return value < self.best * (1.0 - self.threshold)
        return value > self.best * (1.0 + self.threshold)

    def step(self, value: float, current_lr: float) -> float:
        """Record an epoch metric; returns the new LR multiplier."""
        if self._improved(value):
            self.best = value
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                # the new LR is current_lr * factor (current_lr already
                # includes the accumulated multiplier)
                if current_lr * self.factor >= self.min_lr:
                    self.multiplier = self.multiplier * self.factor
                self.bad_epochs = 0
        return self.multiplier


class EarlyStopping:
    """Stop after ``patience`` epochs without improvement
    (/root/reference/model_training/train/callbacks/early_stop.py:8-18)."""

    def __init__(self, patience: int = 10, mode: str = "min", min_delta: float = 0.0):
        assert mode in ("min", "max")
        self.patience = patience
        self.mode = mode
        self.min_delta = min_delta
        self.best: Optional[float] = None
        self.bad_epochs = 0

    def step(self, value: float) -> bool:
        """Returns True if training should stop."""
        improved = (
            self.best is None
            or (self.mode == "min" and value < self.best - self.min_delta)
            or (self.mode == "max" and value > self.best + self.min_delta)
        )
        if improved:
            self.best = value
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
        return self.bad_epochs >= self.patience
