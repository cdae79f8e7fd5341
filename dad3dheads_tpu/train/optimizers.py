"""Optimizer factory (optax).

Behavioral spec: /root/reference/model_training/train/optimizers.py:20-38 —
name -> optimizer map (adam/adamw/sgd) built from a config dict; defaults
match the reference configs (adam lr 1e-4,
config/optimizer/adam.yaml). Gradient clipping comes from the trainer config
(``gradient_clip_val``, train/utils.py:68) and is composed here as an optax
chain so it runs inside the jitted update.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import optax


def get_optimizer(
    config: Optional[Dict[str, Any]] = None,
    learning_rate: Optional[Any] = None,
    gradient_clip_val: float = 0.0,
) -> optax.GradientTransformation:
    """Build an optax optimizer from a config dict.

    config keys: name (adam|adamw|sgd|radam|lamb), lr, weight_decay, momentum,
    nesterov, eps, betas. ``learning_rate`` overrides config["lr"] and may be
    an optax schedule.
    """
    config = dict(config or {})
    name = config.pop("name", "adam").lower()
    lr = learning_rate if learning_rate is not None else config.pop("lr", 1e-4)
    config.pop("lr", None)
    weight_decay = config.pop("weight_decay", 0.0)
    eps = config.pop("eps", 1e-8)
    betas = config.pop("betas", (0.9, 0.999))
    momentum = config.pop("momentum", 0.9)
    nesterov = config.pop("nesterov", False)

    if name == "adam":
        tx = optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps)
        if weight_decay:
            tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    elif name == "adamw":
        tx = optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay)
    elif name == "sgd":
        tx = optax.sgd(lr, momentum=momentum, nesterov=nesterov)
        if weight_decay:
            tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    elif name == "radam":
        tx = optax.radam(lr, b1=betas[0], b2=betas[1], eps=eps)
    elif name == "lamb":
        tx = optax.lamb(lr, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay)
    else:
        raise KeyError(f"Unsupported optimizer {name!r}")

    if gradient_clip_val and gradient_clip_val > 0:
        tx = optax.chain(optax.clip_by_global_norm(gradient_clip_val), tx)
    return tx
