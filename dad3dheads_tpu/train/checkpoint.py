"""Checkpoint manager: top-k by monitored metric + last + resume.

Behavioral spec: /root/reference/model_training/train/callbacks/
model_checkpoint.py:16-51 — keep the k best checkpoints by a monitored metric
(default valid reprojection NME, min), always keep last, metric-keyed
filenames; plus warm-start loading (model/utils.py:15-29). The reference
never wires optimizer-state resume; here ``save``/``restore`` round-trip the
full TrainState (params, batch stats, optimizer state, step/epoch), and
``export_inference`` writes the variables-only msgpack the predictor loads —
the TorchScript-export equivalent (trainer.py:47-52).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, List, Optional

import numpy as np
from flax import serialization


def _sanitize(name: str) -> str:
    return re.sub(r"[^A-Za-z0-9_.=-]", "_", name)


class CheckpointManager:
    def __init__(
        self,
        directory: str,
        monitor: str = "metrics/reproject_nme_2d",
        mode: str = "min",
        save_top_k: int = 3,
        save_last: bool = True,
    ):
        assert mode in ("min", "max")
        self.directory = directory
        self.monitor = monitor
        self.mode = mode
        self.save_top_k = save_top_k
        self.save_last = save_last
        os.makedirs(directory, exist_ok=True)
        self._registry_path = os.path.join(directory, "registry.json")
        self._registry: List[Dict[str, Any]] = []
        if os.path.isfile(self._registry_path):
            with open(self._registry_path) as f:
                self._registry = json.load(f)

    # -- internals ---------------------------------------------------------
    def _write(self, state, path: str) -> None:
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(state))

    def _flush_registry(self) -> None:
        with open(self._registry_path, "w") as f:
            json.dump(self._registry, f, indent=2)

    def _is_better(self, a: float, b: float) -> bool:
        return a < b if self.mode == "min" else a > b

    # -- public API --------------------------------------------------------
    def save(self, state, epoch: int, metrics: Dict[str, float]) -> Optional[str]:
        """Save if within the top-k; always refresh 'last'. Returns the new
        checkpoint path (or None if not in the top-k)."""
        if self.save_last:
            self._write(state, os.path.join(self.directory, "last.msgpack"))

        value = float(metrics.get(self.monitor, np.nan))
        path = None
        if not np.isnan(value):
            fname = _sanitize(f"epoch={epoch}_{self.monitor}={value:.4f}") + ".msgpack"
            path = os.path.join(self.directory, fname)
            self._write(state, path)
            self._registry.append({"path": path, "epoch": epoch, "value": value})
            self._registry.sort(key=lambda e: e["value"], reverse=(self.mode == "max"))
            while len(self._registry) > self.save_top_k:
                evicted = self._registry.pop()
                if evicted["path"] != path and os.path.isfile(evicted["path"]):
                    os.remove(evicted["path"])
                if evicted["path"] == path:
                    path = None
            self._flush_registry()
        return path

    @property
    def best(self) -> Optional[Dict[str, Any]]:
        return self._registry[0] if self._registry else None

    def restore(self, state_template, path: Optional[str] = None):
        """Load a checkpoint into the structure of ``state_template``."""
        if path is None:
            if self.best is not None:
                path = self.best["path"]
            else:
                path = os.path.join(self.directory, "last.msgpack")
        with open(path, "rb") as f:
            return serialization.from_bytes(state_template, f.read())

    def restore_last(self, state_template):
        return self.restore(state_template, os.path.join(self.directory, "last.msgpack"))

    def export_inference(self, state, path: Optional[str] = None) -> str:
        """Write the variables-only msgpack consumed by FaceMeshPredictor."""
        from ..api.predictor import save_predictor_checkpoint

        variables = {"params": state.params, "batch_stats": state.batch_stats}
        return save_predictor_checkpoint(
            variables, path or os.path.join(self.directory, "dad_3dnet.msgpack")
        )
