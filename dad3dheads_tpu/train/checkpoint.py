"""Checkpoint manager: top-k by monitored metric + last + resume.

Behavioral spec: /root/reference/model_training/train/callbacks/
model_checkpoint.py:16-51 — keep the k best checkpoints by a monitored metric
(default valid reprojection NME, min), always keep last, metric-keyed
filenames, weights-only top-k (like the reference's ``weights_only``); plus
warm-start loading (model/utils.py:15-29). The reference never wires
optimizer-state resume; here 'last' round-trips the full TrainState (params,
batch stats, optimizer state, step/epoch), and ``export_inference`` writes
the variables-only msgpack the predictor loads — the TorchScript-export
equivalent (trainer.py:47-52).

Async mode (``async_save=True``): ``save`` snapshots the state with a
device-side copy (new buffers, so the train step's donated-state buffers are
never read after invalidation) and hands serialization + file IO to a single
writer thread — the device->host transfer (hundreds of MB of optimizer state)
overlaps the next epoch instead of stalling the loop. ``flush()`` drains the
writer; ``best``/``restore`` flush implicitly.
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


_jit_tree_copy = None


def _device_snapshot(tree):
    """Copy every jax.Array leaf into fresh device buffers (async dispatch).

    One jitted call for the whole tree: per-leaf ``jnp.copy`` costs one
    dispatch per leaf (hundreds of round trips on a remote attachment, which
    measurably stalled the fit loop on every held best epoch); a single jit
    copies everything in one executable launch."""
    import jax
    import jax.numpy as jnp

    global _jit_tree_copy
    if _jit_tree_copy is None:
        _jit_tree_copy = jax.jit(lambda t: jax.tree_util.tree_map(jnp.copy, t))

    leaves = jax.tree_util.tree_leaves(tree)
    if leaves and all(isinstance(x, jax.Array) for x in leaves):
        return _jit_tree_copy(tree)
    return jax.tree_util.tree_map(
        lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x, tree
    )


class CheckpointManager:
    def __init__(
        self,
        directory: str,
        monitor: str = "metrics/reproject_nme_2d",
        mode: str = "min",
        save_top_k: int = 3,
        save_last: bool = True,
        async_save: bool = False,
        weights_only_top_k: bool = True,
    ):
        assert mode in ("min", "max")
        self.directory = directory
        self.monitor = monitor
        self.mode = mode
        self.save_top_k = save_top_k
        self.save_last = save_last
        self.async_save = async_save
        self.weights_only_top_k = weights_only_top_k
        os.makedirs(directory, exist_ok=True)
        self._registry_path = os.path.join(directory, "registry.json")
        self._registry: List[Dict[str, Any]] = []
        if os.path.isfile(self._registry_path):
            with open(self._registry_path) as f:
                self._registry = json.load(f)
        self._executor = None
        self._pending = None
        # between-interval best epochs held as device snapshots (see hold())
        self._held: List[tuple] = []

    # -- internals ---------------------------------------------------------
    def _write_bytes(self, data: bytes, path: str) -> None:
        with open(path, "wb") as f:
            f.write(data)

    def _flush_registry(self) -> None:
        with open(self._registry_path, "w") as f:
            json.dump(self._registry, f, indent=2)

    def _is_better(self, a: float, b: float) -> bool:
        return a < b if self.mode == "min" else a > b

    def _weights_of(self, state):
        if hasattr(state, "params") and hasattr(state, "batch_stats"):
            return {"params": state.params, "batch_stats": state.batch_stats}
        return state

    def _save_impl(
        self, state, epoch: int, metrics: Dict[str, float], update_last: bool = True
    ) -> Optional[str]:
        if self.save_last and update_last:
            self._write_bytes(
                serialization.to_bytes(state), os.path.join(self.directory, "last.msgpack")
            )

        value = float(metrics.get(self.monitor, np.nan))
        path = None
        if not np.isnan(value):
            fname = _sanitize(f"epoch={epoch}_{self.monitor}={value:.4f}") + ".msgpack"
            path = os.path.join(self.directory, fname)
            payload = self._weights_of(state) if self.weights_only_top_k else state
            self._write_bytes(serialization.to_bytes(payload), path)
            self._registry.append(
                {
                    "path": path,
                    "epoch": epoch,
                    "value": value,
                    "weights_only": bool(self.weights_only_top_k),
                }
            )
            self._registry.sort(key=lambda e: e["value"], reverse=(self.mode == "max"))
            while len(self._registry) > self.save_top_k:
                evicted = self._registry.pop()
                if evicted["path"] != path and os.path.isfile(evicted["path"]):
                    os.remove(evicted["path"])
                if evicted["path"] == path:
                    path = None
            self._flush_registry()
        return path

    # -- public API --------------------------------------------------------
    def save(
        self,
        state,
        epoch: int,
        metrics: Dict[str, float],
        update_last: bool = True,
        presnapshotted: bool = False,
    ) -> Optional[str]:
        """Save if within the top-k; refresh 'last' unless ``update_last`` is
        False (used to flush a held best-epoch snapshot without clobbering
        the resume state). Synchronous mode returns the new top-k path (None
        if not top-k); async mode snapshots the state on device, queues the
        write, and returns None. ``presnapshotted`` skips the device copy for
        payloads hold() already copied."""
        if not self.async_save:
            return self._save_impl(state, epoch, metrics, update_last)

        snapshot = state if presnapshotted else _device_snapshot(state)
        from concurrent.futures import ThreadPoolExecutor

        if self._executor is None:
            self._executor = ThreadPoolExecutor(1)
        self.flush()  # at most one write in flight
        self._pending = self._executor.submit(
            self._save_impl, snapshot, epoch, dict(metrics), update_last
        )
        return None

    def hold(self, state, epoch: int, metrics: Dict[str, float]) -> None:
        """Keep a between-interval best epoch as a DEVICE snapshot.

        No host IO happens here (a full disk save per improving epoch was
        measured to collapse fit throughput 1,011 -> 36 img/s behind slow
        checkpoint IO); up to ``save_top_k`` snapshots stay in device memory,
        sorted by the monitored value, and ``flush_held`` writes them into
        the top-k registry at interval boundaries, early stop, preemption,
        or fit end."""
        value = float(metrics.get(self.monitor, np.nan))
        if np.isnan(value):
            return
        payload = self._weights_of(state) if self.weights_only_top_k else state
        self._held.append((_device_snapshot(payload), epoch, dict(metrics), value))
        self._held.sort(key=lambda e: e[3], reverse=(self.mode == "max"))
        del self._held[self.save_top_k :]

    def flush_held(self) -> None:
        """Write every held best-epoch snapshot into the top-k registry
        (never touching 'last' — it belongs to the newest state)."""
        held, self._held = self._held, []
        for snap, ep, met, _ in held:
            self.save(snap, ep, met, update_last=False, presnapshotted=True)

    def flush(self) -> None:
        """Drain any in-flight async write (re-raises writer errors)."""
        if self._pending is not None:
            pending, self._pending = self._pending, None
            pending.result()

    @property
    def best(self) -> Optional[Dict[str, Any]]:
        self.flush()
        return self._registry[0] if self._registry else None

    def is_better(self, a: float, b: float) -> bool:
        """True if ``a`` beats ``b`` under the configured mode."""
        return self._is_better(a, b)

    def best_value(self) -> Optional[float]:
        """Best monitored value WITHOUT draining the async writer (reading
        ``best`` every epoch would stall training behind slow checkpoint IO;
        an in-flight save can make this at most one entry stale)."""
        return self._registry[0]["value"] if self._registry else None

    @staticmethod
    def _on_device(tree):
        """from_bytes yields host numpy leaves; put them on device once so
        consumers that call jitted functions in a loop (post-fit best eval,
        resumed training) don't re-upload the state every call."""
        import jax
        import jax.numpy as jnp

        return jax.tree_util.tree_map(jnp.asarray, tree)

    def restore(self, state_template, path: Optional[str] = None):
        """Load a checkpoint into the structure of ``state_template``.

        Weights-only top-k checkpoints restore params/batch_stats into the
        template and keep its optimizer state/step."""
        self.flush()
        entry = None
        if path is None:
            if self.best is not None:
                entry = self.best
                path = entry["path"]
            else:
                path = os.path.join(self.directory, "last.msgpack")
        else:
            entry = next((e for e in self._registry if e["path"] == path), None)
        with open(path, "rb") as f:
            data = f.read()
        if entry is not None and entry.get("weights_only"):
            weights = self._on_device(
                serialization.from_bytes(self._weights_of(state_template), data)
            )
            if hasattr(state_template, "replace"):
                return state_template.replace(
                    params=weights["params"], batch_stats=weights["batch_stats"]
                )
            return weights
        return self._on_device(serialization.from_bytes(state_template, data))

    def restore_last(self, state_template):
        self.flush()
        with open(os.path.join(self.directory, "last.msgpack"), "rb") as f:
            return self._on_device(serialization.from_bytes(state_template, f.read()))

    def export_inference(self, state, path: Optional[str] = None) -> str:
        """Write the variables-only msgpack consumed by FaceMeshPredictor."""
        from ..api.predictor import save_predictor_checkpoint

        variables = {"params": state.params, "batch_stats": state.batch_stats}
        return save_predictor_checkpoint(
            variables, path or os.path.join(self.directory, "dad_3dnet.msgpack")
        )
