"""Cross-cutting utilities: logging, numeric sanitizers, profiling.

Aux-subsystem parity (SURVEY.md §5):
  - The reference enables torch's autograd anomaly detection globally
    (/root/reference/train.py:15); the JAX analogue is ``enable_nan_debugging``
    (jax_debug_nans/jax_debug_infs), plus the fp32 geometry islands already
    pinned in core.lbs.
  - The reference's only deploy tracing is torch.jit.trace export; here
    ``profile_trace`` wraps ``jax.profiler`` so any region can be captured
    for TensorBoard/XProf — a capability the reference lacks.
  - ``create_logger`` mirrors the coloredlogs console factory
    (model_training/utils.py:22-39) without the dependency.
"""

from __future__ import annotations

import contextlib
import logging
import os
from typing import Iterator

import yaml

_LOG_FORMAT = "%(asctime)s %(name)s %(levelname)s - %(message)s - %(filename)s:%(lineno)d"


def create_logger(name: str, msg_format: str = "") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter(msg_format or _LOG_FORMAT))
        logger.addHandler(handler)
    logger.setLevel(logging.DEBUG if os.environ.get("DEBUG") else logging.INFO)
    return logger


def load_yaml(path: str) -> dict:
    with open(path) as f:
        return yaml.safe_load(f)


def get_relative_path(x: str, rel_to: str) -> str:
    return os.path.join(os.path.dirname(rel_to), x)


def enable_nan_debugging(infs: bool = True) -> None:
    """Fail fast on NaN (and optionally inf) production inside jitted code —
    the torch.autograd.set_detect_anomaly(True) analogue."""
    import jax

    jax.config.update("jax_debug_nans", True)
    if infs:
        jax.config.update("jax_debug_infs", True)


@contextlib.contextmanager
def profile_trace(log_dir: str, *, host_tracer_level: int = 2) -> Iterator[None]:
    """Capture a jax.profiler trace of the enclosed region (viewable in
    TensorBoard's profile tab / XProf)."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir, create_perfetto_link=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named profiler region for the trace timeline."""
    import jax

    return jax.profiler.TraceAnnotation(name)


def enable_compilation_cache(path: str | None = None) -> None:
    """Turn on JAX's persistent compilation cache for CLI invocations.

    Every CLI process pays the full XLA compile otherwise (measured 27.4 s ->
    7.6 s for the flagship forward on the tunneled TPU with the cache warm).
    Opt out with DAD3D_NO_COMPILE_CACHE=1. Safe to call unconditionally —
    failures (read-only home, old jax) degrade to uncached compiles."""
    if os.environ.get("DAD3D_NO_COMPILE_CACHE", "").lower() not in ("", "0", "false"):
        return
    import jax

    path = path or os.path.join(
        os.path.expanduser("~"), ".cache", "dad3dheads_tpu", "jax"
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # noqa: BLE001 — cache is an optimization, never fatal
        logging.getLogger(__name__).debug("compilation cache unavailable", exc_info=True)
