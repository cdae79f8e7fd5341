"""Small glue for the CLIs: load + compose config, prepare experiment dir."""

from __future__ import annotations

from typing import Any, Dict, List, Optional

from ..train.config import load_config, prepare_experiment_dir


def load_and_prepare(path: str, overrides: Optional[List[str]] = None) -> Dict[str, Any]:
    config = load_config(path, overrides)
    prepare_experiment_dir(config)
    return config
