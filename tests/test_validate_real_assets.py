"""tools/validate_real_assets.py — the one-command gauntlet a user with
licensed assets runs (VERDICT r3 #10). Exercised here with synthetic assets
in the REAL license formats: a FLAME-2020-layout pickle and a TorchScript
.trcd trace of the torch mirror, both built the same way the format tests
build them (tests/test_flame_pkl.py, tests/test_trcd_ingestion.py).

Reference counterparts: model_training/model/flame.py:124-180 (FLAME pkl
consumption), predictor.py:22-65 (.trcd load).
"""

import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from dad3dheads_tpu import assets  # noqa: E402

REPO = os.path.join(os.path.dirname(__file__), "..")
IMG = 128


@pytest.fixture(scope="module")
def flame_pkl(tmp_path_factory):
    from tests.test_flame_pkl import _as_flame2020_pickle

    m = assets.synthesize_flame_model()
    path = tmp_path_factory.mktemp("assets") / "flame2020.pkl"
    with open(path, "wb") as f:
        pickle.dump(_as_flame2020_pickle(m), f, protocol=2)
    return str(path)


@pytest.fixture(scope="module")
def trcd(tmp_path_factory):
    from torch_dad3dnet import TorchDAD3DNet, randomize_bn_stats

    torch.manual_seed(3)
    net = TorchDAD3DNet()
    randomize_bn_stats(net, seed=4)
    net.eval()
    with torch.no_grad():
        traced = torch.jit.trace(
            net, torch.zeros(1, 3, IMG, IMG), check_trace=False, strict=False
        )
    path = tmp_path_factory.mktemp("assets") / "model.trcd"
    traced.save(str(path))
    return str(path)


def test_validate_tool_passes_on_valid_assets(flame_pkl, trcd, tmp_path):
    """Both asset kinds supplied at once -> every check PASSes, exit 0, and
    the ported msgpack is written."""
    out = str(tmp_path / "ported.msgpack")
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "validate_real_assets.py"),
            "--flame-pkl", flame_pkl,
            "--trcd", trcd,
            "--img-size", str(IMG),
            "--out", out,
        ],
        capture_output=True,
        text=True,
        # JAX_PLATFORMS alone is ignored (the axon TPU plugin prepends
            # itself); DAD3D_PLATFORM forces CPU via jax.config in the
            # package __init__ — without it this subprocess attaches to
            # the tunneled TPU and can stall minutes in client handoff
            env={**os.environ, "JAX_PLATFORMS": "cpu", "DAD3D_PLATFORM": "cpu"},
        timeout=1200,
    )
    sys.stdout.write(proc.stdout[-2000:])
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "FAIL" not in proc.stdout
    assert proc.stdout.count("[PASS]") == 6, proc.stdout
    assert os.path.exists(out)


def test_validate_tool_fails_loudly_on_bad_asset(tmp_path):
    """A corrupt pickle must produce a FAIL verdict and exit 1 — not a
    silent pass or a stack-trace-only crash."""
    bad = tmp_path / "bad.pkl"
    with open(bad, "wb") as f:
        pickle.dump({"not": "flame"}, f)
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "validate_real_assets.py"),
            "--flame-pkl", str(bad),
        ],
        capture_output=True,
        text=True,
        # JAX_PLATFORMS alone is ignored (the axon TPU plugin prepends
            # itself); DAD3D_PLATFORM forces CPU via jax.config in the
            # package __init__ — without it this subprocess attaches to
            # the tunneled TPU and can stall minutes in client handoff
            env={**os.environ, "JAX_PLATFORMS": "cpu", "DAD3D_PLATFORM": "cpu"},
        timeout=600,
    )
    assert proc.returncode == 1
    assert "[FAIL]" in proc.stdout
