"""TorchScript (.trcd) ingestion — the reference's actual published artifact.

The reference ships its pretrained model as a TorchScript trace
(/root/reference/predictor.py:72 loads it; trainer.py:47-52 exports it).
These tests close the loop offline: ``torch.jit.trace`` the local torch
mirror of the architecture, save it as ``.trcd``, load it through the
``torch.jit.load`` branch of ``load_torch_state_dict``
(tools/port_torch_weights.py), port via the explicit name map, and assert
the flax forward matches the traced module numerically.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from port_torch_weights import (  # noqa: E402
    dad3dnet_resnet50_name_map,
    load_torch_state_dict,
    port_by_name_map,
)
from torch_dad3dnet import TorchDAD3DNet, randomize_bn_stats  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dad3dheads_tpu.constants import (  # noqa: E402
    OUTPUT_2D_LANDMARKS,
    OUTPUT_3DMM_PARAMS,
    OUTPUT_LANDMARKS_HEATMAP,
)
from dad3dheads_tpu.models import create_model  # noqa: E402

IMG = 128


@pytest.fixture(scope="module")
def trcd_path(tmp_path_factory):
    torch.manual_seed(21)
    net = TorchDAD3DNet()
    randomize_bn_stats(net, seed=22)
    net.eval()
    example = torch.zeros(1, 3, IMG, IMG)
    with torch.no_grad():
        # strict=False: the forward returns a dict, like the reference model
        traced = torch.jit.trace(net, example, check_trace=False, strict=False)
    path = tmp_path_factory.mktemp("trcd") / "model.trcd"
    traced.save(str(path))
    return str(path)


def test_trcd_state_dict_loads_and_ports(trcd_path):
    """The traced module's state dict round-trips through torch.jit.load and
    covers the explicit name map with nothing unmatched."""
    sd = load_torch_state_dict(trcd_path)
    model = create_model({"backbone": "resnet50"})
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3), jnp.float32), train=False
    )
    ported, report = port_by_name_map(sd, variables, dad3dnet_resnet50_name_map())
    assert report == [], "\n".join(report)


def test_trcd_port_numerical_parity(trcd_path):
    """flax forward with .trcd-ported weights == the traced module's output —
    proves the deployable-artifact format ports end to end."""
    module = torch.jit.load(trcd_path, map_location="cpu")
    sd = load_torch_state_dict(trcd_path)

    model = create_model({"backbone": "resnet50"})
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3), jnp.float32), train=False
    )
    ported, report = port_by_name_map(sd, variables, dad3dnet_resnet50_name_map())
    assert report == []

    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 3, IMG, IMG)).astype(np.float32)
    with torch.no_grad():
        ref = module(torch.from_numpy(x))

    out = model.apply(ported, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False)

    heat = np.transpose(np.asarray(out[OUTPUT_LANDMARKS_HEATMAP]), (0, 3, 1, 2))
    np.testing.assert_allclose(heat, ref["heatmap"].numpy(), rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(out[OUTPUT_3DMM_PARAMS]), ref["params_3dmm"].numpy(), rtol=1e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out[OUTPUT_2D_LANDMARKS]), ref["landmarks"].numpy(), rtol=1e-3, atol=2e-3
    )
