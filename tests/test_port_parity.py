"""Numerical weight-port parity (the round-1 acceptance gate).

Builds the reference DAD-3DNet architecture in torch locally
(tools/torch_dad3dnet.py — pytorchcv resnet50 naming + FlameRegression
assembly, /root/reference/model_training/model/flame_regression.py:62-106),
randomly initializes it, ports the state dict through the EXPLICIT name map
(tools/port_torch_weights.py), and asserts the flax forward matches the torch
forward on random inputs to fp32 tolerance. This simultaneously cross-checks
the whole flax CNN (encoder + BiFPN + fusion + heads) against an independent
torch implementation.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from port_torch_weights import (  # noqa: E402
    backbone_name_map,
    dad3dnet_resnet50_name_map,
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

IMG = 128  # any power-of-two works; smaller than 256 to keep CPU time down


@pytest.fixture(scope="module")
def torch_net():
    torch.manual_seed(7)
    net = TorchDAD3DNet()
    randomize_bn_stats(net, seed=11)
    net.eval()
    return net


@pytest.fixture(scope="module")
def ported_flax(torch_net):
    model = create_model({"backbone": "resnet50"})
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3), jnp.float32), train=False
    )
    sd = {k: v.detach().numpy() for k, v in torch_net.state_dict().items()}
    ported, report = port_by_name_map(sd, variables, dad3dnet_resnet50_name_map())
    assert report == [], "\n".join(report)
    return model, ported


def test_name_map_is_total(ported_flax):
    """Every flax leaf must be covered by the map (nothing left random)."""
    model, ported = ported_flax
    mapped = set(dad3dnet_resnet50_name_map())
    flat = jax.tree_util.tree_flatten_with_path(ported)[0]
    missing = []
    for path, _ in flat:
        pstr = "/".join(str(getattr(e, "key", e)) for e in path)
        if pstr not in mapped:
            missing.append(pstr)
    assert missing == [], missing


def test_port_numerical_parity(torch_net, ported_flax):
    model, ported = ported_flax
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 3, IMG, IMG)).astype(np.float32)

    with torch.no_grad():
        ref = torch_net(torch.from_numpy(x))

    out = model.apply(ported, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False)

    heat = np.transpose(np.asarray(out[OUTPUT_LANDMARKS_HEATMAP]), (0, 3, 1, 2))
    np.testing.assert_allclose(heat, ref["heatmap"].numpy(), rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(out[OUTPUT_3DMM_PARAMS]), ref["params_3dmm"].numpy(), rtol=1e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out[OUTPUT_2D_LANDMARKS]), ref["landmarks"].numpy(), rtol=1e-3, atol=2e-3
    )


def test_backbone_only_port_torchvision_dialect():
    """--backbone-only: a torchvision-named resnet50 state dict lands in the
    encoder subtree (and only there), with correct layout conversion."""
    from port_torch_weights import _convert

    name_map = backbone_name_map("torchvision")
    model = create_model({"backbone": "resnet50"})
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32), train=False
    )
    # synthesize a torchvision-shaped state dict: invert the conversion from
    # each flax leaf's shape, fill with a per-key fingerprint value
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    by_path = {
        "/".join(str(getattr(e, "key", e)) for e in path): leaf for path, leaf in flat
    }
    sd = {}
    for fpath, (tkey, kind) in name_map.items():
        shape = tuple(by_path[fpath].shape)
        if kind == "conv":
            tshape = (shape[3], shape[2], shape[0], shape[1])
        elif kind == "dw":
            tshape = (shape[1], 1, 1, 1)
        elif kind == "dense":
            tshape = (shape[1], shape[0])
        else:
            tshape = shape
        sd[tkey] = np.full(tshape, float(hash(tkey) % 997) / 997.0, np.float32)

    ported, report = port_by_name_map(sd, variables, name_map, require_full=True)
    assert report == [], "\n".join(report)

    flat_p = jax.tree_util.tree_flatten_with_path(ported)[0]
    for path, leaf in flat_p:
        pstr = "/".join(str(getattr(e, "key", e)) for e in path)
        if pstr in name_map:
            tkey, kind = name_map[pstr]
            np.testing.assert_array_equal(np.asarray(leaf), _convert(sd[tkey], kind))
        else:
            assert not pstr.startswith(("params/encoder", "batch_stats/encoder")), pstr
            np.testing.assert_array_equal(np.asarray(leaf), np.asarray(by_path[pstr]))


@pytest.fixture(scope="module")
def torch_mobilenet():
    torch.manual_seed(13)
    net = TorchDAD3DNet(backbone="mobilenet_w1")
    randomize_bn_stats(net, seed=17)
    net.eval()
    return net


@pytest.fixture(scope="module")
def ported_flax_mobilenet(torch_mobilenet):
    from port_torch_weights import dad3dnet_name_map

    model = create_model({"backbone": "mobilenet_w1"})
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3), jnp.float32), train=False
    )
    sd = {k: v.detach().numpy() for k, v in torch_mobilenet.state_dict().items()}
    ported, report = port_by_name_map(sd, variables, dad3dnet_name_map("mobilenet_w1"))
    assert report == [], "\n".join(report)
    return model, ported


def test_mobilenet_name_map_is_total(ported_flax_mobilenet):
    """Every mobilenet flax leaf must be covered (nothing left random) —
    same first-class guarantee resnet50 has (reference encoders.py:51-54)."""
    from port_torch_weights import dad3dnet_name_map

    model, ported = ported_flax_mobilenet
    mapped = set(dad3dnet_name_map("mobilenet_w1"))
    flat = jax.tree_util.tree_flatten_with_path(ported)[0]
    missing = []
    for path, _ in flat:
        pstr = "/".join(str(getattr(e, "key", e)) for e in path)
        if pstr not in mapped:
            missing.append(pstr)
    assert missing == [], missing


def test_mobilenet_port_numerical_parity(torch_mobilenet, ported_flax_mobilenet):
    """flax mobilenet_w1 DAD-3DNet == torch mirror to fp32 tolerance."""
    model, ported = ported_flax_mobilenet
    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 3, IMG, IMG)).astype(np.float32)

    with torch.no_grad():
        ref = torch_mobilenet(torch.from_numpy(x))

    out = model.apply(ported, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False)

    heat = np.transpose(np.asarray(out[OUTPUT_LANDMARKS_HEATMAP]), (0, 3, 1, 2))
    np.testing.assert_allclose(heat, ref["heatmap"].numpy(), rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(out[OUTPUT_3DMM_PARAMS]), ref["params_3dmm"].numpy(), rtol=1e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out[OUTPUT_2D_LANDMARKS]), ref["landmarks"].numpy(), rtol=1e-3, atol=2e-3
    )
