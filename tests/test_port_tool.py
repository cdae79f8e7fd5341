"""Weight-port tool: role partitioning must keep BN stats and affine params
in their own lanes (regression for the greedy-scramble bug)."""

import numpy as np
import jax
import jax.numpy as jnp

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from port_torch_weights import convert_tensor, port  # noqa: E402


def test_port_partitions_bn_roles():
    C = 8
    torch_sd = {
        "block.conv.weight": np.arange(C * 3 * 3 * 3, dtype=np.float32).reshape(C, 3, 3, 3),
        "block.bn.weight": np.full((C,), 2.0, np.float32),     # gamma
        "block.bn.bias": np.full((C,), 3.0, np.float32),       # beta
        "block.bn.running_mean": np.full((C,), 4.0, np.float32),
        "block.bn.running_var": np.full((C,), 5.0, np.float32),
        "block.bn.num_batches_tracked": np.asarray(7, np.int64),
    }
    variables = {
        "params": {
            "Conv_0": {"kernel": jnp.zeros((3, 3, 3, C))},
            "BatchNorm_0": {"scale": jnp.zeros((C,)), "bias": jnp.zeros((C,))},
        },
        "batch_stats": {"BatchNorm_0": {"mean": jnp.zeros((C,)), "var": jnp.ones((C,))}},
    }
    ported, report = port(torch_sd, variables)
    assert report == [], report
    np.testing.assert_array_equal(np.asarray(ported["params"]["BatchNorm_0"]["scale"]), 2.0)
    np.testing.assert_array_equal(np.asarray(ported["params"]["BatchNorm_0"]["bias"]), 3.0)
    np.testing.assert_array_equal(np.asarray(ported["batch_stats"]["BatchNorm_0"]["mean"]), 4.0)
    np.testing.assert_array_equal(np.asarray(ported["batch_stats"]["BatchNorm_0"]["var"]), 5.0)
    # conv kernel transposed OIHW -> HWIO
    np.testing.assert_array_equal(
        np.asarray(ported["params"]["Conv_0"]["kernel"]),
        np.transpose(torch_sd["block.conv.weight"], (2, 3, 1, 0)),
    )


def test_convert_tensor_layouts():
    conv = np.zeros((16, 4, 3, 3))
    assert convert_tensor(conv).shape == (3, 3, 4, 16)
    dense = np.zeros((10, 20))
    assert convert_tensor(dense).shape == (20, 10)
    vec = np.zeros((7,))
    assert convert_tensor(vec).shape == (7,)
