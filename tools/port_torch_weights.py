"""Port reference PyTorch weights (Lightning checkpoint or TorchScript .trcd)
into this framework's flax parameter layout.

The reference's deployable artifact is a TorchScript trace
(/root/reference/predictor.py:72, trainer.py:47-52) and its training
checkpoints are Lightning state dicts with a ``model.`` prefix
(model/utils.py:15-29). This tool walks a torch state dict, maps every tensor
to the corresponding flax parameter (NCHW->HWIO conv kernels, (out,in)->(in,
out) dense kernels, BN scale/bias/moving stats), and writes the predictor
msgpack.

Usage:
  python tools/port_torch_weights.py --torch ckpt.trcd --out dad_3dnet.msgpack

Note: the mapping table covers the resnet50 flagship assembly. It is
validated structurally (every flax leaf must be consumed) — numerical parity
additionally requires the real FLAME assets the reference also needs.
"""

from __future__ import annotations

import argparse
import sys
from typing import Any, Dict, List, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, "np.ndarray"]:
    import torch

    if path.endswith((".trcd", ".pt", ".jit")):
        try:
            module = torch.jit.load(path, map_location="cpu")
            sd = module.state_dict()
        except RuntimeError:
            sd = torch.load(path, map_location="cpu", weights_only=False)
    else:
        sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = {
            k[len("model.") :]: v
            for k, v in sd["state_dict"].items()
            if k.startswith("model.")
        }
    return {k: v.detach().numpy() for k, v in sd.items()}


def convert_tensor(value: np.ndarray) -> np.ndarray:
    """Layout conversion by rank: conv OIHW->HWIO (covers depthwise too),
    dense (out,in)->(in,out)."""
    if value.ndim == 4:
        return np.transpose(value, (2, 3, 1, 0))
    if value.ndim == 2:
        return value.T
    return value


def _torch_class(name: str, value: np.ndarray) -> str:
    """Role of a torch tensor: conv/dense kernels, BN gamma/beta, BN stats."""
    if name.endswith("running_mean"):
        return "mean"
    if name.endswith("running_var"):
        return "var"
    if name.endswith("num_batches_tracked"):
        return "skip"
    if value.ndim >= 2:
        return "kernel"
    if name.endswith(".weight"):
        return "scale"  # 1-D weight = BN gamma
    if name.endswith(".bias"):
        return "bias"
    return "other"


def _flax_class(path: str) -> str:
    leaf = path.rsplit("'", 2)[-2] if "'" in path else path
    if leaf in ("kernel",):
        return "kernel"
    if leaf in ("scale",):
        return "scale"
    if leaf in ("bias",):
        return "bias"
    if leaf in ("mean",):
        return "mean"
    if leaf in ("var",):
        return "var"
    return "other"


def port(torch_sd: Dict[str, np.ndarray], flax_variables) -> Tuple[Any, List[str]]:
    """Class-partitioned greedy port: tensors are first grouped by role
    (conv/dense kernel, BN scale, bias, running mean, running var) so a BN
    gamma can never land in a running-stats slot, then paired greedily by
    converted shape within each role, preserving each side's order.

    CAVEAT: within a role, layers of identical shape are paired by traversal
    order — flax sorts module names while torch keeps definition order, so a
    real checkpoint port must be validated numerically (run the predictor on
    a reference image); any unmatched leaf is reported, never silent.
    """
    import jax

    flat, treedef = jax.tree_util.tree_flatten_with_path(flax_variables)
    pools: Dict[str, List[Tuple[str, np.ndarray]]] = {}
    for tname, tval in torch_sd.items():
        cls = _torch_class(tname, tval)
        if cls != "skip":
            pools.setdefault(cls, []).append((tname, tval))
    used: Dict[str, List[bool]] = {k: [False] * len(v) for k, v in pools.items()}

    new_leaves = []
    report: List[str] = []
    for path, leaf in flat:
        pstr = jax.tree_util.keystr(path)
        cls = _flax_class(pstr)
        target_shape = tuple(leaf.shape)
        placed = None
        for i, (tname, tval) in enumerate(pools.get(cls, [])):
            if used[cls][i]:
                continue
            conv = convert_tensor(tval)
            if tuple(conv.shape) == target_shape:
                placed = conv
                used[cls][i] = True
                break
        if placed is None:
            report.append(f"UNMATCHED flax leaf {pstr} ({cls}) {target_shape}")
            new_leaves.append(leaf)
        else:
            new_leaves.append(placed.astype(np.float32))

    for cls, items in pools.items():
        for i, (tname, tval) in enumerate(items):
            if not used[cls][i]:
                report.append(f"UNUSED torch tensor {tname} ({cls}) {tuple(tval.shape)}")
    return jax.tree_util.tree_unflatten(treedef, new_leaves), report


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--torch", required=True, help="torch checkpoint / torchscript path")
    ap.add_argument("--out", required=True, help="output msgpack path")
    ap.add_argument("--img-size", type=int, default=256)
    args = ap.parse_args()

    sys.path.insert(0, ".")
    import jax
    import jax.numpy as jnp

    from dad3dheads_tpu.api.predictor import save_predictor_checkpoint
    from dad3dheads_tpu.models import create_model

    model = create_model({"backbone": "resnet50"})
    x = jnp.zeros((1, args.img_size, args.img_size, 3), jnp.float32)
    variables = jax.jit(lambda r: model.init(r, x, train=False))(jax.random.PRNGKey(0))

    torch_sd = load_torch_state_dict(args.torch)
    ported, report = port(torch_sd, variables)
    for line in report:
        print(line)
    print(f"{len(report)} unmatched/unused tensors")
    path = save_predictor_checkpoint(ported, args.out)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
