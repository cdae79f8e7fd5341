"""Port reference PyTorch weights (Lightning checkpoint or TorchScript .trcd)
into this framework's flax parameter layout.

The reference's deployable artifact is a TorchScript trace
(/root/reference/predictor.py:72, trainer.py:47-52) and its training
checkpoints are Lightning state dicts with a ``model.`` prefix
(model/utils.py:15-29). This tool maps every torch tensor to the
corresponding flax parameter (NCHW->HWIO conv kernels, (out,in)->(in,out)
dense kernels, BN scale/bias/moving stats) through an EXPLICIT per-layer name
map for the resnet50 flagship assembly — no shape guessing — and writes the
predictor msgpack. Numerical parity of the mapping is proven by
tests/test_port_parity.py against a locally built torch reference model
(tools/torch_dad3dnet.py).

Usage:
  # full DAD-3DNet checkpoint (reference FlameRegression naming):
  python tools/port_torch_weights.py --torch ckpt.trcd --out dad_3dnet.msgpack
  # ImageNet-pretrained resnet50 backbone only (pytorchcv or torchvision
  # state dict; the rest of the network stays randomly initialized):
  python tools/port_torch_weights.py --torch resnet50.pth \
      --backbone-only pytorchcv --out warmstart.msgpack

A greedy shape-pool fallback (--greedy) remains for non-resnet50 layouts; it
pairs identically-shaped layers by traversal order and MUST be validated
numerically after use.
"""

from __future__ import annotations

import argparse
import sys
from typing import Any, Dict, List, Tuple

import numpy as np

RESNET50_STAGE_UNITS = (3, 4, 6, 3)
MOBILENET_STAGE_UNITS = (1, 2, 2, 6, 2)
BIFPN_NODES = ("p3_td", "p4_td", "p5_td", "p6_td", "p4_out", "p5_out", "p6_out", "p7_out")


def _convert(value: np.ndarray, kind: str) -> np.ndarray:
    if kind == "conv":  # OIHW -> HWIO
        return np.transpose(value, (2, 3, 1, 0))
    if kind == "dense":  # (out, in) -> (in, out)
        return value.T
    if kind == "dw":  # depthwise 1x1 (C,1,1,1) -> per-channel scale (1, C)
        return value.reshape(1, -1)
    return value


def _resnet50_encoder_entries(flax_prefix: str, torch_prefix: str) -> Dict[str, Tuple[str, str]]:
    """Explicit map for the five-stage pytorchcv resnet50 feature extractor
    (reference wraps it at model_training/model/encoders.py:20-31)."""
    m: Dict[str, Tuple[str, str]] = {}

    def conv_bn(fp: str, tp: str) -> None:
        m[f"params/{fp}/Conv_0/kernel"] = (f"{tp}.conv.weight", "conv")
        m[f"params/{fp}/BatchNorm_0/scale"] = (f"{tp}.bn.weight", "id")
        m[f"params/{fp}/BatchNorm_0/bias"] = (f"{tp}.bn.bias", "id")
        m[f"batch_stats/{fp}/BatchNorm_0/mean"] = (f"{tp}.bn.running_mean", "id")
        m[f"batch_stats/{fp}/BatchNorm_0/var"] = (f"{tp}.bn.running_var", "id")

    conv_bn(f"{flax_prefix}/init_block/ConvBN_0", f"{torch_prefix}.init_block.conv")
    for s, units in enumerate(RESNET50_STAGE_UNITS, start=1):
        for u in range(units):
            fp = f"{flax_prefix}/stage{s}/Bottleneck_{u}"
            tp = f"{torch_prefix}.stage{s}.unit{u + 1}"
            for i in range(3):
                conv_bn(f"{fp}/ConvBN_{i}", f"{tp}.body.conv{i + 1}")
            if u == 0:  # the only unit with a projection shortcut
                conv_bn(f"{fp}/ConvBN_3", f"{tp}.identity_conv")
    return m


def _torchvision_encoder_entries(flax_prefix: str) -> Dict[str, Tuple[str, str]]:
    """torchvision.models.resnet50 state-dict naming (conv1/bn1,
    layer{1-4}.{i}.conv{1-3}/bn{1-3}, downsample.{0,1}). Same architecture and
    stride placement (v1.5: stride on conv2) as pytorchcv's resnet50."""
    m: Dict[str, Tuple[str, str]] = {}

    def conv_bn(fp: str, conv_key: str, bn_key: str) -> None:
        m[f"params/{fp}/Conv_0/kernel"] = (f"{conv_key}.weight", "conv")
        m[f"params/{fp}/BatchNorm_0/scale"] = (f"{bn_key}.weight", "id")
        m[f"params/{fp}/BatchNorm_0/bias"] = (f"{bn_key}.bias", "id")
        m[f"batch_stats/{fp}/BatchNorm_0/mean"] = (f"{bn_key}.running_mean", "id")
        m[f"batch_stats/{fp}/BatchNorm_0/var"] = (f"{bn_key}.running_var", "id")

    conv_bn(f"{flax_prefix}/init_block/ConvBN_0", "conv1", "bn1")
    for s, units in enumerate(RESNET50_STAGE_UNITS, start=1):
        for u in range(units):
            fp = f"{flax_prefix}/stage{s}/Bottleneck_{u}"
            tp = f"layer{s}.{u}"
            for i in range(3):
                conv_bn(f"{fp}/ConvBN_{i}", f"{tp}.conv{i + 1}", f"{tp}.bn{i + 1}")
            if u == 0:
                conv_bn(f"{fp}/ConvBN_3", f"{tp}.downsample.0", f"{tp}.downsample.1")
    return m


def _mobilenet_encoder_entries(flax_prefix: str, torch_prefix: str) -> Dict[str, Tuple[str, str]]:
    """Explicit map for the five-stage pytorchcv mobilenet_w1 feature
    extractor (reference model_training/model/encoders.py:51-54; channel
    table backbone.yaml 64/128/256/512/1024). flax layout:
    models/mobilenet.py — ``init_conv``/``init_bn`` then ``s{S}_{u}`` blocks
    with Conv_0/BatchNorm_0 (depthwise) + Conv_1/BatchNorm_1 (pointwise)."""
    m: Dict[str, Tuple[str, str]] = {}

    def bn(fp: str, tp: str) -> None:
        m[f"params/{fp[0]}/{fp[1]}/scale"] = (f"{tp}.weight", "id")
        m[f"params/{fp[0]}/{fp[1]}/bias"] = (f"{tp}.bias", "id")
        m[f"batch_stats/{fp[0]}/{fp[1]}/mean"] = (f"{tp}.running_mean", "id")
        m[f"batch_stats/{fp[0]}/{fp[1]}/var"] = (f"{tp}.running_var", "id")

    m[f"params/{flax_prefix}/init_conv/kernel"] = (f"{torch_prefix}.init_block.conv.weight", "conv")
    bn((flax_prefix, "init_bn"), f"{torch_prefix}.init_block.bn")
    for s, units in enumerate(MOBILENET_STAGE_UNITS, start=1):
        for u in range(units):
            fp = f"{flax_prefix}/s{s}_{u}"
            tp = f"{torch_prefix}.stage{s}.unit{u + 1}"
            m[f"params/{fp}/Conv_0/kernel"] = (f"{tp}.dw_conv.conv.weight", "conv")
            bn((fp, "BatchNorm_0"), f"{tp}.dw_conv.bn")
            m[f"params/{fp}/Conv_1/kernel"] = (f"{tp}.pw_conv.conv.weight", "conv")
            bn((fp, "BatchNorm_1"), f"{tp}.pw_conv.bn")
    return m


def dad3dnet_name_map(backbone: str = "resnet50") -> Dict[str, Tuple[str, str]]:
    """flax path ('/'-joined, collection-prefixed) -> (torch state-dict key,
    layout conversion) for the full reference FlameRegression assembly
    (model_training/model/flame_regression.py:62-85) with either supported
    backbone (encoder_mapping, encoders.py:51-54)."""
    if backbone == "resnet50":
        m = _resnet50_encoder_entries("encoder", "encoder.model")
    elif backbone == "mobilenet_w1":
        m = _mobilenet_encoder_entries("encoder", "encoder.model")
    else:
        raise KeyError(f"unknown backbone {backbone!r}")

    def bn(fp: str, tp: str) -> None:
        m[f"params/{fp}/scale"] = (f"{tp}.weight", "id")
        m[f"params/{fp}/bias"] = (f"{tp}.bias", "id")
        fp_stats = fp.replace("/BatchNorm_0", "")
        m[f"batch_stats/{fp_stats}/BatchNorm_0/mean"] = (f"{tp}.running_mean", "id")
        m[f"batch_stats/{fp_stats}/BatchNorm_0/var"] = (f"{tp}.running_var", "id")

    for p in ("p3", "p4", "p5", "p6"):
        m[f"params/bifpn/{p}/kernel"] = (f"bifpn.{p}.weight", "conv")
        m[f"params/bifpn/{p}/bias"] = (f"bifpn.{p}.bias", "id")
    m["params/bifpn/p7/Conv_0/kernel"] = ("bifpn.p7.conv.weight", "conv")
    m["params/bifpn/p7/Conv_0/bias"] = ("bifpn.p7.conv.bias", "id")
    bn("bifpn/p7/BatchNorm_0", "bifpn.p7.bn")
    for k in range(2):
        m[f"params/bifpn/block{k}/w1"] = (f"bifpn.bifpn.{k}.w1", "id")
        m[f"params/bifpn/block{k}/w2"] = (f"bifpn.bifpn.{k}.w2", "id")
        for node in BIFPN_NODES:
            fp, tp = f"bifpn/block{k}/{node}", f"bifpn.bifpn.{k}.{node}"
            m[f"params/{fp}/depthwise_scale"] = (f"{tp}.depthwise.weight", "dw")
            m[f"params/{fp}/Conv_0/kernel"] = (f"{tp}.pointwise.weight", "conv")
            bn(f"{fp}/BatchNorm_0", f"{tp}.bn")

    m["params/heatmap_head/kernel"] = ("head.heatmap.weight", "conv")
    m["params/heatmap_head/bias"] = ("head.heatmap.bias", "id")
    m["params/fusion/Conv_0/kernel"] = ("fusion_layer.conv1x1.weight", "conv")
    m["params/fusion/Conv_0/bias"] = ("fusion_layer.conv1x1.bias", "id")
    for fh, th in (("shape_head", "shape"), ("pose_head", "pose"), ("landmarks_head", "landmarks")):
        for fd, td in (("Dense_0", "0"), ("Dense_1", "3")):
            m[f"params/{fh}/{fd}/kernel"] = (f"{th}.logit_image.{td}.weight", "dense")
            m[f"params/{fh}/{fd}/bias"] = (f"{th}.logit_image.{td}.bias", "id")
    return m


def dad3dnet_resnet50_name_map() -> Dict[str, Tuple[str, str]]:
    """Back-compat alias for the flagship map."""
    return dad3dnet_name_map("resnet50")


def backbone_name_map(dialect: str) -> Dict[str, Tuple[str, str]]:
    """Name map for an ImageNet-pretrained resnet50 backbone alone
    (reference: model/resnet_regression.yaml `pretrained: True` via
    model_training/model/encoders.py:9-39). ``pytorchcv`` expects the
    ``features.*`` key prefix of a full pytorchcv model; ``torchvision``
    expects torchvision.models.resnet50 naming."""
    if dialect == "pytorchcv":
        return _resnet50_encoder_entries("encoder", "features")
    if dialect == "torchvision":
        return _torchvision_encoder_entries("encoder")
    raise KeyError(f"unknown backbone dialect {dialect!r}")


def _flatten_paths(flax_variables) -> Tuple[list, Any]:
    import jax

    flat, treedef = jax.tree_util.tree_flatten_with_path(flax_variables)
    paths = []
    for path, leaf in flat:
        parts = []
        for entry in path:
            parts.append(str(getattr(entry, "key", getattr(entry, "idx", entry))))
        paths.append(("/".join(parts), leaf))
    return paths, treedef


def port_by_name_map(
    torch_sd: Dict[str, np.ndarray],
    flax_variables,
    name_map: Dict[str, Tuple[str, str]],
    require_full: bool = True,
) -> Tuple[Any, List[str]]:
    """Explicit port: each flax leaf named in ``name_map`` is replaced by its
    mapped torch tensor (layout-converted); leaves not in the map are kept.
    The report lists map entries whose torch key is absent, mapped tensors
    whose converted shape mismatches, and (with require_full) torch tensors
    never consumed."""
    import jax

    flat, treedef = _flatten_paths(flax_variables)
    report: List[str] = []
    consumed = set()
    new_leaves = []
    for pstr, leaf in flat:
        entry = name_map.get(pstr)
        if entry is None:
            new_leaves.append(leaf)
            continue
        tkey, kind = entry
        if tkey not in torch_sd:
            report.append(f"MISSING torch key {tkey} for flax leaf {pstr}")
            new_leaves.append(leaf)
            continue
        conv = _convert(np.asarray(torch_sd[tkey]), kind)
        if tuple(conv.shape) != tuple(leaf.shape):
            report.append(
                f"SHAPE MISMATCH {pstr}: torch {tkey} -> {conv.shape}, flax {tuple(leaf.shape)}"
            )
            new_leaves.append(leaf)
            continue
        consumed.add(tkey)
        new_leaves.append(conv.astype(np.float32))
    if require_full:
        for tkey in torch_sd:
            if tkey in consumed or tkey.endswith("num_batches_tracked"):
                continue
            report.append(f"UNUSED torch tensor {tkey} {tuple(np.asarray(torch_sd[tkey]).shape)}")
    return jax.tree_util.tree_unflatten(treedef, [l for l in new_leaves]), report


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
    ap.add_argument(
        "--backbone",
        choices=("resnet50", "mobilenet_w1"),
        default="resnet50",
        help="encoder of the checkpoint being ported (reference "
        "encoder_mapping, encoders.py:51-54)",
    )
    ap.add_argument(
        "--backbone-only",
        choices=("pytorchcv", "torchvision"),
        help="treat the input as an ImageNet-pretrained resnet50 backbone and "
        "port only the encoder (warm start); heads stay randomly initialized",
    )
    ap.add_argument(
        "--greedy",
        action="store_true",
        help="use the legacy shape-pool matcher instead of the explicit name "
        "map (for non-resnet50 layouts; validate numerically afterwards)",
    )
    args = ap.parse_args()

    sys.path.insert(0, ".")
    import jax
    import jax.numpy as jnp

    from dad3dheads_tpu.api.predictor import save_predictor_checkpoint
    from dad3dheads_tpu.models import create_model

    model = create_model({"backbone": args.backbone})
    x = jnp.zeros((1, args.img_size, args.img_size, 3), jnp.float32)
    variables = jax.jit(lambda r: model.init(r, x, train=False))(jax.random.PRNGKey(0))

    torch_sd = load_torch_state_dict(args.torch)
    if args.greedy:
        ported, report = port(torch_sd, variables)
    elif args.backbone_only:
        torch_sd = {k: v for k, v in torch_sd.items() if not k.startswith("output.")}
        ported, report = port_by_name_map(
            torch_sd, variables, backbone_name_map(args.backbone_only)
        )
    else:
        ported, report = port_by_name_map(
            torch_sd, variables, dad3dnet_name_map(args.backbone)
        )
    for line in report:
        print(line)
    print(f"{len(report)} unmatched/unused tensors")
    path = save_predictor_checkpoint(ported, args.out)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
