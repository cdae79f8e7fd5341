"""One-command validation gauntlet for USER-SUPPLIED licensed assets.

The repo ships synthetic FLAME stand-ins (the licensed FLAME 2020 pickle,
published .trcd weights, and DAD-3DHeads annotations are absent upstream too
— they gate on a license). A user who obtains them runs THIS to find out, in
one step, whether their assets work with the framework:

  python tools/validate_real_assets.py \
      [--flame-pkl flame.pkl]              # FLAME 2020 pickle (chumpy or not)
      [--trcd dad_3dnet.trcd]              # published TorchScript weights
      [--backbone resnet50|mobilenet_w1]   # architecture of the .trcd
      [--annotations val.json --dataset-root DIR]   # real DAD-3DHeads data
      [--out ported.msgpack]               # write the ported predictor ckpt

Each supplied asset runs its parity gauntlet (decode sanity for FLAME, full
name-map port + torch-forward numerical parity for .trcd, dataset pipeline +
GT generation for annotations) and prints a PASS/FAIL verdict per check;
exit code 0 iff everything passed.

Reference counterparts: model_training/model/flame.py:124-180 (FLAME pkl
consumption), predictor.py:22-65 (.trcd load), dad_3dheads_benchmark
(annotation scoring).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import traceback
from typing import Callable, List, Tuple

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

RESULTS: List[Tuple[str, bool, str]] = []


def check(name: str) -> Callable:
    def deco(fn):
        def run(*a, **k):
            try:
                detail = fn(*a, **k) or ""
                RESULTS.append((name, True, str(detail)))
            except Exception as e:  # noqa: BLE001 — verdict tool reports all
                RESULTS.append((name, False, f"{type(e).__name__}: {e}"))
                traceback.print_exc()
        return run
    return deco


@check("flame-pkl: loads + validates")
def check_flame_load(path: str):
    from dad3dheads_tpu import assets

    m = assets.load_flame_model(path)
    assert not m.is_synthetic
    v, _ = m.v_template.shape[0], m.faces.shape[0]
    assert m.shapedirs.shape[0] == v, (m.shapedirs.shape, v)
    assert m.j_regressor.shape == (5, v), m.j_regressor.shape
    assert m.lbs_weights.shape == (v, 5), m.lbs_weights.shape
    return f"V={v} faces={m.faces.shape[0]} shapedirs={m.shapedirs.shape}"


@check("flame-pkl: decode is finite + pose-responsive")
def check_flame_decode(path: str):
    import jax.numpy as jnp
    import numpy as np

    from dad3dheads_tpu.core.flame import FlameModel, FlameParams, flame_decode
    from dad3dheads_tpu.constants import FLAME_CONSTS

    from dad3dheads_tpu import assets

    flame = FlameModel.from_arrays(assets.load_flame_model(path))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 413)).astype(np.float32) * 0.1)
    params = FlameParams.from_3dmm(x, FLAME_CONSTS)
    v = flame_decode(flame, params)
    assert bool(jnp.all(jnp.isfinite(v))), "non-finite vertices"
    # jaw articulation must move the mesh (kinematic chain is alive)
    v2 = flame_decode(
        flame, params.replace(jaw=jnp.tile(jnp.asarray([[0.3, 0.0, 0.0]]), (2, 1)))
    )
    moved = float(jnp.abs(v2 - v).max())
    assert moved > 1e-4, f"jaw rotation had no effect ({moved})"
    return f"decode ok, jaw moves mesh by {moved:.4f}"


@check("flame-pkl: 68-landmark embedding applies")
def check_flame_landmarks(path: str):
    import jax.numpy as jnp
    import numpy as np

    from dad3dheads_tpu import assets
    from dad3dheads_tpu.core.flame import FlameModel
    from dad3dheads_tpu.core.landmarks import LandmarkEmbedding, get_68_landmarks

    arrays = assets.load_flame_model(path)
    emb = LandmarkEmbedding.load()
    vmax = int(max(np.max(emb.static_vertex_ids), np.max(emb.dynamic_vertex_ids)))
    V = arrays.v_template.shape[0]
    assert vmax < V, f"embedding indexes vertex {vmax} but model has {V}"
    flame = FlameModel.from_arrays(arrays)
    lms = get_68_landmarks(flame.v_template[None], emb)
    assert lms.shape == (1, 68, 3)
    assert bool(jnp.all(jnp.isfinite(lms)))
    return f"68 landmarks on template ok (V={V})"


@check("trcd: state dict loads")
def check_trcd_load(path: str):
    from port_torch_weights import load_torch_state_dict

    sd = load_torch_state_dict(path)
    assert len(sd) > 0, "empty state dict"
    return f"{len(sd)} tensors"


@check("trcd: full name-map port (no unmatched/unused)")
def check_trcd_port(path: str, backbone: str, img_size: int, out: str = None):
    import jax
    import jax.numpy as jnp

    from port_torch_weights import dad3dnet_name_map, load_torch_state_dict, port_by_name_map
    from dad3dheads_tpu.models import create_model

    model = create_model({"backbone": backbone})
    x = jnp.zeros((1, img_size, img_size, 3), jnp.float32)
    variables = jax.jit(lambda r: model.init(r, x, train=False))(jax.random.PRNGKey(0))
    sd = load_torch_state_dict(path)
    ported, report = port_by_name_map(sd, variables, dad3dnet_name_map(backbone))
    if report:
        raise AssertionError("; ".join(report[:10]) + f" ({len(report)} issues)")
    if out:
        from dad3dheads_tpu.api.predictor import save_predictor_checkpoint

        save_predictor_checkpoint(ported, out)
    globals()["_PORTED"] = (model, ported)
    return f"all {len(sd)} tensors consumed" + (f", wrote {out}" if out else "")


@check("trcd: torch forward == ported flax forward")
def check_trcd_parity(path: str, img_size: int):
    import numpy as np
    import torch

    module = torch.jit.load(path, map_location="cpu")
    module.eval()
    model, ported = globals()["_PORTED"]
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 3, img_size, img_size)).astype(np.float32)
    with torch.no_grad():
        ref = module(torch.from_numpy(x))
    out = model.apply(ported, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False)
    from dad3dheads_tpu.constants import OUTPUT_3DMM_PARAMS

    ref_params = (
        ref["params_3dmm"] if isinstance(ref, dict) else ref[1]
    ).numpy()
    got = np.asarray(out[OUTPUT_3DMM_PARAMS])
    np.testing.assert_allclose(got, ref_params, rtol=1e-3, atol=2e-3)
    return f"3DMM params match to {np.abs(got - ref_params).max():.2e}"


@check("annotations: dataset pipeline produces training samples")
def check_annotations(ann_path: str, root: str, img_size: int):
    import numpy as np

    from dad3dheads_tpu.constants import (
        INPUT_IMAGE_KEY,
        TARGET_2D_LANDMARKS_PRESENCE,
        TARGET_LANDMARKS_HEATMAP,
    )
    from dad3dheads_tpu.data.dataset import FlameDataset

    ds = FlameDataset.from_config(
        {"ann_path": ann_path, "dataset_root": root, "img_size": img_size}
    )
    n = min(8, len(ds))
    ok = 0
    for i in range(n):
        s = ds[i]
        if s is None:
            continue
        assert s[INPUT_IMAGE_KEY].shape == (img_size, img_size, 3)
        assert s[TARGET_LANDMARKS_HEATMAP].max() > 0
        assert np.asarray(s[TARGET_2D_LANDMARKS_PRESENCE]).any()
        ok += 1
    assert ok > 0, f"0/{n} samples loaded"
    return f"{ok}/{n} samples load with valid targets"


@check("annotations: benchmark GT folds")
def check_annotations_gt(ann_path: str, root: str, tmp: str):
    from dad3dheads_tpu.benchmark_harness.evaluate import HeadAnnotation

    with open(ann_path) as f:
        items = json.load(f)
    n = 0
    for item in items[:8]:
        p = item.get("annotation_path")
        if not p:
            continue
        with open(os.path.join(root, p)) as f:
            cfg = json.load(f)
        if cfg.get("vertices") is None:
            continue
        a = HeadAnnotation.from_config({**cfg, "id": str(n), "bbox": item.get("bbox", [0, 0, 1, 1])})
        assert a.vertices3d.shape[1] == 3
        n += 1
    assert n > 0, "no scoreable annotations in the first 8 items"
    return f"{n} annotations fold into evaluator ground truth"


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--flame-pkl")
    ap.add_argument("--trcd")
    ap.add_argument("--backbone", choices=("resnet50", "mobilenet_w1"), default="resnet50")
    ap.add_argument("--annotations")
    ap.add_argument("--dataset-root", default=".")
    ap.add_argument("--img-size", type=int, default=256)
    ap.add_argument("--out", help="write the ported predictor msgpack here")
    args = ap.parse_args()
    if not (args.flame_pkl or args.trcd or args.annotations):
        ap.error("supply at least one of --flame-pkl / --trcd / --annotations")

    if args.flame_pkl:
        check_flame_load(args.flame_pkl)
        check_flame_decode(args.flame_pkl)
        check_flame_landmarks(args.flame_pkl)
    if args.trcd:
        check_trcd_load(args.trcd)
        check_trcd_port(args.trcd, args.backbone, args.img_size, args.out)
        if "_PORTED" in globals():
            check_trcd_parity(args.trcd, args.img_size)
    if args.annotations:
        check_annotations(args.annotations, args.dataset_root, args.img_size)
        check_annotations_gt(args.annotations, args.dataset_root, "/tmp")

    print("\n=== validate_real_assets verdict ===")
    failed = 0
    for name, ok, detail in RESULTS:
        mark = "PASS" if ok else "FAIL"
        failed += not ok
        print(f"[{mark}] {name}" + (f" — {detail}" if detail else ""))
    print(f"{len(RESULTS) - failed}/{len(RESULTS)} checks passed")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
