"""Score the two extra acceptance legs on an existing acceptance workdir:

  host   — same checkpoint served per-image through host cv2 preprocessing
           (the reference-style path; must match the device-preprocess row)
  int8   — same checkpoint through the int8 PTQ pipeline (models/quantized),
           calibrated on the val images

Run after tools/acceptance_run.py has produced <work>/exp/checkpoints/
dad_3dnet.msgpack and <work>/gt/. Emits one JSON line with both rows.

  python tools/acceptance_extra_legs.py --work /tmp/acceptance_r05 --img 128
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", required=True)
    ap.add_argument("--img", type=int, default=128)
    ap.add_argument("--calib-num", type=int, default=32)
    ap.add_argument("--skip-host", action="store_true")
    args = ap.parse_args()

    from dad3dheads_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from tools.acceptance_run import evaluate_checkpoint

    ckpt = os.path.join(args.work, "exp", "checkpoints", "dad_3dnet.msgpack")
    gt_dir = os.path.join(args.work, "gt")
    gts = [os.path.join(gt_dir, f) for f in os.listdir(gt_dir) if f.endswith(".json")]
    assert len(gts) == 1, gts
    gt_path = gts[0]

    host = (
        None
        if args.skip_host
        else evaluate_checkpoint(args.work, args.img, ckpt, gt_path, "host")
    )

    # int8: calibrate on the val images IN-PROCESS (a subprocess here pays
    # the tunnel's multi-minute client-handoff stall), then serve with
    # quant_amax
    amax_path = os.path.join(args.work, "amax.npz")
    import glob

    import jax.numpy as jnp
    import numpy as np

    from dad3dheads_tpu.api.predictor import FaceMeshPredictor
    from dad3dheads_tpu.data.dataset import read_as_rgb
    from dad3dheads_tpu.models.quantized import calibrate, save_amax
    from dad3dheads_tpu.ops.preprocess import preprocess_image_np

    base_v = os.path.join(args.work, "DAD-3DHeadsDataset", "val")
    paths = sorted(
        glob.glob(os.path.join(base_v, "images", "*.png"))
    )[: args.calib_num]
    assert paths, f"no calibration images under {base_v}"
    # calibrate at the SAME dtype evaluate_checkpoint serves (fp32 default —
    # its model config omits dtype), so the amax table certifies the exact
    # pipeline the int8 rows score
    predictor = FaceMeshPredictor(
        {"img_size": args.img, "model": {"backbone": "resnet50"}},
        checkpoint_path=ckpt,
    )
    tensors = [preprocess_image_np(read_as_rgb(p), args.img)[0] for p in paths]
    batches = [
        jnp.asarray(np.stack(tensors[i : i + 16])) for i in range(0, len(tensors), 16)
    ]
    amax = calibrate(
        predictor.model, predictor.variables, batches, dtype=jnp.float32
    )
    save_amax(amax, amax_path)
    print(f"calibrated {len(amax)} sites -> {amax_path}", flush=True)
    int8 = evaluate_checkpoint(
        args.work, args.img, ckpt, gt_path, "int8", quant_amax=amax_path
    )
    # the DEPLOYMENT path: int8 CNN + fused device preprocess (predict_frames)
    int8_dev = evaluate_checkpoint(
        args.work, args.img, ckpt, gt_path, "int8_device",
        device_preprocess=True, quant_amax=amax_path,
    )
    print(
        json.dumps(
            {
                "host": host and {k: round(v, 3) for k, v in host.items()},
                "int8": {k: round(v, 3) for k, v in int8.items()},
                "int8_device_preprocess": {
                    k: round(v, 3) for k, v in int8_dev.items()
                },
            }
        )
    )


if __name__ == "__main__":
    main()
