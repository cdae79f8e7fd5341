"""Full acceptance run on rendered synthetic data:

  1. generate train/val datasets (images rendered from annotated geometry)
  2. train DAD-3DNet through the real data pipeline
  3. predict the val set, build a benchmark submission
  4. score it with the DAD-3DHeads evaluator (vs. the untrained baseline)

This is the complete reference workflow (SURVEY.md §3.2/§3.5) executed end to
end with learning actually happening — the reference itself cannot run any of
this without its licensed dataset + FLAME assets.

  python tools/acceptance_run.py --work /tmp/acceptance --train-num 256 \
      --epochs 10 --img 128 --batch 32
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def sh(*cmd: str) -> None:
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True)


def evaluate_checkpoint(
    work, img, ckpt_path, gt_path, tag, device_preprocess=False, quant_amax=None
):
    import numpy as np

    from dad3dheads_tpu.api.predictor import FaceMeshPredictor
    from dad3dheads_tpu.benchmark_harness import DADEvaluator
    from dad3dheads_tpu.benchmark_harness.submission import (
        predictions_to_submission_entry,
    )
    from dad3dheads_tpu.core.landmarks import LandmarkEmbedding
    from dad3dheads_tpu.data.dataset import read_as_rgb

    config = {
        "img_size": img,
        "stride": 4,
        "model": {"backbone": "resnet50", "num_classes": 68, "num_filters": 256, "limit_value": 3},
    }
    if quant_amax is not None:
        config["quant_amax"] = quant_amax
    predictor = FaceMeshPredictor(config, checkpoint_path=ckpt_path)
    emb = LandmarkEmbedding.load()
    base = os.path.join(work, "DAD-3DHeadsDataset", "val")
    with open(os.path.join(base, "val.json")) as f:
        items = json.load(f)
    from dad3dheads_tpu.data.bbox import ensure_bbox_boundaries, extend_bbox

    submission = {}
    if device_preprocess:
        # serve the val set through the fused device-preprocess path
        # (predict_frames: crop/resize/normalize in-graph) — the accuracy
        # numbers must match the host-cv2 path this harness usually runs
        frames, boxes, origins = [], [], []
        for el in items:
            image = read_as_rgb(os.path.join(base, el["img_path"]))
            x, y, w, h = ensure_bbox_boundaries(
                extend_bbox(np.asarray(el["bbox"]), 0.1), image.shape[:2]
            )
            if not (w > 4 and h > 4):
                x, y, w, h = 0, 0, image.shape[1], image.shape[0]
            frames.append(image)
            boxes.append((x, y, x + w, y + h))
            origins.append((x, y))
        preds_list = predictor.predict_frames(frames, bboxes=boxes, batch_size=16)
        for el, preds, (x, y) in zip(items, preds_list, origins):
            # predict_frames points are already full-frame; the projected
            # vertices stay in the crop frame like the host path's
            preds["projected_vertices"] = preds["projected_vertices"] + np.asarray(
                [x, y], np.float32
            )
            submission[el["item_id"]] = predictions_to_submission_entry(preds, emb)
    else:
        for el in items:
            image = read_as_rgb(os.path.join(base, el["img_path"]))
            # predict on the (extended) head bbox crop — the distribution the
            # network is trained on — then shift 2D outputs back to image coords
            x, y, w, h = ensure_bbox_boundaries(
                extend_bbox(np.asarray(el["bbox"]), 0.1), image.shape[:2]
            )
            crop = image[y : y + h, x : x + w] if w > 4 and h > 4 else image
            preds = predictor(crop)
            if w > 4 and h > 4:
                preds["projected_vertices"] = preds["projected_vertices"] + np.asarray(
                    [x, y], np.float32
                )
                preds["points"] = preds["points"] + np.asarray([x, y])
            submission[el["item_id"]] = predictions_to_submission_entry(preds, emb)
    sub_path = os.path.join(work, f"submission_{tag}.json")
    with open(sub_path, "w") as f:
        json.dump(submission, f)

    overall, _ = DADEvaluator(gt_path, sub_path)()
    print(f"[{tag}] " + "  ".join(f"{k}={v:.4f}" for k, v in overall.items()), flush=True)
    return overall


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--work", default="/tmp/acceptance")
    ap.add_argument("--train-num", type=int, default=256)
    ap.add_argument("--val-num", type=int, default=32)
    ap.add_argument("--img", type=int, default=128)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--skip-generate", action="store_true")
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument(
        "--device-preprocess", action="store_true",
        help="serve the val set via predict_frames (crop/resize/normalize "
        "fused on device) instead of per-image host cv2",
    )
    args = ap.parse_args()

    from dad3dheads_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    py = sys.executable
    tool_dir = os.path.dirname(os.path.abspath(__file__))
    if not args.skip_generate:
        sh(py, os.path.join(tool_dir, "make_synthetic_dataset.py"), "--out", args.work,
           "--subset", "train", "--num", str(args.train_num), "--img-size", str(args.img))
        sh(py, os.path.join(tool_dir, "make_synthetic_dataset.py"), "--out", args.work,
           "--subset", "val", "--num", str(args.val_num), "--img-size", str(args.img))

    from dad3dheads_tpu.benchmark_harness import generate_gt

    gt_path = generate_gt(args.work, "val", output_dir=os.path.join(args.work, "gt"))

    exp_dir = os.path.join(args.work, "exp")
    base_t = os.path.join(args.work, "DAD-3DHeadsDataset", "train")
    base_v = os.path.join(args.work, "DAD-3DHeadsDataset", "val")

    # untrained baseline
    base_metrics = evaluate_checkpoint(args.work, args.img, None, gt_path, "untrained")

    if not args.skip_train:
        sh(
            py, "-m", "dad3dheads_tpu.cli.train",
            "--config", "configs/train.yaml",
            f"experiment_dir={exp_dir}",
            f"batch_size={args.batch}",
            f"img_size={args.img}",
            f"max_epochs={args.epochs}",
            "min_epochs=0",
            "early_stopping=null",
            "model.dtype=bf16",
            "scheduler.warmup_steps=50",
            "num_workers=8",
            f"train.ann_path={base_t}/train.json",
            f"train.dataset_root={base_t}",
            f"train.img_size={args.img}",
            "train.output_uint8=true",
            f"val.ann_path={base_v}/val.json",
            f"val.dataset_root={base_v}",
            f"val.img_size={args.img}",
            "val.output_uint8=true",
        )

    trained = evaluate_checkpoint(
        args.work, args.img, os.path.join(exp_dir, "checkpoints", "dad_3dnet.msgpack"),
        gt_path, "trained", device_preprocess=args.device_preprocess,
    )
    print(
        json.dumps(
            {
                "untrained_nme": round(base_metrics["nme_reprojection"], 3),
                "trained_nme": round(trained["nme_reprojection"], 3),
                "untrained_pose": round(base_metrics["pose_error"], 3),
                "trained_pose": round(trained["pose_error"], 3),
                "trained_z5": round(trained["z5_accuracy"], 3),
            }
        )
    )


if __name__ == "__main__":
    main()
