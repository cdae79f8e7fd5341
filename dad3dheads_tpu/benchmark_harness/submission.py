"""Create a benchmark submission json from the framework's own predictor.

Parity role: the reference defines the submission format
(dad_3dheads_benchmark/README.md: {item_id: {68_landmarks_2d, N_landmarks_3d,
7_landmarks_3d, rotation_matrix}}) but ships no generator; this closes the
loop so "run the benchmark on our outputs" is one command.

The predicted mesh is emitted in camera convention (z negated) — that is the
orientation the Z_n metric scores against (it compares the prediction's z
ordering to the *negated* GT z, benchmark evaluate.zn), and the 7-landmark
Procrustes (reflection permitted) absorbs the flip for Chamfer.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..api.predictor import FaceMeshPredictor
from ..core.landmarks import LandmarkEmbedding, get_68_landmarks
from ..core.rotation import rot_mat_from_6dof
from ..constants import flame_param_offset
from .evaluate import SEVEN_LMK_INDICES


def predictions_to_submission_entry(
    predictions: Dict[str, np.ndarray], embedding: Optional[LandmarkEmbedding] = None
) -> Dict[str, List]:
    emb = embedding if embedding is not None else LandmarkEmbedding.load()
    verts = np.asarray(predictions["3d_vertices"], np.float32)
    lms3d = np.asarray(get_68_landmarks(jnp.asarray(verts)[None], emb))[0]

    # The scored metric is *reprojection* NME: the 68 2D landmarks come from
    # the barycentric embedding of the reprojected mesh (the embedding is
    # linear, so it commutes with the projection), not the heatmap argmax.
    proj = np.asarray(predictions["projected_vertices"], np.float32)
    if proj.ndim == 3:
        proj = proj[0]
    proj3 = np.concatenate([proj[:, :2], np.zeros_like(proj[:, :1])], axis=1)
    lms2d = np.asarray(get_68_landmarks(jnp.asarray(proj3)[None], emb))[0][:, :2]
    off = flame_param_offset("rotation")
    rot6 = np.asarray(predictions["3dmm_params"])[:, off : off + 6]
    R = np.asarray(rot_mat_from_6dof(jnp.asarray(rot6)))[0]
    # camera convention: the evaluator compares against the 180-degree
    # x-flipped GT model-view (benchmark get_gt_rot_mat), so the predicted
    # model-space rotation is emitted in that frame
    R = np.diag([1.0, -1.0, -1.0]).astype(np.float32) @ R
    verts_cam = (verts * np.array([1.0, 1.0, -1.0], np.float32)).tolist()
    svn_cam = (lms3d[SEVEN_LMK_INDICES] * np.array([1.0, 1.0, -1.0], np.float32)).tolist()
    return {
        "68_landmarks_2d": lms2d.tolist(),
        "N_landmarks_3d": verts_cam,
        "7_landmarks_3d": svn_cam,
        "rotation_matrix": R.tolist(),
    }


def generate_submission(
    dataset_base: str,
    subset: str = "val",
    output_path: str = "data/submission.json",
    checkpoint_path: Optional[str] = None,
    limit: Optional[int] = None,
) -> str:
    """Run the predictor over a DAD-3DHeads subset and write a submission."""
    from ..data.dataset import read_as_rgb

    with open(f"{dataset_base}/DAD-3DHeadsDataset/{subset}/{subset}.json") as f:
        items = json.load(f)
    if limit:
        items = items[:limit]

    predictor = FaceMeshPredictor.dad_3dnet(checkpoint_path=checkpoint_path)
    embedding = LandmarkEmbedding.load()

    submission = {}
    # chunked batched prediction (predict_images): fixed-shape device batches
    # + threaded decode, bounded host memory
    chunk = 256
    for lo in range(0, len(items), chunk):
        part = items[lo : lo + chunk]
        images = [
            read_as_rgb(
                f"{dataset_base}/DAD-3DHeadsDataset/{subset}/images/{el['item_id']}.png"
            )
            for el in part
        ]
        preds_list = predictor.predict_images(images, batch_size=32, num_workers=8)
        for el, preds in zip(part, preds_list):
            submission[el["item_id"]] = predictions_to_submission_entry(preds, embedding)

    os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
    with open(output_path, "w") as f:
        json.dump(submission, f)
    return output_path
