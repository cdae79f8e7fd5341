"""Generate a synthetic DAD-3DHeads-format dataset with RENDERED images.

Samples random FLAME parameters, decodes meshes, renders them with the
framework's own rasterizer + Phong lighting, and writes the exact on-disk
layout the reference dataset uses
(/root/reference/model_training/config/dataset/dad_3d_heads.yaml and
dad_3dheads_benchmark/generate_gt.py):

  <out>/DAD-3DHeadsDataset/<subset>/{<subset>.json, images/*.png,
                                     annotations/*.json}

Because the images are rendered from the annotated geometry, a network
trained on this data must actually learn image -> geometry — making the full
reference workflow (FlameDataset -> train -> predict -> generate-gt ->
benchmark) executable and *learnable* end to end without the proprietary
dataset.

The model-view matrix embeds the weak-perspective pose (scale * R | t) and
the projection matrix maps world [-1, 1] to pixels with the dataset's y-flip
convention, so FlameDataset's projection math reproduces exactly the
keypoints the image was rendered with.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="synth_dataset")
    ap.add_argument("--subset", default="train")
    ap.add_argument("--num", type=int, default=64)
    ap.add_argument("--img-size", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--with-attributes", action="store_true")
    args = ap.parse_args()

    from dad3dheads_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import cv2
    import jax
    import jax.numpy as jnp

    from dad3dheads_tpu import assets
    from dad3dheads_tpu.core.flame import FlameModel, FlameParams, flame_decode
    from dad3dheads_tpu.core.rotation import rot_mat_from_6dof
    from dad3dheads_tpu.data import random_3dmm
    from dad3dheads_tpu.render.lighting import RenderPipeline
    from dad3dheads_tpu.render.native import native_available

    S = args.img_size
    flame = FlameModel.load()
    faces = assets.get_faces().astype(np.int32)
    pipeline = RenderPipeline()

    base = os.path.join(args.out, "DAD-3DHeadsDataset", args.subset)
    os.makedirs(os.path.join(base, "images"), exist_ok=True)
    os.makedirs(os.path.join(base, "annotations"), exist_ok=True)

    @jax.jit
    def decode(flame, mm):
        params = FlameParams.from_3dmm(mm)
        v0 = flame_decode(flame, params, zero_rot=True)
        R = rot_mat_from_6dof(params.rotation)
        scale = jnp.clip(params.scale[:, None] + 1.0, min=1e-8)
        t = params.translation.at[..., 2].set(0.0)
        world = jnp.einsum("bxy,bvy->bvx", R, v0) * scale + t[:, None]
        return v0, world, R, scale[..., 0]

    rng = jax.random.PRNGKey(args.seed)
    index = []

    use_native = native_available()
    for i in range(args.num):
        rng, k = jax.random.split(rng)
        mm = random_3dmm(k, 1)
        v0, world, R, scale = jax.device_get(decode(flame, mm))
        v0, world, R, scale = v0[0], world[0], R[0], float(scale[0, 0])

        # screen-space vertices: xy in pixels (y down), z toward the viewer
        screen = np.empty_like(world)
        screen[:, 0] = (world[:, 0] + 1.0) / 2.0 * S
        screen[:, 1] = (world[:, 1] + 1.0) / 2.0 * S
        screen[:, 2] = world[:, 2]

        bg = np.full((S, S, 3), 32, np.uint8)
        if use_native:
            from dad3dheads_tpu.render.lighting import RenderPipeline as RP
            from dad3dheads_tpu.render.native import rasterize_native

            light = np.asarray(pipeline.compute_light(jnp.asarray(screen), jnp.asarray(faces)))
            img = rasterize_native(screen, faces, light, bg=bg)
        else:
            img = np.asarray(pipeline(jnp.asarray(screen), jnp.asarray(faces), jnp.asarray(bg)))

        item_id = f"synth_{args.subset}_{i:05d}"
        cv2.imwrite(
            os.path.join(base, "images", item_id + ".png"),
            cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
        )

        # the model-view rotation must stay orthonormal (the pose metric
        # checks R R^T = I), so the weak-perspective scale lives in the
        # per-sample projection matrix: mv = [R | t/s], proj scales by s.
        mv = np.eye(4, dtype=np.float32)
        mv[:3, :3] = R
        mv[:3, 3] = [float(mm[0, 409]) / scale, float(mm[0, 410]) / scale, 0.0]
        proj = np.array(
            [
                [scale * S / 2, 0, 0, S / 2],
                [0, -scale * S / 2, 0, S / 2],
                [0, 0, 1, 0],
                [0, 0, 0, 1],
            ],
            np.float32,
        )

        with open(os.path.join(base, "annotations", item_id + ".json"), "w") as f:
            json.dump(
                {
                    "vertices": v0.tolist(),
                    "model_view_matrix": mv.tolist(),
                    "projection_matrix": proj.tolist(),
                },
                f,
            )

        xs, ys = screen[:, 0], screen[:, 1]
        x0, y0 = float(max(xs.min(), 0)), float(max(ys.min(), 0))
        x1, y1 = float(min(xs.max(), S - 1)), float(min(ys.max(), S - 1))
        entry = {
            "item_id": item_id,
            "img_path": f"images/{item_id}.png",
            "annotation_path": f"annotations/{item_id}.json",
            "bbox": [int(x0), int(y0), int(x1 - x0), int(y1 - y0)],
        }
        if args.with_attributes:
            entry["attributes"] = {"quality": "good", "gender": "synthetic"}
        index.append(entry)

    with open(os.path.join(base, f"{args.subset}.json"), "w") as f:
        json.dump(index, f)
    print(os.path.join(base, f"{args.subset}.json"))


if __name__ == "__main__":
    main()
