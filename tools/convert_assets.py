"""One-time converter: reference static assets -> framework-native .npz bundles.

Reads the public DAD-3DHeads static *data* assets (mesh topology, landmark
embeddings, vertex-index subsets — binary data, not code) and repacks them as
compact .npz bundles under ``dad3dheads_tpu/assets/``.

Sources (all under /root/reference/model_training/model/static/):
  - flame_mesh_faces.pt            -> topology.npz["faces"]           (9976, 3)
  - flame_indices/*.npy            -> topology.npz[...]
  - indices_2d.npy, head_indices.npy -> topology.npz[...]
  - flame_static_embedding.pkl     -> landmark_embeddings.npz (static 51 lms)
  - flame_dynamic_embedding.npy    -> landmark_embeddings.npz (contour 17 lms x 79 poses)
  - face_keypoints/keypoints_{191,445} -> keypoint_subsets.npz

Run:  python tools/convert_assets.py [--reference /root/reference]
"""

from __future__ import annotations

import argparse
import json
import os
import pickle

import numpy as np

ASSET_DIR = os.path.join(os.path.dirname(__file__), "..", "dad3dheads_tpu", "assets")


def _load_faces_pt(path: str) -> np.ndarray:
    import torch

    faces = torch.load(path, map_location="cpu", weights_only=False)
    return np.asarray(faces, dtype=np.int32)


def convert_topology(static_dir: str, out_dir: str) -> None:
    arrays = {}
    arrays["faces"] = _load_faces_pt(os.path.join(static_dir, "flame_mesh_faces.pt"))
    arrays["indices_2d"] = np.load(os.path.join(static_dir, "indices_2d.npy")).astype(np.int32)
    arrays["head_indices"] = np.load(os.path.join(static_dir, "head_indices.npy")).astype(np.int32)
    fi = os.path.join(static_dir, "flame_indices")
    for name in sorted(os.listdir(fi)):
        key = os.path.splitext(name)[0]
        arrays[f"flame_indices/{key}"] = np.load(os.path.join(fi, name)).astype(np.int32)
    np.savez_compressed(os.path.join(out_dir, "topology.npz"), **arrays)
    print(f"topology.npz: {sorted(arrays)}")


def convert_landmark_embeddings(static_dir: str, out_dir: str) -> None:
    with open(os.path.join(static_dir, "flame_static_embedding.pkl"), "rb") as f:
        static = pickle.load(f, encoding="latin1")
    dyn = np.load(
        os.path.join(static_dir, "flame_dynamic_embedding.npy"), allow_pickle=True, encoding="latin1"
    )[()]
    np.savez_compressed(
        os.path.join(out_dir, "landmark_embeddings.npz"),
        static_lmk_face_idx=np.asarray(static["lmk_face_idx"], dtype=np.int32),
        static_lmk_b_coords=np.asarray(static["lmk_b_coords"], dtype=np.float32),
        dynamic_lmk_face_idx=np.asarray(dyn["lmk_face_idx"], dtype=np.int32),
        dynamic_lmk_b_coords=np.asarray(dyn["lmk_b_coords"], dtype=np.float32),
    )
    print("landmark_embeddings.npz written")


def convert_keypoint_subsets(static_dir: str, out_dir: str) -> None:
    """Flatten the per-part OrderedDict .npy files into index arrays.

    Mirrors the reference flattening order (sorted file names, dict insertion
    order within a file — /root/reference/model_training/utils.py:62-105).
    """
    arrays = {}
    meta = {}
    for subset in ("keypoints_191", "keypoints_445"):
        sub_dir = os.path.join(static_dir, "face_keypoints", subset)
        groups = {}  # group name -> list of indices, per file
        order = []
        for fname in sorted(os.listdir(sub_dir)):
            part = os.path.splitext(fname)[0]
            data = np.load(os.path.join(sub_dir, fname), allow_pickle=True)[()]
            for gname, vals in data.items():
                groups[f"{part}/{gname}"] = [int(v) for v in vals]
            order.append(part)
        meta[subset] = {"file_order": order, "groups": {k: len(v) for k, v in groups.items()}}
        # Store each group; also store flattened variants used by the loaders.
        for gk, vals in groups.items():
            arrays[f"{subset}/{gk}"] = np.asarray(vals, dtype=np.int32)

        def flat(exclude=()):
            out = []
            for fname in sorted(os.listdir(sub_dir)):
                part = os.path.splitext(fname)[0]
                if part in exclude:
                    continue
                data = np.load(os.path.join(sub_dir, fname), allow_pickle=True)[()]
                for vals in data.values():
                    out += [int(v) for v in vals]
            return np.asarray(out, dtype=np.int32)

        arrays[f"{subset}/__flat__"] = flat()
        arrays[f"{subset}/__flat_no_cheeks__"] = flat(exclude=("cheeks",))
    np.savez_compressed(os.path.join(out_dir, "keypoint_subsets.npz"), **arrays)
    with open(os.path.join(out_dir, "keypoint_subsets_meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    print(
        "keypoint_subsets.npz:",
        {k: int(arrays[k].shape[0]) for k in arrays if k.endswith("__") },
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--out", default=os.path.abspath(ASSET_DIR))
    args = ap.parse_args()
    static_dir = os.path.join(args.reference, "model_training", "model", "static")
    os.makedirs(args.out, exist_ok=True)
    convert_topology(static_dir, args.out)
    convert_landmark_embeddings(static_dir, args.out)
    convert_keypoint_subsets(static_dir, args.out)


if __name__ == "__main__":
    main()
