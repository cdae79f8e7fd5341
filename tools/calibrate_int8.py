"""Calibrate int8 activation scales for the DAD-3DNet predictor.

Runs a few batches through the fp model recording per-site max |activation|
(models/quantized.py), and saves the amax table as an .npz that
``FaceMeshPredictor`` accepts via ``quant_amax`` (config key or constructor
dict) to switch inference to the int8 path (measured ~1.5x on a v5e chip).

  python tools/calibrate_int8.py --checkpoint ck.msgpack --out amax.npz \
      --images /path/to/DAD-3DHeadsDataset/val [--num 64] [--img-size 256]

Without --images, calibration uses synthetic rendered heads (the same
generator as tools/acceptance_run.py), which is representative of the
normalized-input distribution.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--out", required=True)
    ap.add_argument("--images", default=None, help="directory of calibration images")
    ap.add_argument("--num", type=int, default=64)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--img-size", type=int, default=256)
    ap.add_argument("--dtype", default="bf16")
    args = ap.parse_args()

    from dad3dheads_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp
    import numpy as np

    from dad3dheads_tpu.api.predictor import FaceMeshPredictor
    from dad3dheads_tpu.models.quantized import calibrate, save_amax
    from dad3dheads_tpu.ops.preprocess import preprocess_image_np

    predictor = FaceMeshPredictor(
        {"img_size": args.img_size, "model": {"backbone": "resnet50", "dtype": args.dtype}},
        checkpoint_path=args.checkpoint,
    )

    tensors = []
    if args.images:
        from dad3dheads_tpu.data.dataset import read_as_rgb

        paths = sorted(
            p for ext in ("*.png", "*.jpg", "*.jpeg")
            for p in glob.glob(os.path.join(args.images, "**", ext), recursive=True)
        )[: args.num]
        if not paths:
            raise SystemExit(f"no images under {args.images}")
        for p in paths:
            t, _, _ = preprocess_image_np(read_as_rgb(p), args.img_size)
            tensors.append(t)
    else:
        import jax

        from dad3dheads_tpu.constants import INPUT_IMAGE_KEY
        from dad3dheads_tpu.core.landmarks import LandmarkEmbedding
        from dad3dheads_tpu.data import synthetic_batch

        emb = LandmarkEmbedding.load()
        gen = jax.jit(
            lambda r: synthetic_batch(r, predictor.flame, emb, args.batch, args.img_size)
        )
        for i in range(max(1, args.num // args.batch)):
            batch = gen(jax.random.PRNGKey(i))
            tensors.extend(np.asarray(batch[INPUT_IMAGE_KEY], np.float32))

    batches = [
        jnp.asarray(np.stack(tensors[i : i + args.batch]))
        for i in range(0, len(tensors), args.batch)
    ]
    dtype = jnp.bfloat16 if args.dtype in ("bf16", "bfloat16") else jnp.float32
    amax = calibrate(predictor.model, predictor.variables, batches, dtype=dtype)
    save_amax(amax, args.out)
    print(f"calibrated {len(amax)} sites over {len(tensors)} images -> {args.out}")


if __name__ == "__main__":
    main()
