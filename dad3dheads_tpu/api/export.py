"""AOT deployment artifact: the TPU-native equivalent of the reference's
TorchScript ``.trcd`` trace.

The reference exports its trained network with ``torch.jit.trace`` and the
predictor loads that blob without the model source
(/root/reference/model_training/train/flame_lightning_model.py:384-401,
/root/reference/predictor.py:72). Here the same capability is built on
``jax.export``: the jitted forward pipeline (CNN -> landmarks + 3DMM) and the
FLAME decode (3DMM -> mesh + reprojection) are serialized as StableHLO with a
*symbolic batch dimension* and multi-platform lowerings (TPU + CPU), packed
together with the weights and the FLAME constants into a single ``.npz``
archive. ``ExportedFaceMeshPredictor`` runs predictions from that one file —
no flax model definition, no FLAME assets, no configs required at the
deployment site.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from ..constants import FLAME_CONSTS, IMAGENET_MEAN, IMAGENET_STD
from ..core.flame import FlameModel

# v2: pipeline emits flat (b, 136) landmarks; optional int8 variant with a
# 3-arg pipeline (weights, qparams, images). v1 artifacts still load (the
# host reshape accepts either landmark shape); v2 artifacts are rejected by
# v1 loaders with a clear version error instead of a shape/arity crash.
# v3: adds the ``stablehlo_frames`` program — fused device preprocessing
# (bbox crop + resize + normalize, ops/preprocess_device.py) + forward +
# decode from raw uint8 frames, with symbolic batch AND frame dimensions.
# v2 artifacts still load (predict_frames then raises with a re-export hint).
# v4: optional TPU-specialized per-bucket frames programs (fused Pallas
# preprocess, static shapes); artifacts without them still stamp v3 so v3
# loaders keep reading them.
_FORMAT_VERSION = 4


def _strip_folded_leaves(variables):
    """Zero every leaf the int8 pipeline folds into its prepared kernels.

    With ``qparams`` supplied, ``quantized_forward`` never reads the fp conv
    kernels / BatchNorm stats of the encoder, BiFPN (except the w1/w2 fusion
    weights), or heatmap head — XLA eliminates them as dead code — so the
    compressed archive stores zeros there and only the live weights (fusion
    layer, regression heads, w1/w2) plus the int8 kernels carry bytes. The
    exported-vs-live parity test guards the dead-leaf classification."""
    import flax

    flat = flax.traverse_util.flatten_dict(variables)
    out = {}
    for path_t, leaf in flat.items():
        col, top = path_t[0], path_t[1]
        dead = (
            (col == "batch_stats" and top in ("encoder", "bifpn"))
            or (col == "params" and top in ("encoder", "heatmap_head"))
            or (col == "params" and top == "bifpn" and path_t[-1] not in ("w1", "w2"))
        )
        out[path_t] = np.zeros_like(leaf) if dead else leaf
    return flax.traverse_util.unflatten_dict(out)


def export_predictor(
    model,
    variables,
    flame: FlameModel,
    path: str,
    img_size: int = 256,
    stride: int = 4,
    constants: Optional[Dict[str, int]] = None,
    platforms: Sequence[str] = ("tpu", "cpu"),
    quant_amax: Optional[Dict[str, Any]] = None,
    resize_mode: str = "longest_max_size",
    tpu_frames_specs: Optional[Sequence[Sequence[int]]] = None,
    tpu_interpret: bool = False,
) -> str:
    """Serialize the full predictor compute into one self-contained archive.

    Two StableHLO programs are exported, matching the predictor's two device
    functions (forward must run before the host-side 3DMM readjustment, the
    decode after it):

      * ``pipeline(weights, images_f32) -> (landmarks, 3dmm)``
      * ``decode(flame_leaves, 3dmm) -> (vertices_3d, projected_2d)``

    Both carry a symbolic batch dimension, so one artifact serves any batch
    size. Weights travel as arguments (flattened leaves stored alongside),
    not baked constants — the loader streams them straight from the archive.

    ``tpu_frames_specs``: optional list of (batch, Hmax, Wmax) buckets; for
    each one an ADDITIONAL TPU-only frames program is exported that runs the
    fused Pallas preprocess (channel-planar wire format, in-kernel weights,
    bf16 fast path — ops/preprocess_pallas.py) instead of the portable XLA
    resample. Pallas needs static shapes, so these programs are per-bucket;
    the portable symbolic-shape ``stablehlo_frames`` program remains the
    fallback for every other shape/backend. Measured from the ARTIFACT on
    v5e (tools/bench_export_frames.py, batch 256, 512^2 frames, device-loop
    methodology): TPU bucket program 5,386.9 img/s vs 5,090.1 for the
    portable XLA-resample program (+5.8%).
    ``tpu_interpret`` lowers those programs with the interpret-mode kernel
    for the CURRENT platform instead of TPU — slow, for CI parity tests.
    """
    constants = dict(constants or FLAME_CONSTS)
    quantized = quant_amax is not None
    if quantized:
        from ..models.quantized import prepare_int8_params, quantized_forward

        qparams = prepare_int8_params(model, variables, dtype=model.dtype, img_size=img_size)
        q_leaves, q_def = jax.tree_util.tree_flatten(qparams)
        variables = _strip_folded_leaves(variables)
    w_leaves, w_def = jax.tree_util.tree_flatten(variables)
    f_leaves, f_def = jax.tree_util.tree_flatten(flame)

    # the decode steps are the predictor's own functions, so exported-vs-live
    # parity holds by construction
    from .predictor import decode_3dmm_to_mesh, decode_pipeline_outputs

    if quantized:
        # int8 artifact: the StableHLO runs the quantized mirror; the amax
        # scalars bake in as constants, the int8 kernels travel as weights
        def pipeline(weights, qleaves, images):
            v = jax.tree_util.tree_unflatten(w_def, weights)
            qp = jax.tree_util.tree_unflatten(q_def, qleaves)
            out, _ = quantized_forward(
                model, v, images, amax=quant_amax, mode="int8",
                dtype=model.dtype, qparams=qp,
            )
            res = decode_pipeline_outputs(out, stride, img_size)
            return res["landmarks"], res["3dmm"]
    else:
        def pipeline(weights, images):
            out = model.apply(jax.tree_util.tree_unflatten(w_def, weights), images, train=False)
            res = decode_pipeline_outputs(out, stride, img_size)
            return res["landmarks"], res["3dmm"]

    def decode(flame_leaves, params_3dmm):
        fl = jax.tree_util.tree_unflatten(f_def, flame_leaves)
        return decode_3dmm_to_mesh(fl, params_3dmm, constants, img_size)

    # the north-star serving program: raw uint8 full frames + bboxes in,
    # decoded outputs + readjustment metadata out — crop/resize/normalize
    # fused on device; batch AND frame extents are symbolic so one program
    # serves any padded-buffer shape the host packs
    from ..ops.preprocess_device import preprocess_frames_device

    def frames_core(
        weights_v, qp, frames, sizes, boxes,
        impl="xla", layout="nhwc", out_dtype=jnp.float32,
    ):
        # default impl="xla": the portable artifact's batch/frame extents are
        # SYMBOLIC and it must run on any backend; the Pallas kernel needs
        # static shapes and a TPU, so it is exported per-bucket (below)
        imgs, scales, paddings = preprocess_frames_device(
            frames, sizes, boxes, img_size, "imagenet", resize_mode,
            impl=impl, layout=layout, out_dtype=out_dtype,
        )
        if quantized:
            out, _ = quantized_forward(
                model, weights_v, imgs.astype(model.dtype), amax=quant_amax,
                mode="int8", dtype=model.dtype, qparams=qp,
            )
        else:
            out = model.apply(weights_v, imgs, train=False)
        res = decode_pipeline_outputs(out, stride, img_size)
        return res["landmarks"], res["3dmm"], scales, paddings

    if quantized:
        def frames_fn(weights, qleaves, frames, sizes, boxes):
            v = jax.tree_util.tree_unflatten(w_def, weights)
            qp = jax.tree_util.tree_unflatten(q_def, qleaves)
            return frames_core(v, qp, frames, sizes, boxes)
    else:
        def frames_fn(weights, frames, sizes, boxes):
            v = jax.tree_util.tree_unflatten(w_def, weights)
            return frames_core(v, None, frames, sizes, boxes)

    (b,) = jax_export.symbolic_shape("b")
    img_sds = jax.ShapeDtypeStruct((b, img_size, img_size, 3), jnp.float32)
    mm_sds = jax.ShapeDtypeStruct((b, sum(constants.values())), jnp.float32)
    sds = lambda leaves: [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in leaves]

    pipe_args = (
        (sds(w_leaves), sds(q_leaves), img_sds) if quantized else (sds(w_leaves), img_sds)
    )
    exp_pipe = jax_export.export(jax.jit(pipeline), platforms=tuple(platforms))(*pipe_args)
    exp_dec = jax_export.export(jax.jit(decode), platforms=tuple(platforms))(
        sds(f_leaves), mm_sds
    )
    bf, fh, fw = jax_export.symbolic_shape("bf, fh, fw")
    frames_args = (
        jax.ShapeDtypeStruct((bf, fh, fw, 3), jnp.uint8),
        jax.ShapeDtypeStruct((bf, 2), jnp.int32),
        jax.ShapeDtypeStruct((bf, 4), jnp.int32),
    )
    frames_full_args = (
        (sds(w_leaves), sds(q_leaves), *frames_args)
        if quantized
        else (sds(w_leaves), *frames_args)
    )
    exp_frames = jax_export.export(jax.jit(frames_fn), platforms=tuple(platforms))(
        *frames_full_args
    )

    # TPU-specialized per-bucket frames programs: fused Pallas preprocess
    # (planar wire format, bf16 fast weights) — measured from the artifact
    # on v5e: 5,386.9 img/s vs 5,090.1 for the portable program (docstring)
    tpu_frames_specs = [tuple(int(v) for v in s) for s in (tpu_frames_specs or ())]
    exp_frames_tpu = []
    tpu_impl = "pallas_interpret" if tpu_interpret else "pallas"
    tpu_platforms = None if tpu_interpret else ("tpu",)
    for tb, th, tw in tpu_frames_specs:
        if quantized:
            def frames_tpu_fn(weights, qleaves, frames, sizes, boxes):
                v = jax.tree_util.tree_unflatten(w_def, weights)
                qp = jax.tree_util.tree_unflatten(q_def, qleaves)
                return frames_core(
                    v, qp, frames, sizes, boxes,
                    impl=tpu_impl, layout="planar", out_dtype=model.dtype,
                )
        else:
            def frames_tpu_fn(weights, frames, sizes, boxes):
                v = jax.tree_util.tree_unflatten(w_def, weights)
                return frames_core(
                    v, None, frames, sizes, boxes,
                    impl=tpu_impl, layout="planar", out_dtype=model.dtype,
                )
        spec_args = (
            jax.ShapeDtypeStruct((tb, th, 3 * tw), jnp.uint8),  # planar frames
            jax.ShapeDtypeStruct((tb, 2), jnp.int32),
            jax.ShapeDtypeStruct((tb, 4), jnp.int32),
        )
        full_args = (
            (sds(w_leaves), sds(q_leaves), *spec_args)
            if quantized
            else (sds(w_leaves), *spec_args)
        )
        kw = {"platforms": tpu_platforms} if tpu_platforms else {}
        exp_frames_tpu.append(
            jax_export.export(jax.jit(frames_tpu_fn), **kw)(*full_args)
        )

    meta = {
        "format_version": _FORMAT_VERSION if tpu_frames_specs else 3,
        "img_size": img_size,
        "stride": stride,
        "constants": constants,
        "platforms": list(platforms),
        "jax_version": jax.__version__,
        "n_weight_leaves": len(w_leaves),
        "n_flame_leaves": len(f_leaves),
        "quantized": quantized,
        "n_qparam_leaves": len(q_leaves) if quantized else 0,
        "resize_mode": resize_mode,
        "tpu_frames_specs": [list(s) for s in tpu_frames_specs],
        "tpu_interpret": bool(tpu_interpret),
    }
    arrays: Dict[str, np.ndarray] = {
        "stablehlo_pipeline": np.frombuffer(exp_pipe.serialize(), np.uint8),
        "stablehlo_decode": np.frombuffer(exp_dec.serialize(), np.uint8),
        "stablehlo_frames": np.frombuffer(exp_frames.serialize(), np.uint8),
        "meta": np.frombuffer(json.dumps(meta).encode(), np.uint8),
    }
    for i, e in enumerate(exp_frames_tpu):
        arrays[f"stablehlo_frames_tpu{i}"] = np.frombuffer(e.serialize(), np.uint8)
    for i, x in enumerate(w_leaves):
        arrays[f"w{i:04d}"] = np.asarray(x)
    for i, x in enumerate(f_leaves):
        arrays[f"f{i:04d}"] = np.asarray(x)
    if quantized:
        for i, x in enumerate(q_leaves):
            arrays[f"q{i:04d}"] = np.asarray(x)

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        # compressed so the zeroed folded-away fp leaves cost ~nothing in the
        # int8 artifact; plain for fp (faster load, nothing compressible)
        (np.savez_compressed if quantized else np.savez)(f, **arrays)
    return path


class ExportedFaceMeshPredictor:
    """FaceMeshPredictor-compatible inference from one exported archive.

    Mirrors the reference's ``torch.jit.load(.trcd)`` deployment: the archive
    carries the compiled programs and the weights; this class adds only the
    host-side pre/postprocessing (resize, normalize, readjustment to the
    original image frame)."""

    def __init__(self, path: str, resize_mode: Optional[str] = None):
        with np.load(path) as z:
            meta = json.loads(bytes(z["meta"]).decode())
            if meta["format_version"] > _FORMAT_VERSION:
                raise ValueError(
                    f"archive format v{meta['format_version']} is newer than "
                    f"this loader (v{_FORMAT_VERSION})"
                )
            self._pipe = jax_export.deserialize(bytes(z["stablehlo_pipeline"]))
            self._dec = jax_export.deserialize(bytes(z["stablehlo_decode"]))
            self._frames = (
                jax_export.deserialize(bytes(z["stablehlo_frames"]))
                if "stablehlo_frames" in z
                else None
            )
            self._frames_tpu = [
                (
                    tuple(int(v) for v in spec),
                    jax_export.deserialize(bytes(z[f"stablehlo_frames_tpu{i}"])),
                )
                for i, spec in enumerate(meta.get("tpu_frames_specs", []))
            ]
            self._weights = [
                jnp.asarray(z[f"w{i:04d}"]) for i in range(meta["n_weight_leaves"])
            ]
            self._flame = [
                jnp.asarray(z[f"f{i:04d}"]) for i in range(meta["n_flame_leaves"])
            ]
            self._qparams = [
                jnp.asarray(z[f"q{i:04d}"])
                for i in range(meta.get("n_qparam_leaves", 0))
            ]
        self.meta = meta
        self._img_size = int(meta["img_size"])
        self.flame_constants = dict(meta["constants"])
        # default to the mode baked into the artifact's frames program so the
        # host-preprocess and device-preprocess paths resample identically
        self._resize_mode = resize_mode or meta.get("resize_mode", "longest_max_size")
        if meta.get("quantized"):
            call3 = jax.jit(lambda w, q, x: self._pipe.call(w, q, x))
            self._pipe_call = lambda w, x: call3(w, self._qparams, x)
        else:
            self._pipe_call = jax.jit(lambda w, x: self._pipe.call(w, x))
        self._dec_call = jax.jit(lambda f, mm: self._dec.call(f, mm))
        def _wrap_frames(prog):
            if meta.get("quantized"):
                fcall = jax.jit(lambda w, q, fr, sz, bx: prog.call(w, q, fr, sz, bx))
                return lambda fr, sz, bx: fcall(self._weights, self._qparams, fr, sz, bx)
            fcall = jax.jit(lambda w, fr, sz, bx: prog.call(w, fr, sz, bx))
            return lambda fr, sz, bx: fcall(self._weights, fr, sz, bx)

        if self._frames is not None:
            self._frames_call = _wrap_frames(self._frames)
        self._frames_tpu_calls = [
            (spec, _wrap_frames(prog)) for spec, prog in self._frames_tpu
        ]

    def __call__(self, image: np.ndarray) -> Dict[str, Any]:
        """RGB uint8 (H, W, 3) -> prediction dict in original-image coords."""
        from ..ops.preprocess import (
            preprocess_image_np,
            readjust_3dmm_np,
            readjust_landmarks_np,
        )

        tensor, scale, paddings = preprocess_image_np(
            image, self._img_size, mode=self._resize_mode
        )
        landmarks, pred_3dmm = self._pipe_call(self._weights, jnp.asarray(tensor[None]))
        landmarks = readjust_landmarks_np(
            np.asarray(landmarks)[0].reshape(-1, 2), paddings, scale
        )
        pred_3dmm = readjust_3dmm_np(
            np.asarray(pred_3dmm), paddings, scale, self._img_size, self.flame_constants
        )
        vertices_3d, projected = self._dec_call(self._flame, jnp.asarray(pred_3dmm))
        return {
            "points": np.reshape(landmarks, (-1, 2)),
            "projected_vertices": np.asarray(projected),
            "3d_vertices": np.asarray(vertices_3d[0]),
            "3dmm_params": pred_3dmm,
        }

    def predict_images(
        self, images, batch_size: int = 32, num_workers: int = 0,
        with_mesh: bool = True,
    ) -> list:
        """Bulk original-frame prediction from the artifact (the deployment
        analogue of FaceMeshPredictor.predict_images). The exported pipeline
        carries a symbolic batch dimension, so every chunk — including the
        ragged last one — runs through the same program without padding."""
        import concurrent.futures as cf

        from ..ops.preprocess import (
            preprocess_image_np,
            readjust_3dmm_np,
            readjust_landmarks_np,
        )

        images = list(images)
        if not images:
            return []
        prep = lambda im: preprocess_image_np(im, self._img_size, mode=self._resize_mode)
        if num_workers > 1:
            with cf.ThreadPoolExecutor(num_workers) as ex:
                prepped = list(ex.map(prep, images))
        else:
            prepped = [prep(im) for im in images]

        results = []
        for lo in range(0, len(prepped), batch_size):
            chunk = prepped[lo : lo + batch_size]
            x = np.stack([t for t, _, _ in chunk])
            landmarks, mm = self._pipe_call(self._weights, jnp.asarray(x))
            landmarks = np.asarray(landmarks).reshape(len(chunk), -1, 2)
            mm = np.asarray(mm)
            pts, adj = [], []
            for j, (_, scale, pads) in enumerate(chunk):
                pts.append(readjust_landmarks_np(landmarks[j], pads, scale))
                adj.append(
                    readjust_3dmm_np(
                        mm[j : j + 1], pads, scale, self._img_size, self.flame_constants
                    )
                )
            adj = np.concatenate(adj, 0)
            if not with_mesh:
                results.extend(
                    {"points": np.reshape(p, (-1, 2)), "3dmm_params": adj[j : j + 1]}
                    for j, p in enumerate(pts)
                )
                continue
            v3, proj = self._dec_call(self._flame, jnp.asarray(adj))
            v3, proj = np.asarray(v3), np.asarray(proj)
            results.extend(
                {
                    "points": np.reshape(pts[j], (-1, 2)),
                    "projected_vertices": proj[j : j + 1],
                    "3d_vertices": v3[j],
                    "3dmm_params": adj[j : j + 1],
                }
                for j in range(len(chunk))
            )
        return results

    def predict_frames(
        self, frames, bboxes=None, batch_size: int = 32, with_mesh: bool = True,
        frame_bucket: int = 64,
    ) -> list:
        """Bulk prediction from FULL frames (+ optional bboxes) with crop /
        resize / normalize INSIDE the exported program (the v3
        ``stablehlo_frames`` entry; symbolic batch and frame extents) — the
        deployment analogue of ``FaceMeshPredictor.predict_frames``. The host
        only pastes frames into a padded buffer; "points" come back in
        full-frame coordinates."""
        if self._frames is None:
            raise ValueError(
                f"this artifact (format v{self.meta['format_version']}) predates "
                "the fused-preprocess frames program; re-export with "
                "tools/export_model.py to use predict_frames"
            )
        from ..ops.preprocess import readjust_3dmm_np, readjust_landmarks_np
        from ..ops.preprocess_device import pack_frames_host

        frames = list(frames)
        if not frames:
            return []
        if bboxes is None:
            bb = [(0, 0, f.shape[1], f.shape[0]) for f in frames]
        else:
            bb = [tuple(int(v) for v in b) for b in bboxes]

        # TPU-specialized bucket programs (fused Pallas preprocess) are usable
        # when the backend matches (or they were exported in interpret mode
        # for CI) — per chunk, the first bucket the padded frames fit wins;
        # anything else falls back to the portable symbolic-shape program
        import jax as _jax

        tpu_ok = self.meta.get("tpu_interpret") or _jax.default_backend() == "tpu"

        def _pick_spec(chunk):
            if not tpu_ok:
                return None
            hmax = max(f.shape[0] for f in chunk)
            wmax = max(f.shape[1] for f in chunk)
            for spec, call in self._frames_tpu_calls:
                tb, th, tw = spec
                if tb == batch_size and th >= hmax and tw >= wmax:
                    return spec, call
            return None

        results = []
        for lo in range(0, len(frames), batch_size):
            chunk = frames[lo : lo + batch_size]
            cb = bb[lo : lo + batch_size]
            count = len(chunk)
            picked = _pick_spec(chunk)
            if picked is not None:
                (tb, th, tw), call = picked
                buf, sizes, boxes = pack_frames_host(
                    chunk, cb, tb, planar=True, fixed_shape=(th, tw)
                )
                lms, mm, scales, pads = call(
                    jnp.asarray(buf), jnp.asarray(sizes), jnp.asarray(boxes)
                )
                lms, mm = lms[:count], mm[:count]
                scales, pads = scales[:count], pads[:count]
            else:
                buf, sizes, boxes = pack_frames_host(
                    chunk, cb, batch_size, bucket=frame_bucket
                )
                lms, mm, scales, pads = self._frames_call(
                    jnp.asarray(buf[:count]),
                    jnp.asarray(sizes[:count]),
                    jnp.asarray(boxes[:count]),
                )
            lms = np.asarray(lms).reshape(count, -1, 2)
            mm, scales, pads = np.asarray(mm), np.asarray(scales), np.asarray(pads)
            pts, adj = [], []
            for j in range(count):
                # bboxes are clamped in-graph; mirror the clamp for the origin
                h_, w_ = chunk[j].shape[:2]
                x0 = int(np.clip(cb[j][0], 0, w_ - 1))
                y0 = int(np.clip(cb[j][1], 0, h_ - 1))
                p = pads[j].tolist()
                pt = readjust_landmarks_np(lms[j], p, scales[j]) + np.asarray([[x0, y0]])
                pts.append(pt)
                adj.append(
                    readjust_3dmm_np(
                        mm[j : j + 1], p, scales[j], self._img_size, self.flame_constants
                    )
                )
            adj = np.concatenate(adj, 0)
            if not with_mesh:
                results.extend(
                    {"points": pts[j], "3dmm_params": adj[j : j + 1]}
                    for j in range(count)
                )
                continue
            v3, proj = self._dec_call(self._flame, jnp.asarray(adj))
            v3, proj = np.asarray(v3), np.asarray(proj)
            results.extend(
                {
                    "points": pts[j],
                    "projected_vertices": proj[j : j + 1],
                    "3d_vertices": v3[j],
                    "3dmm_params": adj[j : j + 1],
                }
                for j in range(count)
            )
        return results

    def predict_batch(self, images: np.ndarray) -> Dict[str, Any]:
        """Batched prediction on pre-sized square inputs (B, S, S, 3), uint8
        or fp32-normalized. Network-frame outputs (no readjustment)."""
        if images.dtype == np.uint8:
            mean = np.asarray(IMAGENET_MEAN, np.float32) * 255.0
            std = np.asarray(IMAGENET_STD, np.float32) * 255.0
            images = (images.astype(np.float32) - mean) / std
        landmarks, pred_3dmm = self._pipe_call(self._weights, jnp.asarray(images))
        vertices_3d, projected = self._dec_call(self._flame, pred_3dmm)
        return {
            "points": np.asarray(landmarks).reshape(len(images), -1, 2),
            "projected_vertices": np.asarray(projected),
            "3d_vertices": np.asarray(vertices_3d),
            "3dmm_params": np.asarray(pred_3dmm),
        }
