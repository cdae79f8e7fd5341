"""FaceMeshPredictor: one image -> 68 landmarks + FLAME mesh + 3DMM params.

Behavioral spec: /root/reference/predictor.py — preprocess (longest-max-size
resize + center pad + ImageNet normalize), model forward, heatmap-argmax
landmark decode (x stride, clipped to the input square), readjustment of
landmarks and 3DMM scale/translation back to the original image frame, FLAME
decode. Output dict keys: {"points", "projected_vertices", "3d_vertices",
"3dmm_params"} (predictor.py:139-142).

TPU-native deployment format: instead of a TorchScript ``.trcd`` blob, the
model is a flax parameter msgpack (``save_predictor_checkpoint``) and the
forward+decode path is one jitted function, AOT-compiled on first call and
cached per input resolution. Supports batched (B>1) prediction via
``predict_batch`` on pre-resized inputs.
"""

from __future__ import annotations

import functools
import logging
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (
    FLAME_CONSTS,
    OUTPUT_2D_LANDMARKS,
    OUTPUT_3DMM_PARAMS,
    OUTPUT_LANDMARKS_HEATMAP,
)
from ..core.flame import FlameModel, FlameParams, flame_decode
from ..core.rotation import rot_mat_from_6dof
from ..models import create_model
from ..ops.preprocess import preprocess_image_np, readjust_3dmm_np, readjust_landmarks_np

logger = logging.getLogger(__name__)


@jax.jit
def _coerce_u8(x: jax.Array) -> jax.Array:
    """Device-side equivalent of the host path's float->uint8 coercion
    (clip/round 0-255), so float device inputs take the same normalize-in-
    graph route as uint8 ones."""
    return jnp.clip(jnp.round(x.astype(jnp.float32)), 0, 255).astype(jnp.uint8)

_CKPT_DIR = os.path.join(os.path.expanduser("~"), ".dad3d_tpu_checkpoints")
_CKPT_FILE = "dad_3dnet.msgpack"

DEFAULT_CONFIG: Dict[str, Any] = {
    "img_size": 256,
    "stride": 4,
    "constants": dict(FLAME_CONSTS),
    "model": {"backbone": "resnet50", "num_filters": 256, "num_classes": 68, "limit_value": 3},
}


def model_exists(filename: str = _CKPT_FILE) -> bool:
    return os.path.isfile(os.path.join(_CKPT_DIR, filename))


def download_model(url: str, retries: int = 5, filename: str = _CKPT_FILE) -> str:
    """Download a published checkpoint into the cache dir with retries
    (reference parity: predictor.py:29-65; uses urllib, no extra deps)."""
    import time
    import urllib.request

    os.makedirs(_CKPT_DIR, exist_ok=True)
    path = os.path.join(_CKPT_DIR, filename)
    assert retries >= 0, "Number of retries should be at least 0"
    last_err: Optional[Exception] = None
    for attempt in range(retries + 1):
        try:
            logger.info("downloading %s from %s (attempt %d)", path, url, attempt + 1)
            with urllib.request.urlopen(url) as r, open(path, "wb") as f:
                while True:
                    chunk = r.read(1 << 20)
                    if not chunk:
                        break
                    f.write(chunk)
            return path
        except Exception as e:  # noqa: BLE001 — network errors are retryable
            last_err = e
            if attempt < retries:
                time.sleep(min(2**attempt, 30))
    raise RuntimeError(f"failed downloading {url}") from last_err


def save_predictor_checkpoint(variables, path: Optional[str] = None) -> str:
    """Serialize model variables (params + batch_stats) to msgpack."""
    from flax import serialization

    path = path or os.path.join(_CKPT_DIR, _CKPT_FILE)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(variables))
    return path



def decode_pipeline_outputs(out, stride: int, img_size: int):
    """Model outputs -> {"landmarks", "3dmm"} (network frame).

    THE canonical landmark decode — the live predictor and the AOT export
    (api/export.py) both call it, so exported-vs-live parity holds by
    construction. Reference precedence (predictor.py:107-112): the regression
    head's normalized landmarks when present, else heatmap argmax x stride."""
    if OUTPUT_2D_LANDMARKS in out:
        landmarks = out[OUTPUT_2D_LANDMARKS] * float(img_size)
    else:
        heatmap = out[OUTPUT_LANDMARKS_HEATMAP]  # (B, H, W, C)
        B, H, W, C = heatmap.shape
        flat = jax.nn.sigmoid(heatmap).reshape(B, H * W, C)
        idx = jnp.argmax(flat, axis=1)
        landmarks = (
            jnp.stack([idx % W, idx // W], axis=-1).astype(jnp.float32) * stride
        )
    landmarks = jnp.clip(landmarks, 0, img_size)
    # flatten to (B, 136): a (B, 68, 2) device buffer pays a per-fetch layout
    # repack on the d2h path (measured seconds per batch through the TPU
    # tunnel vs 30 ms flat) — hosts reshape after the copy
    return {
        "landmarks": landmarks.reshape(landmarks.shape[0], -1),
        "3dmm": out[OUTPUT_3DMM_PARAMS],
    }


def decode_3dmm_to_mesh(flame, params_3dmm, consts, img_size: int):
    """3DMM params -> (vertices_3d, projected_2d); canonical FLAME decode +
    reprojection shared by the live predictor and the AOT export."""
    from ..core.projection import weak_perspective_project
    from ..core.rotation import rotate_vertices

    params = FlameParams.from_3dmm(params_3dmm, dict(consts))
    v0 = flame_decode(flame, params, zero_rot=True)
    v = rotate_vertices(rot_mat_from_6dof(params.rotation), v0)
    proj = weak_perspective_project(v, params.scale, params.translation, img_size)
    return v, proj[..., :2]


class FaceMeshPredictor:
    def __init__(
        self,
        config: Optional[Dict[str, Any]] = None,
        checkpoint_path: Optional[str] = None,
        flame_path: Optional[str] = None,
        mesh=None,
        require_weights: bool = False,
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` with a ``data`` axis —
        ``predict_batch``, ``predict_images``, and ``predict_frames`` then
        shard every batch over it (weights replicated), scaling serving
        throughput across chips with no other changes.

        ``require_weights``: raise instead of warning when no checkpoint can
        be found or downloaded (the reference downloads its model or fails,
        predictor.py:29-65; the CLIs set this unless --allow-random-weights)."""
        self.config = {**DEFAULT_CONFIG, **(config or {})}
        self._img_size = int(self.config["img_size"])
        self._stride = int(self.config.get("stride", 4))
        self._resize_mode = self.config.get("resize_mode", "longest_max_size")
        self.flame_constants = self.config["constants"]
        self.flame = FlameModel.load(flame_path)

        self.model = create_model(self.config["model"])
        self.variables = self._init_or_load(checkpoint_path, require_weights)
        self.mesh = mesh
        if mesh is not None:
            from ..parallel.mesh import replicate

            self.variables = replicate(self.variables, mesh)
            self.flame = replicate(self.flame, mesh)
        # opt-in int8 PTQ inference (models/quantized.py): an amax dict / npz
        # from tools/calibrate_int8.py switches the device pipeline to the
        # quantized forward (measured ~1.5x on chip; no reference counterpart)
        self.quant_amax = self.config.get("quant_amax")
        if self.quant_amax is not None and self.model.backbone != "resnet50":
            # surface the coverage limit at config-load time, not deep in the
            # forward (the int8 mirror covers the flagship encoder only)
            raise ValueError(
                f"int8 inference (quant_amax) supports the resnet50 flagship "
                f"only; got backbone={self.model.backbone!r}. Drop quant_amax "
                "or switch the model config to resnet50."
            )
        if isinstance(self.quant_amax, str):
            from ..models.quantized import load_amax

            self.quant_amax = load_amax(self.quant_amax)
        self.quant_qparams = None
        if self.quant_amax is not None:
            # fold BN + requantize weights ONCE at load; the per-call forward
            # then reads only the int8 kernels
            from ..models.quantized import prepare_int8_params

            self.quant_qparams = prepare_int8_params(
                self.model, self.variables, dtype=self.model.dtype,
                img_size=self._img_size,
            )

    # -- weights -----------------------------------------------------------
    def _init_or_load(self, checkpoint_path: Optional[str], require_weights: bool = False):
        x = jnp.zeros((1, self._img_size, self._img_size, 3), jnp.float32)
        variables = jax.jit(lambda r: self.model.init(r, x, train=False))(
            jax.random.PRNGKey(0)
        )
        if checkpoint_path is not None and not os.path.isfile(checkpoint_path):
            # an explicitly requested checkpoint must never be silently
            # replaced by the cache/download fallback (a typo'd path would
            # serve the published weights instead of the user's model)
            raise FileNotFoundError(
                f"checkpoint not found: {checkpoint_path}. Train one "
                "(python -m dad3dheads_tpu.cli.train) or port the reference "
                "weights (tools/port_torch_weights.py)."
            )
        path = checkpoint_path or os.path.join(_CKPT_DIR, _CKPT_FILE)
        if not os.path.isfile(path) and self.config.get("model_url"):
            # reference behavior: fetch the published artifact into the cache
            # dir when it is not present locally (predictor.py:29-65)
            path = download_model(self.config["model_url"])
        self.loaded_checkpoint: Optional[str] = None
        if os.path.isfile(path):
            from flax import serialization

            with open(path, "rb") as f:
                variables = serialization.from_bytes(variables, f.read())
            # from_bytes yields HOST numpy leaves; put them on device once —
            # otherwise every inference call re-uploads ~100 MB of weights
            # (measured 3-6 s/call through the TPU tunnel)
            variables = jax.tree_util.tree_map(jnp.asarray, variables)
            logger.info("loaded predictor checkpoint from %s", path)
            self.loaded_checkpoint = path
        elif require_weights:
            raise FileNotFoundError(
                f"no predictor checkpoint at {path} and no model_url configured. "
                "Train one (python -m dad3dheads_tpu.cli.train), port the "
                "reference weights (tools/port_torch_weights.py --torch "
                "model.trcd --out dad_3dnet.msgpack), set model_url in the "
                "predictor config for auto-download, or pass "
                "--allow-random-weights to run with random weights."
            )
        else:
            logger.warning(
                "no checkpoint at %s — using randomly initialized weights", path
            )
        return variables

    # -- the jitted device pipeline ---------------------------------------
    @staticmethod
    def _forward(model_def, variables, images, quantized, quant_amax, qparams):
        """Traced forward on normalized fp32 images (fp or int8 path)."""
        if quantized:
            from ..models.quantized import quantized_forward

            out, _ = quantized_forward(
                model_def, variables, images, amax=quant_amax, mode="int8",
                dtype=model_def.dtype, qparams=qparams,
            )
        else:
            out = model_def.apply(variables, images, train=False)
        return out

    @staticmethod
    @functools.partial(
        jax.jit,
        static_argnames=("model_def", "stride", "img_size", "quantized", "packed"),
    )
    def _device_pipeline(
        model_def, variables, images, stride, img_size, quant_amax=None,
        quantized=False, qparams=None, packed=False,
    ):
        if images.dtype == jnp.uint8:
            # uint8 batches normalize in-graph (one jit, partitions trivially
            # when the batch is sharded over a mesh)
            from ..ops.preprocess import normalize_batch_jax

            images = normalize_batch_jax(images)
        out = FaceMeshPredictor._forward(
            model_def, variables, images, quantized, quant_amax, qparams
        )
        dev = decode_pipeline_outputs(out, stride, img_size)
        if packed:
            # one (B, 136+413) buffer => ONE device->host fetch per batch in
            # the serving drain (each separate fetch pays a full round trip)
            return jnp.concatenate(
                [dev["landmarks"], dev["3dmm"].astype(jnp.float32)], axis=1
            )
        return dev

    @staticmethod
    @functools.partial(
        jax.jit,
        static_argnames=("model_def", "stride", "img_size", "resize_mode", "quantized"),
    )
    def _device_pipeline_frames(
        model_def, variables, frames, sizes, bboxes, stride, img_size,
        resize_mode, quant_amax=None, quantized=False, qparams=None,
    ):
        """Full frames + bboxes in, decoded outputs + readjustment metadata
        out — crop/resize/normalize fused on device (ops/preprocess_device),
        zero host resample work (the north-star serving pipeline)."""
        from ..ops.preprocess_device import preprocess_frames_device

        # planar wire format (pack_frames_host(planar=True)) skips the
        # on-device NHWC->planar relayout on the Pallas path
        layout = "planar" if frames.ndim == 3 else "nhwc"
        images, scales, paddings = preprocess_frames_device(
            frames, sizes, bboxes, img_size, "imagenet", resize_mode,
            layout=layout,
        )
        out = FaceMeshPredictor._forward(
            model_def, variables, images, quantized, quant_amax, qparams
        )
        dev = decode_pipeline_outputs(out, stride, img_size)
        dev["scales"] = scales
        dev["paddings"] = paddings
        return dev

    @staticmethod
    @functools.partial(jax.jit, static_argnames=("consts_key", "img_size"))
    def _decode_3dmm(flame, params_3dmm, consts_key, img_size):
        return decode_3dmm_to_mesh(flame, params_3dmm, consts_key, img_size)

    # -- public API --------------------------------------------------------
    def __call__(self, image: np.ndarray) -> Dict[str, Any]:
        """RGB uint8 (H, W, 3) -> prediction dict in original-image coords."""
        h, w = image.shape[:2]
        tensor, scale, paddings = preprocess_image_np(
            image, self._img_size, mode=self._resize_mode
        )
        consts_key = tuple(sorted(self.flame_constants.items()))

        dev = self._device_pipeline(
            self.model,
            self.variables,
            jnp.asarray(tensor[None]),
            self._stride,
            self._img_size,
            quant_amax=self.quant_amax,
            quantized=self.quant_amax is not None,
            qparams=self.quant_qparams,
        )
        landmarks = np.asarray(dev["landmarks"])[0].reshape(-1, 2)
        pred_3dmm = np.asarray(dev["3dmm"])

        landmarks = readjust_landmarks_np(landmarks, paddings, scale)
        pred_3dmm = readjust_3dmm_np(
            pred_3dmm, paddings, scale, self._img_size, self.flame_constants
        )

        vertices_3d, projected = self._decode_3dmm(
            self.flame, jnp.asarray(pred_3dmm), consts_key, self._img_size
        )
        return {
            "points": np.reshape(landmarks, (-1, 2)),
            "projected_vertices": np.asarray(projected),
            "3d_vertices": np.asarray(vertices_3d[0]),
            "3dmm_params": pred_3dmm,
        }

    def _put(self, tree):
        """Shard batch-leading array(s) over the mesh's data axis when this
        predictor serves multi-chip; identity otherwise."""
        if self.mesh is None:
            return tree
        from ..parallel.mesh import shard_batch

        return shard_batch(tree, self.mesh)

    def predict_batch(self, images: np.ndarray) -> Dict[str, Any]:
        """Batched prediction on pre-sized square inputs (B, S, S, 3) uint8 or
        fp32-normalized. Returns network-frame outputs (no per-image
        readjustment)."""
        B = images.shape[0]
        pad = 0
        if self.mesh is not None:
            # shard the (4x-smaller if uint8) batch over the data axis; the
            # jitted pipeline normalizes in-graph
            from ..parallel.mesh import pad_batch_to_devices, shard_batch

            pad = pad_batch_to_devices(B, self.mesh) - B
            if pad:
                images = np.concatenate([images, images[-1:].repeat(pad, 0)], 0)
            x = shard_batch(jnp.asarray(images), self.mesh)
        elif images.dtype == np.uint8:
            from ..ops.preprocess_pallas import normalize_images

            x = normalize_images(jnp.asarray(images))
        else:
            x = jnp.asarray(images)
        consts_key = tuple(sorted(self.flame_constants.items()))
        dev = self._device_pipeline(
            self.model, self.variables, x, self._stride, self._img_size,
            quant_amax=self.quant_amax, quantized=self.quant_amax is not None,
            qparams=self.quant_qparams,
        )
        vertices_3d, projected = self._decode_3dmm(
            self.flame, dev["3dmm"], consts_key, self._img_size
        )
        out = {
            "points": np.asarray(dev["landmarks"]).reshape(B + pad, -1, 2),
            "projected_vertices": np.asarray(projected),
            "3d_vertices": np.asarray(vertices_3d),
            "3dmm_params": np.asarray(dev["3dmm"]),
        }
        if pad:
            out = {k: v[:B] for k, v in out.items()}
        return out

    def predict_images(
        self, images, batch_size: int = 32, num_workers: int = 0,
        with_mesh: bool = True,
    ) -> list:
        """Bulk prediction: iterable of RGB uint8 images -> list of per-image
        dicts in ORIGINAL image coordinates (the ``__call__`` contract),
        batched on device.

        The serving path: preprocessing runs on host threads
        (``num_workers``), every device call uses one padded compile shape
        (``batch_size``), and up to two batches stay in flight so JAX's async
        dispatch overlaps host readjustment with device compute. The
        reference's predictor is strictly one-image (predictor.py:78-83).

        ``with_mesh=False`` skips the FLAME decode and the mesh device->host
        fetch (~6 MB/batch) — the right mode when serving only landmarks +
        3DMM params (cli/predict.py jsonl format); the returned dicts then
        carry just {"points", "3dmm_params"}.

        ``images`` may also be one device-resident ``jax.Array`` of shape
        (N, S, S, 3): each batch_size slice runs as one packed jit dispatch
        whose (B, 136+413) result is fetched asynchronously so the transfer
        overlaps the next batch's compute, followed by one vectorized
        readjustment — no host->device transfer and no host preprocessing;
        the serving-bench path that isolates orchestration overhead (measured
        93% of the raw device pipeline rate, SERVING_r03.json)."""
        import collections
        import concurrent.futures as cf

        contiguous_device = isinstance(images, jax.Array)
        if contiguous_device:
            assert images.ndim == 4 and images.shape[1] == self._img_size, images.shape
            if images.dtype != jnp.uint8:
                # the jitted pipeline only normalizes uint8 batches — coerce
                # float 0-255 device arrays the same way the host path does,
                # so they never reach the network unnormalized
                images = _coerce_u8(images)
            n_total = images.shape[0]
            if n_total == 0:
                return []
        else:
            images = list(images)
            if not images:
                return []
        # uint8 tensors: 4x fewer host->device bytes; the jitted pipeline
        # normalizes in-graph (it only does so for uint8 batches, so coerce
        # float 0-255 inputs to uint8 here — otherwise raw values would reach
        # the network unnormalized). Device-resident jax arrays (already
        # img_size square) pass through untouched — the serving-bench path
        # that isolates orchestration overhead from host->device transfer.
        def prep(im):
            if isinstance(im, jax.Array):
                assert im.shape[:2] == (self._img_size, self._img_size), im.shape
                if im.dtype != jnp.uint8:
                    im = _coerce_u8(im)
                return im, 1.0, [0, 0, 0, 0]
            if im.dtype != np.uint8:
                im = np.clip(np.round(im), 0, 255).astype(np.uint8)
            return preprocess_image_np(
                im, self._img_size, normalize="none", mode=self._resize_mode
            )
        consts_key = tuple(sorted(self.flame_constants.items()))
        lm_cols = 2 * self.model.num_classes
        if contiguous_device:
            return self._predict_bulk_device(
                images, n_total, batch_size, with_mesh, consts_key, lm_cols
            )
        if num_workers > 1:
            with cf.ThreadPoolExecutor(num_workers) as ex:
                prepped = list(ex.map(prep, images))
        else:
            prepped = [prep(im) for im in images]
        n_items = len(prepped)
        results: list = []
        pending: collections.deque = collections.deque()

        def drain():
            dev, count, metas = pending.popleft()
            packed = np.asarray(dev)  # ONE d2h fetch: (batch, 136 + 413)
            landmarks_b = packed[:, :lm_cols].reshape(packed.shape[0], -1, 2)
            mm_b = packed[:, lm_cols:]
            pts, adj = [], []
            for j in range(count):
                scale, pads = metas[j]
                pts.append(readjust_landmarks_np(landmarks_b[j], pads, scale))
                adj.append(
                    readjust_3dmm_np(
                        mm_b[j : j + 1], pads, scale, self._img_size, self.flame_constants
                    )
                )
            adj = np.concatenate(adj, 0)
            if not with_mesh:
                for j in range(count):
                    results.append(
                        {
                            "points": np.reshape(pts[j], (-1, 2)),
                            "3dmm_params": adj[j : j + 1],
                        }
                    )
                return
            # pad the decode to the same compiled batch shape as the pipeline
            dpad = batch_size - count
            adj_dev = np.concatenate([adj, np.repeat(adj[-1:], dpad, 0)]) if dpad else adj
            v3, proj = self._decode_3dmm(
                self.flame, self._put(jnp.asarray(adj_dev)), consts_key,
                self._img_size,
            )
            v3, proj = np.asarray(v3), np.asarray(proj)
            for j in range(count):
                results.append(
                    {
                        "points": np.reshape(pts[j], (-1, 2)),
                        "projected_vertices": proj[j : j + 1],
                        "3d_vertices": v3[j],
                        "3dmm_params": adj[j : j + 1],
                    }
                )

        for lo in range(0, n_items, batch_size):
            count = min(batch_size, n_items - lo)
            chunk = prepped[lo : lo + batch_size]
            tensors = [t for t, _, _ in chunk]
            if isinstance(tensors[0], jax.Array):
                x = jnp.stack(tensors)  # device-side stack, no transfer
                if count < batch_size:
                    x = jnp.concatenate(
                        [x, jnp.repeat(x[-1:], batch_size - count, 0)]
                    )
            else:
                x = np.stack(tensors)
                if count < batch_size:
                    x = np.concatenate(
                        [x, np.repeat(x[-1:], batch_size - count, 0)]
                    )
            metas = [(s, p) for _, s, p in chunk]
            # multi-chip serving: shard the batch over the data axis so every
            # device runs batch_size/n_data images (weights replicated at
            # load; batch_size must divide by the axis)
            x = self._put(jnp.asarray(x))
            dev = self._device_pipeline(
                self.model,
                self.variables,
                x,
                self._stride,
                self._img_size,
                quant_amax=self.quant_amax,
                quantized=self.quant_amax is not None,
                qparams=self.quant_qparams,
                packed=True,
            )
            # start the device->host copy now; by drain time (two batches
            # later) the bytes are already local and np.asarray is free
            try:
                dev.copy_to_host_async()
            except AttributeError:
                pass
            pending.append((dev, count, metas))
            if len(pending) >= 2:
                drain()
        while pending:
            drain()
        return results

    def _predict_bulk_device(
        self, images, n_items, batch_size, with_mesh, consts_key, lm_cols
    ) -> list:
        """Device-resident bulk: per-batch jit dispatches with async d2h of
        each packed result, so result transfer overlaps the next batch's
        compute (only the LAST batch's fetch tails the pipeline), then one
        vectorized readjustment (device inputs are already network-frame, so
        scale=1 and zero padding for every image)."""
        if n_items % batch_size:
            pad_n = batch_size - n_items % batch_size
            images = jnp.concatenate([images, jnp.repeat(images[-1:], pad_n, 0)])
        outs = []
        for lo in range(0, images.shape[0], batch_size):
            o = self._device_pipeline(
                self.model,
                self.variables,
                self._put(images[lo : lo + batch_size]),
                self._stride,
                self._img_size,
                quant_amax=self.quant_amax,
                quantized=self.quant_amax is not None,
                qparams=self.quant_qparams,
                packed=True,
            )
            try:
                o.copy_to_host_async()
            except AttributeError:
                pass
            outs.append(o)
        packed = np.concatenate([np.asarray(o) for o in outs])[:n_items]
        identity = [0, 0, 0, 0]
        pts = readjust_landmarks_np(
            packed[:, :lm_cols].reshape(n_items, -1, 2), identity, 1.0
        )
        adj = readjust_3dmm_np(
            packed[:, lm_cols:], identity, 1.0, self._img_size, self.flame_constants
        )
        results: list = []
        if not with_mesh:
            for j in range(n_items):
                results.append({"points": pts[j], "3dmm_params": adj[j : j + 1]})
            return results
        for lo in range(0, n_items, batch_size):
            count = min(batch_size, n_items - lo)
            dpad = batch_size - count
            adj_dev = adj[lo : lo + batch_size]
            if dpad:
                adj_dev = np.concatenate([adj_dev, np.repeat(adj_dev[-1:], dpad, 0)])
            v3, proj = self._decode_3dmm(
                self.flame, self._put(jnp.asarray(adj_dev)), consts_key,
                self._img_size,
            )
            v3, proj = np.asarray(v3), np.asarray(proj)
            for j in range(count):
                results.append(
                    {
                        "points": pts[lo + j],
                        "projected_vertices": proj[j : j + 1],
                        "3d_vertices": v3[j],
                        "3dmm_params": adj[lo + j : lo + j + 1],
                    }
                )
        return results

    def predict_frames(
        self,
        frames,
        bboxes=None,
        batch_size: int = 32,
        with_mesh: bool = True,
        frame_bucket: int = 64,
    ) -> list:
        """Bulk prediction from FULL frames (+ optional bboxes), preprocessing
        ON DEVICE: the host only pastes each uint8 frame into a static padded
        buffer — crop, aspect-preserving resize, center pad, and ImageNet
        normalization all run inside the jitted pipeline
        (ops/preprocess_device.py), closing the north-star "preprocess fuses
        on device" target. Compare ``predict_images``, which resamples with
        cv2 on host threads.

        Args:
          frames: iterable of RGB uint8 (H, W, 3) full frames (sizes may vary;
            buffers are padded to the chunk max, rounded up to
            ``frame_bucket`` to bound recompilation).
          bboxes: optional (N, 4) int [x0, y0, x1, y1] crop windows, clamped
            to each frame; default = whole frame.

        Returns per-frame dicts in the ``__call__`` contract, with "points"
        in FULL-FRAME coordinates (crop origin added back); "3dmm_params"
        stays in the crop frame like the reference's predictor output."""
        import collections

        frames = list(frames)
        if not frames:
            return []
        n = len(frames)
        if bboxes is None:
            bb = [(0, 0, f.shape[1], f.shape[0]) for f in frames]
        else:
            bb = []
            for i, b in enumerate(bboxes):
                h_, w_ = frames[i].shape[:2]
                x0 = int(np.clip(b[0], 0, w_ - 1))
                y0 = int(np.clip(b[1], 0, h_ - 1))
                bb.append(
                    (x0, y0, int(np.clip(b[2], x0 + 1, w_)), int(np.clip(b[3], y0 + 1, h_)))
                )
        consts_key = tuple(sorted(self.flame_constants.items()))
        results: list = []
        pending: collections.deque = collections.deque()

        def drain():
            dev, count, metas = pending.popleft()
            lms = np.asarray(dev["landmarks"])
            lms = lms.reshape(lms.shape[0], -1, 2)
            mm = np.asarray(dev["3dmm"])
            scales = np.asarray(dev["scales"])
            pads = np.asarray(dev["paddings"])
            pts, adj = [], []
            for j in range(count):
                p = pads[j].tolist()
                s = scales[j]
                x0, y0 = metas[j][0], metas[j][1]
                pt = readjust_landmarks_np(lms[j], p, s) + np.asarray([[x0, y0]])
                pts.append(pt)
                adj.append(
                    readjust_3dmm_np(mm[j : j + 1], p, s, self._img_size, self.flame_constants)
                )
            adj = np.concatenate(adj, 0)
            if not with_mesh:
                for j in range(count):
                    results.append({"points": pts[j], "3dmm_params": adj[j : j + 1]})
                return
            dpad = batch_size - count
            adj_dev = np.concatenate([adj, np.repeat(adj[-1:], dpad, 0)]) if dpad else adj
            v3, proj = self._decode_3dmm(
                self.flame, self._put(jnp.asarray(adj_dev)), consts_key,
                self._img_size,
            )
            v3, proj = np.asarray(v3), np.asarray(proj)
            for j in range(count):
                results.append(
                    {
                        "points": pts[j],
                        "projected_vertices": proj[j : j + 1],
                        "3d_vertices": v3[j],
                        "3dmm_params": adj[j : j + 1],
                    }
                )

        from ..ops.preprocess_device import pack_frames_host

        for lo in range(0, n, batch_size):
            chunk = frames[lo : lo + batch_size]
            cb = bb[lo : lo + batch_size]
            count = len(chunk)
            buf, sizes, boxes = pack_frames_host(
                chunk, cb, batch_size, bucket=frame_bucket, planar=True
            )
            xb, xs, xbx = self._put(
                (jnp.asarray(buf), jnp.asarray(sizes), jnp.asarray(boxes))
            )
            dev = self._device_pipeline_frames(
                self.model,
                self.variables,
                xb,
                xs,
                xbx,
                self._stride,
                self._img_size,
                self._resize_mode,
                quant_amax=self.quant_amax,
                quantized=self.quant_amax is not None,
                qparams=self.quant_qparams,
            )
            pending.append((dev, count, cb))
            if len(pending) >= 2:
                drain()
        while pending:
            drain()
        return results

    @classmethod
    def dad_3dnet(cls, checkpoint_path: Optional[str] = None, **kwargs) -> "FaceMeshPredictor":
        """The flagship predictor (reference: FaceMeshPredictor.dad_3dnet)."""
        return cls(DEFAULT_CONFIG, checkpoint_path=checkpoint_path, **kwargs)

    @classmethod
    def from_yaml(cls, path: str) -> "FaceMeshPredictor":
        """Build from a predictor config yaml (configs/dad_3dnet.yaml)."""
        import yaml

        with open(path) as f:
            config = yaml.safe_load(f)
        ckpt = config.pop("checkpoint", None)
        if ckpt:
            ckpt = os.path.expanduser(ckpt)
            if not os.path.isfile(ckpt):
                ckpt = None
        return cls(config, checkpoint_path=ckpt)
