"""FlameDataset: the DAD-3DHeads annotation format -> fixed-shape batches.

Behavioral spec: /root/reference/model_training/data/flame_dataset.py —
per item: read RGB, jitter+clamp the bbox (each side grows U(0.05, 0.15)),
crop; load the GT mesh json (vertices + model_view_matrix -> homogeneous
world vertices, projection_matrix); project the 68 barycentric landmarks (or
a keypoint index subset) and all 5023 vertices to crop space with a y-flip;
resize/pad/normalize; split targets; presence = in-crop test; heatmaps as
uint8 Gaussians; landmarks normalized to [0, 1].

TPU-first split of responsibilities:
  - host workers (threads + this class): jpeg decode, crop, resize to the
    static 256x256, keypoint projection — everything shape-dynamic;
  - device (jitted): heatmap splatting is vectorized on device by default
    (``encode_heatmap``), instead of the reference's per-keypoint numpy loop;
    a host ``HeatmapCoder`` is provided for API parity / offline use.

Failed samples are skipped and replaced by duplicating earlier items, like
the reference's ``collate_skip_none`` (flame_dataset.py:38-44).
"""

from __future__ import annotations

import json
import os
import queue
import threading
from typing import Any, Dict, Iterator, List, Optional

import numpy as np

from ..constants import (
    IMAGE_FILENAME_KEY,
    INPUT_BBOX_KEY,
    INPUT_IMAGE_KEY,
    SAMPLE_INDEX_KEY,
    TARGET_2D_FULL_LANDMARKS,
    TARGET_2D_LANDMARKS,
    TARGET_2D_LANDMARKS_PRESENCE,
    TARGET_3D_MODEL_VERTICES,
    TARGET_LANDMARKS_HEATMAP,
)
from .. import assets
from ..ops.preprocess import preprocess_image_np, transform_keypoints_np
from .bbox import random_extended_bbox


def read_as_rgb(path: str) -> np.ndarray:
    """Read an image file as RGB uint8 (H, W, 3)."""
    import cv2

    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        from PIL import Image

        return np.asarray(Image.open(path).convert("RGB"))
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


class HeatmapCoder:
    """Host-side per-sample Gaussian heatmap encoder (API parity with
    /root/reference/model_training/data/coder.py; the device path uses
    ops.heatmap.encode_heatmap instead)."""

    def __init__(self, img_size: int = 256, stride: int = 4, radius=5, num_classes: int = 68):
        self.img_size = img_size
        self.stride = stride
        self.num_classes = num_classes
        if radius == "pointwise":
            # fixed 3x3 kernel (reference pointwise_gaussian_2d,
            # data/utils.py:37-39)
            self.radius = 1
            self._gaussian = np.asarray(
                [[0.5, 0.75, 0.5], [0.75, 1.0, 0.75], [0.5, 0.75, 0.5]], np.float32
            )
        else:
            self.radius = int(radius)
            d = 2 * self.radius + 1
            sigma = d / 6.0
            ax = np.arange(-self.radius, self.radius + 1)
            xx, yy = np.meshgrid(ax, ax)
            g = np.exp(-(xx * xx + yy * yy) / (2 * sigma * sigma)).astype(np.float32)
            g[g < np.finfo(np.float32).eps * g.max()] = 0
            self._gaussian = g

    def __call__(self, keypoints: np.ndarray, presence: np.ndarray) -> np.ndarray:
        size = self.img_size // self.stride
        hm = np.zeros((self.num_classes, size, size), np.float32)
        r = self.radius
        for i, kp in enumerate(keypoints):
            if not presence[i]:
                continue
            x, y = int(kp[0] // self.stride), int(kp[1] // self.stride)
            if x < 0 or y < 0 or x >= size or y >= size:
                continue
            l, rr = min(x, r), min(size - x, r + 1)
            t, b = min(y, r), min(size - y, r + 1)
            patch = self._gaussian[r - t : r + b, r - l : r + rr]
            np.maximum(hm[i, y - t : y + b, x - l : x + rr], patch, out=hm[i, y - t : y + b, x - l : x + rr])
        return np.uint8(255.0 * hm)


class FlameDataset:
    """data: list of {img_path, annotation_path, bbox}; config: dataset dict
    (dataset_root, img_size, stride, num_classes, keypoints, transform)."""

    def __init__(self, data: List[Dict[str, Any]], config: Dict[str, Any]):
        self.data = data
        self.config = config
        self.root = config.get("dataset_root", ".")
        self.img_size = int(config.get("img_size", 256))
        self.stride = int(config.get("stride", 4))
        self.num_classes = int(config.get("num_classes", 68))
        self.normalize = config.get("transform", {}).get("normalize", "imagenet")
        # reference offers 'longest_max_size' (aspect + pad) and plain
        # 'resize' (data/transforms.py:7-24)
        self.resize_mode = config.get("transform", {}).get("resize_mode", "longest_max_size")
        # uint8 output defers normalization to the device (4x cheaper
        # host->device transfer; the train step normalizes on chip)
        self.output_uint8 = bool(config.get("output_uint8", False))
        # device_heatmap defers heatmap encoding to the device entirely: the
        # sample carries NO heatmap and the train/eval step synthesizes it
        # with ops/heatmap.py (bit-equal to the host coder). Kills the
        # single biggest per-item host cost after JPEG decode — the
        # reference burns this in every worker process
        # (model_training/data/flame_dataset.py:64-71 -> coder.py)
        self.device_heatmap = bool(config.get("device_heatmap", False))
        kp_cfg = config.get("keypoints", {}) or {}
        subset_name = kp_cfg.get("2d_subset_name", "multipie_keypoints")
        if subset_name == "multipie_keypoints":
            self.keypoint_indices = None  # 68 barycentric landmarks
        else:
            self.keypoint_indices = assets.load_keypoint_subset(subset_name)
        self.coder = HeatmapCoder(
            self.img_size,
            self.stride,
            radius=config.get("radius", 5),
            num_classes=self.num_classes,
        )
        self.train_mode = bool(config.get("train_mode", True))
        self._seed = int(config.get("seed", 0))
        # lazy torch-free landmark evaluation on host
        emb = assets.load_landmark_embeddings()
        faces = assets.get_faces()
        self._static_vids = faces[emb["static_lmk_face_idx"]]
        self._static_bary = emb["static_lmk_b_coords"]
        self._dyn_vids = faces[emb["dynamic_lmk_face_idx"][0]]
        self._dyn_bary = emb["dynamic_lmk_b_coords"][0]

    # -- construction ------------------------------------------------------
    @classmethod
    def from_config(cls, config: Dict[str, Any]) -> "FlameDataset":
        with open(config["ann_path"]) as f:
            anno = json.load(f)
        return cls(data=anno, config=config)

    def __len__(self) -> int:
        return len(self.data)

    # -- per-sample pipeline ----------------------------------------------
    def _landmarks68_host(self, vertices: np.ndarray) -> np.ndarray:
        """(5023, 3) -> (68, 3), numpy (dynamic contour at zero pose)."""
        stat = np.einsum("kic,ki->kc", vertices[self._static_vids], self._static_bary)
        dyn = np.einsum("kic,ki->kc", vertices[self._dyn_vids], self._dyn_bary)
        return np.concatenate([dyn, stat], axis=0)

    @staticmethod
    def _load_mesh(path: str):
        # parsing the ~340 KB vertex json is 86% of the per-item cost
        # (14 of 16 ms, measured) and holds the GIL, so loader threads don't
        # scale; cache the arrays as ONE raw sidecar .npy on first parse —
        # np.load of a plain .npy is ~10x cheaper than an .npz (no zipfile /
        # header parsing) and later epochs drop to ~2.5 ms/item.
        # Layout: rows 0..V-1 = [v3d | world_homo] (V, 7); the final row
        # carries the flattened 4x4 projection matrix in its first... 16
        # slots of a (3, 7)-row tail (21 >= 16).
        cache = path + ".cache.npy"
        V = None
        try:
            if os.path.getmtime(cache) >= os.path.getmtime(path):
                a = np.load(cache)
                V = a.shape[0] - 3
                return a[:V, :3], a[:V, 3:7], a[V:].ravel()[:16].reshape(4, 4)
        except (OSError, ValueError):
            pass  # absent/stale/corrupt cache -> reparse below
        with open(path) as f:
            data = json.load(f)
        v3d = np.asarray(data["vertices"], np.float32)
        mv = np.asarray(data["model_view_matrix"], np.float32)
        homo = np.concatenate([v3d, np.ones_like(v3d[:, :1])], -1)
        world_homo = (homo @ mv.T).astype(np.float32)
        proj = np.asarray(data["projection_matrix"], np.float32)
        try:
            packed = np.concatenate([v3d, world_homo], axis=1)  # (V, 7)
            tail = np.zeros((3, 7), np.float32)
            tail.ravel()[:16] = proj.ravel()
            packed = np.concatenate([packed, tail], axis=0)
            # atomic publish so concurrent loader threads never read a
            # half-written cache; read-only dataset dirs just skip caching
            tmp = cache + f".tmp{os.getpid()}-{threading.get_ident()}"
            with open(tmp, "wb") as f:
                np.save(f, packed)  # file handle: no implicit .npy suffix
            os.replace(tmp, cache)
        except OSError:
            pass
        return v3d, world_homo, proj

    @staticmethod
    def _project(world_homo: np.ndarray, proj: np.ndarray, height: float, cx: float, cy: float):
        p = world_homo @ proj.T
        xy = p[:, :2] / p[:, 3:4]
        xy = np.stack([xy[:, 0], height - xy[:, 1]], -1)
        return xy - np.asarray([cx, cy], np.float32)

    def __getitem__(self, idx: int) -> Optional[Dict[str, Any]]:
        try:
            item = self.data[idx]
            img = read_as_rgb(os.path.join(self.root, item["img_path"]))
            # per-sample generator: numpy Generators are not thread-safe, and
            # __getitem__ runs on loader threads; (seed, idx) keeps the jitter
            # deterministic and race-free
            rng = np.random.default_rng((self._seed, idx))
            bbox = random_extended_bbox(item["bbox"], img.shape[:2], rng)
            x, y, w, h = bbox
            crop = img[y : y + h, x : x + w]
            if crop.size == 0:
                return None

            v3d, world_homo, proj = self._load_mesh(
                os.path.join(self.root, item["annotation_path"])
            )
            height = img.shape[0]
            if self.keypoint_indices is None:
                lm3 = self._landmarks68_host(world_homo[:, :3])
                lm3h = np.concatenate([lm3, np.ones_like(lm3[:, :1])], -1)
            else:
                lm3h = world_homo[self.keypoint_indices]
            lms_2d = self._project(lm3h, proj, height, x, y)
            full_2d = self._project(world_homo, proj, height, x, y)

            presence = (
                (lms_2d[:, 0] > 0) & (lms_2d[:, 0] < w) & (lms_2d[:, 1] > 0) & (lms_2d[:, 1] < h)
            )

            norm = "none" if self.output_uint8 else self.normalize
            tensor, scale, pads = preprocess_image_np(
                crop, self.img_size, norm, mode=self.resize_mode
            )
            if self.output_uint8 and tensor.dtype != np.uint8:
                # preprocess 'none' already returns raw uint8; this rescale
                # exists only for a float-returning preprocess (a 0..1 image)
                # — applying it to uint8 saturated every pixel >= 1 to 255
                tensor = np.clip(tensor * 255.0 + 0.5, 0, 255).astype(np.uint8)
            lms_t = transform_keypoints_np(lms_2d, scale, pads)
            full_t = transform_keypoints_np(full_2d, scale, pads)

            sample = {
                SAMPLE_INDEX_KEY: idx,
                IMAGE_FILENAME_KEY: item["img_path"],
                INPUT_IMAGE_KEY: tensor,
                INPUT_BBOX_KEY: np.asarray(bbox, np.float32),
                TARGET_3D_MODEL_VERTICES: v3d,
                TARGET_2D_LANDMARKS: (lms_t / self.img_size).astype(np.float32),
                TARGET_2D_FULL_LANDMARKS: full_t.astype(np.float32),
                TARGET_2D_LANDMARKS_PRESENCE: presence,
            }
            if not self.device_heatmap:
                heatmap = self.coder(lms_t, presence)  # (C, S, S) uint8
                sample[TARGET_LANDMARKS_HEATMAP] = np.transpose(heatmap, (1, 2, 0))
            return sample
        except (OSError, KeyError, ValueError, json.JSONDecodeError):
            return None


def collate(samples: List[Optional[Dict[str, Any]]]) -> Dict[str, Any]:
    """Stack samples; None entries are replaced by duplicating good ones."""
    good = [s for s in samples if s is not None]
    if not good:
        raise RuntimeError("all samples in batch failed to load")
    n_good = len(good)
    while len(good) < len(samples):
        good.append(good[(len(good) - n_good) % n_good])
    out: Dict[str, Any] = {}
    for k in good[0]:
        vals = [s[k] for s in good]
        if isinstance(vals[0], np.ndarray):
            out[k] = np.stack(vals)
        else:
            out[k] = vals
    return out


def _process_worker(dataset, batches, out_q, prefetch_sem):
    """Loader worker-PROCESS main: compute + collate assigned batches in
    order, publish (or relay the first exception), then a None sentinel.
    ``prefetch_sem`` bounds how many finished batches may sit unconsumed in
    the pipe (queue.put returns before the consumer reads, so the queue's
    own maxsize cannot provide backpressure across processes)."""
    try:
        for b in batches:
            prefetch_sem.acquire()
            out_q.put(collate([dataset[i] for i in b]))
    except BaseException as e:  # noqa: BLE001 — relayed to the consumer
        try:
            out_q.put(e)
        except Exception:
            out_q.put(RuntimeError(f"loader worker failed: {e!r}"))
    finally:
        out_q.put(None)


class DataLoader:
    """Prefetching loader producing numpy batches, with thread OR process
    workers (``worker_mode``).

    The reference delegates to torch DataLoader worker *processes*
    (flame_dataset.py usage: ``num_workers`` in the Lightning config); both
    modes are provided here because which wins is a host property:

    - ``"thread"`` (default): zero IPC — best when per-item Python work is
      light (2.3 ms/item with device heatmaps) and cores are scarce. Thread
      count is clamped to the CPU count: the GIL serializes the numpy-light
      sections, so surplus threads only add contention (measured on a 1-core
      host: 8 threads 300 img/s vs 1 thread 438 img/s — the r04 anomaly).
    - ``"process"``: PERSISTENT worker processes (not the per-epoch pool
      measured and rejected in r03 — that paid re-import + per-item pickle).
      Batches are statically assigned round-robin, each worker collates its
      batch and ships ONE pickled numpy dict per batch through a pipe;
      the parent polls workers in assignment order, so batch order (and
      therefore every sample's (seed, idx) jitter stream) is identical to
      thread mode. True multi-core scaling for the decode+projection work;
      per-batch IPC is a memcpy-rate unpickle on the consumer side.
      ``mp_context`` defaults to "spawn": forking a JAX parent deadlocks —
      measured with the TPU client attached (worker inherits locked mutexes
      from the runtime's threads and hangs in its first batch; Trainer.fit
      froze until killed). Spawn pays a one-time ~2-4 s re-import per worker,
      amortized by persistence; "fork" stays available for numpy-only
      parents.

    Multi-host: pass ``process_index``/``process_count`` (defaults: JAX's) and
    the SAME ``seed`` on every host. Each epoch every process draws the same
    permutation, takes the interleaved slice ``order[rank::count]``
    (DistributedSampler semantics, reference
    flame_lightning_model.py:182-186), and yields LOCAL batches of
    ``batch_size // process_count`` samples. The per-epoch batch count is
    computed from ``len(dataset) // process_count`` so every process yields
    exactly the same number of batches — a divergent tail would deadlock the
    cross-host collectives inside the train step.
    """

    def __init__(
        self,
        dataset: FlameDataset,
        batch_size: int,
        shuffle: bool = True,
        num_workers: int = 8,
        prefetch: int = 4,
        seed: int = 0,
        drop_last: bool = True,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
        worker_mode: str = "thread",
        mp_context: str = "spawn",
    ):
        if worker_mode not in ("thread", "process"):
            raise ValueError(f"worker_mode must be 'thread' or 'process', got {worker_mode!r}")
        if process_index is None or process_count is None:
            import jax

            process_index = jax.process_index() if process_index is None else process_index
            process_count = jax.process_count() if process_count is None else process_count
        if batch_size % process_count != 0:
            raise ValueError(
                f"global batch size {batch_size} must be divisible by "
                f"process_count {process_count}"
            )
        self.dataset = dataset
        self.batch_size = batch_size
        self.local_batch_size = batch_size // process_count
        self.process_index = process_index
        self.process_count = process_count
        self.shuffle = shuffle
        self.worker_mode = worker_mode
        self.mp_context = mp_context
        if worker_mode == "thread":
            # surplus GIL-bound threads only contend (r04: 8 threads slower
            # than 1 on a 1-core host); processes scale past the GIL
            num_workers = min(num_workers, os.cpu_count() or num_workers)
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)

    def set_batch_size(self, batch_size: int) -> None:
        """Rebind the GLOBAL batch size (the auto_scale_batch_size hook —
        train/loop.py Trainer.tune_batch_size); takes effect next epoch."""
        if batch_size % self.process_count != 0:
            raise ValueError(
                f"global batch size {batch_size} must be divisible by "
                f"process_count {self.process_count}"
            )
        self.batch_size = batch_size
        self.local_batch_size = batch_size // self.process_count

    def __len__(self) -> int:
        n = len(self.dataset) // self.process_count
        b = self.local_batch_size
        return n // b if self.drop_last else (n + b - 1) // b

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(order)
        # every process sees the same length (the interleaved slice is
        # truncated to the shortest process's count)
        n_local = len(order) // self.process_count
        local_order = order[self.process_index :: self.process_count][:n_local]
        bs = self.local_batch_size
        batches = [
            local_order[i : i + bs] for i in range(0, len(local_order), bs)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == bs]

        if self.worker_mode == "process":
            yield from self._iter_processes(batches)
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put_or_stop(item) -> bool:
            # bounded put that re-checks the stop flag, so an abandoned
            # iterator (consumer broke out early) cannot wedge the worker in
            # a full queue forever
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            from concurrent.futures import ThreadPoolExecutor

            try:
                with ThreadPoolExecutor(self.num_workers) as ex:
                    for b in batches:
                        if stop.is_set():
                            return
                        samples = list(ex.map(self.dataset.__getitem__, b))
                        if not put_or_stop(collate(samples)):
                            return
            except BaseException as e:  # noqa: BLE001 — relayed to consumer
                # a crash must surface in the training loop, not silently end
                # the epoch early: a truncated epoch on one host desyncs the
                # per-process batch counts and deadlocks cross-host
                # collectives
                put_or_stop(e)
                return
            finally:
                put_or_stop(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                if isinstance(batch, BaseException):
                    raise batch
                yield batch
        finally:
            stop.set()

    def _iter_processes(self, batches) -> Iterator[Dict[str, Any]]:
        """Persistent worker-process pipeline: worker w owns batches[w::W] (in
        order), so the parent reading worker (i % W) for batch i preserves
        the exact thread-mode batch order. A per-worker semaphore bounds
        in-flight finished batches to ``prefetch`` (backpressure across the
        process boundary)."""
        import multiprocessing as mp

        if not batches:
            return
        ctx = mp.get_context(self.mp_context)
        n_w = min(self.num_workers, len(batches))
        queues, sems, procs = [], [], []
        try:
            for w in range(n_w):
                q = ctx.Queue()
                sem = ctx.Semaphore(max(1, self.prefetch))
                p = ctx.Process(
                    target=_process_worker,
                    args=(self.dataset, batches[w::n_w], q, sem),
                    daemon=True,
                )
                p.start()
                queues.append(q)
                sems.append(sem)
                procs.append(p)
            for i in range(len(batches)):
                w = i % n_w
                while True:
                    try:
                        batch = queues[w].get(timeout=5.0)
                        break
                    except queue.Empty:
                        if not procs[w].is_alive():
                            raise RuntimeError(
                                f"loader worker {w} died (exit code "
                                f"{procs[w].exitcode}) without relaying an error"
                            ) from None
                if batch is None:
                    raise RuntimeError(f"loader worker {w} ended early")
                if isinstance(batch, BaseException):
                    raise batch
                sems[w].release()
                yield batch
        finally:
            for p in procs:
                if p.is_alive():
                    p.terminate()
            for p in procs:
                p.join(timeout=5.0)
