"""DAD-3DHeads benchmark evaluator: pose error, reprojection NME, one-sided
Chamfer, and Z_n depth-ordinal accuracy, aggregated overall + per-attribute.

Behavioral spec: /root/reference/dad_3dheads_benchmark/benchmark.py +
utils.py —
  - pose error ||I - R_pred R_gt^T||_F with a 180-degree x-rotation flip of
    the GT model-view (benchmark.py:73-84);
  - NME over the 68 projected GT landmarks / sqrt(bbox area) * 100
    (benchmark.py:86-99);
  - Chamfer: GT scaled to 20mm inter-eye distance, prediction aligned by
    7-landmark Procrustes, one-sided squared chamfer from the GT *face*
    subset to the aligned prediction (utils.py:122-141, kaolin semantics
    w1=1, w2=0);
  - Z_n: ordinal depth agreement over each head-subset vertex's n nearest
    GT neighbors (benchmark.py:111-151).

TPU-first redesign: every metric is vectorized JAX. Chamfer is a tiled
pairwise-min reduction; Z_n replaces the reference's O(K*n) python loop with
one top-k + gather + boolean reduction. Procrustes runs in numpy (7x3 SVD —
host-trivial, batched over the whole submission via LAPACK's stacked SVD).

Unlike the reference's per-sample scoring loop (benchmark.py:153-196 — one
kaolin/python dispatch per item), the whole submission is scored in ONE jit
dispatch: samples are stacked (FLAME topology is fixed, so no padding) and
``lax.map`` walks chunks of 8 on device, which bounds the live pairwise
matrices while amortizing dispatch overhead over the full set. The tiny math
(68-landmark barycentric embedding, 7x3 Procrustes, projection) runs on host
in numpy, which is batching-invariant by construction — that is what makes
the batched scorer BIT-identical to the per-sample oracle path
(``DADEvaluator.__call__(batched=False)``); the two are pinned equal by
tests/test_benchmark.py.
"""

from __future__ import annotations

import functools
import json
import logging
from collections import defaultdict
from typing import Any, Dict, List, Optional, Tuple

logger = logging.getLogger(__name__)

import jax
import jax.numpy as jnp
import numpy as np

from .. import assets
from ..core.landmarks import LandmarkEmbedding

SEVEN_LMK_INDICES = np.array([36, 39, 42, 45, 33, 48, 54])


# ---------------------------------------------------------------------------
# geometry helpers
# ---------------------------------------------------------------------------


def procrustes(X: np.ndarray, Y: np.ndarray, scaling: bool = True) -> Dict[str, Any]:
    """Least-squares similarity transform mapping Y onto X (rotation,
    translation, optional scaling; reflection allowed if it fits best).
    Returns {'rotation' (applied as y @ R), 'scale', 'translation'}.

    Runs in float64 regardless of input dtype: the downstream chamfer metric
    is sensitive to SVD rounding, and double precision makes the per-sample
    and batched paths agree to ~1e-7."""
    X, Y = np.asarray(X, np.float64), np.asarray(Y, np.float64)
    muX, muY = X.mean(0), Y.mean(0)
    X0, Y0 = X - muX, Y - muY
    normX = np.sqrt((X0**2).sum())
    normY = np.sqrt((Y0**2).sum())
    X0 /= normX
    Y0 /= normY
    U, s, Vt = np.linalg.svd(X0.T @ Y0, full_matrices=False)
    R = Vt.T @ U.T
    traceTA = s.sum()
    scale = traceTA * normX / normY if scaling else 1.0
    translation = muX - scale * muY @ R
    return {"rotation": R, "scale": scale, "translation": translation}


def procrustes_batched(X: np.ndarray, Y: np.ndarray, scaling: bool = True) -> Dict[str, Any]:
    """``procrustes`` over stacked (N, K, 3) point sets via LAPACK's batched
    SVD — same per-item arithmetic, one call for the whole submission.
    Returns {'rotation' (N, 3, 3), 'scale' (N,), 'translation' (N, 3)}.
    float64 like ``procrustes`` (numpy's stacked SVD runs the same LAPACK
    routine per item, so results match the per-sample path bit-for-bit)."""
    X, Y = np.asarray(X, np.float64), np.asarray(Y, np.float64)
    muX, muY = X.mean(1), Y.mean(1)  # (N, 3)
    X0, Y0 = X - muX[:, None], Y - muY[:, None]
    normX = np.sqrt((X0**2).sum(axis=(1, 2)))  # (N,)
    normY = np.sqrt((Y0**2).sum(axis=(1, 2)))
    X0 = X0 / normX[:, None, None]
    Y0 = Y0 / normY[:, None, None]
    U, s, Vt = np.linalg.svd(np.transpose(X0, (0, 2, 1)) @ Y0, full_matrices=False)
    R = np.transpose(Vt, (0, 2, 1)) @ np.transpose(U, (0, 2, 1))
    scale = s.sum(-1) * normX / normY if scaling else np.ones_like(normX)
    translation = muX - scale[:, None] * np.einsum("nk,nkj->nj", muY, R)
    return {"rotation": R, "scale": scale, "translation": translation}


@functools.partial(jax.jit, static_argnames=())
def one_sided_chamfer_sq(src: jax.Array, dst: jax.Array) -> jax.Array:
    """Mean over src points of the squared distance to the nearest dst point
    (kaolin chamfer_distance with w1=1, w2=0 semantics)."""
    # ||s - d||^2 = |s|^2 + |d|^2 - 2 s.d ; tiled for memory safety.
    # HIGHEST precision: dist2 is a catastrophic cancellation (s2 + d2 and
    # 2*cross are ~mm^2 * 10^3 while dist2 is ~mm^2), so a bf16-pass matmul
    # on TPU would swamp the metric with rounding noise.
    s2 = jnp.sum(src * src, axis=-1, keepdims=True)  # (N, 1)
    d2 = jnp.sum(dst * dst, axis=-1)[None, :]  # (1, M)
    cross = jnp.matmul(src, dst.T, precision=jax.lax.Precision.HIGHEST)  # (N, M)
    dist2 = s2 + d2 - 2.0 * cross
    return jnp.mean(jnp.maximum(jnp.min(dist2, axis=-1), 0.0))


@jax.jit
def _chamfer_mins_jit(src: jax.Array, dst: jax.Array) -> jax.Array:
    return one_sided_chamfer_mins(src, dst)


def one_sided_chamfer_mins(src: jax.Array, dst: jax.Array) -> jax.Array:
    """Per-src-point min squared distance (N,).

    Direct-difference formulation, NOT the |s|^2+|d|^2-2s.d matmul trick:
    (a) the trick is a catastrophic cancellation (terms ~1e5 cancel to ~0.3),
    and (b) its k=3 dot rounds differently between the single-sample and the
    vmapped lowering (FMA order), which would split the batched evaluator
    from the per-sample oracle. Elementwise square-of-difference with a
    fixed 3-term sum and an exactly-commutative min is bit-identical under
    any batching; XLA fuses the (N, M, 3) producer into the reduction so
    nothing is materialized. The final mean happens on HOST in float64
    (evaluator paths), immune to fp32 reduction-order noise."""
    diff = src[:, None, :] - dst[None, :, :]  # (N, M, 3), fused into the min
    dist2 = jnp.sum(diff * diff, axis=-1)
    return jnp.min(dist2, axis=-1)


@functools.partial(jax.jit, static_argnames=("top_k",))
def zn_accuracy(pred: jax.Array, gt: jax.Array, top_k: int = 5) -> jax.Array:
    """Ordinal depth agreement: for each point and each of its ``top_k``
    nearest GT neighbors (by full 3D distance), do pred and GT agree on
    which is closer to the camera (z ordering)? Mean over all pairs.

    pred/gt: (N, 3). One fused computation instead of the reference's
    per-point python double loop.
    """
    # Direct-difference formulation (see one_sided_chamfer_mins): no
    # catastrophic cancellation, and — unlike a gemm, whose per-element
    # rounding can depend on the batch blocking — exactly the same bits under
    # any vmap/lax.map lowering, so the neighbor ranking (and therefore Z_n)
    # cannot split between the batched scorer and the per-sample oracle.
    diff = gt[:, None, :] - gt[None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    # Reproduces the reference's exact indexing (benchmark.py:123-127):
    # argsort each COLUMN, then take columns 1..top_k of the sorted-index
    # matrix — i.e. index_to_compare[i, j] = the i-th closest point to point
    # j+1 (not point i's own neighbors). Kept bit-for-bit for score parity.
    idx = jnp.argsort(d2, axis=0)[:, 1 : top_k + 1]  # (N, top_k)
    gt_z = gt[:, 2]
    pr_z = pred[:, 2]
    gt_cmp = gt_z[:, None] >= gt_z[idx]
    pr_cmp = pr_z[:, None] >= pr_z[idx]
    return jnp.mean((gt_cmp == pr_cmp).astype(jnp.float32))


# ---------------------------------------------------------------------------
# whole-submission batched scoring (3 jit dispatches for any N)
# ---------------------------------------------------------------------------


def _pad_chunks(a: np.ndarray, chunk: int) -> np.ndarray:
    """(N, ...) -> (ceil(N/chunk), chunk, ...), edge-padding with the last
    sample; callers slice aggregates back to [:N]."""
    n = a.shape[0]
    pad = (-n) % chunk
    if pad:
        a = np.concatenate([a, np.repeat(a[-1:], pad, axis=0)], axis=0)
    return a.reshape((n + pad) // chunk, chunk, *a.shape[1:])


@functools.partial(jax.jit, static_argnames=("top_k",))
def _heavy_chunked(
    gt_c: jax.Array,
    scale_c: jax.Array,
    pred_c: jax.Array,
    aligned_c: jax.Array,
    face_idx: jax.Array,
    head_idx: jax.Array,
    top_k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Chamfer + Z_n for the whole submission, chunked so the (face, V) and
    (head, head) pairwise matrices of only one chunk are live at a time.
    ``aligned_c`` is the Procrustes-aligned prediction, computed on host in
    float64 (tiny 3x3 einsum) so it matches the per-sample oracle exactly."""

    def one(args):
        gt, s, pred, aligned = args
        gt_scaled = gt * s[:, None, None]
        gt_face = jnp.take(gt_scaled, face_idx, axis=1)
        # per-point mins, NOT the mean: the mean runs on host in float64 so
        # fp32 reduction-order noise can't split this path from the oracle
        mins = jax.vmap(one_sided_chamfer_mins)(gt_face, aligned)
        pred_head = jnp.take(pred, head_idx, axis=1)
        gt_head = -jnp.take(gt, head_idx, axis=1)
        zn = jax.vmap(lambda p, g: zn_accuracy(p, g, top_k=top_k))(pred_head, gt_head)
        return mins, zn

    mins, zn = jax.lax.map(one, (gt_c, scale_c, pred_c, aligned_c))
    return mins.reshape(-1, mins.shape[-1]), zn.reshape(-1)


# ---------------------------------------------------------------------------
# annotations
# ---------------------------------------------------------------------------


class HeadAnnotation:
    def __init__(
        self,
        id: str,
        vertices3d: np.ndarray,
        model_view_matrix: np.ndarray,
        projection_matrix: np.ndarray,
        bbox: List[int],
        image_height: int,
        attributes: Optional[Dict[str, Any]] = None,
    ):
        self.id = id
        self.vertices3d = vertices3d
        self.model_view_matrix = model_view_matrix
        self.projection_matrix = projection_matrix
        self.bbox = bbox
        self.image_height = image_height
        self.attributes = attributes
        homo = np.concatenate([vertices3d, np.ones_like(vertices3d[:, :1])], -1)
        self.vertices3d_world_homo = homo @ model_view_matrix.T

    @classmethod
    def from_config(cls, config: Dict[str, Any]) -> "HeadAnnotation":
        return cls(
            id=config["id"],
            vertices3d=np.asarray(config["vertices"], np.float32),
            model_view_matrix=np.asarray(config["model_view_matrix"], np.float32),
            projection_matrix=np.asarray(config["projection_matrix"], np.float32),
            bbox=config["bbox"],
            image_height=config["image_height"],
            attributes=config.get("attributes"),
        )


class DADEvaluator:
    """Scores a submission json against generated ground truth.

    Submission format (reference dad_3dheads_benchmark/README.md):
      {item_id: {"68_landmarks_2d", "N_landmarks_3d", "7_landmarks_3d",
                 "rotation_matrix"}}
    """

    def __init__(self, ground_truth_path: str, submission_path: str):
        self.gt_path = ground_truth_path
        self.sub_path = submission_path
        self.head_indices = assets.get_flame_indices("head_indices")
        self.face_indices = assets.get_flame_indices("face")
        self.embedding = LandmarkEmbedding.load()

    # -- per-sample metrics -----------------------------------------------
    def _lm68_host(self, verts: np.ndarray) -> np.ndarray:
        """(..., V, 3) -> (..., 68, 3): zero-pose barycentric embedding on
        HOST. The embedding is 68 triangle gathers + a 3-term weighted sum —
        microseconds in numpy — and host numpy is batching-invariant by
        construction (gather / elementwise / fixed-order tiny sum), which is
        what makes the batched scorer bit-identical to the per-sample oracle.
        Device time goes where the FLOPs are: the chamfer/Z_n dispatch.
        Same math as core.landmarks.get_68_landmarks at bin 0 (order
        [17 dynamic | 51 static])."""
        ids = getattr(self, "_lm_ids", None)
        if ids is None:
            emb = self.embedding
            ids = np.concatenate(
                [np.asarray(emb.dynamic_vertex_ids[0]), np.asarray(emb.static_vertex_ids)]
            )
            self._lm_ids = ids
            self._lm_bary = np.concatenate(
                [np.asarray(emb.dynamic_bary[0]), np.asarray(emb.static_bary)]
            ).astype(np.float32)
        tri = np.asarray(verts, np.float32)[..., ids, :]  # (..., 68, 3, 3)
        return (tri * self._lm_bary[..., None]).sum(-2)

    def _landmarks68_3d(self, vertices: np.ndarray) -> np.ndarray:
        return self._lm68_host(vertices)

    def gt_landmarks_68_2d(self, a: HeadAnnotation) -> np.ndarray:
        lms = self._landmarks68_3d(a.vertices3d)
        homo = np.concatenate([lms, np.ones_like(lms[:, :1])], -1)
        world = homo @ a.model_view_matrix.T
        p = world @ a.projection_matrix.T
        xy = p[:, :2] / p[:, 3:4]
        return np.stack([xy[:, 0], a.image_height - xy[:, 1]], -1)

    @staticmethod
    def get_gt_rot_mat(a: HeadAnnotation) -> np.ndarray:
        rot_180 = np.diag([1.0, -1.0, -1.0, 1.0])
        return (rot_180 @ a.model_view_matrix)[:3, :3]

    def pose_error(self, a: HeadAnnotation, pred: Dict[str, Any]) -> float:
        R_pred = np.asarray(pred["rotation_matrix"], np.float32)
        R_gt = self.get_gt_rot_mat(a)
        return float(np.linalg.norm(np.eye(3) - R_pred @ R_gt.T, "fro"))

    def nme(self, a: HeadAnnotation, pred: Dict[str, Any]) -> float:
        p68 = np.asarray(pred["68_landmarks_2d"], np.float32)
        g68 = self.gt_landmarks_68_2d(a)
        return float(
            np.mean(np.linalg.norm(g68 - p68, 2, -1) / np.sqrt(a.bbox[2] * a.bbox[3])) * 100.0
        )

    def chamfer_distance(self, a: HeadAnnotation, pred: Dict[str, Any]) -> float:
        gt_v = a.vertices3d_world_homo[:, :3]
        # scale GT to 20mm inter-eye distance
        lms = self._landmarks68_3d(gt_v)
        svn_gt = lms[SEVEN_LMK_INDICES]
        scale = 20.0 / (np.linalg.norm(svn_gt[1] - svn_gt[2]) + 1e-12)
        # scale in fp32 — the same IEEE multiply the batched device path does,
        # so both feed the chamfer kernel bit-identical inputs
        gt_v = gt_v.astype(np.float32) * np.float32(scale)
        svn_gt = self._landmarks68_3d(gt_v)[SEVEN_LMK_INDICES]

        pred_v = np.asarray(pred["N_landmarks_3d"], np.float32).reshape(-1, 3)
        svn_pred = np.asarray(pred["7_landmarks_3d"], np.float32).reshape(-1, 3)
        tf = procrustes(svn_gt, svn_pred)
        aligned = tf["scale"] * pred_v @ tf["rotation"] + tf["translation"]

        gt_face = gt_v[self.face_indices]
        mins = _chamfer_mins_jit(jnp.asarray(gt_face), jnp.asarray(aligned))
        return float(np.asarray(mins, np.float64).mean())

    def zn(self, a: HeadAnnotation, pred: Dict[str, Any], n: int = 5) -> float:
        gt_v = a.vertices3d_world_homo[:, :3]
        pred_v = np.asarray(pred["N_landmarks_3d"], np.float32).reshape(-1, 3)
        gt_head = jnp.asarray(gt_v[self.head_indices] * -1.0)
        pred_head = jnp.asarray(pred_v[self.head_indices])
        return float(zn_accuracy(pred_head, gt_head, top_k=n))

    # -- whole-submission scoring -------------------------------------------
    def score_batched(
        self,
        anns: List[HeadAnnotation],
        preds: List[Dict[str, Any]],
        chunk: int = 8,
        top_k: int = 5,
    ) -> Dict[str, np.ndarray]:
        """All four metrics for every (annotation, prediction) pair in ONE
        jit dispatch + vectorized host numpy. Returns (N,) arrays keyed by
        metric name; raises ValueError on ragged vertex counts (callers fall
        back to the per-sample oracle path)."""
        N = len(anns)
        gt_model = np.stack([a.vertices3d for a in anns]).astype(np.float32)
        gt_world = np.stack(
            [a.vertices3d_world_homo[:, :3] for a in anns]
        ).astype(np.float32)
        mvm = np.stack([a.model_view_matrix for a in anns])
        p68 = np.stack([np.asarray(p["68_landmarks_2d"], np.float32) for p in preds])
        pred_v = np.stack(
            [np.asarray(p["N_landmarks_3d"], np.float32).reshape(-1, 3) for p in preds]
        )
        svn_pred = np.stack(
            [np.asarray(p["7_landmarks_3d"], np.float32).reshape(-1, 3) for p in preds]
        )
        R_pred = np.stack([np.asarray(p["rotation_matrix"], np.float32) for p in preds])

        # pose error (pure host, vectorized)
        rot_180 = np.diag([1.0, -1.0, -1.0, 1.0])
        R_gt = (rot_180[None] @ mvm)[:, :3, :3]
        E = np.eye(3)[None] - R_pred @ np.transpose(R_gt, (0, 2, 1))
        pose = np.linalg.norm(E, axis=(1, 2))

        # GT 68 landmarks for the whole set, on HOST (see _lm68_host). NME
        # projects the MODEL-space landmarks through mvm/proj
        # (gt_landmarks_68_2d), while chamfer's 20mm rescale anchors on the
        # WORLD-space landmarks (chamfer_distance).
        gt_c = jnp.asarray(_pad_chunks(gt_world, chunk))
        lm68 = self._lm68_host(gt_model)  # model space (NME)
        lm68_world = self._lm68_host(gt_world)  # world space (chamfer rescale)

        # NME (host): the EXACT per-sample arithmetic of gt_landmarks_68_2d +
        # nme(), looped — each item is a 68x4 matmul (microseconds), and a
        # vectorized f32 batched-matmul rounds differently from the
        # per-sample sgemm, which would break the bit-identity contract with
        # the oracle path. Device dispatch count is unaffected.
        nme = np.empty(N, np.float64)
        for i, a in enumerate(anns):
            lms = lm68[i]
            homo = np.concatenate([lms, np.ones_like(lms[:, :1])], -1)
            world = homo @ a.model_view_matrix.T
            pp = world @ a.projection_matrix.T
            xy = pp[:, :2] / pp[:, 3:4]
            g68 = np.stack([xy[:, 0], a.image_height - xy[:, 1]], -1)
            nme[i] = (
                np.mean(
                    np.linalg.norm(g68 - p68[i], 2, -1)
                    / np.sqrt(a.bbox[2] * a.bbox[3])
                )
                * 100.0
            )

        # 20mm inter-eye rescale factor, scalar-by-scalar so the arithmetic
        # (incl. numpy scalar promotion) matches the per-sample path exactly
        svn_gt = lm68_world[:, SEVEN_LMK_INDICES]
        scale = np.array(
            [
                20.0 / (np.linalg.norm(svn_gt[i, 1] - svn_gt[i, 2]) + 1e-12)
                for i in range(N)
            ],
            np.float32,
        )
        scale_c = jnp.asarray(_pad_chunks(scale, chunk))

        # landmarks of the rescaled GT -> Procrustes anchors. The f32
        # gt_world * f32 scale multiply is the same single IEEE op the
        # per-sample path performs on host (chamfer_distance).
        svn_scaled = self._lm68_host(gt_world * scale[:, None, None])[
            :, SEVEN_LMK_INDICES
        ]
        tf = procrustes_batched(svn_scaled, svn_pred)
        # Procrustes alignment on host in float64 — the same arithmetic as the
        # per-sample path (chamfer_distance), cast to fp32 only at the device
        # boundary so both paths feed the chamfer kernel identical inputs.
        aligned = (
            tf["scale"][:, None, None] * (pred_v.astype(np.float64) @ tf["rotation"])
            + tf["translation"][:, None, :]
        ).astype(np.float32)

        # THE device dispatch: chamfer + Z_n
        cham_mins, zn = _heavy_chunked(
            gt_c,
            scale_c,
            jnp.asarray(_pad_chunks(pred_v, chunk)),
            jnp.asarray(_pad_chunks(aligned, chunk)),
            jnp.asarray(self.face_indices),
            jnp.asarray(self.head_indices),
            top_k,
        )
        return {
            "pose_error": pose.astype(np.float64),
            "nme": nme.astype(np.float64),
            "z5": np.asarray(zn, np.float64)[:N],
            # float64 host mean over per-point mins == the per-sample oracle
            "chamfer": np.asarray(cham_mins, np.float64)[:N].mean(axis=1),
        }

    # -- aggregation -------------------------------------------------------
    def __call__(
        self, batched: bool = True, chunk: int = 8
    ) -> Tuple[Dict[str, float], Dict[str, Any]]:
        with open(self.sub_path) as f:
            submission = json.load(f)
        with open(self.gt_path) as f:
            ground_truth = [HeadAnnotation.from_config(c) for c in json.load(f)]

        anns, preds = [], []
        for a in ground_truth:
            if a.id not in submission:
                print(f"No prediction with ID: {a.id}.")
                continue
            anns.append(a)
            preds.append(submission[a.id])

        out_names = {
            "pose_error": "pose_error",
            "nme": "nme_reprojection",
            "z5": "z5_accuracy",
            "chamfer": "chamfer",
        }
        per_sample: Optional[Dict[str, np.ndarray]] = None
        if batched and anns:
            try:
                per_sample = self.score_batched(anns, preds, chunk=chunk)
            except ValueError as e:
                # Ragged vertex counts: fall back to the (bit-identical but
                # one-dispatch-per-item) oracle path. Loud, because on a
                # full-size submission this is a ~1000x dispatch regression.
                sizes = sorted(
                    {np.asarray(p["N_landmarks_3d"], np.float32).size // 3 for p in preds}
                )
                logger.warning(
                    "score_batched could not stack the submission (%s); "
                    "vertex counts present: %s. Falling back to the per-sample "
                    "oracle scorer (%d items, one dispatch each).",
                    e,
                    sizes,
                    len(anns),
                )
                per_sample = None
        if per_sample is None:
            metric_funcs = {
                "pose_error": self.pose_error,
                "nme": self.nme,
                "z5": lambda a, p: self.zn(a, p, n=5),
                "chamfer": self.chamfer_distance,
            }
            per_sample = {
                name: np.array([func(a, p) for a, p in zip(anns, preds)])
                for name, func in metric_funcs.items()
            }

        metrics = {
            name: {"attributes": defaultdict(lambda: defaultdict(list))}
            for name in out_names
        }
        for i, a in enumerate(anns):
            if a.attributes:
                for attr, value in a.attributes.items():
                    for name in out_names:
                        metrics[name]["attributes"][attr][value].append(
                            float(per_sample[name][i])
                        )

        overall = {
            out: float(np.mean(per_sample[name])) if len(anns) else float("nan")
            for name, out in out_names.items()
        }
        attribute_result: Dict[str, Any] = {}
        for name, out in out_names.items():
            attribute_result[out] = {
                attr: {v: float(np.mean(vals)) for v, vals in values.items()}
                for attr, values in metrics[name]["attributes"].items()
            }
        return overall, attribute_result


def print_evaluation_results(overall: Dict[str, float], attributes: Dict[str, Any]) -> None:
    print("=== DAD-3DHeads benchmark ===")
    for k, v in overall.items():
        print(f"  {k:20s} {v:.6f}")
    for metric, attrs in attributes.items():
        for attr, values in attrs.items():
            print(f"  {metric} / {attr}:")
            for value, mean in values.items():
                print(f"    {value:16} {mean:.6f}")


def print_evaluation_summary(overall: Dict[str, float], attributes: Dict[str, Any]) -> None:
    """One-line summary view (the reference's compact printer)."""
    parts = [f"{k}={v:.4f}" for k, v in overall.items()]
    print("DAD-3DHeads: " + "  ".join(parts))


def evaluate(submission_path: str, gt_path: str) -> Dict[str, float]:
    overall, attrs = DADEvaluator(gt_path, submission_path)()
    print_evaluation_results(overall, attrs)
    return overall
