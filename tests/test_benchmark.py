"""Benchmark-harness tests: metric math against oracles + end-to-end scoring
of a perfect submission (which must achieve perfect scores)."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from dad3dheads_tpu.benchmark_harness import (
    DADEvaluator,
    one_sided_chamfer_sq,
    procrustes,
    zn_accuracy,
)


def test_procrustes_recovers_similarity(rng):
    Y = rng.normal(size=(7, 3))
    # a known similarity transform
    angle = 0.3
    R = np.array(
        [
            [np.cos(angle), -np.sin(angle), 0],
            [np.sin(angle), np.cos(angle), 0],
            [0, 0, 1.0],
        ]
    )
    X = 2.5 * Y @ R + np.array([1.0, -2.0, 0.5])
    tf = procrustes(X, Y)
    Z = tf["scale"] * Y @ tf["rotation"] + tf["translation"]
    np.testing.assert_allclose(Z, X, atol=1e-6)


def test_one_sided_chamfer(rng):
    dst = rng.normal(size=(50, 3)).astype(np.float32)
    # src = subset of dst -> chamfer 0
    src = dst[:20]
    assert float(one_sided_chamfer_sq(jnp.asarray(src), jnp.asarray(dst))) < 1e-9
    # known offset: single points
    a = jnp.asarray([[0.0, 0, 0]])
    b = jnp.asarray([[3.0, 4.0, 0.0]])
    assert float(one_sided_chamfer_sq(a, b)) == pytest.approx(25.0, rel=1e-5)


def test_zn_oracle(rng):
    gt = rng.normal(size=(40, 3)).astype(np.float32)
    pred_same = gt.copy()
    assert float(zn_accuracy(jnp.asarray(pred_same), jnp.asarray(gt))) == pytest.approx(1.0)
    # flipping z ordering inverts nearly all strict comparisons; with random
    # continuous z the agreement should be far below 1
    pred_flip = gt.copy()
    pred_flip[:, 2] *= -1
    acc = float(zn_accuracy(jnp.asarray(pred_flip), jnp.asarray(gt)))
    assert acc < 0.2

    # literal double-loop oracle
    def oracle(pred, gt, top_k=5):
        d = np.linalg.norm(gt[None, :, :] - gt[:, None, :], axis=-1)
        order = np.argsort(d, axis=0)
        idx = order[:, 1 : top_k + 1]
        total = []
        for i in range(gt.shape[0]):
            for j in range(top_k):
                total.append(
                    (gt[i, 2] >= gt[idx[i, j], 2]) == (pred[i, 2] >= pred[idx[i, j], 2])
                )
        return np.mean(total)

    pred = gt + rng.normal(size=gt.shape) * 0.1
    ours = float(zn_accuracy(jnp.asarray(pred.astype(np.float32)), jnp.asarray(gt)))
    ref = oracle(pred, gt)
    assert ours == pytest.approx(ref, abs=1e-6)


def _make_gt_and_perfect_submission(tmp_path, rng, n=2):
    from dad3dheads_tpu.benchmark_harness.evaluate import SEVEN_LMK_INDICES, HeadAnnotation

    evaluator_emb = None
    gt_list, submission = [], {}
    for i in range(n):
        verts = (rng.normal(size=(5023, 3)) * 0.1).astype(np.float32)
        mv = np.eye(4, dtype=np.float32)
        mv[:3, 3] = [0.01 * i, 0.0, -0.5]
        proj = np.eye(4, dtype=np.float32)
        proj[0, 0] = proj[1, 1] = 100.0
        proj[0, 3] = proj[1, 3] = 128.0
        cfg = {
            "id": f"item{i}",
            "bbox": [10, 10, 100, 100],
            "vertices": verts.tolist(),
            "model_view_matrix": mv.tolist(),
            "projection_matrix": proj.tolist(),
            "image_height": 256,
            "attributes": {"quality": "good" if i % 2 == 0 else "bad"},
        }
        gt_list.append(cfg)

        # perfect prediction: derived from the GT itself
        a = HeadAnnotation.from_config(cfg)
        ev = DADEvaluator.__new__(DADEvaluator)
        from dad3dheads_tpu import assets
        from dad3dheads_tpu.core.landmarks import LandmarkEmbedding

        ev.head_indices = assets.get_flame_indices("head_indices")
        ev.face_indices = assets.get_flame_indices("face")
        ev.embedding = LandmarkEmbedding.load()

        g68 = ev.gt_landmarks_68_2d(a)
        gt_world = a.vertices3d_world_homo[:, :3]
        # the 7 landmarks of the *scaled* GT, exactly what chamfer aligns to
        lms = ev._landmarks68_3d(gt_world)
        svn = lms[SEVEN_LMK_INDICES]
        scale = 20.0 / np.linalg.norm(svn[1] - svn[2])
        scaled = gt_world * scale
        svn_scaled = ev._landmarks68_3d(scaled)[SEVEN_LMK_INDICES]

        # Z_n compares the prediction's z-ordering against the NEGATED GT
        # (benchmark zn: gt_head * -1), so a perfect submission supplies
        # camera-frame (sign-flipped) vertices; Procrustes allows the
        # reflection, so Chamfer still aligns them exactly.
        submission[f"item{i}"] = {
            "68_landmarks_2d": g68.tolist(),
            "N_landmarks_3d": (-scaled).tolist(),
            "7_landmarks_3d": (-svn_scaled).tolist(),
            "rotation_matrix": ev.get_gt_rot_mat(a).tolist(),
        }

    gt_path = str(tmp_path / "gt.json")
    sub_path = str(tmp_path / "sub.json")
    with open(gt_path, "w") as f:
        json.dump(gt_list, f)
    with open(sub_path, "w") as f:
        json.dump(submission, f)
    return gt_path, sub_path


def test_perfect_submission_scores(tmp_path, rng):
    gt_path, sub_path = _make_gt_and_perfect_submission(tmp_path, rng)
    overall, attrs = DADEvaluator(gt_path, sub_path)()
    assert overall["pose_error"] == pytest.approx(0.0, abs=1e-5)
    assert overall["nme_reprojection"] == pytest.approx(0.0, abs=1e-4)
    assert overall["z5_accuracy"] == pytest.approx(1.0, abs=1e-6)
    # fp32 rounding leaves ~1e-4 mm^2 residual on a 20mm-scaled face
    assert overall["chamfer"] == pytest.approx(0.0, abs=5e-3)
    # per-attribute aggregation present
    assert "quality" in attrs["pose_error"]


def test_zn_pred_not_scaled_matches_reference_path(tmp_path, rng):
    """zn uses the *unscaled* world vertices for pred and -1 * gt."""
    gt_path, sub_path = _make_gt_and_perfect_submission(tmp_path, rng, n=1)
    ev = DADEvaluator(gt_path, sub_path)
    overall, _ = ev()
    assert np.isfinite(overall["z5_accuracy"])


def _make_noisy_submission(tmp_path, rng, n):
    """GT + an imperfect submission (non-degenerate metric values)."""
    gt_path, sub_path = _make_gt_and_perfect_submission(tmp_path, rng, n=n)
    import json as _json

    with open(sub_path) as f:
        sub = _json.load(f)
    for key, p in sub.items():
        for field, sigma in (
            ("68_landmarks_2d", 2.0),
            ("N_landmarks_3d", 0.3),
            ("7_landmarks_3d", 0.1),
        ):
            arr = np.asarray(p[field], np.float32)
            p[field] = (arr + rng.normal(size=arr.shape).astype(np.float32) * sigma).tolist()
        # perturbed but still a rotation: small random rotation composed in
        w = rng.normal(size=3) * 0.05
        th = np.linalg.norm(w)
        k = w / (th + 1e-12)
        K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        dR = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)
        p["rotation_matrix"] = (dR @ np.asarray(p["rotation_matrix"])).tolist()
    with open(sub_path, "w") as f:
        _json.dump(sub, f)
    return gt_path, sub_path


def test_batched_evaluator_matches_per_sample_oracle(tmp_path, rng):
    """The single-dispatch batched scorer is BIT-IDENTICAL to the per-sample
    loop, per metric, on a chunk-straddling sample count (5 with chunk 2
    exercises the edge pad). Exactness holds because the device kernels are
    batching-invariant (elementwise / gather / exactly-commutative min), the
    tiny landmark/Procrustes math runs in host numpy shared by both paths,
    and the final reductions run on host in float64."""
    gt_path, sub_path = _make_noisy_submission(tmp_path, rng, n=5)
    ev = DADEvaluator(gt_path, sub_path)
    fast_overall, fast_attrs = ev(batched=True, chunk=2)
    slow_overall, slow_attrs = ev(batched=False)
    for k in slow_overall:
        np.testing.assert_array_equal(fast_overall[k], slow_overall[k], err_msg=k)
    for metric, attrs in slow_attrs.items():
        for attr, values in attrs.items():
            for v, mean in values.items():
                np.testing.assert_array_equal(fast_attrs[metric][attr][v], mean)


def test_batched_evaluator_dispatch_count(tmp_path, rng, monkeypatch):
    """Scoring N samples stays at ONE device dispatch regardless of N — the
    TPU-first promise vs the reference's per-sample loop
    (/root/reference/dad_3dheads_benchmark/benchmark.py:153-196). The tiny
    landmark/Procrustes/projection math runs in host numpy."""
    import importlib

    # the package re-exports an ``evaluate`` FUNCTION; fetch the module
    ev_mod = importlib.import_module("dad3dheads_tpu.benchmark_harness.evaluate")

    gt_path, sub_path = _make_noisy_submission(tmp_path, rng, n=7)
    calls = {"n": 0}

    def count(fn):
        def wrapped(*a, **k):
            calls["n"] += 1
            return fn(*a, **k)

        return wrapped

    monkeypatch.setattr(ev_mod, "_heavy_chunked", count(ev_mod._heavy_chunked))
    overall, _ = DADEvaluator(gt_path, sub_path)(batched=True, chunk=4)
    assert calls["n"] == 1
    assert all(np.isfinite(v) for v in overall.values())


def test_ragged_submission_falls_back_loudly_and_matches_oracle(tmp_path, rng, caplog):
    """A submission with ragged vertex counts cannot be stacked: the
    evaluator must (a) WARN — on a full-size submission the fallback is a
    ~1000x dispatch regression the operator should see — and (b) produce
    results equal to the per-sample oracle path."""
    import logging

    gt_path, sub_path = _make_noisy_submission(tmp_path, rng, n=3)
    with open(sub_path) as f:
        sub = json.load(f)
    # one item carries 10 extra (duplicated) mesh vertices: still valid for
    # every metric (zn/chamfer index/reduce over the FLAME-topology prefix),
    # but np.stack over the submission is now ragged
    extra = np.asarray(sub["item1"]["N_landmarks_3d"], np.float32)[:10]
    sub["item1"]["N_landmarks_3d"] = np.concatenate(
        [np.asarray(sub["item1"]["N_landmarks_3d"], np.float32), extra]
    ).tolist()
    with open(sub_path, "w") as f:
        json.dump(sub, f)

    ev = DADEvaluator(gt_path, sub_path)
    with caplog.at_level(logging.WARNING, logger="dad3dheads_tpu.benchmark_harness.evaluate"):
        fast_overall, _ = ev(batched=True, chunk=2)
    assert any("per-sample oracle" in r.message for r in caplog.records)
    slow_overall, _ = ev(batched=False)
    for k in slow_overall:
        np.testing.assert_array_equal(fast_overall[k], slow_overall[k], err_msg=k)
