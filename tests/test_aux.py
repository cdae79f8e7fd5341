"""Aux subsystems: visualization panels, submission generator, utils."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dad3dheads_tpu.benchmark_harness.submission import predictions_to_submission_entry
from dad3dheads_tpu.train.visualization import (
    denormalize_image,
    draw_keypoints_panel,
    landmarks_panel_from_batch,
    make_grid,
)
from dad3dheads_tpu.utils import create_logger, enable_nan_debugging, load_yaml


def test_denormalize_roundtrip(rng):
    from dad3dheads_tpu.constants import IMAGENET_MEAN, IMAGENET_STD

    img = (rng.uniform(size=(16, 16, 3)) * 255).astype(np.uint8)
    norm = (img.astype(np.float32) / 255.0 - np.asarray(IMAGENET_MEAN)) / np.asarray(
        IMAGENET_STD
    )
    out = denormalize_image(norm.astype(np.float32))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


def test_panel_and_grid(rng):
    from dad3dheads_tpu.constants import (
        INPUT_IMAGE_KEY,
        OUTPUT_2D_LANDMARKS,
        TARGET_2D_LANDMARKS,
    )

    B, S = 3, 32
    batch = {
        INPUT_IMAGE_KEY: rng.normal(size=(B, S, S, 3)).astype(np.float32),
        TARGET_2D_LANDMARKS: rng.uniform(size=(B, 68, 2)).astype(np.float32),
    }
    outputs = {OUTPUT_2D_LANDMARKS: rng.uniform(size=(B, 68, 2)).astype(np.float32)}
    panel = landmarks_panel_from_batch(batch, outputs, img_size=S, max_images=3)
    assert panel.shape == (S, 4 * S, 3)  # 3 images in a 4-col grid row
    assert panel.dtype == np.uint8

    grid = make_grid(np.zeros((5, 8, 8, 3), np.uint8), cols=2)
    assert grid.shape == (3 * 8, 2 * 8, 3)


def test_submission_entry_schema(rng):
    preds = {
        "points": rng.uniform(0, 256, size=(68, 2)).astype(np.float32),
        "projected_vertices": rng.uniform(0, 256, size=(1, 5023, 2)).astype(np.float32),
        "3d_vertices": rng.normal(size=(5023, 3)).astype(np.float32) * 0.1,
        "3dmm_params": np.zeros((1, 413), np.float32),
    }
    preds["3dmm_params"][0, 403:409] = [1, 0, 0, 0, 1, 0]
    entry = predictions_to_submission_entry(preds)
    lms2d = np.asarray(entry["68_landmarks_2d"])
    assert lms2d.shape == (68, 2)
    # mesh-derived 2D landmarks live within the projected-vertex range
    assert lms2d.min() >= -1 and lms2d.max() <= 257
    assert set(entry) == {"68_landmarks_2d", "N_landmarks_3d", "7_landmarks_3d", "rotation_matrix"}
    assert np.asarray(entry["N_landmarks_3d"]).shape == (5023, 3)
    assert np.asarray(entry["7_landmarks_3d"]).shape == (7, 3)
    R = np.asarray(entry["rotation_matrix"])
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    # camera convention: 180-degree x-flip of the model-space rotation
    # (identity 6dof here), matching the evaluator's GT frame
    np.testing.assert_allclose(R, np.diag([1.0, -1.0, -1.0]), atol=1e-5)
    # camera convention: z negated relative to model space
    np.testing.assert_allclose(
        np.asarray(entry["N_landmarks_3d"])[:, 2], -preds["3d_vertices"][:, 2] * 1.0, atol=1e-6
    )


def test_logger_and_yaml(tmp_path):
    log = create_logger("dad3d.test")
    log.info("hello")
    (tmp_path / "x.yaml").write_text("a: 1\n")
    assert load_yaml(str(tmp_path / "x.yaml")) == {"a": 1}


def test_predictor_from_yaml():
    from dad3dheads_tpu.api.predictor import FaceMeshPredictor

    p = FaceMeshPredictor.from_yaml("configs/dad_3dnet.yaml")
    assert p._img_size == 256 and p._stride == 4
    assert p.flame_constants["shape"] == 300


def test_compilation_cache_opt_out(monkeypatch, tmp_path):
    """enable_compilation_cache honors 0/false/empty as 'not opted out' and
    any other value as opt-out; the cache dir is created when enabled."""
    import jax

    from dad3dheads_tpu.utils import enable_compilation_cache

    target = str(tmp_path / "cache")
    monkeypatch.setenv("DAD3D_NO_COMPILE_CACHE", "1")
    enable_compilation_cache(target)
    assert not os.path.isdir(target)  # opted out: untouched

    monkeypatch.setenv("DAD3D_NO_COMPILE_CACHE", "0")
    enable_compilation_cache(target)
    assert os.path.isdir(target)
    assert jax.config.jax_compilation_cache_dir == target
