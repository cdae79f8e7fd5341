"""Generate the int8-accuracy regression fixture (tests/fixtures/int8_accuracy.npz).

Pins the int8 PTQ pipeline's accuracy against regression with concrete,
checked-in numbers instead of a percent-of-amplitude smoke bound: a fixed
input batch, the calibrated amax table for the seed-0 resnet50 model, and the
fp decode outputs (landmarks in pixels + 3DMM vector). The companion test
(tests/test_quantized.py::test_int8_accuracy_fixture) rebuilds the model from
the same seed, re-runs calibration, fp, and int8, and asserts
  - the recalibrated amax table matches the recorded one (pins calibration),
  - fp outputs still match the recorded ones (seeded-init reproducibility),
  - int8 outputs match the recorded ones to tight tolerance (pins every
    quantize/dequantize scale and rounding choice in the int8 path),
  - int8 landmark displacement / 3DMM drift vs fp stay <= recorded bounds.

Regenerate (CPU, deterministic) after an intentional model change:
  python tools/make_int8_fixture.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

IMG = 64
BATCH = 4


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from dad3dheads_tpu.api.predictor import decode_pipeline_outputs
    from dad3dheads_tpu.models import create_model
    from dad3dheads_tpu.models.quantized import calibrate, quantized_forward

    model = create_model({"backbone": "resnet50"})
    x0 = jnp.zeros((1, IMG, IMG, 3), jnp.float32)
    variables = jax.jit(lambda r: model.init(r, x0, train=False))(jax.random.PRNGKey(0))

    images = jax.random.normal(jax.random.PRNGKey(42), (BATCH, IMG, IMG, 3), jnp.float32)
    amax = calibrate(model, variables, [images], dtype=jnp.float32)

    fp_out = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, images)
    fp = decode_pipeline_outputs(fp_out, stride=4, img_size=IMG)
    q_out, _ = jax.jit(
        lambda v, x, a: quantized_forward(model, v, x, amax=a, mode="int8", dtype=jnp.float32)
    )(variables, images, amax)
    q = decode_pipeline_outputs(q_out, stride=4, img_size=IMG)

    fp_lms = np.asarray(fp["landmarks"]).reshape(BATCH, 68, 2)
    q_lms = np.asarray(q["landmarks"]).reshape(BATCH, 68, 2)
    disp = np.linalg.norm(fp_lms - q_lms, axis=-1)
    drift_3dmm = np.abs(np.asarray(fp["3dmm"]) - np.asarray(q["3dmm"]))
    print(f"landmark displacement px: max {disp.max():.4f} mean {disp.mean():.4f}")
    print(f"3dmm drift: max {drift_3dmm.max():.5f} mean {drift_3dmm.mean():.5f}")

    out = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")
    os.makedirs(out, exist_ok=True)
    path = os.path.join(out, "int8_accuracy.npz")
    names = sorted(amax)
    np.savez_compressed(
        path,
        images=np.asarray(images),
        amax_names=np.asarray(names),
        amax_values=np.asarray([float(amax[n]) for n in names], np.float32),
        fp_landmarks=fp_lms.astype(np.float32),
        fp_3dmm=np.asarray(fp["3dmm"], np.float32),
        q_landmarks=q_lms.astype(np.float32),
        q_3dmm=np.asarray(q["3dmm"], np.float32),
        # regression bounds: generation-time observation with headroom
        max_landmark_disp_px=np.float32(max(2.0 * disp.max(), 1.0)),
        max_3dmm_drift=np.float32(max(2.0 * drift_3dmm.max(), 0.01)),
    )
    print(f"wrote {path} ({os.path.getsize(path) / 1024:.0f} KiB)")


if __name__ == "__main__":
    main()
