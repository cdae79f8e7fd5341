"""UV texture extraction test (fallback spherical atlas)."""

import numpy as np
import pytest


def test_uv_texture_creator(rng, flame_model):
    from dad3dheads_tpu.core.head_mesh import HeadMesh
    from dad3dheads_tpu.render.uv_texture import UVTextureCreator

    hm = HeadMesh(model=flame_model, image_size=256)
    creator = UVTextureCreator(resolution=64, head_mesh=hm)
    # some texels must be covered by the fallback atlas
    assert (creator.tri_id >= 0).sum() > 100

    image = (rng.uniform(size=(256, 256, 3)) * 255).astype(np.uint8)
    preds = {"3dmm_params": np.zeros((1, 413), np.float32)}
    preds["3dmm_params"][0, 403:409] = [1, 0, 0, 0, 1, 0]
    tex = creator(image, preds)
    assert tex.shape == (64, 64, 3)
    assert tex.dtype == np.uint8
    assert tex.max() > 0  # sampled something from the image
