"""UV texture extraction tests (fallback spherical atlas + licensed layouts)."""

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


def _two_triangle_layout():
    """Unit-square UV layout: two charts covering the left/right halves."""
    vt = np.array(
        [[0.05, 0.05], [0.45, 0.05], [0.05, 0.95], [0.55, 0.05], [0.95, 0.05], [0.95, 0.95]],
        np.float32,
    )
    ft = np.array([[0, 1, 2], [3, 4, 5]], np.int64)
    return vt, ft


def test_uv_embedding_from_layout():
    from dad3dheads_tpu.render.uv_texture import uv_embedding_from_layout

    vt, ft = _two_triangle_layout()
    tri_id, bary = uv_embedding_from_layout(vt, ft, resolution=64)
    assert tri_id.shape == (64, 64) and bary.shape == (64, 64, 3)
    # both charts cover texels, and ids index the face table rows
    assert set(np.unique(tri_id)) <= {-1, 0, 1}
    assert (tri_id == 0).sum() > 50 and (tri_id == 1).sum() > 50
    covered = tri_id >= 0
    np.testing.assert_allclose(bary[covered].sum(-1), 1.0, atol=1e-3)
    # OBJ v-up convention: the vt=(0.05,0.95) corner (chart 0 apex) must land
    # near the TOP image rows
    rows0 = np.nonzero(tri_id == 0)[0]
    assert rows0.min() < 10


def test_uv_creator_accepts_layout_npz_and_obj(tmp_path, rng, flame_model):
    from dad3dheads_tpu.core.head_mesh import HeadMesh
    from dad3dheads_tpu.render.uv_texture import UVTextureCreator, parse_obj_uv_layout

    from dad3dheads_tpu import assets

    vt, ft2 = _two_triangle_layout()
    # the layout must be row-aligned with the mesh faces (the creator rejects
    # anything else): real UV charts on rows 0-1, degenerate (zero-area)
    # rows for the rest so only the first two faces rasterize
    n_faces = len(assets.get_faces())
    ft = np.zeros((n_faces, 3), np.int64)
    ft[:2] = ft2
    npz = tmp_path / "uv_layout.npz"
    np.savez(npz, vt=vt, ft=ft)
    hm = HeadMesh(model=flame_model, image_size=256)
    creator = UVTextureCreator(resolution=64, head_mesh=hm, uv_data_path=str(npz))
    assert (creator.tri_id >= 0).sum() > 100

    obj = tmp_path / "template.obj"
    lines = [f"vt {u} {v}" for u, v in vt]
    lines += [f"f 1/{a+1} 2/{b+1} 3/{c+1}" for a, b, c in ft]
    obj.write_text("\n".join(lines) + "\n")
    parsed = parse_obj_uv_layout(str(obj))
    assert parsed is not None
    np.testing.assert_allclose(parsed[0], vt, atol=1e-6)
    np.testing.assert_array_equal(parsed[1], ft)
    creator2 = UVTextureCreator(resolution=64, head_mesh=hm, uv_data_path=str(obj))
    np.testing.assert_array_equal(creator2.tri_id, creator.tri_id)

    image = (rng.uniform(size=(256, 256, 3)) * 255).astype(np.uint8)
    preds = {"3dmm_params": np.zeros((1, 413), np.float32)}
    preds["3dmm_params"][0, 403:409] = [1, 0, 0, 0, 1, 0]
    tex = creator(image, preds)
    assert tex.shape == (64, 64, 3) and tex.max() > 0
