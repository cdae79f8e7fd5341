"""The licensed-asset bridge: loading a FLAME-2020 ``flame.pkl``.

The reference consumes the real (LFS-absent) pickle at
model_training/model/static/flame.pkl via smplx conventions
(/root/reference/model_training/model/flame.py:124-180). A user with a FLAME
licence hands that file to ``load_flame_model`` — these tests prove the
``_from_flame_pkl`` path by serializing the synthetic stand-in arrays in the
exact FLAME-2020 pickle layout (float64 arrays, (V,3,36) posedirs, scipy
sparse ``J_regressor``, uint32 ``kintree_table`` with a 0xFFFFFFFF root) and
asserting the loaded model matches the source arrays and decodes identically.
"""

import pickle

import numpy as np
import pytest
import scipy.sparse as sp

from dad3dheads_tpu import assets
from dad3dheads_tpu.constants import NUM_JOINTS


def _as_flame2020_pickle(m: assets.FlameModelArrays) -> dict:
    """Re-encode FlameModelArrays in the FLAME-2020 pickle layout."""
    # our posedirs is (36, V*3); FLAME 2020 stores (V, 3, 36)
    v = m.v_template.shape[0]
    posedirs = m.posedirs.T.reshape(v, 3, (NUM_JOINTS - 1) * 9)
    kintree = np.stack(
        [
            np.asarray(m.parents, dtype=np.int64),
            np.arange(NUM_JOINTS, dtype=np.int64),
        ]
    )
    # the real asset stores the root parent as uint32 -1 (0xFFFFFFFF)
    kintree = kintree.astype(np.uint32)
    return {
        "v_template": m.v_template.astype(np.float64),
        "shapedirs": m.shapedirs.astype(np.float64),
        "posedirs": posedirs.astype(np.float64),
        "J_regressor": sp.csc_matrix(m.j_regressor.astype(np.float64)),
        "weights": m.lbs_weights.astype(np.float64),
        "kintree_table": kintree,
        "f": m.faces.astype(np.uint32),
    }


@pytest.fixture(scope="module")
def pkl_path(tmp_path_factory):
    src = assets.synthesize_flame_model()
    path = tmp_path_factory.mktemp("flame") / "flame.pkl"
    with open(path, "wb") as f:
        pickle.dump(_as_flame2020_pickle(src), f, protocol=2)
    return str(path)


def test_pkl_roundtrip_arrays(pkl_path):
    src = assets.synthesize_flame_model()
    loaded = assets.load_flame_model(pkl_path)
    assert not loaded.is_synthetic
    np.testing.assert_allclose(loaded.v_template, src.v_template, atol=1e-6)
    np.testing.assert_allclose(loaded.shapedirs, src.shapedirs, atol=1e-6)
    np.testing.assert_allclose(loaded.posedirs, src.posedirs, atol=1e-6)
    np.testing.assert_allclose(loaded.j_regressor, src.j_regressor, atol=1e-6)
    np.testing.assert_allclose(loaded.lbs_weights, src.lbs_weights, atol=1e-6)
    np.testing.assert_array_equal(loaded.parents, src.parents)
    assert loaded.parents[0] == -1  # uint32 0xFFFFFFFF root decoded as -1
    np.testing.assert_array_equal(loaded.faces, src.faces)
    loaded.validate()


def test_pkl_env_var_precedence(pkl_path, monkeypatch):
    monkeypatch.setenv("DAD3D_FLAME_PATH", pkl_path)
    loaded = assets.load_flame_model()
    assert not loaded.is_synthetic
    np.testing.assert_allclose(
        loaded.v_template, assets.synthesize_flame_model().v_template, atol=1e-6
    )


def test_pkl_decode_matches_synthetic(pkl_path):
    """A decode through the pkl-loaded model equals the synthetic decode —
    the full FLAMELayer path (flame.py:182-229) sees identical arrays."""
    import jax.numpy as jnp

    from dad3dheads_tpu.core.flame import FlameModel, FlameParams, flame_decode

    m_pkl = FlameModel.from_arrays(assets.load_flame_model(pkl_path))
    m_syn = FlameModel.from_arrays(assets.synthesize_flame_model())

    rng = np.random.default_rng(7)
    vec = jnp.asarray(rng.normal(size=(2, 413)).astype(np.float32) * 0.1)
    params = FlameParams.from_3dmm(vec)
    v_pkl = np.asarray(flame_decode(m_pkl, params))
    v_syn = np.asarray(flame_decode(m_syn, params))
    np.testing.assert_allclose(v_pkl, v_syn, atol=1e-5)


def test_pkl_dense_regressor_and_zero_root(pkl_path, tmp_path):
    """Variant layout: dense J_regressor and an int kintree whose root is 0
    (some re-exports do this) — the loader must still yield parents[0]=-1."""
    src = assets.synthesize_flame_model()
    data = _as_flame2020_pickle(src)
    data["J_regressor"] = np.asarray(src.j_regressor, dtype=np.float64)
    kintree = np.stack(
        [
            np.concatenate([[0], src.parents[1:]]).astype(np.int64),
            np.arange(NUM_JOINTS, dtype=np.int64),
        ]
    )
    data["kintree_table"] = kintree
    path = tmp_path / "flame_dense.pkl"
    with open(path, "wb") as f:
        pickle.dump(data, f, protocol=2)
    loaded = assets.load_flame_model(str(path))
    assert loaded.parents[0] == -1
    np.testing.assert_allclose(loaded.j_regressor, src.j_regressor, atol=1e-6)
    loaded.validate()


def test_pkl_chumpy_wrapped_loads_without_chumpy(tmp_path):
    """The REAL FLAME 2020 asset wraps its arrays in chumpy.ch.Ch objects, so
    a plain pickle.load raises ModuleNotFoundError in any environment without
    chumpy (the reference only loads because smplx drags chumpy in). The
    chumpy-free unpickler must absorb the Ch state and hand back the arrays.

    Emulated faithfully: a throwaway ``chumpy.ch`` module whose Ch pickles by
    instance __dict__ with the ndarray in 'x' (chumpy's layout), registered
    only while DUMPING, then removed — loading hits the missing-module path
    exactly like a user's real flame.pkl would."""
    import sys
    import types

    src = assets.synthesize_flame_model()
    data = _as_flame2020_pickle(src)

    ch_mod = types.ModuleType("chumpy.ch")

    class Ch:
        def __init__(self, x):
            self.x = np.asarray(x)
            self.dterms = ()  # extra state like the real Ch carries

    Ch.__module__ = "chumpy.ch"
    Ch.__qualname__ = "Ch"
    ch_mod.Ch = Ch
    top = types.ModuleType("chumpy")
    top.ch = ch_mod
    sys.modules["chumpy"] = top
    sys.modules["chumpy.ch"] = ch_mod
    try:
        for k in ("v_template", "shapedirs", "posedirs", "weights"):
            data[k] = Ch(data[k])
        path = tmp_path / "flame_chumpy.pkl"
        with open(path, "wb") as f:
            pickle.dump(data, f, protocol=2)
    finally:
        del sys.modules["chumpy"], sys.modules["chumpy.ch"]

    # sanity: without the shim this pickle is unloadable here
    with pytest.raises(ModuleNotFoundError):
        with open(path, "rb") as f:
            pickle.load(f, encoding="latin1")

    loaded = assets.load_flame_model(str(path))
    np.testing.assert_allclose(loaded.v_template, src.v_template, atol=1e-6)
    np.testing.assert_allclose(loaded.shapedirs, src.shapedirs, atol=1e-6)
    np.testing.assert_allclose(loaded.posedirs, src.posedirs, atol=1e-6)
    np.testing.assert_allclose(loaded.lbs_weights, src.lbs_weights, atol=1e-6)
    loaded.validate()
