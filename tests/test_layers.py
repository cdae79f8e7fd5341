"""Layer zoo tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dad3dheads_tpu.models import (
    MaskPredictionHead,
    MixSepConv,
    PixelShuffleUpsample,
    SepConv,
    get_conv_block,
    pixel_shuffle,
)


def _run(module, x):
    variables = module.init(jax.random.PRNGKey(0), x, train=False)
    return module.apply(variables, x, train=False)


def test_sep_and_mix_conv_shapes():
    x = jnp.ones((2, 16, 16, 12))
    assert _run(SepConv(24), x).shape == (2, 16, 16, 24)
    assert _run(SepConv(24, stride=2), x).shape == (2, 8, 8, 24)
    assert _run(MixSepConv(24), x).shape == (2, 16, 16, 24)


def test_pixel_shuffle_exact():
    # known depth-to-space arrangement
    x = jnp.arange(16, dtype=jnp.float32).reshape(1, 1, 1, 16)
    y = np.asarray(pixel_shuffle(x, 2))
    assert y.shape == (1, 2, 2, 4)
    # block (0,0) carries channels 0..3
    np.testing.assert_array_equal(y[0, 0, 0], [0, 1, 2, 3])
    np.testing.assert_array_equal(y[0, 0, 1], [4, 5, 6, 7])
    np.testing.assert_array_equal(y[0, 1, 0], [8, 9, 10, 11])


def test_pixel_shuffle_upsample_module():
    x = jnp.ones((1, 8, 8, 16))
    y = _run(PixelShuffleUpsample(8, upscale=2), x)
    assert y.shape == (1, 16, 16, 8)


def test_mask_prediction_head():
    x = jnp.ones((2, 32, 32, 16))
    y = _run(MaskPredictionHead(num_classes=68), x)
    assert y.shape == (2, 32, 32, 68)


def test_registry():
    assert get_conv_block("sep_conv") is SepConv
    with pytest.raises(KeyError):
        get_conv_block("nope")
