"""imresize parity vs golden fixtures generated from the reference imsize.py."""

import os

import numpy as np
import pytest

from hsi_dmgasr_tpu.data.imresize import imresize, make_imresize_jax

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "imresize_golden.npz")

CASES = [
    "down_128_32",
    "up_32_128",
    "down_64_16",
    "scale_half",
    "scale_2x",
    "scale_3x",
    "odd_shape",
    "gray_2d",
    "uint8",
]


def _kw(arr):
    scale, h, w = arr
    if scale > 0:
        return dict(scalar_scale=float(scale))
    return dict(output_shape=(int(h), int(w)))


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("golden fixtures not generated")
    return np.load(GOLDEN)


@pytest.mark.parametrize("name", CASES)
def test_imresize_matches_reference(golden, name):
    img = golden[f"{name}__in"]
    expected = golden[f"{name}__out"]
    out = imresize(img, **_kw(golden[f"{name}__kw"]))
    assert out.shape == expected.shape
    assert out.dtype == expected.dtype
    if expected.dtype == np.uint8:
        np.testing.assert_array_equal(out, expected)
    else:
        np.testing.assert_allclose(out, expected, rtol=0, atol=1e-12)


def test_imresize_jax_matches_numpy(golden):
    img = golden["down_128_32__in"].astype(np.float32)
    expected = imresize(img, output_shape=(32, 32))
    f = make_imresize_jax(img.shape[:2], output_shape=(32, 32))
    out = np.asarray(f(img))
    np.testing.assert_allclose(out, expected, atol=2e-5)


def test_imresize_jax_batched():
    rng = np.random.RandomState(0)
    x = rng.rand(2, 64, 64, 7).astype(np.float32)
    f = make_imresize_jax((64, 64), output_shape=(16, 16))
    out = np.asarray(f(x))
    assert out.shape == (2, 16, 16, 7)
    ref = np.stack([imresize(x[i], output_shape=(16, 16)) for i in range(2)])
    np.testing.assert_allclose(out, ref, atol=2e-5)
