"""Parity tests: var_tpu.ops.resize vs torch.nn.functional.interpolate.

torch (CPU build) is baked into the image; these tests compare weight-matrix
resizes against the exact kernels the reference calls in its quantizer hot
path (reference ``models/quant.py:150,160,183,190-192``; ``basic_vae.py:28``).
"""

import numpy as np
import pytest

import jax.numpy as jnp
import torch
import torch.nn.functional as F

from var_tpu.ops.resize import resize

PATCH_NUMS = (1, 2, 3, 4, 5, 6, 8, 10, 13, 16)


def _torch_resize(x_nhwc: np.ndarray, out_hw, mode) -> np.ndarray:
    t = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)).copy())
    if mode == "nearest":
        y = F.interpolate(t, size=out_hw, mode="nearest")
    else:
        y = F.interpolate(t, size=out_hw, mode=mode)
    return np.transpose(y.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("pn", PATCH_NUMS[:-1])
def test_area_downsample_matches_torch(pn):
    """16x16 -> every pyramid scale, the quantizer's residual downsample."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 16, 16, 5)).astype(np.float32)
    got = np.asarray(resize(jnp.asarray(x), (pn, pn), "area"))
    want = _torch_resize(x, (pn, pn), "area")
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("pn", PATCH_NUMS[:-1])
def test_bicubic_upsample_matches_torch(pn):
    """Every pyramid scale -> 16x16, the quantizer's embedding upsample."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, pn, pn, 5)).astype(np.float32)
    got = np.asarray(resize(jnp.asarray(x), (16, 16), "bicubic"))
    want = _torch_resize(x, (16, 16), "bicubic")
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("shape", [(3, 3), (7, 7), (16, 16)])
def test_nearest_2x_matches_torch(shape):
    """VAE decoder Upsample2x (reference basic_vae.py:28)."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, *shape, 4)).astype(np.float32)
    out_hw = (shape[0] * 2, shape[1] * 2)
    got = np.asarray(resize(jnp.asarray(x), out_hw, "nearest"))
    want = _torch_resize(x, out_hw, "nearest")
    np.testing.assert_allclose(got, want)


@pytest.mark.parametrize("inout", [((16, 16), (5, 5)), ((4, 4), (16, 16)), ((13, 13), (10, 10))])
def test_bilinear_matches_torch(inout):
    (ih, iw), out_hw = inout
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, ih, iw, 4)).astype(np.float32)
    got = np.asarray(resize(jnp.asarray(x), out_hw, "bilinear"))
    want = _torch_resize(x, out_hw, "bilinear")
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_bicubic_downsample_matches_torch():
    """Bicubic is also used downscale in embed_to_fhat experimental path."""
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 16, 16, 3)).astype(np.float32)
    got = np.asarray(resize(jnp.asarray(x), (10, 10), "bicubic"))
    want = _torch_resize(x, (10, 10), "bicubic")
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_identity_shortcircuit():
    x = jnp.ones((1, 8, 8, 2))
    assert resize(x, (8, 8), "area") is x


def test_resize_differentiable():
    import jax

    x = jnp.ones((1, 4, 4, 2))
    g = jax.grad(lambda v: resize(v, (16, 16), "bicubic").sum())(x)
    assert g.shape == x.shape
    assert np.isfinite(np.asarray(g)).all()
