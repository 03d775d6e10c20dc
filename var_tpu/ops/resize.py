"""Image resize operators with exact PyTorch ``F.interpolate`` semantics.

The multi-scale residual quantizer (reference: ``models/quant.py:135-196``)
interleaves four resize modes inside its residual accumulation loop:

* ``area``    — downsample residuals to each scale (``quant.py:150``)
* ``bicubic`` — upsample code embeddings back to 16x16 (``quant.py:160``)
* ``nearest`` — 2x upsampling inside the VAE decoder (``basic_vae.py:28``)
* ``bilinear``— edit-mask resizing (``demo_zero_shot_edit.ipynb``)

Errors here compound across 10 scales and flip discrete argmin token
choices, so numerical parity with torch matters (SURVEY.md §7 hard part #1).

TPU-first design: every one of these resizes is a *linear* operator along H
and W separately, so we precompute an ``(out, in)`` weight matrix per axis
(host-side, float64, cached) and apply it as two matmuls. This maps the
entire op onto the MXU instead of gather/scatter loops, differentiates for
free (transposed matmuls), and keeps shapes static for XLA.

All functions take NHWC arrays (TPU-preferred layout).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["resize", "resize_area", "resize_bicubic", "resize_bilinear", "resize_nearest"]

_CUBIC_A = -0.75  # torch's cubic convolution constant (upsample_bicubic2d)


def _cubic_weight(t: np.ndarray) -> np.ndarray:
    """Cubic convolution kernel w(x) with a=-0.75, defined on |x| < 2."""
    a = _CUBIC_A
    t = np.abs(t)
    w_near = ((a + 2.0) * t - (a + 3.0)) * t * t + 1.0  # |t| <= 1
    w_far = (((t - 5.0) * t + 8.0) * t - 4.0) * a  # 1 < |t| < 2
    return np.where(t <= 1.0, w_near, np.where(t < 2.0, w_far, 0.0))


@functools.lru_cache(maxsize=None)
def _weights_1d(in_size: int, out_size: int, mode: str) -> np.ndarray:
    """Dense (out_size, in_size) float32 resize matrix matching torch.

    torch semantics replicated (all with align_corners=False, no antialias):
      area     == adaptive_avg_pool: integer cell boundaries, equal weights.
      bicubic  == src=(i+0.5)*s-0.5 (negative kept), 4 taps, border clamp.
      bilinear == src clamped at 0, 2 taps.
      nearest  == src = floor(i * in/out).
    """
    w = np.zeros((out_size, in_size), dtype=np.float64)
    if mode == "area":
        for i in range(out_size):
            start = (i * in_size) // out_size
            end = -((-(i + 1) * in_size) // out_size)  # ceil((i+1)*in/out)
            w[i, start:end] = 1.0 / (end - start)
    elif mode == "bicubic":
        scale = in_size / out_size
        for i in range(out_size):
            src = (i + 0.5) * scale - 0.5  # cubic: negative src NOT clamped
            x0 = int(np.floor(src))
            t = src - x0
            taps = _cubic_weight(np.array([t + 1.0, t, 1.0 - t, 2.0 - t]))
            for k in range(4):
                idx = min(max(x0 - 1 + k, 0), in_size - 1)  # border replicate
                w[i, idx] += taps[k]
    elif mode == "bilinear":
        scale = in_size / out_size
        for i in range(out_size):
            src = max((i + 0.5) * scale - 0.5, 0.0)  # linear: clamp at 0
            x0 = int(np.floor(src))
            x1 = min(x0 + 1, in_size - 1)
            t = src - x0
            w[i, x0] += 1.0 - t
            w[i, x1] += t
    elif mode == "nearest":
        scale = in_size / out_size
        for i in range(out_size):
            idx = min(int(np.floor(i * scale)), in_size - 1)
            w[i, idx] = 1.0
    else:
        raise ValueError(f"unknown resize mode: {mode}")
    return np.ascontiguousarray(w, dtype=np.float32)


def resize(x: jax.Array, out_hw: tuple[int, int], mode: str) -> jax.Array:
    """Resize NHWC ``x`` to ``(N, out_h, out_w, C)`` with torch semantics.

    Identity sizes short-circuit (the reference skips the resize at the last
    scale, e.g. ``quant.py:150`` ``si != SN-1`` branches — callers need not
    special-case this).
    """
    n, h, in_w, c = x.shape
    out_h, out_w = out_hw
    if (h, in_w) == (out_h, out_w):
        return x
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    hi = jax.lax.Precision.HIGHEST
    if h != out_h:
        wh = jnp.asarray(_weights_1d(h, out_h, mode))
        xf = jnp.einsum("oh,nhwc->nowc", wh, xf, precision=hi)
    if in_w != out_w:
        ww = jnp.asarray(_weights_1d(in_w, out_w, mode))
        xf = jnp.einsum("ow,nhwc->nhoc", ww, xf, precision=hi)
    return xf.astype(orig_dtype)


def resize_area(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    return resize(x, out_hw, "area")


def resize_bicubic(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    return resize(x, out_hw, "bicubic")


def resize_bilinear(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    return resize(x, out_hw, "bilinear")


def resize_nearest(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    return resize(x, out_hw, "nearest")
