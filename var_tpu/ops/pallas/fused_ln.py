"""Pallas fused modulated LayerNorm for the VAR decode path.

``y = LayerNorm(x) * scale + shift`` with per-sample (B, C) modulation — the
AdaLN pre-norm of every transformer block (reference ``basic_var.py:152-158``)
and the pre-head norm (``var.py:118-124``).

Why a kernel: in the 10-stage KV-cached decode, XLA compiles this glue as
(stats reduce + apply) fusions that profile at 20-60 GB/s on the per-stage
(2B, L, C) activations — ~190 ms of a 672 ms d16 bs64 decode, more than the
GEMMs. One Pallas pass reads x once, computes fp32 stats in registers, and
writes the modulated output once at stream bandwidth.

Decode is forward-only, so no VJP is defined; the teacher-forced training
path keeps XLA's LN (at L=680 single-pass XLA fuses it well, and it needs
the gradient).
"""

from __future__ import annotations

import functools
from typing import Optional

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32

# input-block byte cap (A/B knob): read ONCE at import so it is stable for
# the process — modulated_layernorm is jit-cached by shapes only, and a
# trace-time env read would silently pin the first-seen value anyway
_BLOCK_CAP = int(os.environ.get("VAR_TPU_LN_BLOCK_BYTES", 2 * 1024 * 1024))


def _kernel(x_ref, s_ref, sh_ref, o_ref, *, eps: float):
    # mirrors models/var._ln + AdaLN modulation bit-for-bit: fp32 stats
    # (E[x^2] - mu^2 form), normalization and (scale+1)/shift applied in the
    # input dtype
    x = x_ref[...]  # (BB, BL, C)
    xf = x.astype(F32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mu)
    inv = jax.lax.rsqrt(var + eps)
    dt = x.dtype
    y = (x - mu.astype(dt)) * inv.astype(dt)
    y = y * (s_ref[...].astype(dt) + 1.0) + sh_ref[...].astype(dt)
    o_ref[...] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def modulated_layernorm(
    x: jax.Array,
    scale: jax.Array,
    shift: jax.Array,
    eps: float = 1e-6,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """LayerNorm over the last dim (fp32 stats) then per-sample AdaLN affine.

    x: (B, L, C); scale, shift: (B, C) raw AdaLN params — broadcast over L.
    Computes ``_ln(x) * (scale + 1) + shift`` (models/var.py AdaLN pre-norm)
    with identical dtype staging, so XLA and Pallas paths agree bitwise for
    fp32 inputs.
    """
    if interpret is None:  # run anywhere: interpret off-TPU (tests)
        interpret = jax.default_backend() != "tpu"
    b, l, c = x.shape
    bl = l if l <= 256 else 256
    # batch samples per program: pallas has ~5-10us/program overhead, so a
    # (1, bl, c) block at B=128 costs more in launches than in bandwidth
    bb = 8 if b % 8 == 0 else (4 if b % 4 == 0 else (2 if b % 2 == 0 else 1))
    # in+out blocks, fp32 temps and double-buffering all draw on the ~16M
    # scoped-VMEM budget: cap the input block (VAR_TPU_LN_BLOCK_BYTES is an
    # A/B knob — the profile shows the big-stage LN passes at ~40 GB/s,
    # suggesting the 2M default plus its fp32 temps starves double
    # buffering)
    while bb > 1 and bb * bl * c * x.dtype.itemsize > _BLOCK_CAP:
        bb //= 2
    while bl > 8 and bb * bl * c * x.dtype.itemsize > _BLOCK_CAP:
        # keep the sequence block %8 (TPU block-dim constraint; bl == l is
        # only exempt while untouched)
        bl = max(8, -(-(bl // 2) // 8) * 8)
    grid = (b // bb, pl.cdiv(l, bl))
    # (B, 1, C) so the modulation blocks' trailing dims equal the array's
    # (TPU lowering requires trailing block dims %8/%128 or dim-equal)
    scale3 = scale.reshape(b, 1, c)
    shift3 = shift.reshape(b, 1, c)
    return pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((b, l, c), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb, bl, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((bb, 1, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((bb, 1, c), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bb, bl, c), lambda i, j: (i, j, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
        interpret=interpret,
    )(x, scale3, shift3)
